"""Rejection kernel parity tests.

Golden vectors come from the reference's own unit tests
(src/tests/rejection_test.c: set1/set2 and expected means/counts); random
stacks are checked against scalar oracles that replicate the C control
flow (tests/reference_impl.py).
"""

import numpy as np
import pytest

from siril_tpu.ops import rejection as rj
from tests import reference_impl as ref

SET1 = np.array([145, 125, 190, 135, 220, 130, 210, 3, 165, 165, 150, 350,
                 170, 180, 195, 440, 215, 135, 410, 40, 140, 175], np.float32)

SET2 = np.array([7.7110e-2, 4.7330e-1, 5.7340e-1, 3.3310e-1, 5.3160e-1,
                 3.6550e-1, 3.1900e-1, 3.4650e-1, 2.2340e-1, 5.3680e-1,
                 4.8200e-1, 4.8150e-1, 2.5420e-1, 7.3770e-1, 6.6930e-1,
                 3.8980e-1, 5.8780e-1, 6.6680e-1, 6.9580e-1, 3.6260e-1,
                 7.1870e-1, 2.6420e-1, 5.2890e-1, 6.1350e-1, 2.4980e-1,
                 2.7930e-1, 7.9300e-1, 6.6690e-1, 5.9180e-1, 6.5240e-1,
                 8.4440e-2, 8.1500e-1, 3.5880e-1, 3.7450e-1, 5.6660e-1,
                 2.5050e-1, 5.6520e-1, 4.6880e-1, 9.7020e-2, 4.9380e-1],
                np.float32)


def run_one(stack, rtype, siglow, sighigh, **kw):
    s = np.asarray(stack, np.float32)[:, None]
    crit = kw.pop("critical", None)
    if crit is not None:
        crit = np.asarray(crit, np.float32)
    mean, rl, rh = rj.rejection_mean(s, rtype, siglow, sighigh,
                                     critical=crit, **kw)
    return float(mean[0]), int(rl[0]), int(rh[0])


class TestGoldenVectors:
    """Expected values from rejection_test.c."""

    def test_percentile_03_04(self):
        mean, rl, rh = run_one(SET1, rj.PERCENTILE, 0.3, 0.4)
        assert rl == 2 and rh == 3
        assert mean == pytest.approx(167.352936, abs=1e-4)

    def test_percentile_1_1(self):
        mean, rl, rh = run_one(SET1, rj.PERCENTILE, 1.0, 1.0)
        assert rl == 0 and rh == 3
        assert mean == pytest.approx(152.0, abs=1e-4)

    def test_gesdt(self):
        crit = rj.gesdt_critical_values(len(SET1), 0.05, 7)
        mean, rl, rh = run_one(SET1, rj.GESDT, 0.3, 0.05,
                               critical=crit, n_full=len(SET1),
                               max_outliers=7)
        assert rl == 2 and rh == 3
        assert mean == pytest.approx(167.352936, abs=1e-4)

    def test_linearfit_25(self):
        mean, rl, rh = run_one(SET2, rj.LINEARFIT, 2.5, 2.5,
                               n_full=len(SET2))
        assert (rl, rh) == (3, 2)
        assert mean == pytest.approx(0.476394, abs=1e-5)

    def test_linearfit_1(self):
        mean, rl, rh = run_one(SET2, rj.LINEARFIT, 1.0, 1.0,
                               n_full=len(SET2))
        assert (rl, rh) == (7, 12)
        assert mean == pytest.approx(0.4966, abs=1e-4)


@pytest.mark.parametrize("rtype,name,sig", [
    (rj.SIGMA, "sigma", (3.0, 3.0)),
    (rj.SIGMA, "sigma", (1.5, 2.0)),
    (rj.MAD, "mad", (3.0, 3.0)),
    (rj.SIGMEDIAN, "sigmedian", (2.0, 2.0)),
    (rj.WINSORIZED, "winsorized", (3.0, 3.0)),
    (rj.LINEARFIT, "linearfit", (2.0, 2.0)),
    (rj.PERCENTILE, "percentile", (0.5, 0.5)),
])
class TestRandomOracle:
    def test_random_stacks(self, rtype, name, sig, rng):
        N, P = 20, 64
        base = rng.normal(0.3, 0.05, size=(1, P)).astype(np.float32)
        stacks = base + rng.normal(0, 0.02, size=(N, P)).astype(np.float32)
        # inject outliers and a few zeros
        out_idx = rng.integers(0, N, P)
        stacks[out_idx, np.arange(P)] += rng.uniform(0.2, 0.5, P).astype(np.float32)
        zero_pix = rng.random(P) < 0.2
        stacks[0, zero_pix] = 0.0
        stacks = np.abs(stacks)

        means, rls, rhs = rj.rejection_mean(
            stacks, rtype, sig[0], sig[1], n_full=N)
        means = np.asarray(means)
        for p in range(P):
            _, rl, rh, m = ref.reject_pixel(stacks[:, p], name, sig[0], sig[1],
                                            n_full=N)
            assert np.isclose(means[p], m, rtol=2e-5, atol=2e-6), \
                f"pixel {p}: {means[p]} vs oracle {m}"
            if name == "sigmedian":
                # sigmedian re-tests every frame each iteration, so its
                # *counts* depend on the iteration path, which is
                # ULP-sensitive at clip boundaries (means still agree).
                assert abs(int(rls[p]) - rl) <= 4, f"pixel {p} rej_low"
                assert abs(int(rhs[p]) - rh) <= 4, f"pixel {p} rej_high"
            else:
                assert int(rls[p]) == rl, f"pixel {p} rej_low"
                assert int(rhs[p]) == rh, f"pixel {p} rej_high"


class TestGesdtOracle:
    def test_random(self, rng):
        N, P = 22, 32
        crit = rj.gesdt_critical_values(N, 0.05, 7)
        stacks = rng.normal(0.4, 0.03, size=(N, P)).astype(np.float32)
        out_idx = rng.integers(0, N, P)
        stacks[out_idx, np.arange(P)] *= 3.0
        means, rls, rhs = rj.rejection_mean(
            stacks, rj.GESDT, 0.3, 0.05, critical=crit,
            n_full=N, max_outliers=7)
        for p in range(P):
            _, rl, rh, m = ref.reject_pixel(
                stacks[:, p], "gesdt", 0.3, 0.05, n_full=N,
                critical=crit, max_outliers=7)
            assert np.isclose(float(means[p]), m, rtol=2e-5), f"pixel {p}"
            assert int(rls[p]) == rl and int(rhs[p]) == rh, f"pixel {p}"


class TestEdgeCases:
    def test_all_zero(self):
        mean, rl, rh = run_one(np.zeros(10, np.float32), rj.SIGMA, 3.0, 3.0)
        assert mean == 0.0 and rl == 0 and rh == 0

    def test_single_nonzero(self):
        s = np.zeros(10, np.float32)
        s[4] = 0.5
        mean, rl, rh = run_one(s, rj.SIGMA, 3.0, 3.0)
        assert mean == pytest.approx(0.5)

    def test_no_rejection(self):
        s = np.full(10, 0.25, np.float32)
        mean, rl, rh = run_one(s, rj.NO_REJEC, 0.0, 0.0)
        assert mean == pytest.approx(0.25)
        assert rl == 0 and rh == 0

    def test_median_stack(self):
        s = np.arange(1, 6, dtype=np.float32)[:, None]
        med = rj.median_stack(s)
        assert float(med[0]) == 3.0


class TestWeighted:
    def test_weighted_mean(self, rng):
        N, P = 12, 16
        stacks = np.abs(rng.normal(0.3, 0.02, size=(N, P))).astype(np.float32)
        w = rng.uniform(0.5, 2.0, size=(N, 1)).astype(np.float32)
        w = np.broadcast_to(w, (N, P)).copy()
        mean, _, _ = rj.rejection_mean(stacks, rj.NO_REJEC, 0.0, 0.0,
                                       weights=w, with_weights=True)
        expect = (stacks * w).sum(0) / w.sum(0)
        np.testing.assert_allclose(np.asarray(mean), expect, rtol=1e-5)
