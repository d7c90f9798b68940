"""Frozen stack-path parity goldens (VERDICT r4 ask #5).

The rejection kernels are tested against ``tests/reference_impl.py`` —
a LIVE numpy mirror of the C control flow (rejection_float.c:100,
statistics_float.c:150,199, sorting.c:195-325).  A live oracle can
drift: an erroneous "fix" applied to both oracle and kernel in one
commit passes silently.  This file freezes the oracle's outputs ONCE
into ``tests/golden/rejection_golden.npz`` and asserts

  1. the LIVE oracle still reproduces the frozen values (oracle drift
     fails loudly), and
  2. the JAX kernels reproduce the frozen values (kernel drift fails
     even if the oracle drifts in the same commit),

for all 8 rejection modes × u16-lattice / continuous-f32 stacks ×
edge cases (ties, heavy outliers, n<3, zero-valued entries), plus the
IKSS location/scale estimators and median tie-break order statistics.

Regenerate ONLY deliberately: SIRIL_REGEN_GOLDEN=1 python -m pytest
tests/test_rejection_golden.py
"""

import os

import numpy as np
import pytest

from siril_tpu.ops import rejection as rj
from tests import reference_impl as ref

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "rejection_golden.npz")

# (mode-name, rtype, siglow, sighigh) — sigmedian counts are iteration-
# path sensitive (see test_rejection.py), means still pin exactly
MODES = [
    ("percentile", rj.PERCENTILE, 0.5, 0.5),
    ("sigma", rj.SIGMA, 3.0, 3.0),
    ("sigma_asym", rj.SIGMA, 1.5, 2.0),
    ("mad", rj.MAD, 3.0, 3.0),
    ("sigmedian", rj.SIGMEDIAN, 2.0, 2.0),
    ("winsorized", rj.WINSORIZED, 3.0, 3.0),
    ("linearfit", rj.LINEARFIT, 2.0, 2.0),
    ("gesdt", rj.GESDT, 0.3, 0.05),
]
ORACLE_NAME = {"percentile": "percentile", "sigma": "sigma",
               "sigma_asym": "sigma", "mad": "mad",
               "sigmedian": "sigmedian", "winsorized": "winsorized",
               "linearfit": "linearfit", "gesdt": "gesdt"}


def _stacks():
    """Deterministic stack battery: columns of (N, P) matrices.

    Cases: gaussian+outliers on the u16 lattice, continuous f32, exact
    ties, heavy contamination (most frames outlying), tiny n (1, 2, 3),
    zero-valued (excluded) entries."""
    rng = np.random.default_rng(20260820)
    out = {}

    n, p = 16, 48
    u16 = np.round(np.clip(
        rng.normal(0.3, 0.05, (n, p)) +
        (rng.random((n, p)) < 0.15) * rng.uniform(0.2, 0.5, (n, p)),
        0, 1) * 65535.0) / np.float32(65535.0)
    u16[0, rng.random(p) < 0.25] = 0.0
    out["u16"] = u16.astype(np.float32)

    f32 = (rng.normal(0.4, 0.03, (n, p)) +
           (rng.random((n, p)) < 0.1) * rng.uniform(-0.3, 0.6, (n, p))
           ).astype(np.float32)
    out["f32"] = np.abs(f32)

    ties = np.tile(np.float32([0.25, 0.25, 0.25, 0.5, 0.5, 0.125, 0.75,
                               0.25])[:, None], (2, 12))
    ties += (rng.random(ties.shape) < 0.3) * np.float32(0.25)
    out["ties"] = ties.astype(np.float32)

    heavy = rng.normal(0.2, 0.01, (12, 24)).astype(np.float32)
    heavy[::2] += rng.uniform(0.3, 0.8, (6, 24)).astype(np.float32)
    out["heavy"] = np.abs(heavy)

    for nn in (1, 2, 3):
        out[f"tiny{nn}"] = np.abs(rng.normal(
            0.3, 0.05, (nn, 16))).astype(np.float32)
    return out


def _oracle_all():
    exp = {}
    for cname, stack in _stacks().items():
        N, P = stack.shape
        for mname, rtype, sl, sh in MODES:
            kw = {}
            if mname == "gesdt":
                mo = max(N // 3, 1)
                kw = {"critical": np.asarray(rj.gesdt_critical_values(
                    N, 0.05, mo), np.float32), "max_outliers": mo}
            means = np.zeros(P, np.float64)
            rls = np.zeros(P, np.int64)
            rhs = np.zeros(P, np.int64)
            for q in range(P):
                _, rl, rh, m = ref.reject_pixel(
                    stack[:, q], ORACLE_NAME[mname], sl, sh,
                    n_full=N, **kw)
                means[q], rls[q], rhs[q] = m, rl, rh
            exp[f"{cname}.{mname}.mean"] = means.astype(np.float32)
            exp[f"{cname}.{mname}.rl"] = rls
            exp[f"{cname}.{mname}.rh"] = rhs
    # IKSS + median tie-break order-statistic vectors
    from siril_tpu.ops.statistics import STATS_NORM, compute_stats_np

    rng = np.random.default_rng(7)
    vecs = {
        "ikss_u16": np.round(np.clip(rng.normal(
            0.3, 0.04, 4096), 0, 1) * 65535.0).astype(np.float32) / 65535.0,
        "ikss_cont": np.abs(rng.normal(0.5, 0.1, 4096)).astype(np.float32),
        "ikss_zeros": np.where(rng.random(4096) < 0.3, 0.0,
                               np.abs(rng.normal(0.4, 0.05, 4096))
                               ).astype(np.float32),
        "med_ties_even": np.repeat(np.float32(
            [0.1, 0.2, 0.2, 0.2, 0.3, 0.9]), 4),
        "med_ties_odd": np.concatenate([np.repeat(np.float32(
            [0.1, 0.2, 0.2, 0.2, 0.3, 0.9]), 4), [np.float32(0.2)]]),
    }
    for k, v in vecs.items():
        st = compute_stats_np(v[None, :], STATS_NORM)
        exp[f"{k}.median"] = np.float32(st.median)
        if k.startswith("ikss"):
            exp[f"{k}.location"] = np.float32(st.location)
            exp[f"{k}.scale"] = np.float32(st.scale)
            exp[f"{k}.mad"] = np.float32(st.mad)
    return exp


class TestRejectionGolden:
    def test_frozen_vectors(self):
        got = _oracle_all()
        if os.environ.get("SIRIL_REGEN_GOLDEN"):
            os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
            np.savez_compressed(GOLDEN, **got)
            pytest.skip("golden regenerated")
        if not os.path.exists(GOLDEN):
            pytest.fail("golden file missing — run with "
                        "SIRIL_REGEN_GOLDEN=1 to create it")
        exp = np.load(GOLDEN)

        # 1. live oracle == frozen oracle, bit-exact (drift detector)
        for k in exp.files:
            np.testing.assert_array_equal(
                got[k], exp[k], err_msg=f"oracle drift on {k!r} — if "
                "deliberate, regenerate the golden AND say why")

        # 2. JAX kernels vs the FROZEN values (kernel drift detector,
        # independent of the live oracle): same tolerances as
        # test_rejection.py (counts exact, mean 2e-5; sigmedian counts
        # path-sensitive ±4)
        for cname, stack in _stacks().items():
            N, P = stack.shape
            for mname, rtype, sl, sh in MODES:
                kw = {}
                if mname == "gesdt":
                    mo = max(N // 3, 1)
                    kw = {"critical": np.asarray(rj.gesdt_critical_values(
                        N, 0.05, mo), np.float32), "max_outliers": mo}
                means, rls, rhs = rj.rejection_mean(
                    stack, rtype, sl, sh, n_full=N, **kw)
                tag = f"{cname}.{mname}"
                np.testing.assert_allclose(
                    np.asarray(means), exp[f"{tag}.mean"], rtol=2e-5,
                    atol=2e-6, err_msg=f"kernel mean drift on {tag}")
                if mname == "sigmedian":
                    assert (np.abs(np.asarray(rls, np.int64)
                                   - exp[f"{tag}.rl"]) <= 4).all(), tag
                    assert (np.abs(np.asarray(rhs, np.int64)
                                   - exp[f"{tag}.rh"]) <= 4).all(), tag
                else:
                    np.testing.assert_array_equal(
                        np.asarray(rls, np.int64), exp[f"{tag}.rl"],
                        err_msg=f"kernel rej_low drift on {tag}")
                    np.testing.assert_array_equal(
                        np.asarray(rhs, np.int64), exp[f"{tag}.rh"],
                        err_msg=f"kernel rej_high drift on {tag}")

    def test_ikss_kernel_vs_frozen(self):
        """The batched estimator path (norm_estimators_hist_jax) against
        the frozen IKSS vectors — the hot fused-pipeline estimators are
        pinned independently of the numpy stats path."""
        if not os.path.exists(GOLDEN):
            pytest.skip("golden not generated yet")
        exp = np.load(GOLDEN)
        import jax.numpy as jnp

        from siril_tpu.ops.statistics import norm_estimators_hist_jax

        rng = np.random.default_rng(7)
        vecs = {
            "ikss_u16": np.round(np.clip(rng.normal(
                0.3, 0.04, 4096), 0, 1) * 65535.0
                ).astype(np.float32) / 65535.0,
            "ikss_cont": np.abs(rng.normal(0.5, 0.1, 4096)
                                ).astype(np.float32),
            "ikss_zeros": np.where(rng.random(4096) < 0.3, 0.0,
                                   np.abs(rng.normal(0.4, 0.05, 4096))
                                   ).astype(np.float32),
        }
        for k, v in vecs.items():
            est = norm_estimators_hist_jax(jnp.asarray(v[None, :]))
            assert float(est["median"][0]) == pytest.approx(
                float(exp[f"{k}.median"]), rel=2e-6), k
            assert float(est["location"][0]) == pytest.approx(
                float(exp[f"{k}.location"]), rel=1e-4), k
            assert float(est["scale"][0]) == pytest.approx(
                float(exp[f"{k}.scale"]), rel=1e-3), k
