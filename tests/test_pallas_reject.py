"""Parity: the fused Pallas rejection-stack kernel vs the jnp path.

The jnp path (ops/rejection.rejection_mean + ops/stacking._norm_apply) is
itself parity-tested against reference formulas (tests/test_rejection.py),
so exact agreement here transitively checks the kernel against
mean_and_reject (median_and_mean.c:956) semantics.

Runs the kernel in interpret mode (CPU backend); on TPU the same code
compiles through Mosaic.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from siril_tpu.ops import rejection as rj
from siril_tpu.ops.normalization import NO_NORM, ADDITIVE_SCALING, MULTIPLICATIVE
from siril_tpu.ops.stacking import _norm_apply
from siril_tpu.pallas.reject_stack import pallas_reject_mean, PALLAS_RTYPES


def _mkstack(rng, n=12, p=400, zeros=True, outliers=True):
    base = 0.2 + 0.5 * rng.random(p).astype(np.float32)
    stack = base[None, :] + rng.normal(0, 0.02, (n, p)).astype(np.float32)
    if outliers:
        idx = rng.integers(0, p, p // 6)
        stack[rng.integers(0, n, p // 6), idx] = 0.95
        idx = rng.integers(0, p, p // 8)
        stack[rng.integers(0, n, p // 8), idx] = 0.001
    if zeros:
        stack[rng.random((n, p)) < 0.05] = 0.0
    return np.clip(stack, 0.0, 1.0)


def _coeffs(rng, n):
    scale = (1.0 + 0.05 * rng.standard_normal(n)).astype(np.float32)
    offset = (0.01 * rng.standard_normal(n)).astype(np.float32)
    mul = (1.0 + 0.03 * rng.standard_normal(n)).astype(np.float32)
    return scale, offset, mul


@pytest.mark.parametrize("rtype", sorted(PALLAS_RTYPES))
@pytest.mark.parametrize("mode", [NO_NORM, ADDITIVE_SCALING, MULTIPLICATIVE])
def test_parity_f32(rng, rtype, mode):
    n = 12
    stack = _mkstack(rng, n=n)
    scale, offset, mul = _coeffs(rng, n)
    normed = _norm_apply(jnp.asarray(stack), jnp.asarray(scale),
                         jnp.asarray(offset), jnp.asarray(mul), mode)
    siglow, sighigh = 3.0, 3.0
    critical, max_outliers = None, 0
    if rtype == rj.GESDT:
        siglow, sighigh = 0.3, 0.05          # outlier fraction, significance
        max_outliers = int(np.floor(n * siglow))
        critical = jnp.asarray(
            rj.gesdt_critical_values(n, sighigh, max_outliers))
    ref_mean, ref_rl, ref_rh = rj.rejection_mean(
        normed, rtype, siglow, sighigh, critical=critical, n_full=n,
        max_outliers=max_outliers)
    got_mean, got_rl, got_rh = pallas_reject_mean(
        jnp.asarray(stack), jnp.asarray(scale), jnp.asarray(offset),
        jnp.asarray(mul), critical=critical, rtype=rtype, mode=mode,
        siglow=siglow, sighigh=sighigh, n_full=n,
        max_outliers=max_outliers)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(ref_mean),
                               rtol=0, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(got_rl), np.asarray(ref_rl))
    np.testing.assert_array_equal(np.asarray(got_rh), np.asarray(ref_rh))


@pytest.mark.parametrize("rtype", [rj.WINSORIZED, rj.SIGMA])
def test_parity_i16_decode(rng, rtype):
    """Raw i16 FITS input decodes on-device identically to the jnp path."""
    n = 10
    stack = _mkstack(rng, n=n, p=300)
    raw = np.round(stack * 65535.0).astype(np.int64) - 32768
    raw_i16 = raw.astype(np.int16)
    scale, offset, mul = _coeffs(rng, n)
    decoded = (raw_i16.astype(np.float32) + 32768.0) / 65535.0
    normed = _norm_apply(jnp.asarray(decoded), jnp.asarray(scale),
                         jnp.asarray(offset), jnp.asarray(mul),
                         ADDITIVE_SCALING)
    ref_mean, ref_rl, ref_rh = rj.rejection_mean(
        normed, rtype, 3.0, 3.0, n_full=n)
    got_mean, got_rl, got_rh = pallas_reject_mean(
        jnp.asarray(raw_i16), jnp.asarray(scale), jnp.asarray(offset),
        jnp.asarray(mul), rtype=rtype, mode=ADDITIVE_SCALING,
        siglow=3.0, sighigh=3.0)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(ref_mean),
                               rtol=0, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(got_rl), np.asarray(ref_rl))
    np.testing.assert_array_equal(np.asarray(got_rh), np.asarray(ref_rh))


def test_parity_weights(rng):
    """Weighted mean with the pmin/pmax membership rule."""
    n = 14
    stack = _mkstack(rng, n=n, p=256)
    scale, offset, mul = _coeffs(rng, n)
    w = (0.5 + rng.random((n, 256))).astype(np.float32)
    normed = _norm_apply(jnp.asarray(stack), jnp.asarray(scale),
                         jnp.asarray(offset), jnp.asarray(mul),
                         ADDITIVE_SCALING)
    ref_mean, _, _ = rj.rejection_mean(
        normed, rj.WINSORIZED, 3.0, 3.0, weights=jnp.asarray(w),
        n_full=n, with_weights=True)
    got_mean, _, _ = pallas_reject_mean(
        jnp.asarray(stack), jnp.asarray(scale), jnp.asarray(offset),
        jnp.asarray(mul), jnp.asarray(w), rtype=rj.WINSORIZED,
        mode=ADDITIVE_SCALING, siglow=3.0, sighigh=3.0, with_weights=True)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(ref_mean),
                               rtol=0, atol=2e-6)


def test_edge_cases(rng):
    """All-zero pixels, single-valid pixels, heavy rejection (N−r≤4 guard)."""
    n, p = 8, 256
    stack = _mkstack(rng, n=n, p=p, zeros=False, outliers=False)
    stack[:, 0] = 0.0                      # all-zero pixel
    stack[1:, 1] = 0.0                     # single valid value
    stack[:, 2] = np.linspace(0.01, 0.99, n)  # extreme spread → guard hits
    scale = np.ones(n, np.float32)
    offset = np.zeros(n, np.float32)
    mul = np.ones(n, np.float32)
    ref_mean, ref_rl, ref_rh = rj.rejection_mean(
        jnp.asarray(stack), rj.SIGMA, 1.0, 1.0, n_full=n)
    got_mean, got_rl, got_rh = pallas_reject_mean(
        jnp.asarray(stack), jnp.asarray(scale), jnp.asarray(offset),
        jnp.asarray(mul), rtype=rj.SIGMA, mode=NO_NORM,
        siglow=1.0, sighigh=1.0)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(ref_mean),
                               rtol=0, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(got_rl), np.asarray(ref_rl))
    np.testing.assert_array_equal(np.asarray(got_rh), np.asarray(ref_rh))


def test_nonaligned_pixels(rng):
    """P not a multiple of the tile width pads and slices correctly."""
    n, p = 9, 777
    stack = _mkstack(rng, n=n, p=p)
    scale = np.ones(n, np.float32)
    offset = np.zeros(n, np.float32)
    mul = np.ones(n, np.float32)
    ref_mean, _, _ = rj.rejection_mean(jnp.asarray(stack), rj.WINSORIZED,
                                       3.0, 3.0, n_full=n)
    got_mean, _, _ = pallas_reject_mean(
        jnp.asarray(stack), jnp.asarray(scale), jnp.asarray(offset),
        jnp.asarray(mul), rtype=rj.WINSORIZED, mode=NO_NORM,
        siglow=3.0, sighigh=3.0)
    assert got_mean.shape == (p,)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(ref_mean),
                               rtol=0, atol=2e-6)


def test_stack_sequence_pallas_path(tmp_path, rng, monkeypatch):
    """Full stack_sequence with the Pallas dispatch forced matches the
    jnp-path result bit-for-bit (u16 lights → resident path → kernel)."""
    from siril_tpu.core.image import SirilImage
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops import stacking as stk
    from siril_tpu.ops.normalization import ADDITIVE_SCALING

    scene = (0.2 + 0.6 * rng.random((32, 48))).astype(np.float32)
    files = []
    for i in range(10):
        f = np.clip(scene + rng.normal(0, 0.01, (32, 48)), 1e-4, 1.0)
        img = SirilImage(data=f.astype(np.float32)[None])
        p = tmp_path / f"l_{i:05d}.fit"
        write_fits(img, p, bitdepth=16)
        files.append(str(p))

    args = stk.StackArgs(method="rej", rejection=rj.WINSORIZED,
                         siglow=3.0, sighigh=3.0, normalize=ADDITIVE_SCALING)
    seq = Sequence.from_files(files, name="l_")
    r_jnp = stk.stack_sequence(seq, args)

    monkeypatch.setenv("SIRIL_TPU_FORCE_PALLAS", "1")
    stk.make_block_kernel.cache_clear()
    seq2 = Sequence.from_files(files, name="l_")
    r_pal = stk.stack_sequence(seq2, args)
    stk.make_block_kernel.cache_clear()

    np.testing.assert_allclose(r_pal.image.host(), r_jnp.image.host(),
                               rtol=0, atol=2e-6)
    assert r_pal.total_rejected == r_jnp.total_rejected


def test_guard_truncation_kept_top_segment(rng):
    """The N−r≤4 guard truncating the HIGH side mid-scan keeps the
    LARGEST high candidates (ascending C scan; the r5 kept-top-segment
    fix found by the adversarial 'heavy' golden case).  Exact parity
    pallas vs jnp vs the per-pixel oracle on stacks engineered so the
    budget exhausts inside the high-candidate suffix — with and without
    frame weights (pmin/pmax must include the segment)."""
    from tests import reference_impl as ref

    n, p = 12, 192
    # tight core + a heavy high tail on every pixel: many high
    # candidates, budget max_acc = n−4 = 8 < candidates on some pixels
    stack = (0.2 + 0.01 * rng.random((n, p))).astype(np.float32)
    ntail = 6
    stack[-ntail:, :] += rng.uniform(0.3, 0.7, (ntail, p)).astype(np.float32)
    stack[:2, :] -= 0.15                        # low candidates first
    stack = np.clip(stack, 0.001, 1.0)
    scale = np.ones(n, np.float32)
    offset = np.zeros(n, np.float32)
    mul = np.ones(n, np.float32)

    for rt, name in ((rj.SIGMA, "sigma"), (rj.MAD, "mad"),
                     (rj.WINSORIZED, "winsorized")):
        jm, jl, jh = rj.rejection_mean(jnp.asarray(stack), rt, 1.0, 1.0,
                                       n_full=n)
        pm, plo, phi = pallas_reject_mean(
            jnp.asarray(stack), jnp.asarray(scale), jnp.asarray(offset),
            jnp.asarray(mul), rtype=rt, mode=NO_NORM,
            siglow=1.0, sighigh=1.0)
        np.testing.assert_allclose(np.asarray(pm), np.asarray(jm),
                                   rtol=0, atol=2e-6, err_msg=name)
        np.testing.assert_array_equal(np.asarray(plo), np.asarray(jl),
                                      err_msg=name)
        np.testing.assert_array_equal(np.asarray(phi), np.asarray(jh),
                                      err_msg=name)
        # oracle spot-check on a sample of pixels (scalar loop is slow)
        hit_trunc = 0
        for q in range(0, p, 16):
            kept, rl, rh, m = ref.reject_pixel(stack[:, q], name, 1.0,
                                               1.0, n_full=n)
            assert int(np.asarray(jl)[q]) == rl, (name, q)
            assert int(np.asarray(jh)[q]) == rh, (name, q)
            assert np.isclose(float(np.asarray(jm)[q]), m, rtol=2e-5,
                              atol=2e-6), (name, q)
            # truncation actually exercised: some kept set must contain
            # a value ABOVE a rejected one (non-contiguous kept window)
            if rh > 0 and kept.size and kept.max() > 0.4:
                hit_trunc += 1
        assert hit_trunc > 0, f"{name}: fixture never truncated"

    # weights: pmin/pmax membership must span the kept-top segment
    w = (0.5 + rng.random((n, p))).astype(np.float32)
    jm, _, _ = rj.rejection_mean(jnp.asarray(stack), rj.WINSORIZED, 1.0,
                                 1.0, weights=jnp.asarray(w), n_full=n,
                                 with_weights=True)
    pmw, _, _ = pallas_reject_mean(
        jnp.asarray(stack), jnp.asarray(scale), jnp.asarray(offset),
        jnp.asarray(mul), jnp.asarray(w), rtype=rj.WINSORIZED,
        mode=NO_NORM, siglow=1.0, sighigh=1.0, with_weights=True)
    np.testing.assert_allclose(np.asarray(pmw), np.asarray(jm),
                               rtol=0, atol=2e-6)
