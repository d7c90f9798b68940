"""DA3D dual-domain refinement (filters/da3d/DA3D.cpp) — must improve on
its guide when the guide is over-smoothed, and stay close to clean."""

import numpy as np
import pytest

from siril_tpu.ops.da3d import da3d


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def test_da3d_refines_oversmoothed_guide(rng):
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w] / 96.0
    clean = (0.4 + 0.2 * np.sin(10 * xx) + 0.15 * np.cos(7 * yy)
             ).astype(np.float32)
    clean[:, w // 2:] += 0.2        # hard edge
    sigma = 0.04
    noisy = clean + rng.normal(0, sigma, clean.shape).astype(np.float32)
    # over-smoothed guide: heavy box blur kills the edge + texture
    from scipy.ndimage import uniform_filter

    guide = uniform_filter(noisy, 7).astype(np.float32)
    out = da3d(noisy, guide, sigma, r=7, sigma_s=7.0)
    inner = np.s_[12:-12, 12:-12]
    p_guide = psnr(guide[inner], clean[inner])
    p_out = psnr(out[inner], clean[inner])
    p_noisy = psnr(noisy[inner], clean[inner])
    assert p_out > p_guide, (p_out, p_guide)    # restores detail
    assert p_out > p_noisy, (p_out, p_noisy)    # still denoises


def test_da3d_identity_on_clean():
    """Clean input + clean guide → output ≈ input (interior; the
    reflect-padded border has crease artifacts in this near-degenerate
    σ→0 regime, as in the reference's own padding)."""
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w] / 64.0
    clean = (0.5 + 0.2 * np.sin(6 * xx + 4 * yy)).astype(np.float32)
    out = da3d(clean, clean, 0.01, r=7, sigma_s=7.0)
    np.testing.assert_allclose(out[8:-8, 8:-8], clean[8:-8, 8:-8],
                               atol=5e-3)


def test_denoise_da3d_command(tmp_path, rng):
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line
    from siril_tpu.core.image import SirilImage

    clean = np.full((1, 64, 64), 0.4, np.float32)
    noisy = clean + rng.normal(0, 0.03, clean.shape).astype(np.float32)
    ctx = Session(cwd=str(tmp_path))
    ctx.set_image(SirilImage(data=np.clip(noisy, 0, 1)))
    rc = process_command_line(ctx, "denoise -da3d")
    assert rc == 0
    out = ctx.image.host()
    assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean()
    assert any("DA3D" in h for h in ctx.image.history)
