"""Blind PSF estimation (makepsf blind -l0 / -si) — VERDICT criterion:
recover a synthetic 7×7 blur kernel to tolerance; flag surface matches
command_list.h:117-122."""

import numpy as np
import pytest

from siril_tpu.ops import blind_deconv as bd


def make_scene(rng, h=320, w=320):
    """Structured natural-image-like scene: stars + edges + gradients."""
    yy, xx = np.mgrid[0:h, 0:w] / float(max(h, w))
    img = 0.25 + 0.15 * np.sin(9 * xx) + 0.1 * np.cos(7 * yy)
    img[h // 3:, :] += 0.2
    img[:, w // 2:] *= 0.7
    for _ in range(80):
        y, x = rng.integers(10, h - 10), rng.integers(10, w - 10)
        a = rng.uniform(0.2, 0.6)
        img[y - 1:y + 2, x - 1:x + 2] += a * 0.3
        img[y, x] += a
    return np.clip(img, 0, 1).astype(np.float32)


def true_kernel7():
    """Asymmetric 7×7 motion-ish blur."""
    k = np.zeros((7, 7), np.float32)
    k[3, 1:6] = [0.5, 1.0, 1.0, 1.0, 0.4]
    k[2, 2:5] = [0.3, 0.6, 0.3]
    k[4, 3] = 0.4
    return k / k.sum()


def blur(img, k):
    otf = bd._psf2otf_np(k, img.shape)
    return np.real(np.fft.ifft2(np.fft.fft2(img) * otf)).astype(np.float32)


def _aligned_err(k_est, k_true):
    """Min L1 distance over integer shifts (centroid centering can
    differ by a pixel)."""
    best = np.inf
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = np.roll(k_est, (dy, dx), axis=(0, 1))
            best = min(best, float(np.abs(s - k_true).sum()))
    return best


def _embed(k, ks):
    out = np.zeros((ks, ks), np.float32)
    off = ks // 2 - k.shape[0] // 2
    out[off:off + k.shape[0], off:off + k.shape[1]] = k
    return out


def test_l0_recovers_kernel(rng):
    scene = make_scene(rng)
    k_true = true_kernel7()
    v = blur(scene, k_true) + rng.normal(0, 5e-4, scene.shape).astype(np.float32)
    k_est = bd.estimate_kernel_l0(v, ks=11)
    assert k_est.shape == (11, 11)
    assert abs(k_est.sum() - 1.0) < 1e-5
    err = _aligned_err(k_est, _embed(k_true, 11))
    assert err < 0.65, err          # L1 of two unit-mass kernels ∈ [0, 2]
    # correlation with the truth must be strong
    corr = float((k_est * _embed(k_true, 11)).sum()
                 / np.sqrt((k_est ** 2).sum()
                           * (_embed(k_true, 11) ** 2).sum()))
    assert corr > 0.8, corr


def make_starfield(rng, h=320, w=320, n_stars=300):
    """Gradient-sparse astro content — the SI method's domain (its
    whitened-image ≈ white assumption holds for point-source fields)."""
    img = 0.1 + 0.05 * np.linspace(0, 1, w)[None, :] * np.ones((h, 1))
    for _ in range(n_stars):
        y, x = rng.integers(4, h - 4), rng.integers(4, w - 4)
        img[y, x] += rng.uniform(0.1, 0.8)
    return np.clip(img, 0, 1).astype(np.float32)


def test_si_recovers_kernel(rng):
    scene = make_starfield(rng)
    k_true = true_kernel7()
    v = blur(scene, k_true) + rng.normal(0, 5e-4, scene.shape).astype(np.float32)
    k_est = bd.estimate_kernel_si(v, ks=11, restarts=4)
    k_t = _embed(k_true, 11)
    corr = float((k_est * k_t).sum()
                 / np.sqrt((k_est ** 2).sum() * (k_t ** 2).sum()))
    assert corr > 0.6, corr


def test_multiscale_runs(rng):
    scene = make_scene(rng, 300, 300)
    v = blur(scene, true_kernel7())
    k = bd.estimate_kernel_l0(v, ks=11, iterations=3, multiscale=True)
    assert k.shape == (11, 11) and abs(k.sum() - 1.0) < 1e-5


def test_kernel_cleanup():
    k = np.zeros((9, 9), np.float32)
    k[4, 4] = 1.0
    k[0, 0] = 0.2       # isolated component — must be removed
    k[4, 5] = 0.5
    out = bd._kernel_cleanup(k)
    assert out[0, 0] == 0.0
    assert abs(out.sum() - 1.0) < 1e-6


def test_makepsf_blind_cli(tmp_path, rng):
    """Flag surface: makepsf blind [-l0] [-si] [-multiscale] [-lambda=]
    [-comp=] [-ks=] [-savepsf=] (command_list.h:120)."""
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line as run_command
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import read_fits, write_fits

    scene = make_scene(rng, 256, 256)
    v = blur(scene, true_kernel7())
    ctx = Session(cwd=str(tmp_path))
    ctx.set_image(SirilImage(data=v[None]))
    run_command(ctx, "makepsf blind -l0 -ks=9 -savepsf=kern.fit")
    assert ctx.psf is not None and ctx.psf.shape == (9, 9)
    saved = read_fits(str(tmp_path / "kern.fit"))
    assert saved.host()[0].max() == pytest.approx(1.0, abs=1e-5)
    run_command(ctx, "makepsf clear")
    assert ctx.psf is None
