"""Filters / wavelets / background / masks / pixel-math tests."""

import numpy as np
import pytest

from siril_tpu.core.image import SirilImage
from siril_tpu.ops import filters as ft
from siril_tpu.ops import masks as mk
from siril_tpu.ops import wavelets as wv
from siril_tpu.ops.background import (
    BKG_POLY,
    BKG_RBF,
    extract_background,
    generate_samples,
)
from siril_tpu.ops.pixelmath import PixelMathError, pixel_math


def img_of(a):
    return SirilImage(data=np.asarray(a, np.float32))


class TestGaussUnsharp:
    def test_gauss_preserves_mean(self, rng):
        im = img_of(rng.random((1, 64, 64)))
        out = ft.gauss(im, 2.0)
        assert out.host().mean() == pytest.approx(im.host().mean(), rel=1e-3)
        assert out.host().std() < im.host().std()

    def test_unsharp_amount1_identity(self, rng):
        im = img_of(rng.random((1, 32, 32)))
        out = ft.unsharp(im, 2.0, 1.0)
        np.testing.assert_allclose(out.host(), im.host(), atol=1e-5)

    def test_unsharp_amount0_is_blur(self, rng):
        im = img_of(rng.random((1, 32, 32)))
        blur = ft.gauss(im, 2.0)
        out = ft.unsharp(im, 2.0, 0.0)
        np.testing.assert_allclose(out.host(), blur.host(), atol=1e-5)


class TestMedianBanding:
    def test_median_removes_impulse(self):
        a = np.full((1, 16, 16), 0.3, np.float32)
        a[0, 8, 8] = 1.0
        out = ft.median_filter(img_of(a), 3)
        assert out.host()[0, 8, 8] == pytest.approx(0.3, abs=1e-5)

    def test_banding_removes_row_offsets(self, rng):
        base = np.full((1, 32, 64), 0.3, np.float32)
        offsets = rng.normal(0, 0.02, 32).astype(np.float32)
        banded = base + offsets[None, :, None]
        out = ft.fix_banding(img_of(banded), protect_highlights=False)
        row_std = out.host()[0].mean(axis=1).std()
        assert row_std < 0.002

    def test_clahe_improves_contrast(self, rng):
        a = 0.4 + 0.05 * rng.random((1, 64, 64)).astype(np.float32)
        out = ft.clahe(img_of(a), clip_limit=4.0)
        assert out.host().std() > a.std()


class TestEPF:
    def test_bilateral_preserves_edges(self):
        a = np.full((1, 32, 32), 0.2, np.float32)
        a[:, :, 16:] = 0.8
        noisy = a + np.random.default_rng(0).normal(0, 0.01, a.shape).astype(np.float32)
        out = ft.bilateral(img_of(noisy), d=5, sigma_col=0.1, sigma_spatial=2.0)
        o = out.host()[0]
        assert abs(o[:, :14].mean() - 0.2) < 0.02
        assert abs(o[:, 18:].mean() - 0.8) < 0.02
        assert o[:, :14].std() < noisy[0][:, :14].std()

    def test_guided_smooths(self, rng):
        a = (0.4 + rng.normal(0, 0.05, (1, 64, 64))).astype(np.float32)
        out = ft.guided_filter(img_of(a), radius=4, eps=1e-2)
        assert out.host().std() < a.std()


class TestFFT:
    def test_fftd_ffti_roundtrip(self, rng):
        im = img_of(rng.random((1, 32, 32)))
        mod, phase = ft.fftd(im)
        back = ft.ffti(mod, phase)
        np.testing.assert_allclose(back.host(), im.host(), atol=1e-4)


class TestLinearMatch:
    def test_recovers_linear_transform(self, rng):
        ref = img_of(0.2 + 0.5 * rng.random((1, 64, 64)))
        im = img_of(np.clip(ref.host() * 0.6 + 0.05, 0, 1))
        out = ft.linear_match(im, ref)
        np.testing.assert_allclose(out.host(), ref.host(), atol=2e-3)


class TestWavelets:
    def test_perfect_reconstruction(self, rng):
        data = rng.random((1, 64, 64)).astype(np.float32)
        planes = wv.atrous_decompose(data, 4)
        back = np.asarray(wv.atrous_reconstruct(planes))
        np.testing.assert_allclose(back, data, atol=1e-5)

    def test_denoise_reduces_noise(self, rng):
        clean = np.full((1, 64, 64), 0.4, np.float32)
        noisy = clean + rng.normal(0, 0.02, clean.shape).astype(np.float32)
        out = wv.wavelet_denoise(img_of(noisy), nb_layers=3)
        assert out.host().std() < noisy.std() * 0.7

    def test_layer_scaling(self, rng):
        data = rng.random((1, 32, 32)).astype(np.float32)
        planes = wv.atrous_decompose(data, 2)
        out = np.asarray(wv.atrous_reconstruct(planes, [0.0, 0.0]))
        np.testing.assert_allclose(out, np.asarray(planes[-1]), atol=1e-6)


class TestBackground:
    def test_poly_removes_gradient(self, rng):
        H, W = 96, 128
        yy, xx = np.mgrid[0:H, 0:W]
        gradient = 0.1 + 0.2 * xx / W + 0.1 * yy / H
        scene = gradient + rng.normal(0, 0.003, (H, W))
        im = img_of(np.clip(scene, 0, 1)[None].astype(np.float32))
        out = extract_background(im, BKG_POLY, degree=1)
        o = out.host()[0]
        # residual gradient should be tiny
        col_trend = abs(o[:, :20].mean() - o[:, -20:].mean())
        assert col_trend < 0.01

    def test_rbf_removes_blob(self, rng):
        H, W = 96, 96
        yy, xx = np.mgrid[0:H, 0:W]
        blob = 0.15 + 0.1 * np.exp(-(((xx - 48) ** 2 + (yy - 48) ** 2) / 2000))
        scene = blob + rng.normal(0, 0.002, (H, W))
        im = img_of(np.clip(scene, 0, 1)[None].astype(np.float32))
        out = extract_background(im, BKG_RBF, smoothing=0.5)
        o = out.host()[0]
        assert o.std() < scene.std() * 0.6

    def test_samples_reject_bright(self, rng):
        lay = np.full((64, 64), 0.1, np.float32)
        lay[20:40, 20:40] = 0.9      # a "galaxy"
        samples = generate_samples(lay, 8, tolerance=0.5)
        bright = [s for s in samples if s.median > 0.5]
        assert all(not s.valid for s in bright)


class TestMasks:
    def test_lum_and_invert(self, rng):
        im = img_of(rng.random((3, 16, 16)))
        m = mk.mask_from_lum(im)
        assert m.shape == (16, 16)
        np.testing.assert_allclose(mk.mask_invert(m), 1.0 - m)

    def test_threshold_binarize(self):
        m = np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4)
        t = mk.mask_threshold(m, 0.5, binarize=True)
        assert set(np.unique(t)) <= {0.0, 1.0}

    def test_masked_blend(self, rng):
        im = img_of(np.full((1, 8, 8), 0.2, np.float32))
        im.mask = np.zeros((8, 8), np.float32)
        im.mask[:4] = 1.0
        im.mask_active = True
        new = np.full((1, 8, 8), 0.8, np.float32)
        blended = np.asarray(im.apply_mask_blend(new))
        assert blended[0, 0, 0] == pytest.approx(0.8)
        assert blended[0, 7, 0] == pytest.approx(0.2)

    def test_star_mask(self, rng):
        lay = np.full((64, 64), 0.05, np.float32)
        yy, xx = np.mgrid[0:64, 0:64]
        lay += 0.6 * np.exp(-(((xx - 32.0) ** 2 + (yy - 32.0) ** 2) / 8.0))
        m = mk.mask_from_stars(img_of(lay[None]))
        assert m[32, 32] > 0.5
        assert m[5, 5] < 0.1


class TestPixelMath:
    def test_basic_arith(self, rng):
        a = img_of(rng.random((1, 8, 8)) * 0.4)
        b = img_of(rng.random((1, 8, 8)) * 0.4)
        out = pixel_math("(A + B) / 2", {"A": a, "B": b})
        np.testing.assert_allclose(out.host(),
                                   (a.host() + b.host()) / 2, rtol=1e-6)

    def test_functions(self, rng):
        a = img_of(rng.random((1, 8, 8)) * 0.5 + 0.1)
        out = pixel_math("sqrt(A) * 0.5", {"A": a})
        np.testing.assert_allclose(out.host(), np.sqrt(a.host()) * 0.5,
                                   rtol=1e-6)

    def test_iif(self, rng):
        a = img_of(rng.random((1, 8, 8)))
        out = pixel_math("iif(A > 0.5, 1, 0)", {"A": a})
        np.testing.assert_array_equal(out.host(), (a.host() > 0.5).astype(np.float32))

    def test_rejects_malicious(self):
        a = img_of(np.zeros((1, 4, 4)))
        with pytest.raises(PixelMathError):
            pixel_math("__import__('os').system('ls')", {"A": a})

    def test_unknown_var(self):
        a = img_of(np.zeros((1, 4, 4)))
        with pytest.raises(PixelMathError):
            pixel_math("A + Q", {"A": a})

    def test_mtf_in_expr(self):
        a = img_of(np.full((1, 4, 4), 0.25, np.float32))
        out = pixel_math("mtf(0.25, A)", {"A": a})
        np.testing.assert_allclose(out.host(), 0.5, atol=1e-6)


class TestMisc:
    def test_rgradient_runs(self, rng):
        a = img_of(0.2 + 0.3 * rng.random((1, 48, 48)))
        out = ft.rgradient(a, 24.0, 24.0, 2.0, 5.0)
        assert np.isfinite(out.host()).all()

    def test_thresh_family(self):
        a = img_of(np.linspace(0, 1, 16, dtype=np.float32).reshape(1, 4, 4))
        assert ft.threshlo(a, 0.3).host().min() >= 0.3
        assert ft.threshhi(a, 0.7).host().max() <= 0.7
        t = ft.thresh(a, 0.2, 0.8).host()
        assert t.min() >= 0.2 and t.max() <= 0.8

    def test_ddp(self, rng):
        a = img_of(0.1 + 0.2 * rng.random((1, 32, 32)))
        out = ft.ddp(a, 0.1, 1.0, 2.0)
        assert np.isfinite(out.host()).all()
