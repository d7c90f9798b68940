"""Demosaic tests: flat-field exactness, gradient reconstruction quality,
pattern phase handling, CFA extraction round trips."""

import numpy as np
import pytest

from siril_tpu.ops import demosaic as dm


def mosaic(rgb, pattern):
    """(3,H,W) RGB → CFA (H,W) by sampling the pattern."""
    h, w = rgb.shape[1:]
    rm, gm, bm = dm._cfa_masks(pattern, h, w)
    cfa = np.zeros((h, w), np.float32)
    cfa[rm] = rgb[0][rm]
    cfa[gm] = rgb[1][gm]
    cfa[bm] = rgb[2][bm]
    return cfa


@pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GRBG", "GBRG"])
@pytest.mark.parametrize("method", [dm.BAYER_BILINEAR, dm.BAYER_VNG,
                                    dm.BAYER_RCD])
class TestFlatField:
    def test_flat_grey(self, pattern, method):
        rgb = np.full((3, 32, 32), 0.5, np.float32)
        cfa = mosaic(rgb, pattern)
        out = dm.debayer(cfa, pattern, method)
        assert out.shape == (3, 32, 32)
        np.testing.assert_allclose(out, 0.5, atol=1e-3)

    def test_flat_color(self, pattern, method):
        rgb = np.zeros((3, 32, 32), np.float32)
        rgb[0], rgb[1], rgb[2] = 0.8, 0.5, 0.2
        cfa = mosaic(rgb, pattern)
        out = dm.debayer(cfa, pattern, method)
        inner = np.s_[:, 4:-4, 4:-4]
        np.testing.assert_allclose(out[inner],
                                   rgb[inner], atol=0.02)


class TestQuality:
    def test_smooth_gradient_rcd_beats_bilinear(self, rng):
        h, w = 64, 64
        yy, xx = np.mgrid[0:h, 0:w] / h
        rgb = np.stack([0.3 + 0.3 * xx, 0.4 + 0.2 * yy,
                        0.5 - 0.2 * xx]).astype(np.float32)
        cfa = mosaic(rgb, "RGGB")
        interior = np.s_[:, 6:-6, 6:-6]
        err_b = np.abs(dm.debayer(cfa, "RGGB", dm.BAYER_BILINEAR)[interior]
                       - rgb[interior]).mean()
        err_r = np.abs(dm.debayer(cfa, "RGGB", dm.BAYER_RCD)[interior]
                       - rgb[interior]).mean()
        assert err_r < 0.01
        assert err_b < 0.01

    def test_edges_rcd_beats_bilinear(self):
        # vertical edge: directional methods should reconstruct better
        h, w = 64, 64
        rgb = np.full((3, h, w), 0.2, np.float32)
        rgb[:, :, 32:] = 0.8
        cfa = mosaic(rgb, "RGGB")
        interior = np.s_[:, 6:-6, 6:-6]
        err_b = np.abs(dm.debayer(cfa, "RGGB", dm.BAYER_BILINEAR)[interior]
                       - rgb[interior]).mean()
        err_r = np.abs(dm.debayer(cfa, "RGGB", dm.BAYER_RCD)[interior]
                       - rgb[interior]).mean()
        assert err_r <= err_b * 1.05


class TestSuperPixel:
    def test_half_size(self):
        rgb = np.zeros((3, 16, 16), np.float32)
        rgb[0], rgb[1], rgb[2] = 0.9, 0.6, 0.1
        cfa = mosaic(rgb, "RGGB")
        out = dm.demosaic_super_pixel(cfa, "RGGB")
        assert out.shape == (3, 8, 8)
        np.testing.assert_allclose(out[0], 0.9, atol=1e-6)
        np.testing.assert_allclose(out[1], 0.6, atol=1e-6)
        np.testing.assert_allclose(out[2], 0.1, atol=1e-6)


class TestPatternPhase:
    def test_offset_shifts_pattern(self):
        assert dm.effective_pattern("RGGB", 1, 0) == "GRBG"
        assert dm.effective_pattern("RGGB", 0, 1) == "GBRG"
        assert dm.effective_pattern("RGGB", 1, 1) == "BGGR"
        assert dm.effective_pattern("RGGB", 2, 2) == "RGGB"

    def test_bad_pattern_raises(self):
        with pytest.raises(ValueError):
            dm.effective_pattern("XYZW")
