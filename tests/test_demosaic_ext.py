"""Extended demosaic methods (AHD/AMAZE/DCB/HPHD/IGV/LMMSE — the
librtprocess set, demosaicing_rtp.cpp:154-156) and X-Trans Markesteijn
slot (demosaicing.c:172 compile + settings.h:78 XTRANS):

VERDICT round-1 'Done' criteria: every method beats bilinear PSNR on a
synthetic mosaic and handles all pattern phases.
"""

import numpy as np
import pytest

from siril_tpu.ops import demosaic as dm
from siril_tpu.ops import xtrans as xt
from tests.test_demosaic import mosaic

EXT = ["ahd", "amaze", "dcb", "hphd", "igv", "lmmse"]


def scene(rng, h=72, w=96):
    """Smooth gradients + edges + color structure."""
    yy, xx = np.mgrid[0:h, 0:w] / max(h, w)
    r = 0.4 + 0.3 * np.sin(6.0 * xx) * np.cos(3.0 * yy)
    g = 0.5 + 0.25 * np.cos(5.0 * (xx + yy))
    b = 0.45 + 0.3 * np.sin(4.0 * yy)
    rgb = np.stack([r, g, b]).astype(np.float32)
    # hard vertical + horizontal luminance edges
    rgb[:, :, w // 2:] *= 0.55
    rgb[:, h // 3:, :] += 0.08
    return np.clip(rgb, 0, 1)


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


@pytest.mark.parametrize("method", EXT)
@pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GRBG", "GBRG"])
def test_flat_field_exact(method, pattern):
    rgb = np.zeros((3, 48, 48), np.float32)
    rgb[0], rgb[1], rgb[2] = 0.8, 0.5, 0.2
    cfa = mosaic(rgb, pattern)
    out = dm.debayer(cfa, pattern, dm.METHOD_NAMES[method])
    inner = np.s_[:, 6:-6, 6:-6]
    np.testing.assert_allclose(out[inner], rgb[inner], atol=0.02)


@pytest.mark.parametrize("method", EXT)
def test_beats_bilinear(method, rng):
    rgb = scene(rng)
    cfa = mosaic(rgb, "RGGB")
    bil = dm.debayer(cfa, "RGGB", dm.BAYER_BILINEAR)
    out = dm.debayer(cfa, "RGGB", dm.METHOD_NAMES[method])
    inner = np.s_[:, 8:-8, 8:-8]
    p_bil = psnr(bil[inner], rgb[inner])
    p_out = psnr(out[inner], rgb[inner])
    assert p_out > p_bil, (method, p_out, p_bil)


# ---------------------------------------------------------------------------
# X-Trans
# ---------------------------------------------------------------------------


def xtrans_mosaic(rgb, grid):
    h, w = rgb.shape[1:]
    rm, gm, bm = xt._xtrans_masks(grid, h, w)
    cfa = np.zeros((h, w), np.float32)
    cfa[rm] = rgb[0][rm]
    cfa[gm] = rgb[1][gm]
    cfa[bm] = rgb[2][bm]
    return cfa


def test_xtrans_pattern_compile():
    g = xt.compile_xtrans_pattern(xt.XTRANS_PATTERNS[0])
    assert g.shape == (6, 6)
    # 6×6 X-Trans: 20 green, 8 red, 8 blue
    assert (g == 1).sum() == 20
    assert (g == 0).sum() == 8
    assert (g == 2).sum() == 8
    # offsets roll the grid
    g2 = xt.compile_xtrans_pattern(xt.XTRANS_PATTERNS[0], xoff=2, yoff=3)
    np.testing.assert_array_equal(np.roll(np.roll(g, 3, 0), 2, 1), g2)


def test_xtrans_flip_matches_reference_rule():
    """compile_XTrans_pattern's bottom-up flip: row i reads source row
    (5−i+flip_offset) % 6 (demosaicing.c:181-189)."""
    pat = xt.XTRANS_PATTERNS[2]
    g_flip = xt.compile_xtrans_pattern(pat, flip=True, flip_offset=2)
    rows = [pat[i * 6:(i + 1) * 6] for i in range(6)]
    lut = {"R": 0, "G": 1, "B": 2}
    want = np.array([[lut[rows[(5 - i + 2) % 6][j]] for j in range(6)]
                     for i in range(6)])
    np.testing.assert_array_equal(g_flip, want)


@pytest.mark.parametrize("pidx", [0, 1, 2, 3])
def test_xtrans_flat_field(pidx):
    grid = xt.compile_xtrans_pattern(xt.XTRANS_PATTERNS[pidx])
    rgb = np.zeros((3, 48, 48), np.float32)
    rgb[0], rgb[1], rgb[2] = 0.7, 0.5, 0.3
    cfa = xtrans_mosaic(rgb, grid)
    out = xt.demosaic_xtrans(cfa, grid)
    inner = np.s_[:, 6:-6, 6:-6]
    np.testing.assert_allclose(out[inner], rgb[inner], atol=0.02)


@pytest.mark.parametrize("xoff,yoff", [(0, 0), (1, 0), (0, 2), (3, 4)])
def test_xtrans_all_phases(xoff, yoff, rng):
    grid = xt.compile_xtrans_pattern(xt.XTRANS_PATTERNS[0], xoff, yoff)
    rgb = scene(rng)
    cfa = xtrans_mosaic(rgb, grid)
    out = xt.demosaic_xtrans(cfa, grid)
    inner = np.s_[:, 8:-8, 8:-8]
    assert psnr(out[inner], rgb[inner]) > 26.0


def test_xtrans_beats_naive(rng):
    """The Markesteijn-class method must beat plain per-channel masked
    bilinear on structured content."""
    import jax.numpy as jnp

    from siril_tpu.ops.demosaic_ext import _masked_bilinear

    grid = xt.compile_xtrans_pattern(xt.XTRANS_PATTERNS[0])
    rgb = scene(rng)
    cfa = xtrans_mosaic(rgb, grid)
    rm, gm, bm = xt._xtrans_masks(grid, *cfa.shape)
    naive = np.stack([
        np.asarray(_masked_bilinear(jnp.asarray(cfa * m, jnp.float32),
                                    jnp.asarray(m)))
        for m in (rm, gm, bm)])
    out = xt.demosaic_xtrans(cfa, grid)
    inner = np.s_[:, 8:-8, 8:-8]
    assert psnr(out[inner], rgb[inner]) > psnr(naive[inner], rgb[inner])


def test_debayer_routes_xtrans(rng):
    """36-char patterns route through the X-Trans path from debayer()."""
    rgb = scene(rng, 60, 60)
    grid = xt.compile_xtrans_pattern(xt.XTRANS_PATTERNS[1])
    cfa = xtrans_mosaic(rgb, grid)
    out = dm.debayer(cfa, xt.XTRANS_PATTERNS[1], dm.BAYER_RCD)
    assert out.shape == (3, 60, 60)
    inner = np.s_[:, 8:-8, 8:-8]
    assert psnr(out[inner], rgb[inner]) > 24.0
