"""X-Trans (Fuji 6×6 CFA) demosaicing — fills the reference's XTRANS
interpolation slot (``src/core/settings.h:78``, dispatch
``src/algos/demosaicing_rtp.cpp:154-156`` markesteijn_demosaic; pattern
compile ``src/algos/demosaicing.c:172`` compile_XTrans_pattern; standard
pattern strings ``demosaicing.c:44-71``).

TPU-native Markesteijn-class method, formulated as whole-image stencils
(the original iterates 3-pass homogeneity voting over scalar pixels;
hostile to a vector unit).  Stages:

1. **Green** at R/B sites: gradient-inverse-weighted normalized
   convolution over the green neighbors of the 8-neighborhood — the
   per-direction weight combines the opposing-neighbor difference and
   the 2-step directional derivative, which is the same edge-adaptive
   criterion Markesteijn's directional votes encode, evaluated
   continuously instead of by argmax.
2. **Green refinement**: one color-difference consistency pass.
3. **R/B** in the color-difference domain: two-pass masked normalized
   convolution (X-Trans R/B sites are 8/36 — sparser than Bayer — so a
   single 3×3 pass cannot reach every pixel).

Handles every pattern phase: the 6×6 grid is compiled with x/y offsets
and the bottom-up flip exactly like the reference.
"""

from __future__ import annotations

import functools

import numpy as np

from siril_tpu.core.image import SirilImage

# the 4 standard X-Trans phase patterns (demosaicing.c:44-71)
XTRANS_PATTERNS = (
    "GGRGGB" "GGBGGR" "BRGRBG" "GGBGGR" "GGRGGB" "RBGBRG",
    "RBGBRG" "GGRGGB" "GGBGGR" "BRGRBG" "GGBGGR" "GGRGGB",
    "GRGGBG" "BGBRGR" "GRGGBG" "GBGGRG" "RGRBGB" "GBGGRG",
    "GBGGRG" "RGRBGB" "GBGGRG" "GRGGBG" "BGBRGR" "GRGGBG",
)


def compile_xtrans_pattern(pattern: str, xoff: int = 0, yoff: int = 0,
                           flip: bool = False,
                           flip_offset: int = 0) -> np.ndarray:
    """36-char 'RGB' string → 6×6 int grid (0=R,1=G,2=B), replicating
    compile_XTrans_pattern (demosaicing.c:172-215) incl. the bottom-up
    row flip with (height % 6) offset and the x/y phase offsets."""
    if len(pattern) != 36:
        raise ValueError("X-Trans pattern must be 36 characters")
    rows = [pattern[i * 6:(i + 1) * 6] for i in range(6)]
    if flip:
        rows = [rows[(5 - i + flip_offset) % 6] for i in range(6)]
    grid = np.zeros((6, 6), np.int32)
    lut = {"R": 0, "G": 1, "B": 2}
    for y in range(6):
        for x in range(6):
            grid[(y + yoff) % 6, (x + xoff) % 6] = lut[rows[y][x]]
    return grid


def _xtrans_masks(grid: np.ndarray, h: int, w: int):
    tiled = np.tile(grid, (h // 6 + 2, w // 6 + 2))[:h, :w]
    return tiled == 0, tiled == 1, tiled == 2


@functools.lru_cache(maxsize=4)
def _xtrans_fn():
    import jax
    import jax.numpy as jnp

    from siril_tpu.ops.demosaic_ext import _masked_bilinear, _sh

    @jax.jit
    def run(x, rm, gm, bm):
        cm = rm | bm
        gmf = gm.astype(x.dtype)
        eps = 1e-5
        num = jnp.zeros_like(x)
        den = jnp.zeros_like(x)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                gn = _sh(x, dy, dx)
                is_g = _sh(gmf, dy, dx)
                grad = (jnp.abs(_sh(x, dy, dx) - _sh(x, -dy, -dx))
                        + jnp.abs(x - _sh(x, 2 * dy, 2 * dx)))
                wgt = is_g / (eps + grad)
                num = num + wgt * gn
                den = den + wgt
        g = jnp.where(gm, x, num / jnp.maximum(den, 1e-12))

        # green refinement: pull G toward local color-difference
        # consistency, smoothing G−R and G−B over their own sites (mixing
        # them checkerboards on colored flats)
        d = jnp.where(cm, g - x, 0.0)
        dr = _masked_bilinear(d * rm, rm)
        db = _masked_bilinear(d * bm, bm)
        dsm = jnp.where(rm, dr, db)
        g = jnp.where(cm, x + 0.5 * (d + dsm), g)

        # R/B: color-difference domain, two filling passes (sites are 8/36)
        def fill(mask):
            diff = (x - g) * mask
            m = mask.astype(x.dtype)
            d1 = _masked_bilinear(diff, mask)
            # second pass: treat first-pass result as dense, smooth holes
            have = jnp.zeros_like(m)
            k = [(0, 0), (0, 1), (0, -1), (1, 0), (-1, 0),
                 (1, 1), (1, -1), (-1, 1), (-1, -1)]
            for dy, dx in k:
                have = have + _sh(m, dy, dx)
            d2 = _masked_bilinear(jnp.where(have > 0, d1, 0.0), have > 0)
            return g + jnp.where(have > 0, d1, d2)

        r = fill(rm)
        b = fill(bm)
        return jnp.stack([r, g, b])

    return run


def demosaic_xtrans(cfa: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """(H, W) X-Trans CFA + compiled 6×6 grid → (3, H, W) RGB."""
    import jax.numpy as jnp

    h, w = cfa.shape
    rm, gm, bm = _xtrans_masks(np.asarray(grid), h, w)
    out = _xtrans_fn()(jnp.asarray(cfa, jnp.float32), jnp.asarray(rm),
                       jnp.asarray(gm), jnp.asarray(bm))
    return np.clip(np.asarray(out), 0.0, 1.0)


def demosaic_xtrans_image(img: SirilImage,
                          pattern: str = None) -> SirilImage:
    """X-Trans debayer of a CFA image using the header pattern (36 chars)
    or a standard phase pattern."""
    kw = img.keywords
    pat = pattern or kw.bayer_pattern
    if pat is None or len(pat) != 36:
        raise ValueError("image has no 36-character X-Trans pattern")
    grid = compile_xtrans_pattern(pat, kw.bayer_xoffset or 0,
                                  kw.bayer_yoffset or 0)
    rgb = demosaic_xtrans(img.host()[0], grid)
    out = img.copy(data=rgb.astype(np.float32))
    out.keywords.bayer_pattern = ""
    out.log_history("X-Trans debayer applied")
    return out
