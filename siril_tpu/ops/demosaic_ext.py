"""Extended Bayer demosaic set — the librtprocess-equivalent methods
(reference dispatch ``src/algos/demosaicing_rtp.cpp:154-156``; enum
``src/core/settings.h:68-79``): AHD, AMAZE, DCB, HPHD, IGV, LMMSE.

Each is a TPU-native re-derivation of the published algorithm, written as
fused whole-image stencils (shift + select arithmetic, no gathers, no
scalar loops) rather than a port of the C row loops:

- **AHD** (Hirakawa & Parks 2005): H/V directional green candidates +
  homogeneity-map selection.  Homogeneity uses luminance/chroma distances
  in a YC space rather than CIELab (documented deviation — same decision
  structure, cheaper transform).
- **LMMSE** (Zhang & Wu 2005): directional color-difference signals,
  9-tap smoothing, per-pixel linear minimum mean-square-error combination
  weighted by inverse residual variance.
- **DCB** (Gozdz): bilinear seed, hard H/V decision from second
  derivatives, color-difference refinement iteration.
- **HPHD**: heterogeneity projections (smoothed directional second
  differences) → hard H/V decision → directional green.
- **IGV**: gradient-inverse-weighted green from 4 directions, then
  iterative color-difference refinement.
- **AMAZE** (Martinec): re-derivation of the core stages — adaptive
  H/V color-difference interpolation with derivative-variance weights,
  continuous directional blending, green refinement and chroma
  smoothing.  (Not a line-accurate port of the 1000-line original; the
  staged structure and adaptivity criteria follow the published design.)

All methods interpolate R/B in the color-difference domain (R−G, B−G
bilinear over their CFA sites) which is shared infrastructure below.
"""

from __future__ import annotations

import functools

import numpy as np

from siril_tpu.ops.demosaic import _cfa_masks, effective_pattern


def _sh(a, dy, dx):
    """Shift with edge clamp: result[y,x] = a[y+dy, x+dx]."""
    import jax.numpy as jnp

    h, w = a.shape
    pad = max(abs(dy), abs(dx))
    ap = jnp.pad(a, pad, mode="edge")
    return ap[pad + dy: pad + dy + h, pad + dx: pad + dx + w]


def _masked_bilinear(x, mask):
    """Normalized convolution: bilinear fill of a masked channel."""
    import jax.numpy as jnp

    m = mask.astype(x.dtype)
    k = [(0, 0, 4.0), (0, 1, 2.0), (0, -1, 2.0), (1, 0, 2.0), (-1, 0, 2.0),
         (1, 1, 1.0), (1, -1, 1.0), (-1, 1, 1.0), (-1, -1, 1.0)]
    num = sum(w * _sh(x * m, dy, dx) for dy, dx, w in k)
    den = sum(w * _sh(m, dy, dx) for dy, dx, w in k)
    return num / jnp.maximum(den, 1e-12)


def _rb_from_differences(x, g, rm, bm):
    """R/B via bilinear interpolation of the color differences R−G, B−G
    over their CFA sites (shared final stage of every method here)."""
    r = g + _masked_bilinear((x - g) * rm, rm)
    b = g + _masked_bilinear((x - g) * bm, bm)
    return r, b


def _cd_smooth(x, g, rm, bm):
    """Smoothed G−X color difference at CFA sites, computed per color
    (G−R over R sites, G−B over B sites — mixing them would checkerboard
    on colored flats)."""
    import jax.numpy as jnp

    d = g - x
    dr = _masked_bilinear(d * rm, rm)
    db = _masked_bilinear(d * bm, bm)
    return jnp.where(rm, dr, db)


def _dir_green(x, gm):
    """Directional green candidates at non-green sites with the standard
    2nd-order Hamilton–Adams correction:
    G_H = (G_w + G_e)/2 + (2X − X_ww − X_ee)/4  (V analogous)."""
    gh = 0.5 * (_sh(x, 0, -1) + _sh(x, 0, 1)) \
        + 0.25 * (2.0 * x - _sh(x, 0, -2) - _sh(x, 0, 2))
    gv = 0.5 * (_sh(x, -1, 0) + _sh(x, 1, 0)) \
        + 0.25 * (2.0 * x - _sh(x, -2, 0) - _sh(x, 2, 0))
    import jax.numpy as jnp

    gh = jnp.where(gm, x, gh)
    gv = jnp.where(gm, x, gv)
    return gh, gv


# ---------------------------------------------------------------------------
# AHD
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _ahd_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, rm, gm, bm):
        gh, gv = _dir_green(x, gm)

        def reconstruct(g):
            r, b = _rb_from_differences(x, g, rm, bm)
            return r, g, b

        rh, ghh, bh = reconstruct(gh)
        rv, gvv, bv = reconstruct(gv)

        # homogeneity in a cheap YC space
        def yc(r, g, b):
            yy = 0.25 * (r + 2.0 * g + b)
            return yy, r - g, b - g

        yh, ch1, ch2 = yc(rh, ghh, bh)
        yv, cv1, cv2 = yc(rv, gvv, bv)

        # adaptive level-set thresholds (Hirakawa–Parks eq. 11): the MIN
        # over the two candidates of the max step along each candidate's
        # own interpolation direction
        elh = jnp.maximum(jnp.abs(yh - _sh(yh, 0, 1)),
                          jnp.abs(yh - _sh(yh, 0, -1)))
        elv = jnp.maximum(jnp.abs(yv - _sh(yv, 1, 0)),
                          jnp.abs(yv - _sh(yv, -1, 0)))
        e_l = jnp.minimum(elh, elv) + 1e-7

        def cdist2(c1, c2, dy, dx):
            return ((c1 - _sh(c1, dy, dx)) ** 2 + (c2 - _sh(c2, dy, dx)) ** 2)

        ech = jnp.maximum(cdist2(ch1, ch2, 0, 1), cdist2(ch1, ch2, 0, -1))
        ecv = jnp.maximum(cdist2(cv1, cv2, 1, 0), cdist2(cv1, cv2, -1, 0))
        e_c = jnp.minimum(ech, ecv) + 1e-12

        def homogeneity(yy, c1, c2):
            hom = jnp.zeros_like(yy)
            for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                okl = jnp.abs(yy - _sh(yy, dy, dx)) <= e_l
                okc = cdist2(c1, c2, dy, dx) <= e_c
                hom = hom + (okl & okc).astype(yy.dtype)
            return hom

        hh = homogeneity(yh, ch1, ch2)
        hv = homogeneity(yv, cv1, cv2)
        # 3×3 smoothing of the homogeneity maps before the decision
        box = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        hh = sum(_sh(hh, dy, dx) for dy, dx in box)
        hv = sum(_sh(hv, dy, dx) for dy, dx in box)
        # ballot; exact ties fall back to the 2nd-derivative criterion
        d2h = jnp.abs(2.0 * x - _sh(x, 0, -2) - _sh(x, 0, 2))
        d2v = jnp.abs(2.0 * x - _sh(x, -2, 0) - _sh(x, 2, 0))
        pick_h = jnp.where(hh == hv, d2h <= d2v, hh > hv)
        g = jnp.where(pick_h, ghh, gvv)
        r = jnp.where(pick_h, rh, rv)
        b = jnp.where(pick_h, bh, bv)
        return jnp.stack([r, g, b])

    return run


# ---------------------------------------------------------------------------
# LMMSE
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _lmmse_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, rm, gm, bm):
        cm = rm | bm
        gh, gv = _dir_green(x, gm)
        # color-difference signals: at CFA sites d = Ĝ − X; at green sites
        # d = G − X̂ (X̂ = directional average with HA correction)
        xh = 0.5 * (_sh(x, 0, -1) + _sh(x, 0, 1)) \
            + 0.25 * (2.0 * x - _sh(x, 0, -2) - _sh(x, 0, 2))
        xv = 0.5 * (_sh(x, -1, 0) + _sh(x, 1, 0)) \
            + 0.25 * (2.0 * x - _sh(x, -2, 0) - _sh(x, 2, 0))
        dh = jnp.where(cm, gh - x, x - xh)
        dv = jnp.where(cm, gv - x, x - xv)

        def lp(d, horiz):
            # 9-tap binomial smoothing along the interpolation direction
            w = (1.0, 8.0, 28.0, 56.0, 70.0, 56.0, 28.0, 8.0, 1.0)
            tot = sum(w)
            if horiz:
                return sum(wi * _sh(d, 0, k - 4) for k, wi in enumerate(w)) / tot
            return sum(wi * _sh(d, k - 4, 0) for k, wi in enumerate(w)) / tot

        def stats(d, horiz):
            m = lp(d, horiz)
            if horiz:
                var = sum(_sh((d - m) ** 2, 0, k) for k in range(-4, 5)) / 9.0
                res = sum(_sh((d - m) ** 2, 0, k) for k in range(-1, 2)) / 3.0
            else:
                var = sum(_sh((d - m) ** 2, k, 0) for k in range(-4, 5)) / 9.0
                res = sum(_sh((d - m) ** 2, k, 0) for k in range(-1, 2)) / 3.0
            return m, var, res

        mh, vh, nh = stats(dh, True)
        mv, vv, nv = stats(dv, False)
        # LMMSE estimate per direction: m + v/(v+n)·(d − m)
        eh = mh + vh / jnp.maximum(vh + nh, 1e-12) * (dh - mh)
        ev = mv + vv / jnp.maximum(vv + nv, 1e-12) * (dv - mv)
        # combine with inverse residual-variance weights
        rh_ = jnp.maximum(vh - vh * vh / jnp.maximum(vh + nh, 1e-12), 1e-12)
        rv_ = jnp.maximum(vv - vv * vv / jnp.maximum(vv + nv, 1e-12), 1e-12)
        wh = rv_ / (rh_ + rv_)
        d = wh * eh + (1.0 - wh) * ev
        g = jnp.where(cm, x + d, x)
        r, b = _rb_from_differences(x, g, rm, bm)
        return jnp.stack([r, g, b])

    return run


# ---------------------------------------------------------------------------
# DCB / HPHD / IGV / AMAZE
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _dcb_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, rm, gm, bm):
        cm = rm | bm
        gh, gv = _dir_green(x, gm)
        # hard decision from 2nd derivatives of the CFA
        d2h = jnp.abs(2.0 * x - _sh(x, 0, -2) - _sh(x, 0, 2))
        d2v = jnp.abs(2.0 * x - _sh(x, -2, 0) - _sh(x, 2, 0))
        g0 = jnp.where(d2h <= d2v, gh, gv)
        g0 = jnp.where(gm, x, g0)
        # refinement iteration: re-estimate G from the smoothed per-color
        # difference (DCB's correction step)
        for _ in range(2):
            d = jnp.where(cm, g0 - x, 0.0)
            dsm = _cd_smooth(x, g0, rm, bm)
            g0 = jnp.where(cm, x + 0.5 * (d + dsm), g0)
        r, b = _rb_from_differences(x, g0, rm, bm)
        return jnp.stack([r, g0, b])

    return run


@functools.lru_cache(maxsize=8)
def _hphd_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, rm, gm, bm):
        # heterogeneity projections: |∂²| accumulated along each axis
        d2h = jnp.abs(2.0 * x - _sh(x, 0, -2) - _sh(x, 0, 2)) \
            + jnp.abs(_sh(x, 0, -1) - _sh(x, 0, 1))
        d2v = jnp.abs(2.0 * x - _sh(x, -2, 0) - _sh(x, 2, 0)) \
            + jnp.abs(_sh(x, -1, 0) - _sh(x, 1, 0))
        # projection smoothing along the orthogonal axis (5-tap)
        ph = sum(_sh(d2h, k, 0) for k in range(-2, 3))
        pv = sum(_sh(d2v, 0, k) for k in range(-2, 3))
        gh, gv = _dir_green(x, gm)
        g = jnp.where(ph <= pv, gh, gv)
        g = jnp.where(gm, x, g)
        r, b = _rb_from_differences(x, g, rm, bm)
        return jnp.stack([r, g, b])

    return run


@functools.lru_cache(maxsize=8)
def _igv_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, rm, gm, bm):
        cm = rm | bm
        eps = 1e-5
        # gradient-inverse weights over the 4 principal directions
        we = 1.0 / (eps + jnp.abs(x - _sh(x, 0, 2))
                    + jnp.abs(_sh(x, 0, 1) - _sh(x, 0, -1)))
        ww = 1.0 / (eps + jnp.abs(x - _sh(x, 0, -2))
                    + jnp.abs(_sh(x, 0, -1) - _sh(x, 0, 1)))
        ws = 1.0 / (eps + jnp.abs(x - _sh(x, 2, 0))
                    + jnp.abs(_sh(x, 1, 0) - _sh(x, -1, 0)))
        wn = 1.0 / (eps + jnp.abs(x - _sh(x, -2, 0))
                    + jnp.abs(_sh(x, -1, 0) - _sh(x, 1, 0)))
        ge = _sh(x, 0, 1) + 0.5 * (x - _sh(x, 0, 2))
        gw = _sh(x, 0, -1) + 0.5 * (x - _sh(x, 0, -2))
        gs = _sh(x, 1, 0) + 0.5 * (x - _sh(x, 2, 0))
        gn = _sh(x, -1, 0) + 0.5 * (x - _sh(x, -2, 0))
        g = (we * ge + ww * gw + ws * gs + wn * gn) / (we + ww + ws + wn)
        g = jnp.where(gm, x, g)
        # iterative color-difference refinement (per-color smoothing)
        for _ in range(2):
            d = jnp.where(cm, g - x, 0.0)
            dsm = _cd_smooth(x, g, rm, bm)
            g = jnp.where(cm, x + 0.5 * (d + dsm), g)
        r, b = _rb_from_differences(x, g, rm, bm)
        return jnp.stack([r, g, b])

    return run


@functools.lru_cache(maxsize=8)
def _amaze_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, rm, gm, bm):
        cm = rm | bm
        eps = 1e-5
        gh, gv = _dir_green(x, gm)
        # directional color differences
        dh = jnp.where(cm, gh - x, 0.0)
        dv = jnp.where(cm, gv - x, 0.0)
        # derivative-variance adaptive weights (AMAZE's direction
        # discrimination): local variance of the directional cd signal
        def dirvar(d, horiz):
            if horiz:
                m = (d + _sh(d, 0, -2) + _sh(d, 0, 2)) / 3.0
                return ((d - m) ** 2 + (_sh(d, 0, -2) - m) ** 2
                        + (_sh(d, 0, 2) - m) ** 2)
            m = (d + _sh(d, -2, 0) + _sh(d, 2, 0)) / 3.0
            return ((d - m) ** 2 + (_sh(d, -2, 0) - m) ** 2
                    + (_sh(d, 2, 0) - m) ** 2)

        vh = dirvar(dh, True) + eps
        vv = dirvar(dv, False) + eps
        # smooth the variances (5×5-ish) for stability
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            vh = vh + _sh(vh, dy, dx)
            vv = vv + _sh(vv, dy, dx)
        wh = vv / (vh + vv)
        d = wh * dh + (1.0 - wh) * dv
        g = jnp.where(cm, x + d, x)
        # green refinement: clamp to local green envelope (zipper control)
        gmax = jnp.maximum(jnp.maximum(_sh(g, 0, 1), _sh(g, 0, -1)),
                           jnp.maximum(_sh(g, 1, 0), _sh(g, -1, 0)))
        gmin = jnp.minimum(jnp.minimum(_sh(g, 0, 1), _sh(g, 0, -1)),
                           jnp.minimum(_sh(g, 1, 0), _sh(g, -1, 0)))
        over = jnp.clip(g, gmin - 0.25 * (gmax - gmin),
                        gmax + 0.25 * (gmax - gmin))
        g = jnp.where(cm, over, g)
        # chroma smoothing: median-of-3 like pass on the differences
        r, b = _rb_from_differences(x, g, rm, bm)
        cr, cb = r - g, b - g

        def med3(c):
            a1 = _sh(c, 0, -1)
            a2 = c
            a3 = _sh(c, 0, 1)
            return jnp.minimum(jnp.maximum(jnp.minimum(a1, a2), a3),
                               jnp.maximum(a1, a2))

        r = g + med3(cr)
        b = g + med3(cb)
        return jnp.stack([r, g, b])

    return run


_FNS = {"ahd": _ahd_fn, "lmmse": _lmmse_fn, "dcb": _dcb_fn,
        "hphd": _hphd_fn, "igv": _igv_fn, "amaze": _amaze_fn}


def demosaic_ext(cfa: np.ndarray, pattern: str, method: str) -> np.ndarray:
    """Run one of the extended methods on a (H, W) CFA → (3, H, W)."""
    import jax.numpy as jnp

    pat = effective_pattern(pattern)
    h, w = cfa.shape
    rm, gm, bm = _cfa_masks(pat, h, w)
    fn = _FNS[method]()
    out = fn(jnp.asarray(cfa, jnp.float32), jnp.asarray(rm),
             jnp.asarray(gm), jnp.asarray(bm))
    return np.clip(np.asarray(out), 0.0, 1.0)
