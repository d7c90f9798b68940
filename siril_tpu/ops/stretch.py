"""Histogram stretches — equivalents of ``src/filters/mtf.c`` (MTF,
autostretch), ``ght.c`` (generalized hyperbolic stretches), ``asinh.c``,
``curve_transform.c`` (curves), linear BP stretch.

All transfer functions are pure elementwise maps built once from scalar
coefficients on the host (GHTsetup equivalent) and applied on device in a
single fused pass — the reference's per-pixel LUTs become XLA-fused math.

Formulas are transcribed from the reference sources (cited per function)
so outputs match within float32 tolerance.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

from siril_tpu.utils.fetch import fetch_np
from siril_tpu.core.image import SirilImage

# ---------------------------------------------------------------------------
# MTF (mtf.c:125-138)
# ---------------------------------------------------------------------------

AS_DEFAULT_SHADOWS_CLIPPING = -2.80   # mtf.h:12
AS_DEFAULT_TARGET_BACKGROUND = 0.25   # mtf.h:13
MAD_NORM = 1.4826


@dataclass
class MTFParams:
    shadows: float = 0.0
    midtones: float = 0.2
    highlights: float = 1.0


def mtf(x, m: float, lo: float, hi: float):
    """MTF (mtf.c:125): clip outside [lo,hi], midtones transfer inside."""
    import jax.numpy as jnp

    xp = jnp.asarray(x, jnp.float32)
    xr = (xp - lo) / max(hi - lo, 1e-30)
    num = (m - 1.0) * xr
    den = (2.0 * m - 1.0) * xr - m
    y = num / jnp.where(den == 0, 1e-30, den)
    y = jnp.where(xp <= lo, 0.0, jnp.where(xp >= hi, 1.0, y))
    return y


def mtf_pseudoinverse(y, p: MTFParams):
    """(mtf.c:118)"""
    import jax.numpy as jnp

    yp = jnp.asarray(y, jnp.float32)
    num = ((p.shadows + p.highlights) * p.midtones - p.shadows) * yp - \
        p.shadows * p.midtones + p.shadows
    den = (2.0 * p.midtones - 1.0) * yp - p.midtones + 1.0
    return num / jnp.where(den == 0, 1e-30, den)


def _mtf_scalar(x, m, lo, hi):
    if x <= lo:
        return 0.0
    if x >= hi:
        return 1.0
    xr = (x - lo) / (hi - lo)
    return ((m - 1.0) * xr) / (((2.0 * m - 1.0) * xr) - m)


def find_linked_midtones_balance(img: SirilImage,
                                 shadows_clipping: float = AS_DEFAULT_SHADOWS_CLIPPING,
                                 target_bg: float = AS_DEFAULT_TARGET_BACKGROUND
                                 ) -> MTFParams:
    """Autostretch parameter finder (mtf.c:298-364)."""
    from siril_tpu.ops.statistics import STATS_BASIC, STATS_MAD, compute_stats_np

    data = img.host()
    nc = data.shape[0]
    stats = [compute_stats_np(data[c], STATS_BASIC | STATS_MAD)
             for c in range(nc)]
    inverted = sum(1 for s in stats if s.median > 0.5)
    p = MTFParams()
    if inverted < nc:
        c0 = m = 0.0
        for s in stats:
            mad = s.mad * MAD_NORM or 0.001
            c0 += s.median + shadows_clipping * mad
            m += s.median
        c0 = max(c0 / nc, 0.0)
        m2 = m / nc - c0
        p.shadows = c0
        p.midtones = _mtf_scalar(m2, target_bg, 0.0, 1.0)
        p.highlights = 1.0
    else:
        c1 = m = 0.0
        for s in stats:
            mad = s.mad * MAD_NORM or 0.001
            m += s.median
            c1 += s.median - shadows_clipping * mad
        c1 = min(c1 / nc, 1.0)
        m2 = c1 - m / nc
        p.midtones = 1.0 - _mtf_scalar(m2, target_bg, 0.0, 1.0)
        p.shadows = 0.0
        p.highlights = c1
    return p


def find_unlinked_midtones_balance(img: SirilImage,
                                   shadows_clipping: float = AS_DEFAULT_SHADOWS_CLIPPING,
                                   target_bg: float = AS_DEFAULT_TARGET_BACKGROUND):
    """Per-channel autostretch params (unlinked variant)."""
    from siril_tpu.ops.statistics import STATS_BASIC, STATS_MAD, compute_stats_np

    data = img.host()
    out = []
    for c in range(data.shape[0]):
        s = compute_stats_np(data[c], STATS_BASIC | STATS_MAD)
        mad = s.mad * MAD_NORM or 0.001
        p = MTFParams()
        if s.median <= 0.5:
            c0 = max(s.median + shadows_clipping * mad, 0.0)
            p.shadows = c0
            p.midtones = _mtf_scalar(s.median - c0, target_bg, 0.0, 1.0)
        else:
            c1 = min(s.median - shadows_clipping * mad, 1.0)
            p.midtones = 1.0 - _mtf_scalar(c1 - s.median, target_bg, 0.0, 1.0)
            p.highlights = c1
        out.append(p)
    return out


def apply_mtf(img: SirilImage, params, linked: bool = True) -> SirilImage:
    import jax.numpy as jnp

    data = img.device()
    if isinstance(params, MTFParams):
        out = mtf(data, params.midtones, params.shadows, params.highlights)
    else:
        chans = [mtf(data[c], params[c].midtones, params[c].shadows,
                     params[c].highlights) for c in range(data.shape[0])]
        out = jnp.stack(chans)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history("MTF stretch")
    return res


def autostretch(img: SirilImage, shadows_clipping: float = AS_DEFAULT_SHADOWS_CLIPPING,
                target_bg: float = AS_DEFAULT_TARGET_BACKGROUND,
                linked: bool = True) -> SirilImage:
    if linked:
        p = find_linked_midtones_balance(img, shadows_clipping, target_bg)
    else:
        p = find_unlinked_midtones_balance(img, shadows_clipping, target_bg)
    return apply_mtf(img, p, linked)


# ---------------------------------------------------------------------------
# GHT (ght.c:59-345) — full transcription
# ---------------------------------------------------------------------------

STRETCH_LINEAR = 0
STRETCH_PAYNE_NORMAL = 1
STRETCH_PAYNE_INVERSE = 2
STRETCH_ASINH = 3
STRETCH_INVASINH = 4

# colour stretch models (payload)
COL_INDEP = 0
COL_HUMANLUM = 1
COL_EVENLUM = 2
COL_SAT = 3


@dataclass
class GHTParams:
    B: float = 0.0
    D: float = 1.0
    LP: float = 0.0
    SP: float = 0.0
    HP: float = 1.0
    BP: float = 0.0
    stretchtype: int = STRETCH_PAYNE_NORMAL
    payne_colourstretchmodel: int = COL_INDEP


class _C:
    """ght_compute_params."""

    def __init__(self):
        for k in ("qlp q0 qwp q1 q a1 b1 a2 b2 c2 d2 e2 a3 b3 c3 d3 e3 "
                  "a4 b4 LPT SPT HPT").split():
            setattr(self, k, 0.0)


def ght_setup(B, D, LP, SP, HP, stretchtype) -> _C:
    """GHTsetup (ght.c:59) — scalar coefficient computation, f64 host."""
    c = _C()
    ln, ex, pw, sq = math.log, math.exp, math.pow, math.sqrt
    if D == 0.0 or stretchtype == STRETCH_LINEAR:
        return c
    if stretchtype == STRETCH_PAYNE_NORMAL:
        if B == -1.0:
            c.qlp = -math.log1p(D * (SP - LP))
            c.q0 = c.qlp - D * LP / (1.0 + D * (SP - LP))
            c.qwp = math.log1p(D * (HP - SP))
            c.q1 = c.qwp + D * (1.0 - HP) / (1.0 + D * (HP - SP))
            c.q = 1.0 / (c.q1 - c.q0)
            # NOTE: deliberate fix vs the reference — ght.c:72 uses the
            # reciprocal slope (1+D(SP-LP))/(D·q) here, which makes the
            # B=-1 curve discontinuous at LP; continuity with the res1
            # segment requires D·q/(1+D(SP-LP)).
            c.b1 = D * c.q / (1.0 + D * (SP - LP))
            c.a2 = -c.q0 * c.q
            c.b2 = -c.q
            c.c2 = 1.0 + D * SP
            c.d2 = -D
            c.a3 = -c.q0 * c.q
            c.b3 = c.q
            c.c3 = 1.0 - D * SP
            c.d3 = D
            c.a4 = (c.qwp - c.q0 - D * HP / (1.0 + D * (HP - SP))) * c.q
            c.b4 = c.q * D / (1.0 + D * (HP - SP))
        elif B < 0.0:
            B = -B
            c.qlp = (1.0 - pw(1.0 + D * B * (SP - LP), (B - 1.0) / B)) / (B - 1.0)
            c.q0 = c.qlp - D * LP * pw(1.0 + D * B * (SP - LP), -1.0 / B)
            c.qwp = (pw(1.0 + D * B * (HP - SP), (B - 1.0) / B) - 1.0) / (B - 1.0)
            c.q1 = c.qwp + D * (1.0 - HP) * pw(1.0 + D * B * (HP - SP), -1.0 / B)
            c.q = 1.0 / (c.q1 - c.q0)
            c.b1 = D * pw(1.0 + D * B * (SP - LP), -1.0 / B) * c.q
            c.a2 = (1.0 / (B - 1.0) - c.q0) * c.q
            c.b2 = -c.q / (B - 1.0)
            c.c2 = 1.0 + D * B * SP
            c.d2 = -D * B
            c.e2 = (B - 1.0) / B
            c.a3 = (-1.0 / (B - 1.0) - c.q0) * c.q
            c.b3 = c.q / (B - 1.0)
            c.c3 = 1.0 - D * B * SP
            c.d3 = D * B
            c.e3 = (B - 1.0) / B
            c.a4 = (c.qwp - c.q0 - D * HP * pw(1.0 + D * B * (HP - SP), -1.0 / B)) * c.q
            c.b4 = D * pw(1.0 + D * B * (HP - SP), -1.0 / B) * c.q
        elif B == 0.0:
            c.qlp = ex(-D * (SP - LP))
            c.q0 = c.qlp - D * LP * ex(-D * (SP - LP))
            c.qwp = 2.0 - ex(-D * (HP - SP))
            c.q1 = c.qwp + D * (1.0 - HP) * ex(-D * (HP - SP))
            c.q = 1.0 / (c.q1 - c.q0)
            c.b1 = D * ex(-D * (SP - LP)) * c.q
            c.a2 = -c.q0 * c.q
            c.b2 = c.q
            c.c2 = -D * SP
            c.d2 = D
            c.a3 = (2.0 - c.q0) * c.q
            c.b3 = -c.q
            c.c3 = D * SP
            c.d3 = -D
            c.a4 = (c.qwp - c.q0 - D * HP * ex(-D * (HP - SP))) * c.q
            c.b4 = D * ex(-D * (HP - SP)) * c.q
        else:
            c.qlp = pw(1.0 + D * B * (SP - LP), -1.0 / B)
            c.q0 = c.qlp - D * LP * pw(1.0 + D * B * (SP - LP), -(1.0 + B) / B)
            c.qwp = 2.0 - pw(1.0 + D * B * (HP - SP), -1.0 / B)
            c.q1 = c.qwp + D * (1.0 - HP) * pw(1.0 + D * B * (HP - SP), -(1.0 + B) / B)
            c.q = 1.0 / (c.q1 - c.q0)
            c.b1 = D * pw(1.0 + D * B * (SP - LP), -(1.0 + B) / B) * c.q
            c.a2 = -c.q0 * c.q
            c.b2 = c.q
            c.c2 = 1.0 + D * B * SP
            c.d2 = -D * B
            c.e2 = -1.0 / B
            c.a3 = (2.0 - c.q0) * c.q
            c.b3 = -c.q
            c.c3 = 1.0 - D * B * SP
            c.d3 = D * B
            c.e3 = -1.0 / B
            c.a4 = (c.qwp - c.q0 - D * HP * pw(1.0 + D * B * (HP - SP), -(B + 1.0) / B)) * c.q
            c.b4 = D * pw(1.0 + D * B * (HP - SP), -(B + 1.0) / B) * c.q
    elif stretchtype == STRETCH_PAYNE_INVERSE:
        if B == -1.0:
            c.qlp = -math.log1p(D * (SP - LP))
            c.q0 = c.qlp - D * LP / (1.0 + D * (SP - LP))
            c.qwp = math.log1p(D * (HP - SP))
            c.q1 = c.qwp + D * (1.0 - HP) / (1.0 + D * (HP - SP))
            c.q = 1.0 / (c.q1 - c.q0)
            c.LPT = (c.qlp - c.q0) * c.q
            # NOTE: deliberate fix vs the reference — ght.c:152 sets
            # SPT = q0·q for B=-1, which is negative, so the res1 inverse
            # branch is unreachable and inputs in [LP,SP) invert through
            # the wrong segment.  The forward value at SP is −q0·q.
            c.SPT = -c.q0 * c.q
            c.HPT = (c.qwp - c.q0) * c.q
            c.b1 = (1.0 + D * (SP - LP)) / (D * c.q)
            c.a2 = (1.0 + D * SP) / D
            c.b2 = -1.0 / D
            c.c2 = -c.q0
            c.d2 = -1.0 / c.q
            c.a3 = -(1.0 - D * SP) / D
            c.b3 = 1.0 / D
            c.c3 = c.q0
            c.d3 = 1.0 / c.q
            c.a4 = HP + (c.q0 - c.qwp) * (1 + D * (HP - SP)) / D
            c.b4 = (1.0 + D * (HP - SP)) / (c.q * D)
        elif B < 0.0:
            B = -B
            c.qlp = (1.0 - pw(1.0 + D * B * (SP - LP), (B - 1.0) / B)) / (B - 1.0)
            c.q0 = c.qlp - D * LP * pw(1.0 + D * B * (SP - LP), -1.0 / B)
            c.qwp = (pw(1.0 + D * B * (HP - SP), (B - 1.0) / B) - 1.0) / (B - 1.0)
            c.q1 = c.qwp + D * (1.0 - HP) * pw(1.0 + D * B * (HP - SP), -1.0 / B)
            c.q = 1.0 / (c.q1 - c.q0)
            c.LPT = (c.qlp - c.q0) * c.q
            c.SPT = -c.q0 * c.q
            c.HPT = (c.qwp - c.q0) * c.q
            c.b1 = pw(1.0 + D * B * (SP - LP), 1.0 / B) / (c.q * D)
            c.a2 = (1.0 + D * B * SP) / (D * B)
            c.b2 = -1.0 / (D * B)
            c.c2 = -c.q0 * (B - 1.0) + 1.0
            c.d2 = (1.0 - B) / c.q
            c.e2 = B / (B - 1.0)
            c.a3 = (D * B * SP - 1.0) / (D * B)
            c.b3 = 1.0 / (D * B)
            c.c3 = 1.0 + c.q0 * (B - 1)
            c.d3 = (B - 1.0) / c.q
            c.e3 = B / (B - 1.0)
            c.a4 = (c.q0 - c.qwp) / (D * pw(1.0 + D * B * (HP - SP), -1.0 / B)) + HP
            c.b4 = 1.0 / (D * pw(1.0 + D * B * (HP - SP), -1.0 / B) * c.q)
        elif B == 0.0:
            c.qlp = ex(-D * (SP - LP))
            c.q0 = c.qlp - D * LP * ex(-D * (SP - LP))
            c.qwp = 2.0 - ex(-D * (HP - SP))
            c.q1 = c.qwp + D * (1.0 - HP) * ex(-D * (HP - SP))
            c.q = 1.0 / (c.q1 - c.q0)
            c.LPT = (c.qlp - c.q0) * c.q
            c.SPT = (1.0 - c.q0) * c.q
            c.HPT = (c.qwp - c.q0) * c.q
            c.b1 = 1.0 / (D * ex(-D * (SP - LP)) * c.q)
            c.a2 = SP
            c.b2 = 1.0 / D
            c.c2 = c.q0
            c.d2 = 1.0 / c.q
            c.a3 = SP
            c.b3 = -1.0 / D
            c.c3 = 2.0 - c.q0
            c.d3 = -1.0 / c.q
            c.a4 = (c.q0 - c.qwp) / (D * ex(-D * (HP - SP))) + HP
            c.b4 = 1.0 / (D * ex(-D * (HP - SP)) * c.q)
        else:
            c.qlp = pw(1.0 + D * B * (SP - LP), -1.0 / B)
            c.q0 = c.qlp - D * LP * pw(1.0 + D * B * (SP - LP), -(1.0 + B) / B)
            c.qwp = 2.0 - pw(1.0 + D * B * (HP - SP), -1.0 / B)
            c.q1 = c.qwp + D * (1.0 - HP) * pw(1.0 + D * B * (HP - SP), -(1.0 + B) / B)
            c.q = 1.0 / (c.q1 - c.q0)
            c.LPT = (c.qlp - c.q0) * c.q
            c.SPT = (1.0 - c.q0) * c.q
            c.HPT = (c.qwp - c.q0) * c.q
            c.b1 = 1.0 / (D * pw(1.0 + D * B * (SP - LP), -(1.0 + B) / B) * c.q)
            c.a2 = 1.0 / (D * B) + SP
            c.b2 = -1.0 / (D * B)
            c.c2 = c.q0
            c.d2 = 1.0 / c.q
            c.e2 = -B
            c.a3 = -1.0 / (D * B) + SP
            c.b3 = 1.0 / (D * B)
            c.c3 = 2.0 - c.q0
            c.d3 = -1.0 / c.q
            c.e3 = -B
            c.a4 = (c.q0 - c.qwp) / (D * pw(1.0 + D * B * (HP - SP), -(B + 1.0) / B)) + HP
            c.b4 = 1.0 / (D * pw(1.0 + D * B * (HP - SP), -(B + 1.0) / B) * c.q)
    elif stretchtype in (STRETCH_ASINH, STRETCH_INVASINH):
        c.qlp = -ln(D * (SP - LP) + sq(D * D * (SP - LP) ** 2 + 1.0))
        c.q0 = c.qlp - LP * D * (D * D * (SP - LP) ** 2 + 1.0) ** -0.5
        c.qwp = ln(D * (HP - SP) + sq(D * D * (HP - SP) ** 2 + 1.0))
        c.q1 = c.qwp + (1.0 - HP) * D * (D * D * (HP - SP) ** 2 + 1.0) ** -0.5
        c.q = 1.0 / (c.q1 - c.q0)
        c.a1 = 0.0
        c.b1 = D * (D * D * (SP - LP) ** 2 + 1.0) ** -0.5 * c.q
        c.a2 = -c.q0 * c.q
        c.b2 = -c.q
        c.c2 = -D
        c.d2 = D * D
        c.e2 = SP
        c.a3 = -c.q0 * c.q
        c.b3 = c.q
        c.c3 = D
        c.d3 = D * D
        c.e3 = SP
        c.a4 = (c.qwp - HP * D * (D * D * (HP - SP) ** 2 + 1.0) ** -0.5 - c.q0) * c.q
        c.b4 = D * (D * D * (HP - SP) ** 2 + 1.0) ** -0.5 * c.q
        if stretchtype == STRETCH_INVASINH:
            c.LPT = c.a1 + c.b1 * LP
            c.SPT = c.a2 + c.b2 * ln(c.c2 * (SP - c.e2) +
                                     sq(c.d2 * (SP - c.e2) ** 2 + 1.0))
            c.HPT = c.a4 + c.b4 * HP
    return c


def ght(x, p: GHTParams, c: Optional[_C] = None):
    """GHT evaluation (ght.c:278-345), vectorized."""
    import jax.numpy as jnp

    if c is None:
        c = ght_setup(p.B, p.D, p.LP, p.SP, p.HP, p.stretchtype)
    xin = jnp.asarray(x, jnp.float32)
    B, D, LP, SP, HP = p.B, p.D, p.LP, p.SP, p.HP
    BP = p.BP if p.stretchtype == STRETCH_LINEAR else 0.0
    st = p.stretchtype
    if st == STRETCH_LINEAR:
        return jnp.maximum(0.0, (xin - p.BP) / (1.0 - p.BP))
    xi = jnp.maximum(0.0, (xin - BP) / (1.0 - BP))
    if D == 0.0:
        return xi
    f32 = np.float32
    if st == STRETCH_PAYNE_NORMAL:
        if B == -1.0:
            r1 = c.a2 + c.b2 * jnp.log(jnp.maximum(c.c2 + c.d2 * xi, 1e-30))
            r2 = c.a3 + c.b3 * jnp.log(jnp.maximum(c.c3 + c.d3 * xi, 1e-30))
        elif B != 0.0:
            r1 = c.a2 + c.b2 * jnp.power(jnp.maximum(c.c2 + c.d2 * xi, 1e-30), f32(c.e2))
            r2 = c.a3 + c.b3 * jnp.power(jnp.maximum(c.c3 + c.d3 * xi, 1e-30), f32(c.e3))
        else:
            r1 = c.a2 + c.b2 * jnp.exp(c.c2 + c.d2 * xi)
            r2 = c.a3 + c.b3 * jnp.exp(c.c3 + c.d3 * xi)
        return jnp.where(xi < LP, c.b1 * xi,
                         jnp.where(xi < SP, r1,
                                   jnp.where(xi < HP, r2, c.a4 + c.b4 * xi)))
    if st == STRETCH_PAYNE_INVERSE:
        if B == -1.0:
            r1 = c.a2 + c.b2 * jnp.exp(c.c2 + c.d2 * xi)
            r2 = c.a3 + c.b3 * jnp.exp(c.c3 + c.d3 * xi)
        elif B != 0.0:
            r1 = c.a2 + c.b2 * jnp.power(jnp.maximum(c.c2 + c.d2 * xi, 1e-30), f32(c.e2))
            r2 = c.a3 + c.b3 * jnp.power(jnp.maximum(c.c3 + c.d3 * xi, 1e-30), f32(c.e3))
        else:
            r1 = c.a2 + c.b2 * jnp.log(jnp.maximum(c.c2 + c.d2 * xi, 1e-30))
            r2 = c.a3 + c.b3 * jnp.log(jnp.maximum(c.c3 + c.d3 * xi, 1e-30))
        return jnp.where(xi < c.LPT, c.b1 * xi,
                         jnp.where(xi < c.SPT, r1,
                                   jnp.where(xi < c.HPT, r2, c.a4 + c.b4 * xi)))
    if st == STRETCH_ASINH:
        v1 = c.c2 * (xi - c.e2) + jnp.sqrt(c.d2 * (xi - c.e2) ** 2 + 1.0)
        r1 = c.a2 + c.b2 * jnp.log(jnp.maximum(v1, 1e-30))
        v2 = c.c3 * (xi - c.e3) + jnp.sqrt(c.d3 * (xi - c.e3) ** 2 + 1.0)
        r2 = c.a3 + c.b3 * jnp.log(jnp.maximum(v2, 1e-30))
        return jnp.where(xi < LP, c.a1 + c.b1 * xi,
                         jnp.where(xi < SP, r1,
                                   jnp.where(xi < HP, r2, c.a4 + c.b4 * xi)))
    # STRETCH_INVASINH
    e1 = jnp.exp((c.a2 - xi) / c.b2)
    r1 = c.e2 - (e1 - 1.0 / e1) / (2.0 * c.c2)
    e2_ = jnp.exp((c.a3 - xi) / c.b3)
    r2 = c.e3 - (e2_ - 1.0 / e2_) / (2.0 * c.c3)
    return jnp.where(xi < c.LPT, (xi - c.a1) / jnp.maximum(c.b1, 1e-30),
                     jnp.where(xi < c.SPT, r1,
                               jnp.where(xi < c.HPT, r2,
                                         (xi - c.a4) / jnp.maximum(c.b4, 1e-30))))


def apply_ght(img: SirilImage, p: GHTParams) -> SirilImage:
    """Apply GHT with the selected colour model (apply_linked_ght_to_fbuf_*)."""
    import jax.numpy as jnp

    data = img.device()
    c = ght_setup(p.B, p.D, p.LP, p.SP, p.HP, p.stretchtype)
    if img.nchans == 3 and p.payne_colourstretchmodel in (COL_HUMANLUM, COL_EVENLUM):
        w = (0.2126, 0.7152, 0.0722) if \
            p.payne_colourstretchmodel == COL_HUMANLUM else (1/3, 1/3, 1/3)
        lum = w[0] * data[0] + w[1] * data[1] + w[2] * data[2]
        sl = ght(lum, p, c)
        k = jnp.where(lum == 0.0, 0.0, sl / jnp.where(lum == 0, 1.0, lum))
        out = jnp.clip(data * k[None], 0.0, 1.0)
    elif img.nchans == 3 and p.payne_colourstretchmodel == COL_SAT:
        # stretch saturation channel in HSL space
        from siril_tpu.ops.colors import hsl_to_rgb, rgb_to_hsl

        h, s, lg = rgb_to_hsl(data[0], data[1], data[2])
        s2 = jnp.clip(ght(s, p, c), 0.0, 1.0)
        r, g, b = hsl_to_rgb(h, s2, lg)
        out = jnp.stack([r, g, b])
    else:
        out = jnp.clip(ght(data, p, c), 0.0, 1.0)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history(f"GHT (D={p.D:.2f} B={p.B:.2f})")
    return res


# ---------------------------------------------------------------------------
# asinh stretch (asinh.c:167-230)
# ---------------------------------------------------------------------------


def asinh_stretch(img: SirilImage, beta: float, offset: float = 0.0,
                  human_luminance: bool = False,
                  rescale: bool = False) -> SirilImage:
    import jax.numpy as jnp

    data = img.device()
    fr = 0.2126 if human_luminance else 1.0 / 3.0
    fg = 0.7152 if human_luminance else 1.0 / 3.0
    fb = 0.0722 if human_luminance else 1.0 / 3.0
    inv1mo = 1.0 / (1.0 - offset)
    ab = math.asinh(beta) if beta != 0 else 1.0
    if img.nchans == 3:
        prime = jnp.maximum(0.0, (data - offset) * inv1mo)
        x = fr * prime[0] + fg * prime[1] + fb * prime[2]
        k = jnp.where(x == 0.0, 0.0,
                      jnp.arcsinh(beta * x) / (jnp.where(x == 0, 1.0, x) * ab)
                      if beta != 0 else 1.0)
        sf = jnp.maximum(0.0, prime * k[None])
        if rescale:
            mx = sf.max(axis=0)
            scale = jnp.where(mx > 1.0, 1.0 / jnp.maximum(mx, 1e-30), 1.0)
            out = sf * scale[None]
        else:
            out = jnp.minimum(sf, 1.0)
    else:
        prime = jnp.maximum(0.0, (data - offset) * inv1mo)
        x = prime[0]
        k = jnp.where(x == 0.0, 0.0,
                      jnp.arcsinh(beta * x) / (jnp.where(x == 0, 1.0, x) * ab)
                      if beta != 0 else 1.0)
        out = jnp.clip(prime * k[None], 0.0, 1.0)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history(f"Asinh Transformation: (stretch={beta:6.1f}, bp={offset:7.5f})")
    return res


# ---------------------------------------------------------------------------
# linstretch (linear BP) + curves
# ---------------------------------------------------------------------------


def linstretch(img: SirilImage, bp: float) -> SirilImage:
    p = GHTParams(BP=bp, stretchtype=STRETCH_LINEAR)
    return apply_ght(img, p)


def apply_curve(img: SirilImage, points, algo: str = "spline",
                channels=(True, True, True)) -> SirilImage:
    """curve_transform.c: monotone cubic-spline or linear curve through
    control points [(x,y)...] in [0,1]."""
    import jax.numpy as jnp

    pts = sorted((float(a), float(b)) for a, b in points)
    xs = np.array([p[0] for p in pts], np.float64)
    ys = np.array([p[1] for p in pts], np.float64)
    if algo == "linear" or len(pts) < 3:
        def f(v):
            return jnp.interp(v, jnp.asarray(xs, jnp.float32),
                              jnp.asarray(ys, jnp.float32))
    else:
        from scipy.interpolate import CubicSpline

        cs = CubicSpline(xs, ys)
        grid = np.linspace(0.0, 1.0, 1024)
        lut = np.clip(cs(grid), 0.0, 1.0).astype(np.float32)

        def f(v):
            return jnp.interp(v, jnp.asarray(grid, jnp.float32),
                              jnp.asarray(lut))
    data = img.device()
    chans = []
    for ci in range(data.shape[0]):
        do = channels[ci] if ci < len(channels) else True
        chans.append(f(data[ci]) if do else data[ci])
    out = jnp.clip(jnp.stack(chans), 0.0, 1.0)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history("Curves transform")
    return res
