"""Image statistics — TPU-native equivalent of ``src/algos/statistics*.c``.

Semantics replicated from the reference (cited per function):
- stats operate on the *non-zero, non-NaN* pixels of a layer
  (``statistics_float.c:233`` reassign_to_non_null_data_float)
- ``sigma`` is the sample standard deviation, N-1 denominator
  (``statistics.h:82-106`` siril_stats_float_sd)
- ``mad`` = median(|x - median|)  (``statistics_float.c:80``)
- ``sqrtbwmv`` = sqrt(biweight midvariance)  (``statistics_float.c:103``)
- IKSSlite location/scale for normalization (``statistics_float.c:199``):
  clip to median±6·mad, then location = median, scale = 0.991·sqrt(bwmv)
- ``bgnoise``: k-sigma-clipped sigma of row-wise 1st-order differences /
  sqrt(2), median over rows (``quantize.c`` FnNoise1, SIGMA_CLIP=5, NITER=3)
- ``avgdev`` = mean(|x - median|)  (gsl absdev_m, ``statistics.c:377``)

Two backends:
- numpy (exact reference semantics; used for parity tests, small images,
  and host-side sequence metadata)
- jax (device; batched over frames — the normalization path for stacking
  computes per-frame estimators for hundreds of frames in one jit)

The reference's histogram/percentile median approximations
(``sorting.c:577,644``) are replaced by exact medians — identical within
float32 tolerance, and sorts are fast on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

# stats option bitmask (statistics.h:25-37)
STATS_SIGMEAN = 1 << 1
STATS_BASIC = 1 << 2
STATS_MAD = 1 << 3
STATS_AVGDEV = 1 << 4
STATS_BWMV = 1 << 5
STATS_IKSS = 1 << 6
STATS_MAIN = STATS_BASIC | STATS_AVGDEV | STATS_MAD | STATS_BWMV
STATS_EXTRA = STATS_MAIN | STATS_IKSS
STATS_NORM = STATS_BASIC | STATS_MAD | STATS_IKSS
STATS_LITENORM = STATS_BASIC | STATS_MAD


@dataclass
class ImStats:
    """Per-layer image statistics (imstats, siril.h:407-413)."""

    total: float = 0
    ngoodpix: float = 0
    mean: float = 0.0
    median: float = 0.0
    sigma: float = 0.0
    avgdev: float = 0.0
    mad: float = 0.0
    sqrtbwmv: float = 0.0
    location: float = 0.0
    scale: float = 0.0
    min: float = 0.0
    max: float = 0.0
    normvalue: float = 1.0
    bgnoise: float = 0.0


# ---------------------------------------------------------------------------
# numpy backend (reference-exact semantics)
# ---------------------------------------------------------------------------


def sd_np(x: np.ndarray) -> float:
    """Sample std, N-1 denominator, f64 accumulation (statistics.h:82).

    sum(dtype=f64) casts each element exactly and accumulates pairwise
    in f64 — same value as an astype(f64) copy, without materializing
    128 MB per 16 Mpix layer (that copy cost ~11 s on a 1-core host).
    einsum squares in f64 on the fly for the variance pass."""
    n = x.size
    if n < 2:
        return 0.0
    mean = np.float32(x.sum(dtype=np.float64) / n)
    d = x - mean
    vsum = np.einsum("i,i->", d, d, dtype=np.float64)
    return float(np.sqrt(np.float32(vsum / (n - 1))))


def median_np(x: np.ndarray) -> float:
    return float(np.median(x)) if x.size else 0.0


def mad_np(x: np.ndarray, med: Optional[float] = None) -> float:
    """MAD = median(|x - med|) (statistics_float.c:80)."""
    if x.size == 0:
        return 0.0
    m = np.float32(median_np(x) if med is None else med)
    return float(np.median(np.abs(x - m)))


def bwmv_np(x: np.ndarray, mad: float, med: float) -> float:
    """Biweight midvariance (statistics_float.c:103-127)."""
    if mad <= 0.0 or x.size == 0:
        return 0.0
    factor = np.float32(1.0 / (9.0 * mad))
    i_med = x - np.float32(med)
    yi = i_med * factor
    yi2 = np.where(np.abs(yi) < 1.0, yi * yi, np.float32(1.0))
    up = ((i_med * (1.0 - yi2) ** 2) ** 2).sum(dtype=np.float64)
    down = ((1.0 - yi2) * (1.0 - 5.0 * yi2)).sum(dtype=np.float64)
    return float(x.size * (up / (down * down))) if down else 0.0


def ikss_lite_np(x: np.ndarray, med: float, mad: float):
    """IKSSlite location/scale (statistics_float.c:199-230).

    Returns (location, scale) or None if degenerate.
    """
    xlow = med - 6.0 * mad
    xhigh = med + 6.0 * mad
    kept = x[(x >= xlow) & (x <= xhigh)]
    if kept.size == 0:
        return None
    loc = median_np(kept)
    m2 = mad_np(kept, loc)
    if m2 == 0.0:
        return None
    scale = float(np.sqrt(bwmv_np(kept, m2, loc)) * 0.991)
    return loc, scale


def _bgnoise_dense(layer2d: np.ndarray, SIGMA_CLIP: float,
                   NITER: int) -> float:
    """Vectorized FnNoise1 for the no-invalid-pixels case: all rows are
    processed as one (ny, nx-1) masked array instead of a Python row
    loop (the loop costs ~16 s at 16 Mpix on a 1-core host).  Squares
    accumulate in f64 over f32 differences — within f32 rounding of the
    per-row reference formulation."""
    d = (layer2d[:, :-1] - layer2d[:, 1:]).astype(np.float32)
    ny, m = d.shape
    keep = np.ones_like(d, bool)
    cnt = np.full(ny, m, np.int64)
    mean = d.sum(axis=1, dtype=np.float64) / m
    dev = d - mean[:, None].astype(np.float32)
    vsum = (dev * dev).sum(axis=1, dtype=np.float64)
    stdev = np.sqrt(vsum / np.maximum(cnt - 1, 1))
    frozen = np.zeros(ny, bool)          # rows done iterating
    for _ in range(NITER):
        active = ~frozen & (stdev > 0.0)
        if not active.any():
            break
        thr = (SIGMA_CLIP * stdev).astype(np.float32)  # f32: an f64
        # threshold would promote the whole 16M-elem comparison to f64
        nkeep = keep & (np.abs(d - mean[:, None].astype(np.float32))
                        < thr[:, None])
        changed = active & ((nkeep != keep).any(axis=1))
        frozen |= ~changed
        if not changed.any():
            break
        keep = np.where(changed[:, None], nkeep, keep)
        cnt = keep.sum(axis=1)
        small = changed & (cnt < 2)      # <2 survivors: keep last stdev
        frozen |= small
        upd = changed & ~small
        if upd.any():
            dk = np.where(keep, d, np.float32(0.0))
            nm = dk.sum(axis=1, dtype=np.float64) / np.maximum(cnt, 1)
            devk = np.where(keep, d - nm[:, None].astype(np.float32),
                            np.float32(0.0))
            nv = (devk * devk).sum(axis=1, dtype=np.float64)
            ns = np.sqrt(nv / np.maximum(cnt - 1, 1))
            mean = np.where(upd, nm, mean)
            stdev = np.where(upd, ns, stdev)
    return float(np.median(stdev / np.sqrt(2.0)))


def bgnoise_np(layer2d: np.ndarray) -> float:
    """FnNoise1 (quantize.c): per-row sigma-clipped std of 1st differences.

    noise = median over rows of stdev(clipped diffs)/sqrt(2).
    """
    SIGMA_CLIP, NITER = 5.0, 3
    ny, nx = layer2d.shape
    if nx < 3:
        return 0.0
    if not ((layer2d == 0.0) | np.isnan(layer2d)).any():
        return _bgnoise_dense(layer2d, SIGMA_CLIP, NITER)
    out = []
    for j in range(ny):
        row = layer2d[j]
        good = row[(row != 0.0) & ~np.isnan(row)]
        if good.size < 3:
            continue
        diffs = (good[:-1] - good[1:]).astype(np.float32)
        nvals = diffs.size
        if nvals < 2:
            continue
        d = diffs
        mean = float(d.astype(np.float64).mean())
        stdev = _diff_sigma(d, mean)
        if stdev > 0.0:
            for _ in range(NITER):
                keep = np.abs(d - np.float32(mean)) < SIGMA_CLIP * stdev
                if keep.all():
                    break
                d = d[keep]
                if d.size < 2:
                    break
                mean = float(d.astype(np.float64).mean())
                stdev = _diff_sigma(d, mean)
        out.append(stdev / np.sqrt(2.0))
    return float(np.median(out)) if out else 0.0


def _diff_sigma(d: np.ndarray, mean: float) -> float:
    n = d.size
    if n < 2:
        return 0.0
    v = ((d.astype(np.float64) - mean) ** 2).sum() / (n - 1)
    return float(np.sqrt(v))


def compute_stats_np(layer2d: np.ndarray, options: int = STATS_MAIN) -> ImStats:
    """Full imstats of one layer (2D float32 [0,1]), reference semantics."""
    st = ImStats()
    flat = layer2d.ravel()
    st.total = flat.size
    good = flat[(flat != 0.0) & ~np.isnan(flat)]
    st.ngoodpix = good.size
    st.normvalue = 1.0
    if good.size == 0:
        return st
    if options & (STATS_BASIC | STATS_SIGMEAN):
        st.mean = float(good.sum(dtype=np.float64) / good.size)
        st.sigma = sd_np(good)
        st.min = float(good.min())
        st.max = float(good.max())
        st.bgnoise = bgnoise_np(layer2d)
    if options & (STATS_BASIC | STATS_MAD | STATS_AVGDEV | STATS_BWMV | STATS_IKSS):
        st.median = median_np(good)
    if options & (STATS_MAD | STATS_BWMV | STATS_IKSS):
        st.mad = mad_np(good, st.median)
    if options & STATS_AVGDEV:
        st.avgdev = float(np.abs(good - np.float32(st.median)).sum(dtype=np.float64) / good.size)
    if options & (STATS_BWMV | STATS_IKSS):
        st.sqrtbwmv = float(np.sqrt(bwmv_np(good, st.mad, st.median)))
    if options & STATS_IKSS:
        r = ikss_lite_np(good, st.median, st.mad)
        if r is not None:
            st.location, st.scale = r
    return st


def compute_stats_image(img, layer: Optional[int] = None,
                        options: int = STATS_MAIN):
    """Stats of a SirilImage: one layer or list over all layers."""
    data = img.host() if hasattr(img, "host") else np.asarray(img)
    if layer is not None:
        return compute_stats_np(data[layer], options)
    return [compute_stats_np(data[c], options) for c in range(data.shape[0])]


# ---------------------------------------------------------------------------
# jax backend — batched device estimators (the normalization hot path)
# ---------------------------------------------------------------------------


def _masked_quantile_sorted(sorted_x, ngood, q):
    """Quantile of the first `ngood` entries of an ascending sorted array
    where invalid entries were pushed to +inf.  Linear interpolation.
    Mask-reduce select (no dynamic gathers — they lower poorly on TPU)."""
    import jax
    import jax.numpy as jnp

    pos = q * (ngood.astype(jnp.float32) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, sorted_x.shape[-1] - 1)
    hi = jnp.clip(lo + 1, 0, sorted_x.shape[-1] - 1)
    frac = pos - lo.astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, sorted_x.shape,
                                    sorted_x.ndim - 1)
    vlo = jnp.where(cols == lo[..., None], sorted_x, 0.0).sum(axis=-1)
    vhi = jnp.where(cols == hi[..., None], sorted_x, 0.0).sum(axis=-1)
    vhi = jnp.where(ngood > lo + 1, vhi, vlo)
    return vlo + frac * (vhi - vlo)


def masked_median_jax(x, valid):
    """Median over the last axis of entries where `valid`; batched."""
    import jax.numpy as jnp

    big = jnp.float32(np.inf)
    xs = jnp.sort(jnp.where(valid, x, big), axis=-1)
    ngood = valid.sum(axis=-1)
    n = jnp.maximum(ngood, 1)
    # exact median: average middle two for even n
    m_hi = _masked_quantile_sorted(xs, n, 0.5)
    return m_hi


def norm_estimators_jax(frames, lite: bool = False):
    """Per-frame (median, mad, location, scale) on device, batched.

    ``frames``: (N, P) float32 — N frames, P pixels of one layer (flattened).
    Zeros are excluded like the reference.  Returns dict of (N,) arrays.
    With ``lite`` (STATS_LITENORM): location=median, scale=1.5*mad
    (normalization.c:118-127).
    """
    import jax.numpy as jnp

    valid = (frames != 0.0) & jnp.isfinite(frames)
    med = masked_median_jax(frames, valid)
    mad = masked_median_jax(jnp.abs(frames - med[:, None]), valid)
    if lite:
        return {"median": med, "mad": mad,
                "location": med, "scale": 1.5 * mad}
    # IKSSlite: clip to median ± 6 mad, recompute median/mad, bwmv scale
    lo = med - 6.0 * mad
    hi = med + 6.0 * mad
    valid2 = valid & (frames >= lo[:, None]) & (frames <= hi[:, None])
    loc = masked_median_jax(frames, valid2)
    mad2 = masked_median_jax(jnp.abs(frames - loc[:, None]), valid2)
    # biweight midvariance over valid2
    factor = 1.0 / (9.0 * jnp.maximum(mad2, 1e-30))
    i_med = jnp.where(valid2, frames - loc[:, None], 0.0)
    yi = i_med * factor[:, None]
    yi2 = jnp.where(jnp.abs(yi) < 1.0, yi * yi, 1.0)
    up_t = jnp.where(valid2, (i_med * (1.0 - yi2) ** 2) ** 2, 0.0)
    dn_t = jnp.where(valid2, (1.0 - yi2) * (1.0 - 5.0 * yi2), 0.0)
    up = up_t.sum(axis=-1)
    dn = dn_t.sum(axis=-1)
    n2 = valid2.sum(axis=-1).astype(jnp.float32)
    bwmv = jnp.where(dn != 0.0, n2 * up / (dn * dn), 0.0)
    scale = jnp.sqrt(bwmv) * 0.991
    return {"median": med, "mad": mad, "location": loc, "scale": scale}


# ---------------------------------------------------------------------------
# histogram medians (sorting.c:577,644 — the reference's large-n median)
# ---------------------------------------------------------------------------

_HIST_BINS = 65536


def hist_median_jax(x, valid, bins: int = _HIST_BINS):
    """Median over the last axis (the lower-median sample, the same
    order statistic as the reference's histogram median for large n,
    sorting.c:577,644) — exact to f32 for ANY value grid, u16 or
    continuous (drizzled/processed sequences).

    TPU-first formulation: value-space multiway bisection with a fused
    count-below reduce per step.  A scatter-add histogram serializes on
    TPU (~2 s/frame at 16 Mpix) and a full sort is no better.  The data
    pass is the cost (HBM streaming — the compare+count is fused into
    the reduce, nothing is materialized), so passes are minimized two
    ways: the interval splits 8-way per pass (7 count thresholds per
    data read: 11 passes reach the 2³² shrink 32 binary passes gave),
    and BOTH order-statistic ranks (lower/upper median) bisect inside
    the same passes, sharing every read.  Net: 11 reads of the array
    instead of 64 for the same exact result."""
    import jax.numpy as jnp
    from jax import lax

    n = valid.sum(axis=-1)
    big = jnp.float32(3.4e38)
    top = jnp.max(jnp.where(valid, x, -big), axis=-1)
    bot = jnp.min(jnp.where(valid, x, big), axis=-1) - jnp.float32(1e-7)
    t_lo = ((n + 1) // 2).astype(jnp.int32)[:, None]   # lower-median rank
    t_hi = (n // 2 + 1).astype(jnp.int32)[:, None]     # upper-median rank

    B = 8                                   # interval split per pass
    frac = jnp.arange(1, B, dtype=jnp.float32)[None, :] / B   # [1, B-1]

    def shrink(lo, hi, cnt, target):
        # mids ascending ⇒ counts nondecreasing; the first index with
        # cnt ≥ target bounds the value from above, its predecessor
        # from below (invariant: count(≤hi) ≥ target > count(≤lo))
        mids = lo[:, None] + frac * (hi - lo)[:, None]
        k = (cnt < target).sum(axis=-1)                       # [rows]
        lo_n = jnp.where(k > 0,
                         jnp.take_along_axis(
                             mids, jnp.maximum(k - 1, 0)[:, None],
                             axis=-1)[:, 0], lo)
        hi_n = jnp.where(k < B - 1,
                         jnp.take_along_axis(
                             mids, jnp.minimum(k, B - 2)[:, None],
                             axis=-1)[:, 0], hi)
        return lo_n, hi_n

    def body(_, state):
        lo1, hi1, lo2, hi2 = state
        m1 = lo1[:, None] + frac * (hi1 - lo1)[:, None]       # [rows, B-1]
        m2 = lo2[:, None] + frac * (hi2 - lo2)[:, None]
        # ONE data read: 2(B−1) fused compare+counts per element
        c1 = (valid[:, None, :] & (x[:, None, :] <= m1[:, :, None])
              ).sum(axis=-1).astype(jnp.int32)                # [rows, B-1]
        c2 = (valid[:, None, :] & (x[:, None, :] <= m2[:, :, None])
              ).sum(axis=-1).astype(jnp.int32)
        lo1, hi1 = shrink(lo1, hi1, c1, t_lo)
        lo2, hi2 = shrink(lo2, hi2, c2, t_hi)
        return lo1, hi1, lo2, hi2

    # 8^11 = 2^33 ≥ the 2^32 shrink of the binary version: hi lands on
    # the exact sample value wherever the binary formulation did
    # (B=16 was measured SLOWER on-chip: the 2× compare cost outweighs
    # the 11→8 pass saving — the medians sit near the VPU/HBM balance)
    _, v_lo, _, v_hi = lax.fori_loop(0, 11, body, (bot, top, bot, top))
    # average the middle pair for even n (masked_median_jax semantics);
    # rows with no valid samples (dead frames) report 0.0, not ±inf
    med = jnp.where(n % 2 == 0, 0.5 * (v_lo + v_hi), v_lo)
    return jnp.where(n > 0, med, 0.0)


def norm_estimators_hist_jax(frames, lite: bool = False):
    """norm_estimators_jax with histogram medians — the estimator pass of
    the HBM-resident / fused paths (u16 sources).  Same semantics:
    median, MAD, IKSSlite location/scale over nonzero pixels."""
    import jax.numpy as jnp

    valid = (frames != 0.0) & jnp.isfinite(frames)
    med = hist_median_jax(frames, valid)
    adev = jnp.abs(frames - med[:, None])
    mad = hist_median_jax(adev, valid)
    if lite:
        return {"median": med, "mad": mad,
                "location": med, "scale": 1.5 * mad}
    lo = med - 6.0 * mad
    hi = med + 6.0 * mad
    valid2 = valid & (frames >= lo[:, None]) & (frames <= hi[:, None])
    loc = hist_median_jax(frames, valid2)
    mad2 = hist_median_jax(jnp.abs(frames - loc[:, None]), valid2)
    factor = 1.0 / (9.0 * jnp.maximum(mad2, 1e-30))
    i_med = jnp.where(valid2, frames - loc[:, None], 0.0)
    yi = i_med * factor[:, None]
    yi2 = jnp.where(jnp.abs(yi) < 1.0, yi * yi, 1.0)
    up_t = jnp.where(valid2, (i_med * (1.0 - yi2) ** 2) ** 2, 0.0)
    dn_t = jnp.where(valid2, (1.0 - yi2) * (1.0 - 5.0 * yi2), 0.0)
    up = up_t.sum(axis=-1)
    dn = dn_t.sum(axis=-1)
    nvalid = valid2.sum(axis=-1)
    bwmv = jnp.where(dn != 0, nvalid * (up / jnp.where(dn == 0, 1.0, dn)
                                        ** 2), 0.0)
    scale = jnp.sqrt(bwmv) * 0.991
    return {"median": med, "mad": mad, "location": loc,
            "scale": jnp.where(scale > 0, scale, 1.5 * mad)}
