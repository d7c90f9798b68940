"""Stacking normalization — equivalent of ``src/stacking/normalization.c``.

Per frame and per layer, compute location/scale estimators (IKSSlite via
STATS_NORM, or median/1.5·mad via STATS_LITENORM — normalization.c:98-142),
then convert to offset/scale/mul coefficients relative to the reference
frame (compute_factors_from_estimators, normalization.c:146-183):

  ADDITIVE_SCALING:  scale_i = scale_ref / scale_i ;
                     offset_i = scale_i·loc_i − loc_ref
  ADDITIVE:          offset_i = loc_i − loc_ref          (scale = 1)
  MULTIPLICATIVE[_SCALING]: mul_i = loc_ref / loc_i

Applied per pixel in the stack kernel (median_and_mean.c:1655-1689):
  additive:        v' = v·scale − offset   (zeros stay zero)
  multiplicative:  v' = v·scale·mul

The heavy part — per-frame robust estimators over megapixel frames — runs
on device, batched over frames (ops/statistics.norm_estimators_jax).
Stats are cached in the sequence's columnar store (.seq M cards).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from siril_tpu.core.sequence import Sequence
from siril_tpu.ops.statistics import (
    STATS_LITENORM,
    STATS_NORM,
    compute_stats_np,
    norm_estimators_jax,
)

# normalization modes (settings.h:34-40)
NO_NORM = 0
ADDITIVE = 1
MULTIPLICATIVE = 2
ADDITIVE_SCALING = 3
MULTIPLICATIVE_SCALING = 4

NORM_NAMES = {
    "no": NO_NORM, "none": NO_NORM,
    "add": ADDITIVE, "additive": ADDITIVE,
    "mul": MULTIPLICATIVE, "multiplicative": MULTIPLICATIVE,
    "addscale": ADDITIVE_SCALING,
    "mulscale": MULTIPLICATIVE_SCALING,
}


@dataclass
class NormCoeffs:
    """(L, N) coefficient arrays (norm_coeff, stacking.h)."""

    offset: np.ndarray
    mul: np.ndarray
    scale: np.ndarray


def compute_normalization(seq: Sequence, indices: np.ndarray, mode: int,
                          lite: bool = False, force: bool = False,
                          frame_batch: int = 8,
                          equalize_rgb: bool = False,
                          reglayer: int = -1) -> NormCoeffs:
    """do_normalization (normalization.c:46-80) for the selected frames.

    ``indices``: absolute frame indices to stack (filtered order).
    Estimators are read from the sequence stats cache when present,
    otherwise computed on device in frame batches and cached.
    """
    n = len(indices)
    L = seq.nb_layers
    offset = np.zeros((L, n))
    mul = np.ones((L, n))
    scale = np.ones((L, n))
    if mode == NO_NORM:
        return NormCoeffs(offset, mul, scale)

    loc = np.zeros((L, n))
    sca = np.ones((L, n))
    need = []
    for k, idx in enumerate(indices):
        for layer in range(L):
            st = None if force else seq.get_frame_stats(layer, int(idx))
            ok = st is not None and (
                (lite and st.median and st.mad) or
                (not lite and st.location and st.scale))
            if ok:
                if lite:
                    loc[layer, k] = st.median
                    sca[layer, k] = 1.5 * st.mad
                else:
                    loc[layer, k] = st.location
                    sca[layer, k] = st.scale
            else:
                need.append((k, int(idx), layer))

    if need:
        _compute_missing(seq, need, loc, sca, lite, frame_batch)
        # persist stats to the .seq sidecar like the reference
        # (do_normalization → writeseqfile, normalization.c:74-75)
        try:
            seq.save()
        except Exception:
            pass

    # factors vs reference (compute_factors_from_estimators)
    ref_idx = seq.get_reference()
    try:
        ref_pos = int(np.nonzero(indices == ref_idx)[0][0])
    except IndexError:
        ref_pos = 0
    offset, scale, mul = factors_from_estimators(
        loc, sca, mode, ref_pos, equalize_rgb=equalize_rgb,
        reglayer=reglayer)
    return NormCoeffs(offset, mul, scale)


def factors_from_estimators(loc: np.ndarray, sca: np.ndarray, mode: int,
                            ref_pos: int, equalize_rgb: bool = False,
                            reglayer: int = -1):
    """compute_factors_from_estimators (normalization.c:146): per-frame
    (offset, scale, mul) from (L, n) location/scale estimator arrays.
    The ONLY implementation of the factor rules — the sharded survey
    path reuses it so the two paths cannot drift."""
    L, n = loc.shape
    offset = np.zeros((L, n))
    scale = np.ones((L, n))
    mul = np.ones((L, n))
    rl = reglayer if reglayer > -1 else 1
    for layer in range(L):
        reflayer = (rl if equalize_rgb else layer)
        reflayer = min(reflayer, L - 1)
        loc0 = loc[reflayer, ref_pos]
        sca0 = sca[reflayer, ref_pos]
        if mode in (ADDITIVE_SCALING, MULTIPLICATIVE_SCALING):
            s = sca[layer]
            scale[layer] = np.where(s == 0, 1.0,
                                    sca0 / np.where(s == 0, 1.0, s))
        if mode in (ADDITIVE, ADDITIVE_SCALING):
            offset[layer] = scale[layer] * loc[layer] - loc0
        elif mode in (MULTIPLICATIVE, MULTIPLICATIVE_SCALING):
            lv = loc[layer]
            mul[layer] = np.where(lv == 0, 1.0,
                                  loc0 / np.where(lv == 0, 1.0, lv))
    return offset, scale, mul


def _compute_missing(seq, need, loc, sca, lite, frame_batch):
    """Device-batched estimator computation for (pos, frame, layer) tuples.
    Frame reads overlap with device compute via a small thread pool."""
    import concurrent.futures as cf

    import jax.numpy as jnp

    by_frame = {}
    for k, idx, layer in need:
        by_frame.setdefault((k, idx), []).append(layer)
    items = sorted(by_frame.items())
    pool = cf.ThreadPoolExecutor(max_workers=4)

    def read_chunk(start):
        chunk = items[start:start + frame_batch]
        return list(pool.map(lambda it: seq.read_frame(it[0][1]).host(), chunk))

    from siril_tpu.utils.devfetch import DeviceCollector

    nxt = pool.submit(read_chunk, 0) if items else None
    col = DeviceCollector()          # one fetch at the end, not 4/chunk
    meta = []                        # (layer, k, idx) per collected row
    for start in range(0, len(items), frame_batch):
        chunk = items[start:start + frame_batch]
        frames = nxt.result()
        if start + frame_batch < len(items):
            nxt = pool.submit(read_chunk, start + frame_batch)
        # one device call per layer-set; frames share shape per sequence
        for layer in range(seq.nb_layers):
            rows = [(ci, f) for ci, ((k, idx), layers) in enumerate(chunk)
                    for f in [frames[ci]] if layer in layers]
            if not rows:
                continue
            batch = np.stack([f[layer].reshape(-1) for _, f in rows])
            est = norm_estimators_jax(jnp.asarray(batch), lite=lite)
            col.append(jnp.stack([est["location"], est["scale"],
                                  est["median"], est["mad"]], axis=-1))
            meta.extend((layer, chunk[ci][0][0], chunk[ci][0][1])
                        for ci, _ in rows)
    pool.shutdown(wait=False)
    vals = col.concat()              # (rows, 4)
    for r, (layer, k, idx) in enumerate(meta):
        location, scale_v, med, mad = (float(v) for v in vals[r])
        loc[layer, k] = location
        sca[layer, k] = scale_v
        _cache(seq, layer, idx, med, mad, location, scale_v, lite)


def _cache(seq, layer, idx, med, mad, location, scale, lite):
    from siril_tpu.ops.statistics import ImStats

    st = seq.get_frame_stats(layer, idx) or ImStats()
    st.median = float(med)
    st.mad = float(mad)
    if not lite:
        st.location = float(location)
        st.scale = float(scale)
    st.total = st.total or seq.rx * seq.ry
    st.ngoodpix = st.ngoodpix or st.total
    seq.set_frame_stats(layer, idx, st)


# ---------------------------------------------------------------------------
# overlap normalization (mosaics) — normalization.c:296-925
# ---------------------------------------------------------------------------


def compute_overlap(seq: Sequence, layer: int, i: int, j: int):
    """Overlap rectangles of frames i and j from their shift-only H
    (compute_overlap, normalization.c:420): intersect the two frames'
    footprints in reference space, then convert back to each frame's
    pixel coordinates.  Returns ((xi,yi,w,h), (xj,yj,w,h)) or None."""
    H = seq.reg(layer).H
    txi, tyi = round(float(H[i][0, 2])), round(float(H[i][1, 2]))
    txj, tyj = round(float(H[j][0, 2])), round(float(H[j][1, 2]))
    if seq.is_variable and seq.imgsize is not None:
        rxi, ryi = int(seq.imgsize[i][0]), int(seq.imgsize[i][1])
        rxj, ryj = int(seq.imgsize[j][0]), int(seq.imgsize[j][1])
    else:
        rxi = rxj = seq.rx
        ryi = ryj = seq.ry
    x0 = max(txi, txj)
    y0 = max(tyi, tyj)
    x1 = min(txi + rxi, txj + rxj)
    y1 = min(tyi + ryi, tyj + ryj)
    if x0 >= x1 or y0 >= y1:
        return None
    w, h = x1 - x0, y1 - y0
    return (x0 - txi, y0 - tyi, w, h), (x0 - txj, y0 - tyj, w, h)


def _pair_estimators(di: np.ndarray, dj: np.ndarray, lite: bool):
    """Location/scale of each frame's pixels over the common overlap,
    excluding pixels that are zero in either frame
    (_compute_estimators_for_images, normalization.c:458-600)."""
    from siril_tpu.ops.statistics import ikss_lite_np

    m = (di != 0) & (dj != 0)
    n = int(m.sum())
    if n == 0:
        return 0, (0.0, 1.0), (0.0, 1.0)
    vi = di[m].astype(np.float64)
    vj = dj[m].astype(np.float64)
    out = []
    for v in (vi, vj):
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        if lite:
            out.append((med, 1.5 * mad if mad > 0 else 1.0))
        else:
            ls = ikss_lite_np(v, med, mad) if mad > 0 else None
            if ls is None:
                out.append((med, 1.5 * mad if mad > 0 else 1.0))
            else:
                out.append((float(ls[0]),
                            float(ls[1]) if ls[1] > 0 else 1.0))
    return n, out[0], out[1]


def solve_overlap_coeffs(nb: int, ref: int, Nij: np.ndarray,
                         Mij: np.ndarray, additive: bool) -> np.ndarray:
    """Weighted LSQ solve for per-frame offsets (additive) or scale
    ratios (multiplicative) from pairwise overlap estimators
    (solve_overlap_coeffs, normalization.c:296-355).  Returns the
    full-length coefficient vector with the reference entry = identity."""
    index = [i for i in range(nb) if i != ref]
    N = nb - 1
    A = np.zeros((N, N))
    B = np.zeros(N)
    for a, ii in enumerate(index):
        if additive:
            B[a] = Nij[ii, ref] * (Mij[ref, ii] - Mij[ii, ref])
        else:
            B[a] = Nij[ii, ref] * Mij[ref, ii] * Mij[ii, ref]
        for b, ij in enumerate(index):
            if ii == ij:
                for k in range(nb):
                    if k != ii:
                        A[a, b] += (Nij[ii, k] if additive
                                    else Nij[ii, k] * Mij[ii, k] ** 2)
            else:
                A[a, b] = (-float(Nij[ii, ij]) if additive
                           else -Nij[ii, ij] * Mij[ii, ij] * Mij[ij, ii])
                if additive:
                    B[a] += Nij[ii, ij] * (Mij[ij, ii] - Mij[ii, ij])
    x = np.linalg.solve(A, B)
    full = np.zeros(nb) if additive else np.ones(nb)
    for a, ii in enumerate(index):
        full[ii] = x[a]
    return full


def compute_overlap_normalization(seq: Sequence, indices: np.ndarray,
                                  mode: int, lite: bool = False,
                                  reglayer: int = 0) -> NormCoeffs:
    """Overlap-driven normalization for mosaics
    (compute_normalization_overlaps, normalization.c:680-925): pairwise
    overlap location/scale estimators + global least-squares solve so
    every frame agrees with its neighbours, anchored at the reference."""
    idx = [int(v) for v in indices]
    nb = len(idx)
    L = seq.nb_layers
    offset = np.zeros((L, nb))
    mul = np.ones((L, nb))
    scale = np.ones((L, nb))
    if mode == NO_NORM or nb < 2:
        return NormCoeffs(offset, mul, scale)
    ref_abs = seq.get_reference()
    try:
        ref = idx.index(ref_abs)
    except ValueError:
        ref = 0
    layer = min(max(reglayer, 0), L - 1)

    # cache frames (mosaics are capped well below deep-sky stack sizes —
    # the reference warns above 30 frames, stacking.h:9)
    frames = {k: seq.read_frame(k).host() for k in idx}
    Nij = np.zeros((L, nb, nb))
    Mij = np.zeros((L, nb, nb))
    Sij = np.ones((L, nb, nb))
    for a in range(nb):
        for b in range(a + 1, nb):
            ov = compute_overlap(seq, layer, idx[a], idx[b])
            if ov is None:
                continue
            (xi, yi, w, h), (xj, yj, _, _) = ov
            for n in range(L):
                di = frames[idx[a]][n][yi:yi + h, xi:xi + w]
                dj = frames[idx[b]][n][yj:yj + h, xj:xj + w]
                cnt, (la, sa), (lb, sb) = _pair_estimators(di, dj, lite)
                Nij[n, a, b] = Nij[n, b, a] = cnt
                Mij[n, a, b] = la
                Mij[n, b, a] = lb
                Sij[n, a, b] = sa
                Sij[n, b, a] = sb

    for n in range(L):
        if mode in (MULTIPLICATIVE_SCALING, ADDITIVE_SCALING):
            sc = solve_overlap_coeffs(nb, ref, Nij[n], Sij[n],
                                      additive=False)
            scale[n] = sc
            # re-normalize locations by the scales found
            Mn = Mij[n] * sc[:, None]
        else:
            Mn = Mij[n]
        if mode in (ADDITIVE, ADDITIVE_SCALING):
            offset[n] = -solve_overlap_coeffs(nb, ref, Nij[n], Mn,
                                              additive=True)
        elif mode == MULTIPLICATIVE:
            mul[n] = solve_overlap_coeffs(nb, ref, Nij[n], Mn,
                                          additive=False)
    # stack kernel applies v' = v·scale − offset, and the solved additive
    # coefficients must be ADDED (reference: poffset = −coeffs,
    # normalization.c:894) — the sign flip above does exactly that.
    return NormCoeffs(offset, mul, scale)
