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
    rl = reglayer if reglayer > -1 else 1
    for layer in range(L):
        reflayer = (rl if equalize_rgb else layer)
        reflayer = min(reflayer, L - 1)
        loc0 = loc[reflayer, ref_pos]
        sca0 = sca[reflayer, ref_pos]
        if mode in (ADDITIVE_SCALING, MULTIPLICATIVE_SCALING):
            s = sca[layer]
            scale[layer] = np.where(s == 0, 1.0, sca0 / np.where(s == 0, 1.0, s))
        if mode in (ADDITIVE, ADDITIVE_SCALING):
            offset[layer] = scale[layer] * loc[layer] - loc0
        elif mode in (MULTIPLICATIVE, MULTIPLICATIVE_SCALING):
            lv = loc[layer]
            mul[layer] = np.where(lv == 0, 1.0, loc0 / np.where(lv == 0, 1.0, lv))
    return NormCoeffs(offset, mul, scale)


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

    nxt = pool.submit(read_chunk, 0) if items else None
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
            location = np.asarray(est["location"])
            scale_v = np.asarray(est["scale"])
            med = np.asarray(est["median"])
            mad = np.asarray(est["mad"])
            for r, (ci, _) in enumerate(rows):
                (k, idx) = chunk[ci][0]
                loc[layer, k] = location[r]
                sca[layer, k] = scale_v[r]
                _cache(seq, layer, idx, med[r], mad[r], location[r],
                       scale_v[r], lite)
    pool.shutdown(wait=False)


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
