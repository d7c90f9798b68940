"""Cosmetic correction — equivalent of ``src/filters/cosmetic_correction.c``.

Two modes, matching the reference:
- master-dark driven (``find_deviant_pixels``:203): thresholds are
  median ± sigₖ·sigma of the DARK; pixels ≥ hot threshold / ≤ cold
  threshold form a fixed defect list applied to every light.
  Replacement (``cosmeticCorrOnePoint``:285): cold → median of the 5×5
  neighborhood (radius 2), hot → mean of the 3×3 neighborhood; CFA-aware
  variants sample same-color neighbors at stride 2.
- auto mode (``autoDetect``, used by find_cosme on lights): a pixel is
  deviant if it deviates from its 5×5 neighborhood median by more than
  k·avgDev of the image (and more than the local dynamic).

TPU-native: the per-pixel scalar loops become one vectorized pass — the
5×5/3×3 CFA-strided neighborhoods are gathered with shifts (jnp.roll-free
padding slices) so the whole defect map is corrected in one fused kernel.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np


def detect_deviant_from_dark(dark_layer: np.ndarray, sig_cold: float,
                             sig_hot: float) -> Tuple[np.ndarray, np.ndarray]:
    """(cold_mask, hot_mask) from master-dark stats.  sig<0 disables."""
    from siril_tpu.ops.statistics import STATS_BASIC, compute_stats_np

    st = compute_stats_np(dark_layer, STATS_BASIC)
    if st.sigma <= 0.0:
        # degenerate (constant) master dark: nothing deviates
        z = np.zeros_like(dark_layer, bool)
        return z, z
    if sig_cold >= 0:
        thres_cold = max(st.median - sig_cold * st.sigma, 0.0)
        cold = dark_layer <= thres_cold
    else:
        cold = np.zeros_like(dark_layer, bool)
    if sig_hot >= 0:
        thres_hot = min(st.median + sig_hot * st.sigma, 1.0)
        hot = dark_layer >= thres_hot
    else:
        hot = np.zeros_like(dark_layer, bool)
    return cold, hot


def _neighbor_stack(x, offsets):
    """Stack shifted copies of (H,W) x for the given (dy,dx) offsets,
    edge-replicated (matches the reference's clamped neighborhood)."""
    import jax.numpy as jnp

    H, W = x.shape[-2], x.shape[-1]
    outs = []
    for dy, dx in offsets:
        pad_y = (max(dy, 0), max(-dy, 0))
        pad_x = (max(dx, 0), max(-dx, 0))
        p = jnp.pad(x, (pad_y, pad_x), mode="edge")
        outs.append(p[pad_y[1]:pad_y[1] + H, pad_x[1]:pad_x[1] + W])
    return jnp.stack(outs)


def _offsets(radius: int, cfa: bool, include_center: bool = False):
    step = 2 if cfa else 1
    r = radius * step
    offs = [(dy, dx) for dy in range(-r, r + 1, step)
            for dx in range(-r, r + 1, step)
            if include_center or (dy, dx) != (0, 0)]
    return offs


def correct_deviant(layer, cold_mask, hot_mask, is_cfa: bool = False):
    """Apply the replacement rules to one (H,W) layer on device."""
    import jax.numpy as jnp

    x = jnp.asarray(layer, jnp.float32)
    cold = jnp.asarray(cold_mask)
    hot = jnp.asarray(hot_mask)
    # cold → median of 5×5 (radius 2) incl. center (get_median_*: the
    # reference gathers the neighborhood *excluding* the pixel itself)
    n5 = _neighbor_stack(x, _offsets(2, is_cfa))
    med5 = jnp.median(n5, axis=0)
    # hot → average of 3×3 (excluding center)
    n3 = _neighbor_stack(x, _offsets(1, is_cfa))
    avg3 = jnp.mean(n3, axis=0)
    out = jnp.where(cold, med5, x)
    out = jnp.where(hot, avg3, out)
    return out


def auto_detect_and_correct(layer, sig_hot: float = 3.0,
                            sig_cold: Optional[float] = None,
                            is_cfa: bool = False):
    """find_hot/auto mode: deviation from 5×5 median vs k·avgDev."""
    import jax.numpy as jnp

    from siril_tpu.ops.statistics import STATS_AVGDEV, STATS_BASIC, compute_stats_np

    lay = np.asarray(layer, np.float32)
    st = compute_stats_np(lay, STATS_BASIC | STATS_AVGDEV)
    x = jnp.asarray(lay)
    n5 = _neighbor_stack(x, _offsets(2, is_cfa))
    med5 = jnp.median(n5, axis=0)
    dev = x - med5
    hot = dev > sig_hot * max(st.avgdev, 1e-7) if sig_hot is not None else \
        jnp.zeros_like(x, bool)
    cold = (-dev > sig_cold * max(st.avgdev, 1e-7)) if sig_cold is not None \
        else jnp.zeros_like(x, bool)
    out = correct_deviant(x, cold, hot, is_cfa)
    return out, np.asarray(cold), np.asarray(hot)


def apply_cosme_file(img, entries, is_cfa: bool = False):
    """`cosme` command: list-file driven point/line corrections.

    entries: list of ('P', x, y) point / ('L', y) line / ('C', x) column.
    """
    import jax.numpy as jnp

    data = img.device() if hasattr(img, "device") else jnp.asarray(img)
    C, H, W = data.shape
    cold = np.zeros((H, W), bool)
    hot = np.zeros((H, W), bool)
    lines = []
    cols = []
    for e in entries:
        kind = e[0].upper()
        if kind == "P":
            x, y = int(e[1]), int(e[2])
            if 0 <= x < W and 0 <= y < H:
                hot[y, x] = True
        elif kind == "L":
            lines.append(int(e[1]))
        elif kind == "C":
            cols.append(int(e[1]))
    out = []
    for c in range(C):
        lay = correct_deviant(data[c], cold, hot, is_cfa)
        lay = np.asarray(lay)
        for y in lines:
            if 0 <= y < H:
                lo = lay[max(y - 1, 0)]
                hi = lay[min(y + 1, H - 1)]
                lay[y] = 0.5 * (lo + hi)
        for x in cols:
            if 0 <= x < W:
                lo = lay[:, max(x - 1, 0)]
                hi = lay[:, min(x + 1, W - 1)]
                lay[:, x] = 0.5 * (lo + hi)
        out.append(lay)
    return np.stack(out)
