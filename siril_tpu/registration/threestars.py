"""1/2/3-star registration — headless equivalent of the reference's
GUI-picked method (``src/registration/3stars.c``: user picks up to 3
stars on the reference frame, a seqpsf-style follow fits each star on
every frame, and a shift (1 star) or similarity (2–3 stars) transform is
stored in the regdata).

CLI surface: ``register seq -3stars -star1=x,y [-star2=x,y]
[-star3=x,y] [-boxsize=n]`` — the picked positions replace the GUI
selection.  Frames where a star fit fails are unselected (the
reference's follow behaves the same)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence as Seq, Tuple

import numpy as np

from siril_tpu.core.sequence import Sequence
from siril_tpu.registration.matching import (
    SHIFT_TRANSFORMATION, SIMILARITY_TRANSFORMATION, estimate_transform)
from siril_tpu.utils.log import log_error, log_message


def _fit_star_near(layer: np.ndarray, x0: float, y0: float,
                   box: int) -> Optional[Tuple[float, float]]:
    """Centroid + PSF refinement of the brightest peak in a box around
    (x0, y0); None when no credible star is there."""
    h, w = layer.shape
    half = box // 2
    xi, yi = int(round(x0)), int(round(y0))
    if not (half <= xi < w - half and half <= yi < h - half):
        return None
    win = layer[yi - half:yi + half + 1, xi - half:xi + half + 1]
    bg = float(np.median(win))
    peak = win.max()
    if peak - bg < 3.0 * (np.median(np.abs(win - bg)) * 1.4826 + 1e-6):
        return None
    py, px = np.unravel_index(int(win.argmax()), win.shape)
    # a peak on the box boundary is not a followed star (it drifted out)
    if (py < 2 or px < 2 or py > win.shape[0] - 3 or px > win.shape[1] - 3):
        return None
    # sub-pixel: flux-weighted centroid of the background-subtracted
    # 7×7 core around the peak (PSF.c minimisation seed)
    r = 3
    y1 = max(py - r, 0)
    y2 = min(py + r + 1, win.shape[0])
    x1 = max(px - r, 0)
    x2 = min(px + r + 1, win.shape[1])
    core = np.maximum(win[y1:y2, x1:x2] - bg, 0.0)
    tot = core.sum()
    if tot <= 0:
        return None
    yy, xx = np.mgrid[y1:y2, x1:x2]
    cx = float((core * xx).sum() / tot)
    cy = float((core * yy).sum() / tot)
    return (xi - half + cx, yi - half + cy)


@dataclass
class ThreeStarResult:
    registered: int
    failed: List[int]


def register_three_stars(seq: Sequence, stars: Seq[Tuple[float, float]],
                         layer: int = 0, box: int = 30) -> ThreeStarResult:
    """Follow up to 3 picked stars across the sequence and store
    shift/similarity matrices in the regdata (3stars.c semantics:
    1 star → translation, ≥2 → similarity)."""
    if not 1 <= len(stars) <= 3:
        raise ValueError("pick 1 to 3 stars")
    indices = seq.selected_indices()
    ref = seq.get_reference()
    ref_img = seq.read_frame(int(ref)).host()[layer]

    ref_pos = []
    for (x, y) in stars:
        p = _fit_star_near(ref_img, x, y, box)
        if p is None:
            raise ValueError(f"no star found near ({x:.0f},{y:.0f}) on the "
                             "reference frame")
        ref_pos.append(p)
    ref_pos = np.asarray(ref_pos)
    ttype = SHIFT_TRANSFORMATION if len(stars) == 1 \
        else SIMILARITY_TRANSFORMATION

    reg = seq.reg(layer)
    ok = 0
    failed: List[int] = []
    for idx in indices:
        idx = int(idx)
        if idx == ref:
            reg.H[idx] = np.eye(3)
            reg.valid[idx] = True
            ok += 1
            continue
        img = seq.read_frame(idx).host()[layer]
        pos = []
        lost = False
        for (rx, ry) in ref_pos:
            p = _fit_star_near(img, rx, ry, box)
            if p is None:
                lost = True
                break
            pos.append(p)
        if lost:
            log_error(f"3stars: frame {idx + 1}: star lost; unselecting")
            seq.incl[idx] = False
            failed.append(idx)
            continue
        h_mat = estimate_transform(np.asarray(pos), ref_pos, ttype)
        reg.H[idx] = h_mat
        reg.valid[idx] = True
        ok += 1
    log_message(f"3-star registration: {ok} frames registered "
                f"({len(failed)} lost)")
    try:
        seq.save()
    except Exception:
        pass
    return ThreeStarResult(registered=ok, failed=failed)
