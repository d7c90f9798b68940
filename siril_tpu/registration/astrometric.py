"""Astrometric registration — homographies derived from per-frame WCS
plate solves (``src/registration/astrometric.c``
``compute_Hs_from_astrometry:239``), used for mosaics: after
``seqplatesolve``, every frame carries a WCS; the mapping frame→reference
is frame-pixels → sky (frame WCS) → reference-pixels (reference WCS),
fitted as a single 3×3 homography per frame.

TPU-first note: the per-frame fit is a tiny DLT least-squares over a
sampled pixel grid (host numpy); the expensive part — the actual warp —
goes through the existing batched warp kernels of ``seqapplyreg``.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from siril_tpu.core.sequence import SEQ_REGULAR, Sequence
from siril_tpu.utils.log import log_message, log_warning


def _frame_wcs(seq: Sequence, index: int):
    """Header-only WCS read for one frame (no pixel I/O)."""
    from siril_tpu.ops.wcs import WCS

    if seq.seq_type == SEQ_REGULAR:
        from siril_tpu.io.fits_io import scan_hdus

        path = seq.frame_path(index)
        if path is None:
            return None
        hdus = [h for h in scan_hdus(path) if len(h.naxes) >= 2]
        if not hdus:
            return None
        return WCS.from_header(hdus[0].header)
    img = seq.read_frame(index)
    return img.wcs


def fit_homography_from_wcs(wcs_i, wcs_ref, width: int, height: int,
                            grid: int = 8) -> Optional[np.ndarray]:
    """DLT least-squares homography H (frame i → reference) sampled on a
    pixel grid projected through both WCS solutions."""
    xs = np.linspace(0, width - 1, grid)
    ys = np.linspace(0, height - 1, grid)
    gx, gy = np.meshgrid(xs, ys)
    ra, dec = wcs_i.pix2world(gx.ravel(), gy.ravel())
    rx, ry = wcs_ref.world2pix(ra, dec)
    if not (np.all(np.isfinite(rx)) and np.all(np.isfinite(ry))):
        return None
    # DLT: for each point, two rows of the 8-unknown system (h33 = 1)
    x, y = gx.ravel(), gy.ravel()
    n = x.size
    A = np.zeros((2 * n, 8))
    b = np.zeros(2 * n)
    A[0::2, 0] = x
    A[0::2, 1] = y
    A[0::2, 2] = 1
    A[0::2, 6] = -x * rx
    A[0::2, 7] = -y * rx
    b[0::2] = rx
    A[1::2, 3] = x
    A[1::2, 4] = y
    A[1::2, 5] = 1
    A[1::2, 6] = -x * ry
    A[1::2, 7] = -y * ry
    b[1::2] = ry
    sol, *_ = np.linalg.lstsq(A, b, rcond=None)
    H = np.array([[sol[0], sol[1], sol[2]],
                  [sol[3], sol[4], sol[5]],
                  [sol[6], sol[7], 1.0]])
    return H


def register_astrometric(seq: Sequence, layer: int = 0,
                         grid: int = 8) -> int:
    """Fill the sequence's regdata H from per-frame WCS solves
    (compute_Hs_from_astrometry).  Returns the number of frames
    registered.  Reference frame: the sequence reference if solved, else
    the first solved frame."""
    n = seq.number
    wcss: List = [None] * n
    solved = []
    for i in range(n):
        if not seq.incl[i]:
            continue
        w = _frame_wcs(seq, i)
        wcss[i] = w
        if w is not None:
            solved.append(i)
    if len(solved) < 2:
        log_warning("astrometric registration needs ≥2 plate-solved "
                    "frames (run seqplatesolve first)")
        return 0
    ref = seq.get_reference()
    if ref not in solved:
        ref = solved[0]
        seq.reference_image = ref
    reg = seq.reg(layer)
    count = 0
    for i in solved:
        if seq.is_variable and seq.imgsize is not None:
            w_i, h_i = int(seq.imgsize[i][0]), int(seq.imgsize[i][1])
        else:
            w_i, h_i = seq.rx, seq.ry
        H = (np.eye(3) if i == ref else
             fit_homography_from_wcs(wcss[i], wcss[ref], w_i, h_i, grid))
        if H is None:
            log_warning(f"frame {i + 1}: degenerate WCS mapping, skipped")
            seq.incl[i] = False
            continue
        reg.H[i] = H
        reg.valid[i] = True
        count += 1
    seq.needs_saving = True
    log_message(f"Astrometric registration: {count} frames aligned from "
                f"their WCS solutions (reference: {ref + 1})")
    return count
