"""Satellite-trail (streak) detection.

Equivalent of the reference's ``src/algos/line_detection.c`` +
``src/opencv/tracks.cpp``: binarize the image at ``median + k·sigma`` and
run a Hough line transform, iterating with an exponentially decreasing
``k`` (``line_detection.c:26-30`` ksigma_f) until tracks of the requested
minimum length are found.

TPU-first formulation: the Hough accumulator is built as one vectorized
outer product ``rho = x·cosθ + y·sinθ`` over all candidate pixels and all
theta bins — a dense [P, T] computation that XLA maps onto the MXU — then
a per-theta histogram.  No per-pixel Python loops.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

# line_detection.c: KSIGMA_INITIAL_FACTOR * min_ksigma start, exp decay
KSIGMA_MINIMAL_VALUE = 1.3
KSIGMA_INITIAL_FACTOR = 8.0
MAX_KSIGMA_IDX = 10


@dataclass
class Track:
    start: Tuple[float, float]
    end: Tuple[float, float]
    angle_deg: float
    length: float
    votes: int


@dataclass
class StreakConf:
    initial_length: int = 0          # 0 → 500 (line_detection.c:46)
    min_allowed_length: int = 0      # 0 → max(25, 0.5% of width)
    min_allowed_ksigma: float = 0.0  # 0 → KSIGMA_MINIMAL_VALUE
    theta_bins: int = 360
    max_points: int = 200_000


def _ksigma_f(x: int, initial: float, minimal: float) -> float:
    """Exponential ksigma decay schedule (line_detection.c:25-30)."""
    if x >= MAX_KSIGMA_IDX:
        return minimal
    return minimal + (initial - minimal) * math.exp(-0.50 * x)


def _hough_lines(ys: np.ndarray, xs: np.ndarray, shape, min_votes: int,
                 theta_bins: int) -> List[Tuple[float, float, int]]:
    """Dense Hough vote: returns (rho, theta, votes) peaks."""
    h, w = shape
    diag = int(math.ceil(math.hypot(h, w)))
    thetas = np.linspace(0.0, math.pi, theta_bins, endpoint=False)
    cos_t = np.cos(thetas).astype(np.float32)
    sin_t = np.sin(thetas).astype(np.float32)
    # [P, T] rho values, offset to non-negative bins
    rho = xs[:, None] * cos_t[None, :] + ys[:, None] * sin_t[None, :]
    rho_idx = np.round(rho).astype(np.int32) + diag
    acc = np.zeros((2 * diag + 1, theta_bins), np.int32)
    t_idx = np.broadcast_to(np.arange(theta_bins, dtype=np.int32),
                            rho_idx.shape)
    np.add.at(acc, (rho_idx.ravel(), t_idx.ravel()), 1)
    peaks = []
    flat = acc.ravel()
    order = np.argsort(flat)[::-1]
    taken = []
    for k in order[:256]:
        v = int(flat[k])
        if v < min_votes:
            break
        r_i, t_i = divmod(int(k), theta_bins)
        # suppress near-duplicate lines (Δrho < 10 px, Δtheta < 3°)
        dup = False
        for (pr, pt) in taken:
            dt = min(abs(t_i - pt), theta_bins - abs(t_i - pt))
            if abs(r_i - pr) < 10 and dt < theta_bins * 3 // 180 + 1:
                dup = True
                break
        if dup:
            continue
        taken.append((r_i, t_i))
        peaks.append((float(r_i - diag), float(thetas[t_i]), v))
    return peaks


def _line_endpoints(ys, xs, rho, theta, tol=3.0):
    """Project inlier pixels onto the line to recover segment endpoints."""
    c, s = math.cos(theta), math.sin(theta)
    d = xs * c + ys * s - rho
    m = np.abs(d) < tol
    if not m.any():
        return None
    # position along the line direction (-sinθ, cosθ)
    t = -xs[m] * s + ys[m] * c
    i0, i1 = int(np.argmin(t)), int(np.argmax(t))
    xm, ym = xs[m], ys[m]
    p0 = (float(xm[i0]), float(ym[i0]))
    p1 = (float(xm[i1]), float(ym[i1]))
    length = math.hypot(p1[0] - p0[0], p1[1] - p0[1])
    return p0, p1, length


def detect_streaks(data: np.ndarray, conf: StreakConf = None,
                   layer: int = 0) -> List[Track]:
    """Find linear tracks in one layer.  ``data`` is [C,H,W] or [H,W] f32.

    Mirrors detect_streaks (line_detection.c:33): iterate ksigma from
    8×min down to min with the exponential schedule; first threshold that
    yields Hough peaks ≥ min_length wins.
    """
    conf = conf or StreakConf()
    img = data[layer] if data.ndim == 3 else data
    h, w = img.shape
    med = float(np.median(img))
    noise = 1.4826 * float(np.median(np.abs(img - med))) or 1e-6
    min_len = conf.initial_length or 500
    min_len = min(min_len, int(0.9 * min(h, w)))
    min_allowed_len = conf.min_allowed_length or max(25, round(w * 0.005))
    min_ks = conf.min_allowed_ksigma or KSIGMA_MINIMAL_VALUE
    initial_ks = KSIGMA_INITIAL_FACTOR * min_ks

    length = min_len
    while length >= min_allowed_len:
        for ks_idx in range(MAX_KSIGMA_IDX + 1):
            ks = _ksigma_f(ks_idx, initial_ks, min_ks)
            thr = med + ks * noise
            ys, xs = np.nonzero(img > thr)
            if ys.size == 0 or ys.size > conf.max_points:
                continue
            ys = ys.astype(np.float32)
            xs = xs.astype(np.float32)
            # votes threshold ~ half the requested length in pixels
            peaks = _hough_lines(ys, xs, (h, w), max(20, length // 2),
                                 conf.theta_bins)
            tracks = []
            for rho, theta, votes in peaks:
                ep = _line_endpoints(ys, xs, rho, theta)
                if ep is None:
                    continue
                p0, p1, ln = ep
                if ln < length:
                    continue
                # fill factor: a real trail lights up most of its extent;
                # chance alignments of noise pixels are sparse
                # (confirm_streaks equivalent, line_detection.c)
                if votes < 0.35 * ln:
                    continue
                ang = math.degrees(math.atan2(p1[1] - p0[1],
                                              p1[0] - p0[0]))
                tracks.append(Track(p0, p1, ang, ln, votes))
            if tracks:
                return tracks
        length //= 2
    return []
