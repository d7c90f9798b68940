"""Curve transforms — equivalent of ``src/filters/curve_transform.c``:
cubic-spline or linear tone curves applied per channel.

The curve is defined by control points in [0,1]²; application is one
vectorized interpolation over the image (device-friendly: a dense LUT is
evaluated once and applied with jnp.interp-style gather).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage

CURVE_LINEAR = 0
CURVE_CUBIC = 1


def _natural_cubic_lut(xs: np.ndarray, ys: np.ndarray,
                       n: int = 4096) -> np.ndarray:
    """Natural cubic spline through the control points → dense LUT."""
    k = xs.size
    if k == 2:
        t = np.linspace(0.0, 1.0, n)
        return np.interp(t, xs, ys)
    h = np.diff(xs)
    # solve for second derivatives (natural boundary)
    A = np.zeros((k, k))
    b = np.zeros(k)
    A[0, 0] = A[-1, -1] = 1.0
    for i in range(1, k - 1):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2.0 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        b[i] = 3.0 * ((ys[i + 1] - ys[i]) / h[i]
                      - (ys[i] - ys[i - 1]) / h[i - 1])
    c = np.linalg.solve(A, b)
    bb = (np.diff(ys) / h) - h * (2.0 * c[:-1] + c[1:]) / 3.0
    dd = np.diff(c) / (3.0 * h)
    t = np.linspace(0.0, 1.0, n)
    seg = np.clip(np.searchsorted(xs, t, side="right") - 1, 0, k - 2)
    dt = t - xs[seg]
    lut = ys[seg] + bb[seg] * dt + c[seg] * dt ** 2 + dd[seg] * dt ** 3
    return np.clip(lut, 0.0, 1.0)


def build_curve_lut(points: Sequence[Tuple[float, float]],
                    algo: int = CURVE_CUBIC, n: int = 4096) -> np.ndarray:
    pts = sorted((float(x), float(y)) for x, y in points)
    if pts[0][0] > 0.0:
        pts.insert(0, (0.0, pts[0][1]))
    if pts[-1][0] < 1.0:
        pts.append((1.0, pts[-1][1]))
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    if algo == CURVE_LINEAR or xs.size < 3:
        t = np.linspace(0.0, 1.0, n)
        return np.interp(t, xs, ys).astype(np.float32)
    return _natural_cubic_lut(xs, ys, n).astype(np.float32)


def apply_curve(img: SirilImage, points: Sequence[Tuple[float, float]],
                algo: int = CURVE_CUBIC,
                channels: Sequence[int] = None) -> SirilImage:
    """Apply the tone curve to the selected channels (all by default)."""
    import jax.numpy as jnp

    lut = jnp.asarray(build_curve_lut(points, algo))
    n = lut.shape[0]
    d = img.device()
    idx = jnp.clip((d * (n - 1)).astype(jnp.int32), 0, n - 1)
    mapped = lut[idx]
    if channels is not None:
        keep = jnp.zeros(img.nchans, bool).at[jnp.asarray(
            list(channels))].set(True)
        mapped = jnp.where(keep[:, None, None], mapped, d)
    out = img.copy(data=np.asarray(img.apply_mask_blend(mapped)))
    out.log_history(f"Curve transform ({len(points)} points)")
    return out
