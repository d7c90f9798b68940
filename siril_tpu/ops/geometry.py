"""Geometry operations — equivalent of ``src/algos/geometry.c`` (1,737 LoC):
crop, rotate (90° fast paths + arbitrary), mirror, binning, resample.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.ops.interp import INTERP_BILINEAR, INTERP_LANCZOS4, resize as _resize, warp_homography


def crop(img: SirilImage, x: int, y: int, w: int, h: int) -> SirilImage:
    """Crop to rectangle (x, y, w, h) in top-down coords (geometry.c crop)."""
    data = img.host()
    C, H, W = data.shape
    x = max(0, min(x, W - 1))
    y = max(0, min(y, H - 1))
    w = max(1, min(w, W - x))
    h = max(1, min(h, H - y))
    out = img.copy(data=np.ascontiguousarray(data[:, y:y + h, x:x + w]))
    if out.wcs is not None:
        out.wcs = out.wcs.shifted(-x, -y) if hasattr(out.wcs, "shifted") else None
    out.log_history(f"Crop (x={x}, y={y}, w={w}, h={h})")
    return out


def mirrorx(img: SirilImage) -> SirilImage:
    out = img.copy(data=np.ascontiguousarray(img.host()[:, ::-1, :]))
    out.log_history("Mirror X")
    return out


def mirrory(img: SirilImage) -> SirilImage:
    out = img.copy(data=np.ascontiguousarray(img.host()[:, :, ::-1]))
    out.log_history("Mirror Y")
    return out


def rotate(img: SirilImage, angle_deg: float,
           method: int = INTERP_LANCZOS4, crop_to_fit: bool = False,
           clamp: bool = True) -> SirilImage:
    """Rotation; multiples of 90° use exact transposes (cvRotateImage),
    arbitrary angles warp about the image center."""
    a = angle_deg % 360.0
    data = img.host()
    if a == 0.0:
        return img.copy()
    if a in (90.0, 180.0, 270.0):
        if a == 180.0:
            out_d = data[:, ::-1, ::-1]
        elif a == 90.0:
            out_d = np.rot90(data, k=1, axes=(1, 2))
        else:
            out_d = np.rot90(data, k=3, axes=(1, 2))
        out = img.copy(data=np.ascontiguousarray(out_d))
        out.log_history(f"Rotation ({a:.1f} deg)")
        return out
    C, H, W = data.shape
    th = math.radians(a)
    c, s = math.cos(th), math.sin(th)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    if crop_to_fit:
        out_w, out_h = W, H
        ocx, ocy = cx, cy
    else:
        out_w = int(round(abs(W * c) + abs(H * s)))
        out_h = int(round(abs(W * s) + abs(H * c)))
        ocx, ocy = (out_w - 1) / 2.0, (out_h - 1) / 2.0
    # H maps source → target: translate(-c) · rot · translate(+oc)
    T1 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]])
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    T2 = np.array([[1, 0, ocx], [0, 1, ocy], [0, 0, 1]])
    Hm = T2 @ R @ T1
    warped = warp_homography(data, Hm, (out_h, out_w), method, clamp)
    out = img.copy(data=warped)
    out.log_history(f"Rotation ({angle_deg:.2f} deg)")
    return out


def binxy(img: SirilImage, factor: int, mean: bool = True) -> SirilImage:
    """Binning ×factor, sum or mean (geometry.c binxy)."""
    data = img.host()
    C, H, W = data.shape
    h2, w2 = H // factor, W // factor
    q = data[:, : h2 * factor, : w2 * factor]
    q = q.reshape(C, h2, factor, w2, factor)
    binned = q.mean(axis=(2, 4)) if mean else q.sum(axis=(2, 4))
    if not mean:
        binned = np.clip(binned, 0.0, 1.0)
    out = img.copy(data=binned.astype(np.float32))
    kw = out.keywords
    kw.binning_x *= factor
    kw.binning_y *= factor
    out.log_history(f"Binning {factor}x{factor} ({'mean' if mean else 'sum'})")
    return out


def resample(img: SirilImage, to_w: int, to_h: int,
             method: int = INTERP_LANCZOS4, clamp: bool = True) -> SirilImage:
    warped = _resize(img.host(), to_w, to_h, method, clamp)
    out = img.copy(data=warped)
    out.log_history(f"Resample to {to_w}x{to_h}")
    return out
