"""Image masks — equivalent of ``src/core/masks.c`` (1,840 LoC).

A mask is a (H, W) float32 plane in [0,1] attached to a SirilImage;
masked ops blend result = mask·new + (1−mask)·old (masks.c blend rule,
implemented in SirilImage.apply_mask_blend).  Creation sources
(masks.c:271,354,481,789,643): channel, luminance, color distance,
detected stars, another image.  Modifiers: invert, blur, feather,
threshold, fmul, autostretch, binarize.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage


def mask_from_channel(img: SirilImage, channel: int) -> np.ndarray:
    d = img.host()
    return d[min(channel, d.shape[0] - 1)].copy()


def mask_from_lum(img: SirilImage,
                  weights: Tuple[float, float, float] = (0.2126, 0.7152, 0.0722)
                  ) -> np.ndarray:
    d = img.host()
    if d.shape[0] == 1:
        return d[0].copy()
    return (weights[0] * d[0] + weights[1] * d[1] + weights[2] * d[2]
            ).astype(np.float32)


def mask_from_color(img: SirilImage, color: Tuple[float, float, float],
                    fuzz: float = 0.1) -> np.ndarray:
    """Similarity to a target RGB color: 1 at exact match, falls off with
    euclidean distance scaled by fuzz."""
    d = img.host()
    if d.shape[0] != 3:
        raise ValueError("color mask requires RGB")
    dist = np.sqrt(((d - np.asarray(color, np.float32)[:, None, None]) ** 2)
                   .mean(axis=0))
    m = np.clip(1.0 - dist / max(fuzz, 1e-6), 0.0, 1.0)
    return m.astype(np.float32)


def mask_from_stars(img: SirilImage, layer: int = 0,
                    grow: float = 1.5) -> np.ndarray:
    """Star mask: gaussian blobs at detected star positions sized by the
    fitted FWHM (masks.c mask_from_stars)."""
    from siril_tpu.registration.starfinder import detect_stars

    d = img.host()
    lay = d[min(layer, d.shape[0] - 1)]
    stars = detect_stars(lay)
    H, W = lay.shape
    m = np.zeros((H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for s in stars:
        sig = max(s.fwhmx, 1.0) / 2.355 * grow
        r = int(4 * sig) + 1
        x0, x1 = max(int(s.x0) - r, 0), min(int(s.x0) + r + 1, W)
        y0, y1 = max(int(s.y0) - r, 0), min(int(s.y0) + r + 1, H)
        if x1 <= x0 or y1 <= y0:
            continue
        sub_y = yy[y0:y1, x0:x1]
        sub_x = xx[y0:y1, x0:x1]
        g = np.exp(-(((sub_x + 0.5 - s.x0) ** 2 + (sub_y + 0.5 - s.y0) ** 2)
                     / (2 * sig * sig)))
        m[y0:y1, x0:x1] = np.maximum(m[y0:y1, x0:x1], g.astype(np.float32))
    return m


def mask_invert(mask: np.ndarray) -> np.ndarray:
    return (1.0 - mask).astype(np.float32)


def mask_blur(mask: np.ndarray, sigma: float) -> np.ndarray:
    from siril_tpu.ops.filters import gaussian_blur_chw

    return np.asarray(gaussian_blur_chw(mask[None], sigma))[0]


def mask_feather(mask: np.ndarray, distance: int) -> np.ndarray:
    """Distance-ramp feather: binary mask edges ramp linearly over
    ``distance`` px (blending.c distance-ramp semantics)."""
    from scipy.ndimage import distance_transform_edt

    binary = mask > 0.5
    inside = distance_transform_edt(binary)
    ramp = np.clip(inside / max(distance, 1), 0.0, 1.0)
    return (ramp * binary).astype(np.float32)


def mask_threshold(mask: np.ndarray, lo: float, hi: float = 1.0,
                   binarize: bool = False) -> np.ndarray:
    m = np.where((mask >= lo) & (mask <= hi), mask, 0.0)
    if binarize:
        m = (m > 0).astype(np.float32)
    return m.astype(np.float32)


def mask_fmul(mask: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(mask * factor, 0.0, 1.0).astype(np.float32)


def mask_autostretch(mask: np.ndarray) -> np.ndarray:
    from siril_tpu.ops.stretch import find_linked_midtones_balance, mtf

    tmp = SirilImage(data=mask[None])
    p = find_linked_midtones_balance(tmp)
    return np.asarray(mtf(mask, p.midtones, p.shadows, p.highlights),
                      np.float32)
