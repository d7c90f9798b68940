"""CFA channel extraction — equivalent of ``src/algos/extraction.c``
(split_cfa, extract_Green, extract_Ha, extract_HaOIII, merge_cfa).

Semantics (extraction.c:111+):
- split_cfa: the four CFA sites → four half-size mono images CFA0..CFA3
  (site order: row-major over the 2×2 cell).
- extract_Ha: the red site → half-size mono (Hα narrowband shot on OSC).
- extract_Green: average of the two green sites → half-size mono.
- extract_HaOIII: Ha = red site half-size; OIII = green/blue synthesis
  (mean of G1,G2,B upsampled to match, per the dual-band workflow);
  with resample option Ha is upscaled ×2 to match OIII full size.
- merge_cfa: inverse of split_cfa, four mono images → CFA mosaic.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage


def _sites(cfa: np.ndarray):
    h, w = cfa.shape
    h2, w2 = h // 2, w // 2
    q = cfa[: h2 * 2, : w2 * 2]
    return {(0, 0): q[0::2, 0::2], (0, 1): q[0::2, 1::2],
            (1, 0): q[1::2, 0::2], (1, 1): q[1::2, 1::2]}


def _color_at(pattern: str) -> Dict[Tuple[int, int], str]:
    p = np.array(list(pattern.upper())).reshape(2, 2)
    return {(dy, dx): p[dy, dx] for dy in (0, 1) for dx in (0, 1)}


def split_cfa(img: SirilImage):
    """→ [CFA0, CFA1, CFA2, CFA3] half-size mono images (row-major sites)."""
    cfa = img.host()[0]
    s = _sites(cfa)
    out = []
    for i, key in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        sub = img.copy(data=np.ascontiguousarray(s[key])[None])
        sub.keywords.bayer_pattern = ""
        out.append(sub)
    return out


def merge_cfa(imgs, pattern: str) -> SirilImage:
    """merge_cfa: 4 half-size images (CFA0..CFA3 site order) → mosaic."""
    if len(imgs) != 4:
        raise ValueError("merge_cfa needs exactly 4 images")
    subs = [im.host()[0] for im in imgs]
    h2, w2 = subs[0].shape
    out = np.zeros((h2 * 2, w2 * 2), np.float32)
    for i, (dy, dx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        out[dy::2, dx::2] = subs[i]
    res = imgs[0].copy(data=out[None])
    res.keywords.bayer_pattern = pattern.upper()
    return res


def extract_channel_sites(img: SirilImage, color: str):
    """Half-size planes of all sites matching `color` in the pattern."""
    pat = img.keywords.bayer_pattern or "RGGB"
    colors = _color_at(pat)
    sites = _sites(img.host()[0])
    return [sites[k] for k, c in colors.items() if c == color]


def extract_ha(img: SirilImage, upscale: bool = False) -> SirilImage:
    """extract_Ha: red CFA site → half-size mono (or ×2 upscaled)."""
    planes = extract_channel_sites(img, "R")
    if not planes:
        raise ValueError("no red sites in pattern")
    ha = planes[0].astype(np.float32)
    if upscale:
        ha = np.kron(ha, np.ones((2, 2), np.float32))
    out = img.copy(data=np.ascontiguousarray(ha)[None])
    out.keywords.bayer_pattern = ""
    out.keywords.filter = "Ha"
    out.log_history("Extraction of Ha layer")
    return out


def extract_green(img: SirilImage) -> SirilImage:
    """extract_Green: mean of the two green sites → half-size mono."""
    planes = extract_channel_sites(img, "G")
    if len(planes) < 2:
        raise ValueError("no green sites in pattern")
    g = (0.5 * (planes[0].astype(np.float32) + planes[1].astype(np.float32)))
    out = img.copy(data=np.ascontiguousarray(g)[None])
    out.keywords.bayer_pattern = ""
    out.keywords.filter = "Green"
    out.log_history("Extraction of Green layer")
    return out


def extract_ha_oiii(img: SirilImage, resample: str = "oiii"):
    """extract_HaOIII dual-band: (Ha, OIII) images.

    resample: 'ha' upscales Ha ×2 to full size; 'oiii' bins OIII to
    half-size (default keeps both half-size consistent).
    """
    pat = img.keywords.bayer_pattern or "RGGB"
    colors = _color_at(pat)
    sites = _sites(img.host()[0])
    r = [sites[k] for k, c in colors.items() if c == "R"][0].astype(np.float32)
    gs = [sites[k].astype(np.float32) for k, c in colors.items() if c == "G"]
    b = [sites[k] for k, c in colors.items() if c == "B"][0].astype(np.float32)
    oiii = (gs[0] + gs[1] + b) / 3.0
    ha = r
    if resample == "ha":
        ha = np.kron(ha, np.ones((2, 2), np.float32))
        oiii = np.kron(oiii, np.ones((2, 2), np.float32))
    ha_img = img.copy(data=np.ascontiguousarray(ha)[None])
    ha_img.keywords.bayer_pattern = ""
    ha_img.keywords.filter = "Ha"
    o_img = img.copy(data=np.ascontiguousarray(oiii)[None])
    o_img.keywords.bayer_pattern = ""
    o_img.keywords.filter = "OIII"
    return ha_img, o_img
