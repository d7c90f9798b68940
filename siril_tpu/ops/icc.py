"""ICC color management — equivalent of ``src/core/icc_profile.c``
(lcms2-based in the reference).  Without lcms2, the working set of
profiles Siril actually uses day-to-day (sRGB, linear Rec709/sRGB
primaries, Rec2020, grayscale) is implemented directly as matrix+TRC
transforms; profile identity is tracked on the image and conversions
compose decode→XYZ(D65)→encode.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from siril_tpu.core.image import SirilImage

# RGB→XYZ matrices (D65)
_SRGB2XYZ = np.array([[0.4124564, 0.3575761, 0.1804375],
                      [0.2126729, 0.7151522, 0.0721750],
                      [0.0193339, 0.1191920, 0.9503041]])
_REC2020toXYZ = np.array([[0.636958, 0.144617, 0.168881],
                          [0.262700, 0.677998, 0.059302],
                          [0.000000, 0.028073, 1.060985]])

PROFILES = {
    "srgb": ("sRGB", _SRGB2XYZ, "srgb"),
    "srgblinear": ("Linear sRGB", _SRGB2XYZ, "linear"),
    "rec2020": ("Rec2020", _REC2020toXYZ, "rec2020"),
    "rec2020linear": ("Linear Rec2020", _REC2020toXYZ, "linear"),
    "graysrgb": ("Gray sRGB-TRC", None, "srgb"),
    "graylinear": ("Gray linear", None, "linear"),
}


def _decode_trc(x, kind):
    if kind == "linear":
        return x
    if kind == "srgb":
        return np.where(x <= 0.04045, x / 12.92,
                        ((x + 0.055) / 1.055) ** 2.4)
    if kind == "rec2020":
        a, b = 1.09929682680944, 0.018053968510807
        return np.where(x < b * 4.5, x / 4.5,
                        ((x + a - 1) / a) ** (1 / 0.45))
    raise ValueError(kind)


def _encode_trc(x, kind):
    x = np.clip(x, 0.0, 1.0)
    if kind == "linear":
        return x
    if kind == "srgb":
        return np.where(x <= 0.0031308, 12.92 * x,
                        1.055 * x ** (1 / 2.4) - 0.055)
    if kind == "rec2020":
        a, b = 1.09929682680944, 0.018053968510807
        return np.where(x < b, 4.5 * x, a * x ** 0.45 - (a - 1))
    raise ValueError(kind)


def assign_profile(img: SirilImage, profile: str) -> SirilImage:
    """icc_assign: tag without converting pixels."""
    key = profile.lower().replace("-", "").replace("_", "")
    if key not in PROFILES:
        raise ValueError(f"unknown profile '{profile}' "
                         f"(available: {', '.join(PROFILES)})")
    out = img.copy()
    out.keywords.extra["ICCPROF"] = PROFILES[key][0]
    out.log_history(f"Assigned ICC profile {PROFILES[key][0]}")
    return out


def remove_profile(img: SirilImage) -> SirilImage:
    out = img.copy()
    out.keywords.extra.pop("ICCPROF", None)
    out.log_history("Removed ICC profile")
    return out


def current_profile_key(img: SirilImage) -> str:
    name = str(img.keywords.extra.get("ICCPROF", "sRGB"))
    for k, (n, _, _) in PROFILES.items():
        if n.lower() == name.lower():
            return k
    return "srgb"


def convert_to_profile(img: SirilImage, dest: str) -> SirilImage:
    """icc_convert_to: convert pixel values between profiles."""
    src_key = current_profile_key(img)
    dst_key = dest.lower().replace("-", "").replace("_", "")
    if dst_key not in PROFILES:
        raise ValueError(f"unknown profile '{dest}'")
    _, m_src, trc_src = PROFILES[src_key]
    _, m_dst, trc_dst = PROFILES[dst_key]
    data = img.host().astype(np.float64)
    lin = _decode_trc(data, trc_src)
    if img.nchans == 3 and m_src is not None and m_dst is not None and \
            not np.allclose(m_src, m_dst):
        flat = lin.reshape(3, -1)
        xyz = m_src @ flat
        lin = np.linalg.solve(m_dst, xyz).reshape(lin.shape)
    out_d = _encode_trc(np.clip(lin, 0.0, 1.0), trc_dst)
    out = img.copy(data=out_d.astype(np.float32))
    out.keywords.extra["ICCPROF"] = PROFILES[dst_key][0]
    out.log_history(f"Converted to ICC profile {PROFILES[dst_key][0]}")
    return out
