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
    """icc_assign: tag without converting pixels.  ``profile`` is a
    built-in name OR a path to a real ``.icc``/``.icm`` file (parsed by
    ops/icc_file.py — the lcms2 cmsOpenProfileFromFile role); the raw
    bytes attach to the image and embed on FITS/TIFF export."""
    import os

    if profile.lower().endswith((".icc", ".icm")) or os.path.exists(profile):
        from siril_tpu.ops.icc_file import read_icc

        prof = read_icc(profile)
        out = img.copy()
        out.icc_profile = prof.raw
        out.keywords.extra["ICCPROF"] = prof.description
        out.log_history(f"Assigned ICC profile {prof.description}")
        return out
    key = profile.lower().replace("-", "").replace("_", "")
    if key not in PROFILES:
        raise ValueError(f"unknown profile '{profile}' "
                         f"(available: {', '.join(PROFILES)}, or a .icc "
                         "file path)")
    out = img.copy()
    out.keywords.extra["ICCPROF"] = PROFILES[key][0]
    # attach generated profile bytes so exports embed a real .icc
    from siril_tpu.ops.icc_file import write_icc_bytes

    builtin = _builtin_icc(key)
    if builtin is not None:
        out.icc_profile = write_icc_bytes(builtin)
    out.log_history(f"Assigned ICC profile {PROFILES[key][0]}")
    return out


def _builtin_icc(key: str):
    """IccProfile object for a built-in matrix+TRC profile."""
    from siril_tpu.ops.icc_file import (
        IccProfile, Trc, _D50, _D65, bradford_adapt)

    name, m, trc_kind = PROFILES[key]
    if trc_kind == "srgb":
        trc = Trc("para", para_type=3,
                  para=(2.4, 1.0 / 1.055, 0.055 / 1.055,
                        1.0 / 12.92, 0.04045))
    elif trc_kind == "rec2020":
        a, b = 1.09929682680944, 0.018053968510807
        trc = Trc("para", para_type=3,
                  para=(1.0 / 0.45, 1.0 / a, (a - 1.0) / a, 1.0 / 4.5,
                        b * 4.5))
    else:
        trc = Trc("gamma", 1.0)
    if m is None:
        return IccProfile(description=name, color_space="GRAY",
                          trc={"k": trc})
    m50 = bradford_adapt(np.asarray(m), _D65, _D50)
    return IccProfile(description=name, matrix=m50,
                      trc={"r": trc, "g": trc, "b": trc})


def remove_profile(img: SirilImage) -> SirilImage:
    out = img.copy()
    out.keywords.extra.pop("ICCPROF", None)
    out.icc_profile = None       # drop the embedded bytes too, or saves
    # keep embedding it and conversions keep using it as the source
    out.log_history("Removed ICC profile")
    return out


def current_profile_key(img: SirilImage) -> str:
    name = str(img.keywords.extra.get("ICCPROF", "sRGB"))
    for k, (n, _, _) in PROFILES.items():
        if n.lower() == name.lower():
            return k
    return "srgb"


def _profile_transforms(img: SirilImage, spec: str):
    """(decode_to_linearD65, encode_from_linearD65, matrixD65, name,
    raw_bytes) for a built-in name, a .icc path, or the image's embedded
    profile ('').  raw_bytes is None for built-in names."""
    import os

    if spec == "" and img.icc_profile:
        from siril_tpu.ops.icc_file import read_icc_bytes

        prof = read_icc_bytes(img.icc_profile)
    elif spec.lower().endswith((".icc", ".icm")) or \
            (spec and os.path.exists(spec)):
        from siril_tpu.ops.icc_file import read_icc

        prof = read_icc(spec)
    else:
        key = (spec or "srgb").lower().replace("-", "").replace("_", "")
        if key not in PROFILES:
            raise ValueError(f"unknown profile '{spec}'")
        name, m, trc_kind = PROFILES[key]
        return (lambda x: _decode_trc(x, trc_kind),
                lambda x: _encode_trc(x, trc_kind),
                None if m is None else np.asarray(m), name, None)

    trcs = prof.trc
    if prof.is_gray or prof.matrix is None:
        t = trcs.get("k") or next(iter(trcs.values()), None)
        dec = (lambda x: t.decode(x)) if t else (lambda x: x)
        enc = (lambda x: t.encode(x)) if t else (lambda x: x)
        return dec, enc, None, prof.description, prof.raw

    def _chan_trc(c, nchans):
        # mono data under an RGB profile uses the r-curve (luminance
        # proxy, same behavior class as the reference's gray fallback)
        ch = "rgb"[c] if nchans >= 3 else "r"
        return trcs.get(ch) or trcs.get("k")

    def dec(x):
        out = np.empty_like(x)
        for c in range(x.shape[0]):
            t = _chan_trc(c, x.shape[0])
            out[c] = t.decode(x[c]) if t else x[c]
        return out

    def enc(x):
        out = np.empty_like(x)
        for c in range(x.shape[0]):
            t = _chan_trc(c, x.shape[0])
            out[c] = t.encode(x[c]) if t else x[c]
        return out

    return dec, enc, prof.matrix_d65(), prof.description, prof.raw


def convert_to_profile(img: SirilImage, dest: str) -> SirilImage:
    """icc_convert_to: convert pixel values between profiles (built-in
    names or real .icc files; the image's embedded profile is the
    source when present)."""
    src_spec = "" if img.icc_profile else current_profile_key(img)
    dec_src, _, m_src, _, _ = _profile_transforms(img, src_spec)
    _, enc_dst, m_dst, dst_name, raw_dst = _profile_transforms(img, dest)
    data = img.host().astype(np.float64)
    lin = dec_src(data)
    # atol covers s15f16 colorant quantization + the Bradford D50↔D65
    # round trip of parsed profiles: same-primary profiles must compare
    # equal or a near-identity matrix pass injects ~5e-4 of error
    if img.nchans == 3 and m_src is not None and m_dst is not None and \
            not np.allclose(m_src, m_dst, atol=5e-4):
        flat = lin.reshape(3, -1)
        xyz = m_src @ flat
        lin = np.linalg.solve(m_dst, xyz).reshape(lin.shape)
    out_d = enc_dst(np.clip(lin, 0.0, 1.0))
    out = img.copy(data=out_d.astype(np.float32))
    out.keywords.extra["ICCPROF"] = dst_name
    if raw_dst is not None:
        # file / embedded destination: _profile_transforms already holds
        # the parsed file's bytes — no second disk read
        out.icc_profile = raw_dst
    else:
        dst_key = dest.lower().replace("-", "").replace("_", "")
        if dst_key in PROFILES:
            from siril_tpu.ops.icc_file import write_icc_bytes

            builtin = _builtin_icc(dst_key)
            out.icc_profile = write_icc_bytes(builtin) if builtin else None
    out.log_history(f"Converted to ICC profile {dst_name}")
    return out
