"""Color science — equivalent of ``src/algos/colors.c`` (2,434 LoC):
RGB↔HSL/HSV/Lab/XYZ conversions, SCNR green-noise removal, hue-band
saturation, negative, 3×3 color-conversion matrix, channel split/compose.

All conversions are elementwise jnp maps over (H,W) channel planes.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from siril_tpu.utils.fetch import fetch_np
from siril_tpu.core.image import SirilImage


def _jnp():
    import jax.numpy as jnp

    return jnp


# ---------------------------------------------------------------------------
# RGB ↔ HSL / HSV  (colors.c rgb_to_hsl etc., standard definitions)
# ---------------------------------------------------------------------------


def rgb_to_hsl(r, g, b):
    jnp = _jnp()
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    l = 0.5 * (mx + mn)
    d = mx - mn
    s = jnp.where(d == 0.0, 0.0,
                  jnp.where(l > 0.5, d / jnp.maximum(2.0 - mx - mn, 1e-30),
                            d / jnp.maximum(mx + mn, 1e-30)))
    dsafe = jnp.where(d == 0.0, 1.0, d)
    hr = jnp.where(mx == r, (g - b) / dsafe % 6.0, 0.0)
    hg = jnp.where((mx == g) & (mx != r), (b - r) / dsafe + 2.0, 0.0)
    hb = jnp.where((mx == b) & (mx != r) & (mx != g), (r - g) / dsafe + 4.0, 0.0)
    h = (hr + hg + hb) / 6.0
    h = jnp.where(d == 0.0, 0.0, h % 1.0)
    return h, s, l


def hsl_to_rgb(h, s, l):
    jnp = _jnp()
    c = (1.0 - jnp.abs(2.0 * l - 1.0)) * s
    hp = (h % 1.0) * 6.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = l - c / 2.0
    conds = [(hp < 1), (hp < 2), (hp < 3), (hp < 4), (hp < 5)]
    r = jnp.select(conds, [c, x, 0.0 * c, 0.0 * c, x], c)
    g = jnp.select(conds, [x, c, c, x, 0.0 * c], 0.0 * c)
    b = jnp.select(conds, [0.0 * c, 0.0 * c, x, c, c], x)
    return r + m, g + m, b + m


def rgb_to_hsv(r, g, b):
    jnp = _jnp()
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    v = mx
    s = jnp.where(mx == 0.0, 0.0, d / jnp.maximum(mx, 1e-30))
    dsafe = jnp.where(d == 0.0, 1.0, d)
    hr = jnp.where(mx == r, (g - b) / dsafe % 6.0, 0.0)
    hg = jnp.where((mx == g) & (mx != r), (b - r) / dsafe + 2.0, 0.0)
    hb = jnp.where((mx == b) & (mx != r) & (mx != g), (r - g) / dsafe + 4.0, 0.0)
    h = jnp.where(d == 0.0, 0.0, ((hr + hg + hb) / 6.0) % 1.0)
    return h, s, v


def hsv_to_rgb(h, s, v):
    jnp = _jnp()
    c = v * s
    hp = (h % 1.0) * 6.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = v - c
    conds = [(hp < 1), (hp < 2), (hp < 3), (hp < 4), (hp < 5)]
    r = jnp.select(conds, [c, x, 0.0 * c, 0.0 * c, x], c)
    g = jnp.select(conds, [x, c, c, x, 0.0 * c], 0.0 * c)
    b = jnp.select(conds, [0.0 * c, 0.0 * c, x, c, c], x)
    return r + m, g + m, b + m


# ---------------------------------------------------------------------------
# RGB ↔ XYZ ↔ CIE L*a*b*  (D65, sRGB linear — colors.c rgb_to_xyz etc.)
# ---------------------------------------------------------------------------

_M_RGB2XYZ = np.array([[0.4124564, 0.3575761, 0.1804375],
                       [0.2126729, 0.7151522, 0.0721750],
                       [0.0193339, 0.1191920, 0.9503041]], np.float32)
_M_XYZ2RGB = np.linalg.inv(_M_RGB2XYZ).astype(np.float32)
_WHITE = np.array([0.95047, 1.0, 1.08883], np.float32)


def rgb_to_xyz(r, g, b):
    jnp = _jnp()
    M = _M_RGB2XYZ
    return (M[0, 0] * r + M[0, 1] * g + M[0, 2] * b,
            M[1, 0] * r + M[1, 1] * g + M[1, 2] * b,
            M[2, 0] * r + M[2, 1] * g + M[2, 2] * b)


def xyz_to_rgb(x, y, z):
    M = _M_XYZ2RGB
    return (M[0, 0] * x + M[0, 1] * y + M[0, 2] * z,
            M[1, 0] * x + M[1, 1] * y + M[1, 2] * z,
            M[2, 0] * x + M[2, 1] * y + M[2, 2] * z)


def _f_lab(t):
    jnp = _jnp()
    d = 6.0 / 29.0
    return jnp.where(t > d ** 3, jnp.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)


def _finv_lab(t):
    jnp = _jnp()
    d = 6.0 / 29.0
    return jnp.where(t > d, t ** 3, 3 * d * d * (t - 4.0 / 29.0))


def xyz_to_lab(x, y, z):
    fx = _f_lab(x / _WHITE[0])
    fy = _f_lab(y / _WHITE[1])
    fz = _f_lab(z / _WHITE[2])
    return 116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)


def lab_to_xyz(L, a, b):
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    return (_WHITE[0] * _finv_lab(fx), _WHITE[1] * _finv_lab(fy),
            _WHITE[2] * _finv_lab(fz))


# ---------------------------------------------------------------------------
# operations
# ---------------------------------------------------------------------------


def scnr(img: SirilImage, scnr_type: str = "avgneutral",
         amount: float = 1.0, preserve_lightness: bool = True) -> SirilImage:
    """SCNR green removal (filters/scnr.c): avg- or max-neutral."""
    jnp = _jnp()
    if img.nchans != 3:
        raise ValueError("SCNR requires an RGB image")
    d = img.device()
    r, g, b = d[0], d[1], d[2]
    if scnr_type in ("avgneutral", "0"):
        m = 0.5 * (r + b)
    else:
        m = jnp.maximum(r, b)
    g2 = jnp.minimum(g, m)
    if amount < 1.0:
        g2 = g * (1.0 - amount) + g2 * amount
    if preserve_lightness:
        _, _, l0 = rgb_to_hsl(r, g, b)
        h1, s1, _ = rgb_to_hsl(r, g2, b)
        r2, g3, b2 = hsl_to_rgb(h1, s1, l0)
        out = jnp.stack([r2, g3, b2])
    else:
        out = jnp.stack([r, g2, b])
    out = jnp.clip(out, 0.0, 1.0)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history(f"SCNR ({scnr_type})")
    return res


def saturation(img: SirilImage, amount: float, background_factor: float = 0.0,
               hue_min: float = 0.0, hue_max: float = 360.0) -> SirilImage:
    """`satu` (filters/saturation.c): boost saturation in a hue band,
    skipping background below bkg+factor·sigma."""
    jnp = _jnp()
    if img.nchans != 3:
        raise ValueError("satu requires an RGB image")
    d = img.device()
    h, s, l = rgb_to_hsl(d[0], d[1], d[2])
    hdeg = h * 360.0
    if hue_min <= hue_max:
        in_band = (hdeg >= hue_min) & (hdeg <= hue_max)
    else:
        in_band = (hdeg >= hue_min) | (hdeg <= hue_max)
    thresh = 0.0
    if background_factor > 0.0:
        from siril_tpu.ops.statistics import STATS_BASIC, compute_stats_np

        st = compute_stats_np(img.host().mean(axis=0), STATS_BASIC)
        thresh = st.median + background_factor * st.bgnoise
    apply = in_band & (l > thresh)
    s2 = jnp.where(apply, jnp.clip(s * (1.0 + amount), 0.0, 1.0), s)
    r, g, b = hsl_to_rgb(h, s2, l)
    out = jnp.clip(jnp.stack([r, g, b]), 0.0, 1.0)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history(f"Saturation enhancement ({amount:+.2f})")
    return res


def negative(img: SirilImage) -> SirilImage:
    """`neg` command."""
    jnp = _jnp()
    out = 1.0 - img.device()
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history("Negative transformation")
    return res


def apply_ccm(img: SirilImage, matrix, gamma: float = 1.0) -> SirilImage:
    """`ccm`: 3×3 color matrix (+ optional gamma) on RGB."""
    jnp = _jnp()
    if img.nchans != 3:
        raise ValueError("ccm requires an RGB image")
    M = np.asarray(matrix, np.float32).reshape(3, 3)
    d = img.device()
    flat = d.reshape(3, -1)
    out = (jnp.asarray(M) @ flat).reshape(d.shape)
    if gamma != 1.0:
        out = jnp.power(jnp.clip(out, 0.0, 1.0), 1.0 / gamma)
    out = jnp.clip(out, 0.0, 1.0)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history("Color conversion matrix applied")
    return res


def split_channels(img: SirilImage, space: str = "rgb"):
    """`split` command: RGB / HSL / HSV / Lab decomposition → 3 mono images."""
    jnp = _jnp()
    if img.nchans != 3:
        raise ValueError("split requires an RGB image")
    d = img.device()
    if space == "rgb":
        planes = (d[0], d[1], d[2])
        names = ("R", "G", "B")
    elif space == "hsl":
        planes = rgb_to_hsl(d[0], d[1], d[2])
        names = ("H", "S", "L")
    elif space == "hsv":
        planes = rgb_to_hsv(d[0], d[1], d[2])
        names = ("H", "S", "V")
    elif space == "lab":
        x, y, z = rgb_to_xyz(d[0], d[1], d[2])
        L, a, b = xyz_to_lab(x, y, z)
        planes = (L / 100.0, (a + 128.0) / 255.0, (b + 128.0) / 255.0)
        names = ("L", "a", "b")
    else:
        raise ValueError(f"unknown colorspace {space}")
    out = []
    for p, n in zip(planes, names):
        im = img.copy(data=np.asarray(p)[None])
        im.keywords.filter = n
        out.append(im)
    return out


def rgb_compose(r: SirilImage, g: SirilImage, b: SirilImage,
                lum: "SirilImage" = None) -> SirilImage:
    """`rgbcomp`: three mono images → RGB; with ``lum``, LRGB composition
    (rgbcomp -lum=, compositing): chrominance from RGB, lightness
    replaced by the luminance layer in HSL space."""
    data = np.stack([r.host()[0], g.host()[0], b.host()[0]])
    if lum is not None:
        ld = lum.host()
        L = ld[0] if ld.shape[0] == 1 else (0.2126 * ld[0] + 0.7152 * ld[1]
                                            + 0.0722 * ld[2])
        h, sat, _ = rgb_to_hsl(data[0], data[1], data[2])
        rr, gg, bb = hsl_to_rgb(h, sat, np.clip(L, 0.0, 1.0))
        data = np.stack([rr, gg, bb]).astype(np.float32)
    out = r.copy(data=data)
    out.log_history("LRGB composition" if lum is not None
                    else "RGB composition")
    return out


def align_rgb_channels(img: SirilImage) -> SirilImage:
    """Compositing channel alignment (src/compositing/align_rgb.c):
    register R and B onto G by FFT phase correlation with sub-pixel
    refinement, then shift each channel into alignment."""
    import jax.numpy as jnp

    from siril_tpu.registration.shift import phase_correlate

    if img.nchans != 3:
        return img
    data = img.host()
    ref = data[1]
    others = np.stack([data[0], data[2]])
    d = phase_correlate(ref, others)           # frame→ref translations
    out = data.copy()
    from siril_tpu.ops.interp import INTERP_BILINEAR, warp_homography

    for k, c in enumerate((0, 2)):
        dx, dy = float(d[k][0]), float(d[k][1])
        if abs(dx) < 0.05 and abs(dy) < 0.05:
            continue
        H = np.eye(3)
        H[0, 2], H[1, 2] = dx, dy
        out[c] = warp_homography(data[c][None], H,
                                 (img.height, img.width),
                                 INTERP_BILINEAR, clamp=False)[0]
    res = img.copy(data=out)
    res.log_history("RGB channel alignment")
    return res
