"""Image filters — equivalents of ``src/filters/`` small filters and the
RT-derived kernels (``src/rt/gauss.cc``, ``boxblur.cc``):

gauss (gaussian blur), unsharp, fmedian (median filter w/ modulation),
banding removal, CLAHE, EPF (bilateral/guided), fftd/ffti, linear_match,
rgradient (Larson–Sekanina), unpurple, ddp, threshold family.

All filters are whole-image device kernels: convolutions via XLA conv
(MXU for the channel dims), windowed ops via shift stacks (VPU), FFT via
XLA batched FFT.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.utils.fetch import fetch_np


def _jnp():
    import jax.numpy as jnp

    return jnp


# ---------------------------------------------------------------------------
# gaussian blur (rt/gauss.cc equivalent) — separable XLA conv
# ---------------------------------------------------------------------------


def _gauss_kernel1d(sigma: float):
    r = max(int(math.ceil(3.0 * sigma)), 1)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur_chw(data, sigma: float):
    """(C,H,W) → (C,H,W) gaussian blur, edge-replicated (OpenCV border)."""
    import jax.numpy as jnp
    from jax import lax

    k = _gauss_kernel1d(sigma)
    r = len(k) // 2
    x = jnp.asarray(data, jnp.float32)
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="edge")
    # separable: rows then cols, via conv_general_dilated on NCHW
    kx = jnp.asarray(k).reshape(1, 1, 1, -1)
    ky = jnp.asarray(k).reshape(1, 1, -1, 1)
    y = lax.conv_general_dilated(xp[:, None], kx, (1, 1), "VALID")
    y = lax.conv_general_dilated(y, ky, (1, 1), "VALID")
    return y[:, 0]


def gauss(img: SirilImage, sigma: float) -> SirilImage:
    out = gaussian_blur_chw(img.device(), sigma)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history(f"Gaussian filter (sigma={sigma:.2f})")
    return res


def unsharp(img: SirilImage, sigma: float, amount: float) -> SirilImage:
    """cvUnsharpFilter semantics: amount=0 → pure blur, amount=1 → identity,
    amount>1 → sharpening (out = amount·img + (1−amount)·blur)."""
    jnp = _jnp()
    d = img.device()
    g = gaussian_blur_chw(d, sigma)
    out = jnp.clip(amount * d + (1.0 - amount) * g, 0.0, 1.0)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history(f"Unsharp (sigma={sigma:.2f}, amount={amount:.2f})")
    return res


# ---------------------------------------------------------------------------
# median filter (filters/median.c) — shift-stack median
# ---------------------------------------------------------------------------


def median_filter(img: SirilImage, ksize: int = 3, modulation: float = 1.0,
                  iterations: int = 1) -> SirilImage:
    jnp = _jnp()
    if ksize % 2 == 0:
        raise ValueError("ksize must be odd")
    r = ksize // 2
    offs = [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]
    d = img.device()

    def one_pass(x):
        stack = []
        H, W = x.shape[-2], x.shape[-1]
        xp = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="edge")
        for dy, dx in offs:
            stack.append(xp[:, r + dy: r + dy + H, r + dx: r + dx + W])
        med = jnp.median(jnp.stack(stack), axis=0)
        return modulation * med + (1.0 - modulation) * x

    out = d
    for _ in range(max(iterations, 1)):
        out = one_pass(out)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history(f"Median filter ({ksize}x{ksize}, mod={modulation:.2f})")
    return res


# ---------------------------------------------------------------------------
# banding (filters/banding.c BandingEngine_float:326)
# ---------------------------------------------------------------------------


def fix_banding(img: SirilImage, sigma: float = 1.0, amount: float = 1.0,
                protect_highlights: bool = True,
                vertical: bool = False) -> SirilImage:
    """Row-banding removal: per-row median vs channel background; values
    above bg + mad·MAD_NORM/sigma excluded when protecting highlights."""
    from siril_tpu.ops.statistics import STATS_BASIC, STATS_MAD, compute_stats_np

    MAD_NORM = 1.4826
    data = img.host().copy()
    if vertical:
        data = np.ascontiguousarray(np.swapaxes(data, 1, 2))
    C, H, W = data.shape
    for c in range(C):
        st = compute_stats_np(data[c], STATS_BASIC | STATS_MAD)
        background = st.median
        if protect_highlights and sigma > 0:
            reject = background + (1.0 / sigma) * st.mad * MAD_NORM
            masked = np.where(data[c] < reject, data[c], np.nan)
            row_med = np.nanmedian(masked, axis=1)
            row_med = np.where(np.isnan(row_med),
                               np.median(data[c], axis=1), row_med)
        else:
            row_med = np.median(data[c], axis=1)
        fix = (background - row_med) * amount
        data[c] = np.clip(data[c] + fix[:, None], 0.0, 1.0)
    if vertical:
        data = np.ascontiguousarray(np.swapaxes(data, 1, 2))
    res = img.copy(data=data.astype(np.float32))
    res.log_history(f"Canon Banding Reduction (amount={amount:.2f})")
    return res


# ---------------------------------------------------------------------------
# CLAHE (filters/clahe.c — OpenCV CLAHE equivalent)
# ---------------------------------------------------------------------------


def clahe(img: SirilImage, clip_limit: float = 2.0,
          tile_size: int = 8) -> SirilImage:
    """Contrast-limited adaptive histogram equalization, OpenCV-style:
    per-tile clipped histograms → per-tile mapping LUTs → bilinear
    interpolation between tile mappings."""
    nbins = 256
    data = img.host()
    C, H, W = data.shape
    ty = max(H // tile_size, 1)
    tx = max(W // tile_size, 1)
    out = np.empty_like(data)
    for c in range(C):
        lay = data[c]
        q = np.clip((lay * (nbins - 1)).astype(np.int32), 0, nbins - 1)
        luts = np.zeros((tile_size, tile_size, nbins), np.float32)
        for i in range(tile_size):
            for j in range(tile_size):
                sub = q[i * ty:(i + 1) * ty if i < tile_size - 1 else H,
                        j * tx:(j + 1) * tx if j < tile_size - 1 else W]
                hist = np.bincount(sub.ravel(), minlength=nbins).astype(np.float64)
                n = sub.size
                clip = max(clip_limit * n / nbins, 1.0)
                excess = np.maximum(hist - clip, 0.0).sum()
                hist = np.minimum(hist, clip) + excess / nbins
                cdf = np.cumsum(hist) / n
                luts[i, j] = cdf.astype(np.float32)
        # bilinear interpolation of tile mappings
        yy, xx = np.mgrid[0:H, 0:W]
        fy = (yy + 0.5) / ty - 0.5
        fx = (xx + 0.5) / tx - 0.5
        i0 = np.clip(np.floor(fy).astype(int), 0, tile_size - 1)
        j0 = np.clip(np.floor(fx).astype(int), 0, tile_size - 1)
        i1 = np.clip(i0 + 1, 0, tile_size - 1)
        j1 = np.clip(j0 + 1, 0, tile_size - 1)
        wy = np.clip(fy - i0, 0.0, 1.0)
        wx = np.clip(fx - j0, 0.0, 1.0)
        v00 = luts[i0, j0, q]
        v01 = luts[i0, j1, q]
        v10 = luts[i1, j0, q]
        v11 = luts[i1, j1, q]
        out[c] = ((1 - wy) * ((1 - wx) * v00 + wx * v01) +
                  wy * ((1 - wx) * v10 + wx * v11)).astype(np.float32)
    res = img.copy(data=out)
    res.log_history(f"CLAHE (clip={clip_limit:.1f}, tiles={tile_size})")
    return res


# ---------------------------------------------------------------------------
# EPF: bilateral + guided filter (filters/epf.c, opencv/guidedfilter.cpp)
# ---------------------------------------------------------------------------


def bilateral(img: SirilImage, d: float = 5.0, sigma_col: float = 0.1,
              sigma_spatial: float = 3.0, mod: float = 1.0,
              guide: Optional[SirilImage] = None) -> SirilImage:
    import jax.numpy as jnp

    r = max(int(round(d / 2)) if d > 0 else int(3 * sigma_spatial), 1)
    x = img.device()
    g = guide.device() if guide is not None else x
    H, W = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="edge")
    gp = jnp.pad(g, ((0, 0), (r, r), (r, r)), mode="edge")
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    inv2ss = 1.0 / (2.0 * sigma_spatial * sigma_spatial)
    inv2sc = 1.0 / (2.0 * sigma_col * sigma_col)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            ws = math.exp(-(dy * dy + dx * dx) * inv2ss)
            xs = xp[:, r + dy: r + dy + H, r + dx: r + dx + W]
            gs = gp[:, r + dy: r + dy + H, r + dx: r + dx + W]
            wr = jnp.exp(-((gs - g) ** 2) * inv2sc)
            w = ws * wr
            num = num + w * xs
            den = den + w
    out = num / jnp.maximum(den, 1e-9)
    out = mod * out + (1.0 - mod) * x
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history("Bilateral filter")
    return res


def _box(x, r):
    import jax.numpy as jnp

    H, W = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="edge")
    c = jnp.cumsum(jnp.cumsum(xp, axis=1), axis=2)
    c = jnp.pad(c, ((0, 0), (1, 0), (1, 0)))
    size = 2 * r + 1
    s = (c[:, size:, size:] - c[:, :-size, size:] -
         c[:, size:, :-size] + c[:, :-size, :-size])
    return s / (size * size)


def guided_filter(img: SirilImage, radius: int = 8, eps: float = 1e-3,
                  mod: float = 1.0,
                  guide: Optional[SirilImage] = None) -> SirilImage:
    """He et al. guided filter (opencv/guidedfilter.cpp equivalent)."""
    import jax.numpy as jnp

    x = img.device()
    g = guide.device() if guide is not None else x
    mean_g = _box(g, radius)
    mean_x = _box(x, radius)
    corr_gx = _box(g * x, radius)
    corr_gg = _box(g * g, radius)
    var_g = corr_gg - mean_g * mean_g
    cov_gx = corr_gx - mean_g * mean_x
    a = cov_gx / (var_g + eps)
    b = mean_x - a * mean_g
    out = _box(a, radius) * g + _box(b, radius)
    out = mod * out + (1.0 - mod) * x
    res = img.copy(data=fetch_np(img.apply_mask_blend(
        jnp.clip(out, 0.0, 1.0))))
    res.log_history("Guided filter")
    return res


# ---------------------------------------------------------------------------
# FFT tool (filters/fft.c: fftd/ffti)
# ---------------------------------------------------------------------------


def fftd(img: SirilImage, shifted: bool = True):
    """Decompose into (modulus, phase) images (fftd command)."""
    import jax.numpy as jnp

    d = img.device()
    F = jnp.fft.fft2(d)
    if shifted:
        F = jnp.fft.fftshift(F, axes=(-2, -1))
    mod = jnp.abs(F)
    mx = mod.reshape(mod.shape[0], -1).max(axis=1)[:, None, None]
    modn = mod / jnp.maximum(mx, 1e-30)
    phase = (jnp.angle(F) + np.pi) / (2.0 * np.pi)
    mimg = img.copy(data=np.asarray(modn, np.float32))
    mimg.keywords.extra["FFTNORM"] = [float(v) for v in np.asarray(mx).ravel()]
    mimg.keywords.extra["FFTSHIFT"] = shifted
    pimg = img.copy(data=np.asarray(phase, np.float32))
    return mimg, pimg


def ffti(mod_img: SirilImage, phase_img: SirilImage) -> SirilImage:
    import jax.numpy as jnp

    mx = mod_img.keywords.extra.get("FFTNORM")
    shifted = bool(mod_img.keywords.extra.get("FFTSHIFT", True))
    mod = mod_img.device()
    if mx is not None:
        mxa = jnp.asarray(np.asarray(mx, np.float32))[:, None, None]
        mod = mod * mxa
    phase = phase_img.device() * (2.0 * np.pi) - np.pi
    F = mod * jnp.exp(1j * phase)
    if shifted:
        F = jnp.fft.ifftshift(F, axes=(-2, -1))
    out = jnp.real(jnp.fft.ifft2(F))
    res = mod_img.copy(data=np.asarray(jnp.clip(out, 0.0, 1.0), np.float32))
    res.log_history("Inverse FFT")
    return res


# ---------------------------------------------------------------------------
# linear match (filters/linear_match.c + fitting.c find_linear_coeff)
# ---------------------------------------------------------------------------


def linear_match(img: SirilImage, ref: SirilImage, low: float = 1e-7,
                 high: float = 0.92) -> SirilImage:
    """Per-channel linear fit of image to reference on pixels within
    [low, high] in both images."""
    data = img.host()
    rdata = ref.host()
    out = np.empty_like(data)
    coeffs = []
    for c in range(data.shape[0]):
        x = data[c].ravel()
        y = rdata[min(c, rdata.shape[0] - 1)].ravel()
        m = (x > low) & (x < high) & (y > low) & (y < high)
        if m.sum() < 10:
            out[c] = data[c]
            coeffs.append((1.0, 0.0))
            continue
        A = np.vstack([x[m], np.ones(m.sum())]).T
        (a, b), *_ = np.linalg.lstsq(A, y[m], rcond=None)
        out[c] = np.clip(a * data[c] + b, 0.0, 1.0)
        coeffs.append((float(a), float(b)))
    res = img.copy(data=out.astype(np.float32))
    res.log_history("Linear match: " +
                    ", ".join(f"a={a:.5f} b={b:.5f}" for a, b in coeffs))
    return res


# ---------------------------------------------------------------------------
# rgradient — Larson–Sekanina (filters/rgradient.c:87-180)
# ---------------------------------------------------------------------------


def rgradient(img: SirilImage, xc: float, yc: float, dr: float,
              da_deg: float) -> SirilImage:
    """out = clip(2I − I(r−dR, θ+dα) − I(r−dR, θ−dα)) − min."""
    import jax.numpy as jnp

    from siril_tpu.ops.interp import INTERP_BILINEAR, sample_plane

    d = img.device()
    C, H, W = d.shape
    da = math.radians(da_deg)
    yy, xx = jnp.mgrid[0:H, 0:W]
    px = xx.astype(jnp.float32) - xc
    py = yy.astype(jnp.float32) - yc
    r = jnp.sqrt(px * px + py * py)
    theta = jnp.arctan2(py, px)

    def coords(dth):
        rr = jnp.maximum(r - dr, 0.0)
        tt = theta + dth
        sx = xc + rr * jnp.cos(tt)
        sy = yc + rr * jnp.sin(tt)
        return sy, sx

    sy1, sx1 = coords(da)
    sy2, sx2 = coords(-da)
    outs = []
    for c in range(C):
        a = sample_plane(d[c], sy1, sx1, INTERP_BILINEAR)
        b = sample_plane(d[c], sy2, sx2, INTERP_BILINEAR)
        v = jnp.minimum(2.0 * d[c] - a - b, 1.0)
        outs.append(v)
    out = jnp.stack(outs)
    out = out - out.min()
    res = img.copy(data=np.asarray(jnp.clip(out, 0.0, 1.0), np.float32))
    res.log_history(f"RGradient (dR={dr:.1f}, dA={da_deg:.1f})")
    return res


# ---------------------------------------------------------------------------
# unpurple (filters/unpurple.c): purple-fringe removal
# ---------------------------------------------------------------------------


def unpurple(img: SirilImage, blue_threshold: float = 0.2,
             strength: float = 1.0, star_mask=None) -> SirilImage:
    import jax.numpy as jnp

    if img.nchans != 3:
        raise ValueError("unpurple requires RGB")
    d = img.device()
    r, g, b = d[0], d[1], d[2]
    # purple fringe: blue strongly exceeding green near bright areas
    fringe = (b > g + blue_threshold) & (r > g * 0.8)
    if star_mask is not None:
        fringe = fringe & jnp.asarray(star_mask, bool)
    b2 = jnp.where(fringe, g + (b - g) * (1.0 - strength), b)
    out = jnp.stack([r, g, b2])
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history("Unpurple")
    return res


# ---------------------------------------------------------------------------
# ddp + simple threshold family (command surface helpers)
# ---------------------------------------------------------------------------


def ddp(img: SirilImage, level: float, coef: float, sigma: float) -> SirilImage:
    """ddp (proto.h:181): out = coef · I / (I_blur + level)."""
    import jax.numpy as jnp

    d = img.device()
    blur = gaussian_blur_chw(d, sigma) if sigma > 0 else d
    out = jnp.clip(coef * d / (blur + level), 0.0, 1.0)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history(f"DDP (level={level:.4f}, coef={coef:.2f})")
    return res


def threshlo(img: SirilImage, level: float) -> SirilImage:
    out = np.maximum(img.host(), np.float32(level))
    r = img.copy(data=out)
    r.log_history(f"threshlo {level}")
    return r


def threshhi(img: SirilImage, level: float) -> SirilImage:
    out = np.minimum(img.host(), np.float32(level))
    r = img.copy(data=out)
    r.log_history(f"threshhi {level}")
    return r


def thresh(img: SirilImage, lo: float, hi: float) -> SirilImage:
    out = np.clip(img.host(), np.float32(lo), np.float32(hi))
    r = img.copy(data=out)
    r.log_history(f"thresh {lo} {hi}")
    return r


def nozero(img: SirilImage, level: float) -> SirilImage:
    d = img.host()
    out = np.where(d == 0.0, np.float32(level), d)
    r = img.copy(data=out)
    r.log_history(f"nozero {level}")
    return r


def fill(img: SirilImage, level: float, area=None) -> SirilImage:
    d = img.host().copy()
    if area is None:
        d[:] = level
    else:
        x, y, w, h = area
        d[:, y:y + h, x:x + w] = level
    r = img.copy(data=d)
    return r
