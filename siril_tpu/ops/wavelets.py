"""À-trous wavelet transform — equivalent of ``src/algos/pave.c`` (B-spline
/ linear pyramid, pave.c:134,185), ``transform.c``/``reconstr.c``
(wavelet/wrecons commands) and ``wavelet_denoise.c`` (layer thresholding,
Anscombe VST in anscombe.c).

The à-trous transform is a stack of dilated separable convolutions —
each scale is one XLA conv with holes 2^i; the whole pyramid stays on
device.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np

from siril_tpu.utils.fetch import fetch_np
from siril_tpu.core.image import SirilImage

WAVELET_LINEAR = 1      # kernel 1/4 1/2 1/4
WAVELET_BSPLINE = 2     # kernel 1/16 1/4 3/8 1/4 1/16

_KERNELS = {
    WAVELET_LINEAR: np.array([0.25, 0.5, 0.25], np.float32),
    WAVELET_BSPLINE: np.array([1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16],
                              np.float32),
}


def _atrous_smooth(x, ktype: int, scale: int):
    """One smoothing step with kernel dilated by 2^scale (separable)."""
    import jax.numpy as jnp
    from jax import lax

    k = _KERNELS[ktype]
    dil = 1 << scale
    r = (len(k) // 2) * dil
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="edge")
    kx = jnp.asarray(k).reshape(1, 1, 1, -1)
    ky = jnp.asarray(k).reshape(1, 1, -1, 1)
    y = lax.conv_general_dilated(xp[:, None], kx, (1, 1), "VALID",
                                 rhs_dilation=(1, dil))
    y = lax.conv_general_dilated(y, ky, (1, 1), "VALID",
                                 rhs_dilation=(dil, 1))
    return y[:, 0]


def atrous_decompose(data, nb_layers: int,
                     ktype: int = WAVELET_BSPLINE) -> List:
    """(C,H,W) → [w0, w1, …, w_{n-1}, residual] detail planes + residual."""
    import jax.numpy as jnp

    x = jnp.asarray(data, jnp.float32)
    planes = []
    cur = x
    for s in range(nb_layers):
        sm = _atrous_smooth(cur, ktype, s)
        planes.append(cur - sm)
        cur = sm
    planes.append(cur)
    return planes


def atrous_reconstruct(planes: Sequence, coeffs: Optional[Sequence[float]] = None):
    """Σ coeff_i · w_i + residual (wrecons)."""
    import jax.numpy as jnp

    n = len(planes) - 1
    if coeffs is None:
        coeffs = [1.0] * n
    out = planes[-1]
    for i in range(n):
        c = coeffs[i] if i < len(coeffs) else 1.0
        out = out + c * planes[i]
    return out


def wavelet_transform(img: SirilImage, nb_layers: int,
                      ktype: int = WAVELET_BSPLINE):
    """`wavelet` command: returns the plane list (stored by the caller for
    a later `wrecons` — replaces the reference's .wave temp files)."""
    return atrous_decompose(img.device(), nb_layers, ktype)


def wavelet_reconstruct(img: SirilImage, planes,
                        coeffs: Sequence[float]) -> SirilImage:
    import jax.numpy as jnp

    out = jnp.clip(atrous_reconstruct(planes, coeffs), 0.0, 1.0)
    res = img.copy(data=np.asarray(out, np.float32))
    res.log_history(f"Wavelet reconstruction {list(coeffs)}")
    return res


# ---------------------------------------------------------------------------
# Anscombe VST (algos/anscombe.c)
# ---------------------------------------------------------------------------


def anscombe(x):
    import jax.numpy as jnp

    return 2.0 * jnp.sqrt(jnp.maximum(x + 3.0 / 8.0, 0.0))


def anscombe_inverse_exact(y):
    """Closed-form unbiased inverse (Makitalo & Foi approximation)."""
    import jax.numpy as jnp

    y = jnp.maximum(y, 1e-6)
    return (0.25 * y * y + 0.25 * math.sqrt(1.5) / y
            - 11.0 / 8.0 / (y * y)
            + 5.0 / 8.0 * math.sqrt(1.5) / (y * y * y) - 1.0 / 8.0)


# ---------------------------------------------------------------------------
# wavelet denoise (filters/wavelet_denoise.c)
# ---------------------------------------------------------------------------


def wavelet_denoise(img: SirilImage, nb_layers: int = 4,
                    thresholds: Optional[Sequence[float]] = None,
                    mode: str = "soft", use_vst: bool = False,
                    ktype: int = WAVELET_BSPLINE) -> SirilImage:
    """Per-layer coefficient thresholding.

    threshold_i defaults to k·sigma_i where sigma_i is the robust noise
    of detail plane i (MAD/0.6745) — the reference's auto thresholds.
    ``mode``: soft | hard | bishrink(approx: bivariate shrink using the
    parent plane).
    """
    import jax.numpy as jnp

    d = img.device()
    if use_vst:
        d = anscombe(d)
    planes = atrous_decompose(d, nb_layers, ktype)
    out_planes = []
    for i in range(nb_layers):
        w = planes[i]
        med = jnp.median(jnp.abs(w))
        sigma = med / 0.6745
        t = (thresholds[i] if thresholds and i < len(thresholds)
             else 3.0 * sigma / (1 << i))
        if mode == "hard":
            w2 = jnp.where(jnp.abs(w) > t, w, 0.0)
        elif mode == "bishrink" and i + 1 < nb_layers:
            parent = planes[i + 1]
            mag = jnp.sqrt(w * w + parent * parent)
            shrink = jnp.maximum(mag - t, 0.0) / jnp.maximum(mag, 1e-9)
            w2 = w * shrink
        else:  # soft
            w2 = jnp.sign(w) * jnp.maximum(jnp.abs(w) - t, 0.0)
        out_planes.append(w2)
    out_planes.append(planes[-1])
    out = atrous_reconstruct(out_planes)
    if use_vst:
        out = anscombe_inverse_exact(out)
    out = jnp.clip(out, 0.0, 1.0)
    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history(f"Wavelet denoise ({mode}, {nb_layers} layers)")
    return res
