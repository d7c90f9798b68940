"""NL-Bayes patch denoiser — TPU-native equivalent of the reference's
``src/filters/nlbayes/`` (C++ NL-Bayes, with Anscombe VST and SOS
boosting options of the `denoise` command, ``command.c``).

Design (not a port): the serial C++ per-patch loops become one batched
pipeline that XLA maps onto the MXU:

1. unfold the image into all k×k patches              [Np, k²]
2. for each stride-s reference patch, gather its search-window
   candidates and compute L2 distances as one matmul   [Nr, W²]
3. ``lax.top_k`` the M most-similar patches → groups   [Nr, M, k²]
4. per-group Gaussian model: mean + covariance (batched outer products),
   Wiener shrinkage  C·(C+σ²I)⁻¹·(p−μ)+μ via batched ``solve``
5. scatter-average the filtered patches back (aggregation)

Two iterations as in NL-Bayes: the second pass reuses the basic estimate
for grouping/statistics and filters the noisy patches.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import numpy as np

from siril_tpu.core.image import SirilImage


def _jnp():
    import jax.numpy as jnp

    return jnp


def estimate_noise_sigma(layer: np.ndarray) -> float:
    """Robust noise σ from the MAD of the Laplacian residual."""
    d = np.asarray(layer, np.float32)
    lap = (4 * d[1:-1, 1:-1] - d[:-2, 1:-1] - d[2:, 1:-1]
           - d[1:-1, :-2] - d[1:-1, 2:])
    mad = np.median(np.abs(lap - np.median(lap)))
    return float(1.4826 * mad / math.sqrt(20.0))


def _unfold(x, k):
    """[H,W] → [(H-k+1)·(W-k+1), k²] patch matrix."""
    import jax.numpy as jnp

    H, W = x.shape
    rows = []
    for dy in range(k):
        for dx in range(k):
            rows.append(x[dy:H - k + 1 + dy, dx:W - k + 1 + dx])
    return jnp.stack(rows, axis=-1).reshape(-1, k * k)


def _nlb_pass(noisy, guide, sigma, k, M, search, stride,
              guide_is_noisy=True):
    """One NL-Bayes pass.  ``guide`` drives grouping + statistics
    (pass 1: the noisy image — its covariance contains the noise, so the
    signal covariance is C−σ²I; pass 2: the basic estimate — covariance
    is the signal model and the Wiener denominator adds σ²I)."""
    import jax
    import jax.numpy as jnp

    H, W = noisy.shape
    hp, wp = H - k + 1, W - k + 1              # patch grid
    P_noisy = _unfold(noisy, k)                # [Np, k²]
    P_guide = _unfold(guide, k)

    # reference patch grid (stride-s), clamped inside the patch grid
    ry = jnp.arange(0, hp, stride)
    rx = jnp.arange(0, wp, stride)
    gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
    ref_y = gy.reshape(-1)
    ref_x = gx.reshape(-1)
    Nr = ref_y.shape[0]

    # search-window candidate offsets
    half = search // 2
    offs = jnp.arange(-half, half + 1)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    oy = oy.reshape(-1)
    ox = ox.reshape(-1)

    cy = jnp.clip(ref_y[:, None] + oy[None, :], 0, hp - 1)   # [Nr, W²]
    cx = jnp.clip(ref_x[:, None] + ox[None, :], 0, wp - 1)
    cand = cy * wp + cx                                       # [Nr, W²]

    g_ref = P_guide[ref_y * wp + ref_x]                       # [Nr, k²]
    g_cand = P_guide[cand]                                    # [Nr, W², k²]
    # L2 distances via the expanded form — the cross term is one matmul
    d2 = (jnp.sum(g_cand * g_cand, -1)
          - 2.0 * jnp.einsum("nwk,nk->nw", g_cand, g_ref)
          + jnp.sum(g_ref * g_ref, -1)[:, None])
    _, top = jax.lax.top_k(-d2, M)                            # [Nr, M]
    sel = jnp.take_along_axis(cand, top, axis=1)              # [Nr, M]

    Gg = P_guide[sel]                                         # [Nr, M, k²]
    Gn = P_noisy[sel]
    mu = Gg.mean(axis=1, keepdims=True)                       # [Nr, 1, k²]
    Xc = Gg - mu
    C = jnp.einsum("nmi,nmj->nij", Xc, Xc) / jnp.maximum(M - 1, 1)
    s2 = sigma * sigma
    eye = jnp.eye(k * k)[None]
    if guide_is_noisy:
        A = C + 1e-8 * eye              # observed covariance (has noise)
        Cs = C - s2 * eye               # signal covariance estimate
    else:
        A = C + s2 * eye
        Cs = C
    # Wiener: est = μ + Cs·A⁻¹·(noisy − μ)   (solve, not inverse)
    rhs = (Gn - mu).swapaxes(1, 2)                            # [Nr, k², M]
    flt = (mu.swapaxes(1, 2)
           + jnp.matmul(Cs, jnp.linalg.solve(A, rhs))).swapaxes(1, 2)

    # aggregation: scatter-average every filtered patch back
    out = jnp.zeros((H, W))
    wgt = jnp.zeros((H, W))
    py = sel // wp                                            # [Nr, M]
    px = sel % wp
    ones = jnp.ones(flt.shape[:2])
    for dy in range(k):
        for dx in range(k):
            v = flt[:, :, dy * k + dx]
            out = out.at[py + dy, px + dx].add(v)
            wgt = wgt.at[py + dy, px + dx].add(ones)
    return jnp.where(wgt > 0, out / jnp.maximum(wgt, 1e-9), noisy)


def nlbayes_denoise(img: SirilImage, sigma: Optional[float] = None,
                    k: int = 5, M: int = 24, search: int = 13,
                    stride: int = 3, use_vst: bool = False,
                    sos_iters: int = 0, sos_rho: float = 0.3) -> SirilImage:
    """Full `denoise` command pipeline: optional Anscombe VST →
    two-pass NL-Bayes → optional SOS boosting → inverse VST."""
    import jax
    import jax.numpy as jnp

    from siril_tpu.ops.wavelets import anscombe, anscombe_inverse_exact

    data = img.host().astype(np.float32)
    out = np.empty_like(data)

    @jax.jit
    def run(chan, s):
        x = chan
        if use_vst:
            x = anscombe(x * 400.0) / 40.0   # scale into Poisson-ish range
        basic = _nlb_pass(x, x, s, k, M, search, stride,
                          guide_is_noisy=True)
        second = _nlb_pass(x, basic, s, k, M, search, stride,
                           guide_is_noisy=False)
        y = second
        for _ in range(sos_iters):
            # SOS boosting (Romano & Elad): strengthen the signal with the
            # previous estimate, operate, subtract it back
            z = x + sos_rho * y
            y = (_nlb_pass(z, z, s, k, M, search, stride,
                           guide_is_noisy=True) - sos_rho * y)
        if use_vst:
            y = anscombe_inverse_exact(y * 40.0) / 400.0
        return jnp.clip(y, 0.0, 1.0)

    for c in range(data.shape[0]):
        s = sigma if sigma is not None else estimate_noise_sigma(data[c])
        out[c] = np.asarray(run(jnp.asarray(data[c]), float(s)),
                            np.float32)
    res = img.copy(data=np.asarray(img.apply_mask_blend(
        _jnp().asarray(out))))
    res.log_history(f"NL-Bayes denoise (sigma={'auto' if sigma is None else sigma}"
                    f"{', VST' if use_vst else ''}"
                    f"{f', SOS x{sos_iters}' if sos_iters else ''})")
    return res
