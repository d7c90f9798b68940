"""DA3D — data-adaptive dual-domain denoising refinement
(reference ``src/filters/da3d/DA3D.cpp``; runs after NL-Bayes, denoise
``-da3d`` flag, call_nlbayes.cpp:183).

Faithful vectorized re-formulation of the per-patch math (DA3D.cpp
lines 5–30), batched over a half-overlapping patch grid:

  1. regression plane: k_reg-weighted LSQ of y against (row−r, col−r)
  2. plane subtracted from y and g
  3. bilateral weights k = exp(−(g−g_c)²/(γ_r σ²) − d²/(2 σ_s²))
  4. ModifyPatch: m = k·y + (1−k)·ȳ_w  (ȳ_w = k-weighted average)
  5. FFT shrinkage GUIDED by the guide spectrum:
     K = exp(−0.8 σ_f² / |G_f|²), σ_f² = σ²·Σk²  (DC untouched)
  6. aggregate (m̂ − (1−k)·ȳ_w + plane·k)·k with weights k²

Deviation from the reference (documented): patch centers live on a
regular stride-s/2 grid processed in one batched pass instead of the
greedy minimum-aggregated-weight selection loop — the sequential
selection exists to *skip* already-covered pixels on a CPU; the dense
grid covers every pixel ≥4× and vectorizes onto the TPU (batched 2D
FFTs + elementwise VPU work).  Defaults r=31 (s=64), σ_s=14, γ_r=0.7
match DA3D.hpp:15-17.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=8)
def _da3d_fn(s: int, r: int, gamma_r: float, sigma_s: float):
    import jax
    import jax.numpy as jnp

    # integer center index r, coords (row−r, col−r) — DA3D.cpp lines 15/25
    d = np.arange(s, dtype=np.float32) - r
    dist2 = (d[:, None] ** 2 + d[None, :] ** 2)
    spatial = jnp.asarray(dist2)
    coord_r = jnp.asarray(np.broadcast_to(d[:, None], (s, s)).copy())
    coord_c = jnp.asarray(np.broadcast_to(d[None, :], (s, s)).copy())

    @jax.jit
    def run(py, pg, sigma):
        """py/pg: (P, s, s) noisy/guide patches → (P, s, s) refined
        contributions and (P, s, s) k² weights."""
        sigma2 = sigma * sigma
        g_c = pg[:, r, r][:, None, None]

        def bilateral(g, grs2, ss2):
            return jnp.exp(-((g - g_c) ** 2) / grs2
                           - spatial[None] / (2.0 * ss2))

        # regression plane (lines 8-9): weighted LSQ y ~ a·dr + b·dc
        k_reg = bilateral(pg, 10.0 * gamma_r * sigma2,
                          2.0 * sigma_s * sigma_s)
        sw = k_reg.sum(axis=(1, 2), keepdims=True)
        # center the coordinates under the weights for a clean solve
        swr = (k_reg * coord_r).sum(axis=(1, 2), keepdims=True) / sw
        swc = (k_reg * coord_c).sum(axis=(1, 2), keepdims=True) / sw
        cr = coord_r - swr
        cc = coord_c - swc
        ybar = (k_reg * py).sum(axis=(1, 2), keepdims=True) / sw
        yc = py - ybar
        srr = (k_reg * cr * cr).sum(axis=(1, 2), keepdims=True)
        scc = (k_reg * cc * cc).sum(axis=(1, 2), keepdims=True)
        src = (k_reg * cr * cc).sum(axis=(1, 2), keepdims=True)
        syr = (k_reg * yc * cr).sum(axis=(1, 2), keepdims=True)
        syc = (k_reg * yc * cc).sum(axis=(1, 2), keepdims=True)
        det = srr * scc - src * src
        # degenerate weight support (k_reg ≈ delta) → no plane; an
        # ill-conditioned solve would explode a/b at image edges
        ok = det > 1e-6 * jnp.maximum(srr * scc, 1e-12)
        safe = jnp.where(ok, det, 1.0)
        a = jnp.where(ok, (syr * scc - syc * src) / safe, 0.0)
        b = jnp.where(ok, (syc * srr - syr * src) / safe, 0.0)
        plane = a * coord_r[None] + b * coord_c[None]
        y = py - plane                         # line 10
        g = pg - plane                         # line 11

        k = bilateral(g, gamma_r * sigma2, sigma_s * sigma_s)  # line 12
        ksum = k.sum(axis=(1, 2), keepdims=True)
        yt = (k * y).sum(axis=(1, 2), keepdims=True) / jnp.maximum(ksum, 1e-12)
        gt = (k * g).sum(axis=(1, 2), keepdims=True) / jnp.maximum(ksum, 1e-12)
        m_y = k * y + (1.0 - k) * yt           # ModifyPatch (line 18)
        m_g = k * g + (1.0 - k) * gt           # line 19

        yf = jnp.fft.fft2(m_y)                 # line 20
        gf = jnp.fft.fft2(m_g)                 # line 21
        sigma_f2 = sigma2 * (k * k).sum(axis=(1, 2), keepdims=True)  # l.22
        x = (jnp.abs(gf) ** 2) / jnp.maximum(sigma_f2, 1e-30)
        shrink = jnp.exp(-0.8 / jnp.maximum(x, 1e-30))    # line 23
        shrink = shrink.at[:, 0, 0].set(1.0)              # DC untouched
        y_hat = jnp.real(jnp.fft.ifft2(yf * shrink))      # line 24

        contrib = (y_hat - (1.0 - k) * yt + plane * k) * k  # lines 25-30
        return contrib, k * k

    return run


def da3d(noisy: np.ndarray, guide: np.ndarray, sigma: float,
         r: int = 31, sigma_s: float = 14.0, gamma_r: float = 0.7
         ) -> np.ndarray:
    """Refine ``guide`` (first-stage denoise of ``noisy``) — one channel
    (H, W) at a time; returns the refined image."""
    import jax.numpy as jnp

    s = 1
    while s < 2 * r + 1:
        s *= 2
    h, w = noisy.shape
    stride = s // 2
    pad = s                               # margin so every pixel is interior
    ypad = np.pad(noisy, pad, mode="reflect")
    gpad = np.pad(guide, pad, mode="reflect")
    hp, wp = ypad.shape
    rows = np.arange(0, hp - s + 1, stride)
    cols = np.arange(0, wp - s + 1, stride)

    # gather patches (host; the heavy math runs jitted on device)
    def patches(img):
        out = np.empty((len(rows) * len(cols), s, s), np.float32)
        i = 0
        for r0 in rows:
            for c0 in cols:
                out[i] = img[r0:r0 + s, c0:c0 + s]
                i += 1
        return out

    py = patches(ypad)
    pg = patches(gpad)
    contrib, wgt = _da3d_fn(s, int(r), float(gamma_r), float(sigma_s))(
        jnp.asarray(py), jnp.asarray(pg), jnp.float32(sigma))
    contrib = np.asarray(contrib)
    wgt = np.asarray(wgt)

    acc = np.zeros((hp, wp), np.float64)
    wacc = np.zeros((hp, wp), np.float64)
    i = 0
    for r0 in rows:
        for c0 in cols:
            acc[r0:r0 + s, c0:c0 + s] += contrib[i]
            wacc[r0:r0 + s, c0:c0 + s] += wgt[i]
            i += 1
    out = np.where(wacc > 1e-6, acc / np.maximum(wacc, 1e-6), gpad)
    return out[pad:pad + h, pad:pad + w].astype(np.float32)


def da3d_image(noisy: np.ndarray, guide: np.ndarray,
               sigma: float, **kw) -> np.ndarray:
    """(C, H, W) wrapper."""
    return np.stack([da3d(noisy[c], guide[c], sigma, **kw)
                     for c in range(noisy.shape[0])])
