"""Blind PSF estimation — ``makepsf blind [-l0|-si]``
(reference ``src/core/command_list.h:117-122`` flag surface; engines in
``src/filters/deconvolution/estimate_kernel.hpp`` (ℓ0 descent,
Pan et al. style) and ``gf_estimate.cpp`` / ``phaseRetrieval.cpp``
(Goldstein–Fattal spectral irregularities)).

TPU-native formulations, all FFT-based jitted iterations:

**ℓ0 descent** (``estimate_kernel_l0``, the -l0 default): alternate
  1. latent-image update: ℓ0-gradient-regularized deconvolution by
     half-quadratic splitting — hard-threshold the gradient field at
     λ/β, FFT quadratic solve, anneal β ×2 until 1e5
     (estimate_kernel.hpp:118-190 semantics);
  2. kernel update: least squares in the gradient domain
     k̂ = Σ conj(F∂u)·F∂v / (Σ|F∂u|² + γ), crop center, clamp ≥ 0,
     threshold at a fraction of max, keep the dominant connected
     component, re-center by centroid, normalize to 1
     (estimate_kernel.hpp:217-300 semantics);
  with λ decaying per outer iteration; optional coarse-to-fine
  multiscale pyramid (-multiscale).

**Spectral irregularities** (``estimate_kernel_si``, -si): the kernel
  power spectrum is estimated from the whitened blurred image — for
  natural images, |F(∂v)|² ≈ |F(k)|²·c (image gradients are ~white),
  so averaging windowed gradient periodograms and subtracting the
  noise floor yields |F(k)|²; the kernel support radius comes from the
  whitened autocorrelation; the kernel itself is recovered from the
  magnitude by Fienup hybrid input–output / error-reduction phase
  retrieval with support + nonnegativity constraints, multiple random
  restarts, best candidate picked by the ℓ½ gradient-sparsity of the
  deconvolved high-variance patch (the reference's evaluation
  criterion).  This is a re-derivation of the published method's core
  (the reference additionally refines per-angle shear projections).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _grey(img: np.ndarray) -> np.ndarray:
    """(C,H,W) or (H,W) → grey (H,W), normalized to [0,1]."""
    a = np.asarray(img, np.float32)
    if a.ndim == 3:
        a = a.mean(axis=0)
    lo, hi = float(a.min()), float(a.max())
    if hi > lo:
        a = (a - lo) / (hi - lo)
    return a


def _psf2otf_np(k: np.ndarray, shape) -> np.ndarray:
    h, w = shape
    kh, kw = k.shape
    pad = np.zeros(shape, np.float32)
    pad[:kh, :kw] = k
    pad = np.roll(pad, (-(kh // 2), -(kw // 2)), axis=(0, 1))
    return np.fft.fft2(pad)


def _kernel_cleanup(k: np.ndarray, threshold_max: float = 0.02) -> np.ndarray:
    """Positivity, max-threshold, dominant connected component, centroid
    re-centering, sum normalization (estimate_kernel.hpp:260-300)."""
    k = np.maximum(k, 0.0)
    if k.max() <= 0:
        out = np.zeros_like(k)
        out[k.shape[0] // 2, k.shape[1] // 2] = 1.0
        return out
    k = np.where(k < k.max() * threshold_max, 0.0, k)
    # dominant 8-connected component (flood fill from the max)
    lab = _connected_components(k > 0)
    if lab.max() > 0:
        best = np.argmax([k[lab == i].sum() for i in range(1, lab.max() + 1)]) + 1
        k = np.where(lab == best, k, 0.0)
    # centroid re-center via integer roll
    tot = k.sum()
    if tot > 0:
        ys, xs = np.mgrid[0:k.shape[0], 0:k.shape[1]]
        cy = (ys * k).sum() / tot
        cx = (xs * k).sum() / tot
        k = np.roll(k, (int(round(k.shape[0] / 2 - cy - 0.5)),
                        int(round(k.shape[1] / 2 - cx - 0.5))), axis=(0, 1))
        k = k / k.sum()
    return k.astype(np.float32)


def _connected_components(mask: np.ndarray) -> np.ndarray:
    """Tiny 8-connected labeling (kernel-sized inputs only)."""
    lab = np.zeros(mask.shape, np.int32)
    cur = 0
    for y in range(mask.shape[0]):
        for x in range(mask.shape[1]):
            if mask[y, x] and lab[y, x] == 0:
                cur += 1
                stack = [(y, x)]
                lab[y, x] = cur
                while stack:
                    yy, xx = stack.pop()
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            ny, nx = yy + dy, xx + dx
                            if (0 <= ny < mask.shape[0]
                                    and 0 <= nx < mask.shape[1]
                                    and mask[ny, nx] and lab[ny, nx] == 0):
                                lab[ny, nx] = cur
                                stack.append((ny, nx))
    return lab


# ---------------------------------------------------------------------------
# ℓ0 descent (BLIND_L0)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _l0_fns(h: int, w: int, ks: int):
    import jax
    import jax.numpy as jnp

    # derivative OTFs (forward differences, circular)
    dx = np.zeros((h, w), np.float32); dx[0, 0] = -1; dx[0, 1] = 1
    dy = np.zeros((h, w), np.float32); dy[0, 0] = -1; dy[1, 0] = 1
    fdx = jnp.asarray(np.fft.fft2(dx))
    fdy = jnp.asarray(np.fft.fft2(dy))
    dtd = jnp.abs(fdx) ** 2 + jnp.abs(fdy) ** 2

    @jax.jit
    def u_update(v, k_otf, lam, beta_init):
        """ℓ0 half-quadratic latent update (Algorithm 2)."""
        fv = jnp.fft.fft2(v)
        ktf = jnp.conj(k_otf) * fv
        ktk = jnp.abs(k_otf) ** 2

        def body(state):
            u, beta = state
            gx = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(u) * fdx))
            gy = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(u) * fdy))
            n2 = gx * gx + gy * gy
            keep = n2 >= lam / beta
            gx = jnp.where(keep, gx, 0.0)
            gy = jnp.where(keep, gy, 0.0)
            adj = jnp.fft.fft2(gx) * jnp.conj(fdx) + \
                jnp.fft.fft2(gy) * jnp.conj(fdy)
            num = ktf + beta * adj
            u2 = jnp.real(jnp.fft.ifft2(num / (ktk + beta * dtd)))
            return u2, beta * 2.0

        def cond(state):
            return state[1] < 1e5

        u, _ = jax.lax.while_loop(cond, body, (v, jnp.float32(beta_init)))
        return u

    @jax.jit
    def k_update(u, v, gamma):
        """Gradient-domain kernel least squares (Algorithm 3)."""
        fu = jnp.fft.fft2(u)
        fv = jnp.fft.fft2(v)
        fgux, fguy = fu * fdx, fu * fdy
        fgvx, fgvy = fv * fdx, fv * fdy
        num = jnp.conj(fgux) * fgvx + jnp.conj(fguy) * fgvy
        den = jnp.abs(fgux) ** 2 + jnp.abs(fguy) ** 2 + gamma
        otf = jnp.real(jnp.fft.ifft2(num / den))
        otf = jnp.fft.fftshift(otf)
        top = h // 2 - ks // 2
        left = w // 2 - ks // 2
        return jax.lax.dynamic_slice(otf, (top, left), (ks, ks))

    return u_update, k_update


def estimate_kernel_l0(image: np.ndarray, ks: int = 15,
                       lam: float = 1e-3, lam_ratio: float = 0.7,
                       lam_min: float = 1e-4, gamma: float = 20.0,
                       iterations: int = 10, multiscale: bool = False,
                       patch: int = 256) -> np.ndarray:
    """ℓ0-descent blind kernel estimation (BLIND_L0,
    deconvolution.c:131/375)."""
    import jax.numpy as jnp

    if ks % 2 == 0:
        ks += 1
    v_full = _grey(image)
    v = _best_patch(v_full, min(patch, min(v_full.shape)))

    scales = [(v, ks)]
    if multiscale:
        sf = 0.5
        vv, kss = v, ks
        while min(vv.shape) * sf > 64 and int(kss * sf) >= 3:
            vv = vv[::2, ::2]
            kss = int(kss * sf)
            kss += (kss + 1) % 2
            scales.append((vv, kss))
    scales = scales[::-1]

    k = None
    u = None
    for si_, (vs, kss) in enumerate(scales):
        h, w = vs.shape
        u_update, k_update = _l0_fns(h, w, kss)
        if u is None or u.shape != vs.shape:
            u = vs
        lam_s = lam
        k_np = np.asarray(k_update(jnp.asarray(u), jnp.asarray(vs), gamma))
        k = _kernel_cleanup(k_np)
        for i in range(iterations):
            k_otf = jnp.asarray(_psf2otf_np(k, (h, w)))
            u = np.asarray(u_update(jnp.asarray(vs), k_otf,
                                    jnp.float32(lam_s),
                                    jnp.float32(2.0 * lam_s)))
            k_np = np.asarray(k_update(jnp.asarray(u), jnp.asarray(vs),
                                       gamma))
            k = _kernel_cleanup(k_np)
            lam_s = max(lam_s * lam_ratio, lam_min)
        if si_ + 1 < len(scales):
            # upsample latent for the next scale (indexing by position:
            # tuple equality against numpy arrays raises under numpy 2)
            u = np.kron(u, np.ones((2, 2), np.float32))
            nh, nw = scales[si_ + 1][0].shape
            u = u[:nh, :nw]
            if u.shape != (nh, nw):
                u = np.pad(u, ((0, nh - u.shape[0]), (0, nw - u.shape[1])),
                           mode="edge")
            # upscale kernel estimate too (re-estimated anyway)
    # resize final kernel to requested ks if multiscale ended smaller
    if k.shape[0] != ks:
        kk = np.zeros((ks, ks), np.float32)
        off = ks // 2 - k.shape[0] // 2
        kk[off:off + k.shape[0], off:off + k.shape[1]] = k
        k = kk / max(kk.sum(), 1e-12)
    return k


def _best_patch(v: np.ndarray, size: int) -> np.ndarray:
    """Deterministic high-variance patch search (searchBlurredPatch
    gf_estimate.cpp:38-66 uses random sampling; a strided grid scan is
    equivalent and reproducible)."""
    h, w = v.shape
    size = min(size, h, w)
    best, by, bx = -1.0, 0, 0
    step = max(1, min(h - size, w - size) // 12) if (h > size and w > size) \
        else 1
    for y in range(0, max(h - size, 1), step):
        for x in range(0, max(w - size, 1), step):
            p = v[y:y + size, x:x + size]
            var = float(p.var())
            if var > best:
                best, by, bx = var, y, x
    return np.ascontiguousarray(v[by:by + size, bx:bx + size])


# ---------------------------------------------------------------------------
# spectral irregularities (BLIND_SI)
# ---------------------------------------------------------------------------


def _kernel_spectrum(v: np.ndarray, ks: int) -> Tuple[np.ndarray, int]:
    """Estimate |F(k)| on a (4ks × 4ks) grid from the whitened-image
    autocorrelation: for gradient-sparse content (astro star fields) the
    gradient autocorrelation ≈ kernel autocorrelation on a pedestal of
    image structure; subtract the pedestal value at the kernel-support
    boundary and clip to 0 (the 2D analog of adjustAutocorrelations'
    'subtract mu_theta and clip', gf_estimate.cpp:115-156), then the
    power spectrum is its Fourier transform."""
    n = 4 * ks
    gx = np.diff(v, axis=1, prepend=v[:, :1])
    gy = np.diff(v, axis=0, prepend=v[:1, :])
    f2 = np.abs(np.fft.fft2(gx)) ** 2 + np.abs(np.fft.fft2(gy)) ** 2
    ac_full = np.real(np.fft.ifft2(f2))
    h, w = v.shape
    d = np.arange(-ks, ks + 1)
    dyy, dxx = np.meshgrid(d, d, indexing="ij")
    ac_win = ac_full[dyy % h, dxx % w]
    # pedestal = mean on the boundary ring max(|dy|,|dx|) == ks
    ring = np.maximum(np.abs(dyy), np.abs(dxx)) == ks
    mu = float(ac_win[ring].mean())
    ac_adj = np.maximum(ac_win - mu, 0.0)
    acs = np.zeros((n, n))
    acs[dyy % n, dxx % n] = ac_adj
    ps = np.maximum(np.real(np.fft.fft2(acs)), 0.0)
    ps /= max(ps[0, 0], 1e-30)          # DC = (Σk)² = 1
    return np.sqrt(ps), n


def _support_radius(v: np.ndarray, ks: int) -> int:
    """Kernel support from the first minimum of the whitened image
    autocorrelation (initialSupportEstimation analog, radial)."""
    gx = np.diff(v, axis=1, prepend=v[:, :1])
    ac = np.real(np.fft.ifft2(np.abs(np.fft.fft2(gx)) ** 2))
    prof = ac[0, :2 * ks].copy()
    prof /= max(prof[0], 1e-30)
    i = 1
    while i < len(prof) - 1 and prof[i + 1] < prof[i]:
        i += 1
    return max(2, min(i, ks // 2 + 1))


@functools.lru_cache(maxsize=8)
def _pr_step_fns(n: int, ks: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(g, mag, support, beta):
        """One HIO iteration with magnitude projection + support/
        nonnegativity object constraint."""
        gf = jnp.fft.fft2(g)
        gf = mag * jnp.exp(1j * jnp.angle(gf))
        g2 = jnp.real(jnp.fft.ifft2(gf))
        good = (g2 >= 0) & support
        return jnp.where(good, g2, g - beta * g2)

    @jax.jit
    def er(g, mag, support):
        gf = jnp.fft.fft2(g)
        gf = mag * jnp.exp(1j * jnp.angle(gf))
        g2 = jnp.real(jnp.fft.ifft2(gf))
        return jnp.where((g2 >= 0) & support, g2, 0.0)

    return step, er


def estimate_kernel_si(image: np.ndarray, ks: int = 15,
                       restarts: int = 6, hio_iters: int = 120,
                       er_iters: int = 40, seed: int = 7,
                       patch: int = 256) -> np.ndarray:
    """Spectral-irregularity blind kernel estimation (BLIND_SI,
    gf_estimate.cpp gf_kernel Algorithm 1 re-derivation)."""
    import jax.numpy as jnp

    if ks % 2 == 0:
        ks += 1
    v = _grey(image)
    vpatch = _best_patch(v, min(patch, min(v.shape)))
    # spectrum/support from the selected PATCH, like the reference's
    # searchBlurredPatch — full-frame complex FFTs at 24 Mpix cost
    # orders of magnitude more for the same estimate
    mag, n = _kernel_spectrum(vpatch, ks)
    rad = _support_radius(vpatch, ks)

    # support mask in the corner (kernel occupies [0:ks, 0:ks] wrapped)
    sup = np.zeros((n, n), bool)
    r = min(max(rad + 2, 3), ks // 2 + 1)
    yy, xx = np.mgrid[0:n, 0:n]
    dy = np.minimum(yy, n - yy)
    dx = np.minimum(xx, n - xx)
    sup[(dy <= r) & (dx <= r)] = True

    step, er = _pr_step_fns(n, ks)
    mag_j = jnp.asarray(mag)
    sup_j = jnp.asarray(sup)
    rng = np.random.default_rng(seed)

    best_k, best_score = None, np.inf
    for t in range(restarts):
        g0 = rng.random((n, n)).astype(np.float32) * sup
        g = jnp.asarray(g0)
        for _ in range(hio_iters):
            g = step(g, mag_j, sup_j, jnp.float32(0.9))
        for _ in range(er_iters):
            g = er(g, mag_j, sup_j)
        kfull = np.asarray(g)
        k = np.fft.fftshift(kfull)[n // 2 - ks // 2: n // 2 + ks // 2 + 1,
                                   n // 2 - ks // 2: n // 2 + ks // 2 + 1]
        for cand in (k, k[::-1, ::-1]):   # autocorrelation flip ambiguity
            ck = _kernel_cleanup(cand.copy(), threshold_max=0.05)
            score = _sparsity_score(vpatch, ck)
            if score < best_score:
                best_score, best_k = score, ck
    return best_k


def _sparsity_score(v: np.ndarray, k: np.ndarray) -> float:
    """ℓ½ gradient sparsity of a quick Wiener deconvolution of the patch
    — the reference's candidate-evaluation criterion (deconvBregman /
    evaluation in gf_estimate)."""
    otf = _psf2otf_np(k, v.shape)
    fv = np.fft.fft2(v)
    x = np.real(np.fft.ifft2(fv * np.conj(otf)
                             / (np.abs(otf) ** 2 + 3e-3)))
    gx = np.diff(x, axis=1)
    gy = np.diff(x, axis=0)
    return float(np.sqrt(np.abs(gx)).sum() + np.sqrt(np.abs(gy)).sum())


def estimate_kernel_blind(image: np.ndarray, ks: int = 15,
                          method: str = "l0", multiscale: bool = False,
                          lam: float = 1e-3,
                          comp: Optional[float] = None) -> np.ndarray:
    """makepsf blind dispatch (-l0 default / -si; -multiscale, -lambda=,
    -comp= accepted — comp scales the SI restart budget like the
    reference's compensation factor trades time for quality)."""
    if method == "si":
        restarts = 6 if comp is None else max(2, int(round(6 * comp)))
        return estimate_kernel_si(image, ks, restarts=restarts)
    return estimate_kernel_l0(image, ks, lam=lam, multiscale=multiscale)
