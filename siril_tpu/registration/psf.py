"""Batched PSF fitting — equivalent of ``src/algos/PSF.c`` (GSL
Levenberg–Marquardt, psf_global_minimisation:900).

Model (PSF.c:356-391): elliptical Gaussian with rotation
    f(i,j) = B + A·exp(−(x'²/Sx + y'²/Sy)),
    x' =  cosα·(j+0.5−x0) − sinα·(i+0.5−y0)
    y' =  sinα·(j+0.5−x0) + cosα·(i+0.5−y0)
and Moffat:  f = B + A·(1 + x'²/Sx + y'²/Sy)^(−β).

FWHM convention (PSF.c): fwhm_x = 2·sqrt(Sx·ln2) px (Gaussian);
for Moffat fwhm_x = 2·sqrt(Sx·(2^(1/β)−1)).  Roundness = fwhm_y/fwhm_x.

TPU-native: one LM optimizer written in JAX, vmapped over a batch of
star patches — hundreds of stars fit in one device call instead of the
reference's per-star GSL loops.  The normal equations are 7×7 (8×8 with
free β) solved with jnp.linalg.solve; Jacobians come from jax.jacfwd of
the model, bounded LM iterations with per-star damping.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import numpy as np

PROFILE_GAUSSIAN = 0
PROFILE_MOFFAT = 1          # free beta
PROFILE_MOFFAT_FIXED = 2

_LN2 = math.log(2.0)


@dataclass
class PSFStar:
    """fwhm_struct equivalent (PSF.h:14-45)."""

    B: float = 0.0
    A: float = 0.0
    x0: float = 0.0        # image coords (px, top-down, pixel-center 0.5)
    y0: float = 0.0
    sx: float = 0.0
    sy: float = 0.0
    fwhmx: float = 0.0
    fwhmy: float = 0.0
    angle: float = 0.0     # degrees
    rmse: float = 1e9
    beta: float = -1.0
    mag: float = 0.0
    snr: float = 0.0
    has_saturated: bool = False
    profile: int = PROFILE_GAUSSIAN

    @property
    def roundness(self) -> float:
        return self.fwhmy / self.fwhmx if self.fwhmx > 0 else 0.0


def _model(params, ii, jj, moffat: bool, beta_fixed: Optional[float]):
    import jax.numpy as jnp

    B, A, x0, y0, lsx, lsy, alpha = params[:7]
    sx = jnp.exp(lsx)
    sy = jnp.exp(lsy)
    ca = jnp.cos(alpha)
    sa = jnp.sin(alpha)
    tx = ca * (jj + 0.5 - x0) - sa * (ii + 0.5 - y0)
    ty = sa * (jj + 0.5 - x0) + ca * (ii + 0.5 - y0)
    d2 = tx * tx / sx + ty * ty / sy
    if moffat:
        beta = beta_fixed if beta_fixed is not None else \
            1.0 + jnp.exp(params[7])     # β > 1
        return B + A * jnp.power(1.0 + d2, -beta)
    return B + A * jnp.exp(-d2)


def fit_psf_batch(patches: np.ndarray, profile: int = PROFILE_GAUSSIAN,
                  fixed_beta: float = 2.0, iters: int = 40):
    """Fit a (K, S, S) batch of star patches.  Returns dict of (K,) arrays:
    B, A, x0, y0 (patch coords), sx, sy, angle(rad), rmse, beta."""
    import jax
    import jax.numpy as jnp

    K, S, _ = patches.shape
    # bucket the batch to a power of two (min 256) so per-frame star
    # counts trigger at most a handful of compiles — the vmapped LM scan
    # is expensive to compile and each batch size is a fresh program
    K2 = 1 << max(int(np.ceil(np.log2(max(K, 1)))), 8)
    if K2 != K:
        if isinstance(patches, np.ndarray):
            pad = np.zeros((K2 - K, S, S), patches.dtype)
            pad[:, S // 2, S // 2] = 1.0    # fitable dummy patches
            patches = np.concatenate([patches, pad])
        else:
            # device-resident input (fetching patches through a slow
            # device→host link costs more than the whole fit): pad on
            # device, never round-trip the pixels
            pad = jnp.zeros((K2 - K, S, S), patches.dtype
                            ).at[:, S // 2, S // 2].set(1.0)
            patches = jnp.concatenate([patches, pad])
    moffat = profile in (PROFILE_MOFFAT, PROFILE_MOFFAT_FIXED)
    free_beta = profile == PROFILE_MOFFAT
    beta_fixed = None if free_beta else (fixed_beta if moffat else None)

    fit = _get_fitter(S, moffat, free_beta, beta_fixed, fixed_beta, iters)
    packed = np.asarray(fit(jnp.asarray(patches, jnp.float32)))  # 1 fetch
    return fit_dict_from_packed(packed[:K], profile, fixed_beta)


def fit_dict_from_packed(packed: np.ndarray, profile: int,
                         fixed_beta: float = 2.0) -> dict:
    """Decode packed [K, npar+1] LM-fit rows (params + rmse, the on-wire
    layout of ``_get_fitter``) into the fit dict of fit_psf_batch."""
    moffat = profile in (PROFILE_MOFFAT, PROFILE_MOFFAT_FIXED)
    free_beta = profile == PROFILE_MOFFAT
    npar = 8 if free_beta else 7
    K = packed.shape[0]
    params = packed[:, :npar]
    rmse = packed[:, npar]
    out = {
        "B": params[:, 0],
        "A": params[:, 1],
        "x0": params[:, 2],
        "y0": params[:, 3],
        "sx": np.exp(np.clip(params[:, 4], -20, 20)),
        "sy": np.exp(np.clip(params[:, 5], -20, 20)),
        "angle": params[:, 6],
        "rmse": rmse,
    }
    if free_beta:
        out["beta"] = 1.0 + np.exp(params[:, 7])
    elif moffat:
        out["beta"] = np.full(K, fixed_beta)
    else:
        out["beta"] = np.full(K, -1.0)
    return out


from functools import lru_cache


@lru_cache(maxsize=16)
def _get_fitter(S: int, moffat: bool, free_beta: bool, beta_fixed,
                fixed_beta: float, iters: int):
    """Cached jitted vmapped LM fitter for one patch/profile config."""
    import jax
    import jax.numpy as jnp

    npar = 8 if free_beta else 7
    ii, jj = np.mgrid[0:S, 0:S].astype(np.float32)

    def residual(params, y):
        m = _model(params, ii, jj, moffat, beta_fixed)
        return (m - y).ravel()

    jac = jax.jacfwd(residual)

    def init_params(y):
        B0 = jnp.percentile(y, 10.0)
        A0 = jnp.maximum(y.max() - B0, 1e-5)
        w = jnp.maximum(y - B0, 0.0)
        tot = jnp.maximum(w.sum(), 1e-9)
        cy = (w * ii).sum() / tot
        cx = (w * jj).sum() / tot
        vy = jnp.maximum((w * (ii - cy) ** 2).sum() / tot, 0.25)
        vx = jnp.maximum((w * (jj - cx) ** 2).sum() / tot, 0.25)
        base = [B0, A0, cx, cy, jnp.log(2.0 * vx), jnp.log(2.0 * vy),
                jnp.zeros(())]
        if free_beta:
            base.append(jnp.full((), np.log(max(fixed_beta - 1.0, 0.1))))
        return jnp.stack([jnp.asarray(b, jnp.float32) for b in base])

    def fit_one(y):
        p0 = init_params(y)

        def body(state, _):
            p, lam, best_p, best_cost = state
            r = residual(p, y)
            J = jac(p, y)
            g = J.T @ r
            H = J.T @ J
            Hd = H + lam * jnp.eye(npar) * jnp.maximum(jnp.diag(H), 1e-8)
            step = jnp.linalg.solve(Hd, g)
            p_new = p - step
            r_new = residual(p_new, y)
            c_old = (r * r).sum()
            c_new = (r_new * r_new).sum()
            improved = (c_new < c_old) & jnp.isfinite(c_new)
            p_next = jnp.where(improved, p_new, p)
            lam_next = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-7),
                                 jnp.minimum(lam * 4.0, 1e6))
            better = c_new < best_cost
            best_p = jnp.where(better, p_new, best_p)
            best_cost = jnp.where(better, c_new, best_cost)
            return (p_next, lam_next, best_p, best_cost), None

        r0 = residual(p0, y)
        state0 = (p0, jnp.float32(1e-2), p0, (r0 * r0).sum())
        (_, _, best_p, best_cost), _ = jax.lax.scan(body, state0,
                                                    None, length=iters)
        rmse = jnp.sqrt(best_cost / (S * S))
        # pack params+rmse into one row: the caller fetches ONE array
        # (each device->host fetch costs ~1-2 s of latency through the
        # axon tunnel, so two fetches per fit call doubled the bill)
        return jnp.concatenate([best_p, rmse[None]])

    return jax.jit(jax.vmap(fit_one))


def fwhm_from_s(s: np.ndarray, beta: np.ndarray) -> np.ndarray:
    """S → FWHM (PSF.c conventions)."""
    g = 2.0 * np.sqrt(np.maximum(s, 0.0) * _LN2)
    with np.errstate(invalid="ignore"):
        m = 2.0 * np.sqrt(np.maximum(s, 0.0) *
                          (np.power(2.0, 1.0 / np.maximum(beta, 1.01)) - 1.0))
    return np.where(beta > 0, m, g)


def stars_from_fit(fit: dict, xs: np.ndarray, ys: np.ndarray,
                   box: int, profile: int = PROFILE_GAUSSIAN):
    """Convert batch-fit outputs + patch origins → list of PSFStar
    (image coordinates)."""
    k = len(fit["A"])
    fx = fwhm_from_s(fit["sx"], fit["beta"])
    fy = fwhm_from_s(fit["sy"], fit["beta"])
    # normalize so fwhmx >= fwhmy (reference convention: roundness <= 1)
    swap = fy > fx
    fx2 = np.where(swap, fy, fx)
    fy2 = np.where(swap, fx, fy)
    stars = []
    for i in range(k):
        st = PSFStar(
            B=float(fit["B"][i]), A=float(fit["A"][i]),
            x0=float(xs[i] + fit["x0"][i]), y0=float(ys[i] + fit["y0"][i]),
            sx=float(fit["sx"][i]), sy=float(fit["sy"][i]),
            fwhmx=float(fx2[i]), fwhmy=float(fy2[i]),
            angle=float(np.degrees(fit["angle"][i]) % 180.0),
            rmse=float(fit["rmse"][i]),
            beta=float(fit["beta"][i]), profile=profile,
        )
        stars.append(st)
    return stars
