"""Background extraction — equivalent of ``src/algos/background_extraction.c``
(2,474 LoC): sample-grid generation with median boxes (:659), polynomial
fit degree 1–4 (computeBackground_Polynom:291), RBF thin-plate-spline with
smoothing (computeBackground_RBF:122), subtract/divide application,
optional dithering.

TPU-native: sample statistics are one device reduction over box tiles;
the polynomial LSQ is a tiny host solve; the RBF evaluation over the full
image is a (H·W × n_samples) matmul — MXU work.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.utils.log import log_message

BKG_POLY = 0
BKG_RBF = 1

SUBTRACT = 0
DIVIDE = 1


@dataclass
class BkgSample:
    x: float
    y: float
    median: float
    valid: bool = True


def generate_samples(layer: np.ndarray, nb_per_line: int = 20,
                     tolerance: float = 1.0) -> List[BkgSample]:
    """Sample grid with median boxes; boxes whose median deviates more
    than ``tolerance`` MADs above the global median are rejected
    (background_extraction.c sample generation + tolerance filter)."""
    H, W = layer.shape
    size = max(min(H, W) // nb_per_line, 8)
    half = size // 2
    med_g = float(np.median(layer))
    mad_g = float(np.median(np.abs(layer - med_g))) or 1e-6
    samples = []
    ys = np.arange(half, H - half + 1, size)
    xs = np.arange(half, W - half + 1, size)
    for y in ys:
        for x in xs:
            box = layer[y - half:y + half + 1, x - half:x + half + 1]
            m = float(np.median(box))
            valid = (m - med_g) <= tolerance * mad_g * 1.4826 * 3 and m > 0
            samples.append(BkgSample(float(x), float(y), m, valid))
    return samples


def _poly_terms(x, y, degree: int):
    import jax.numpy as jnp

    terms = []
    for total in range(degree + 1):
        for i in range(total + 1):
            j = total - i
            terms.append((x ** i) * (y ** j))
    return jnp.stack(terms, axis=-1)


def compute_background_poly(samples: List[BkgSample], shape: Tuple[int, int],
                            degree: int = 4) -> np.ndarray:
    """Least-squares 2D polynomial background (computeBackground_Polynom)."""
    import jax.numpy as jnp

    H, W = shape
    pts = [(s.x / W, s.y / H, s.median) for s in samples if s.valid]
    if len(pts) < (degree + 1) * (degree + 2) // 2:
        raise ValueError("not enough valid background samples")
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    zs = np.array([p[2] for p in pts])
    A = np.asarray(_poly_terms(jnp.asarray(xs), jnp.asarray(ys), degree))
    coef, *_ = np.linalg.lstsq(A, zs, rcond=None)
    yy, xx = np.mgrid[0:H, 0:W]
    G = _poly_terms(jnp.asarray(xx / W, jnp.float32),
                    jnp.asarray(yy / H, jnp.float32), degree)
    bkg = np.asarray(G @ jnp.asarray(coef, jnp.float32))
    return bkg.astype(np.float32)


def compute_background_rbf(samples: List[BkgSample], shape: Tuple[int, int],
                           smoothing: float = 0.5) -> np.ndarray:
    """Thin-plate-spline RBF background (computeBackground_RBF):
    φ(r) = r²·log(r), ridge term = smoothing on the kernel diagonal.
    Full-image evaluation is an (H·W, n) matmul on device."""
    import jax.numpy as jnp

    H, W = shape
    pts = [(s.x / W, s.y / H, s.median) for s in samples if s.valid]
    n = len(pts)
    if n < 5:
        raise ValueError("not enough valid background samples")
    P = np.array([[p[0], p[1]] for p in pts])
    z = np.array([p[2] for p in pts])
    d2 = ((P[:, None, :] - P[None, :, :]) ** 2).sum(-1)
    K = 0.5 * d2 * np.log(np.maximum(d2, 1e-12))
    lam = smoothing * np.mean(np.abs(K)) * 1e-2 + 1e-9
    A = np.zeros((n + 3, n + 3))
    A[:n, :n] = K + lam * np.eye(n)
    A[:n, n] = 1.0
    A[:n, n + 1:] = P
    A[n, :n] = 1.0
    A[n + 1:, :n] = P.T
    b = np.zeros(n + 3)
    b[:n] = z
    w = np.linalg.solve(A, b)
    wk = jnp.asarray(w[:n], jnp.float32)
    c0, cx, cy = w[n], w[n + 1], w[n + 2]
    yy, xx = np.mgrid[0:H, 0:W]
    G = np.stack([xx.ravel() / W, yy.ravel() / H], axis=1).astype(np.float32)

    @_jax_jit
    def eval_rbf(G, Pj, wk):
        d2 = ((G[:, None, :] - Pj[None, :, :]) ** 2).sum(-1)
        phi = 0.5 * d2 * jnp.log(jnp.maximum(d2, 1e-12))
        return phi @ wk

    vals = np.asarray(eval_rbf(jnp.asarray(G), jnp.asarray(P, jnp.float32), wk))
    bkg = vals.reshape(H, W) + c0 + cx * (xx / W) + cy * (yy / H)
    return bkg.astype(np.float32)


def _jax_jit(f):
    import jax

    return jax.jit(f)


def extract_background(img: SirilImage, method: int = BKG_POLY,
                       degree: int = 4, smoothing: float = 0.5,
                       nb_samples: int = 20, tolerance: float = 1.0,
                       correction: int = SUBTRACT,
                       dither: bool = False) -> SirilImage:
    """`subsky` command: model and remove the sky background."""
    data = img.host()
    C, H, W = data.shape
    out = np.empty_like(data)
    rng = np.random.default_rng(0xB46)
    for c in range(C):
        samples = generate_samples(data[c], nb_samples, tolerance)
        nvalid = sum(1 for s in samples if s.valid)
        log_message(f"Background: channel {c}: {nvalid} samples")
        if method == BKG_RBF:
            bkg = compute_background_rbf(samples, (H, W), smoothing)
        else:
            bkg = compute_background_poly(samples, (H, W), degree)
        if correction == DIVIDE:
            mu = float(np.mean(bkg))
            res = data[c] / np.maximum(bkg, 1e-6) * mu
        else:
            res = data[c] - bkg + float(np.median(bkg))
        if dither:
            res = res + rng.normal(0, 1.0 / 65535.0, res.shape)
        out[c] = np.clip(res, 0.0, 1.0)
    res_img = img.copy(data=out.astype(np.float32))
    res_img.log_history(
        "Background extraction (%s)" % ("RBF" if method == BKG_RBF
                                        else f"Polynomial deg {degree}"))
    return res_img
