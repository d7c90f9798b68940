"""Interpolation / warp engine — TPU-native equivalent of the reference's
OpenCV glue (``src/opencv/opencv.cpp``: cvTransformImage:518,
cvResizeGaussian:255, warpPerspective w/ BORDER_TRANSPARENT).

One gather-based kernel family powers homography warps (registration
apply), arbitrary rotation, and resampling: for each output pixel the
source coordinate is computed (homography or affine scale), then an
N-tap separable filter (nearest / bilinear / cubic a=-0.5 | OpenCV
a=-0.75 / lanczos4) gathers and accumulates.  XLA turns the tap loops
into fused gathers — no data-dependent control flow.

Ringing clamp replicates the reference (opencv.cpp:264-276): warp an
area-style guide, mark pixels where out < factor·guide, dilate 3×3, and
substitute the guide there.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

# interpolation ids (match Siril's opencv_interpolation order where used
# by commands: ne/bi/bc/la + area/none)
INTERP_NEAREST = 0
INTERP_BILINEAR = 1
INTERP_BICUBIC = 2
INTERP_LANCZOS4 = 3
INTERP_AREA = 4
INTERP_NONE = 5

INTERP_NAMES = {"ne": INTERP_NEAREST, "nearest": INTERP_NEAREST,
                "bi": INTERP_BILINEAR, "bilinear": INTERP_BILINEAR,
                "bc": INTERP_BICUBIC, "cubic": INTERP_BICUBIC,
                "bicubic": INTERP_BICUBIC,
                "la": INTERP_LANCZOS4, "lanczos4": INTERP_LANCZOS4,
                "lanczos": INTERP_LANCZOS4,
                "ar": INTERP_AREA, "area": INTERP_AREA,
                "no": INTERP_NONE, "none": INTERP_NONE}

CLAMPING_FACTOR = 0.98


def _cubic_weights(t, a=-0.75):
    """OpenCV-style cubic kernel weights for the 4 taps around t∈[0,1)."""
    import jax.numpy as jnp

    # taps at offsets -1, 0, 1, 2 relative to floor
    x = jnp.stack([t + 1.0, t, 1.0 - t, 2.0 - t])
    ax = jnp.abs(x)
    w = jnp.where(
        ax <= 1.0,
        ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
        jnp.where(ax < 2.0,
                  ((ax - 5.0) * ax + 8.0) * ax * a - 4.0 * a,
                  0.0))
    return w


def _lanczos_weights(t, A=4):
    import jax.numpy as jnp

    offs = jnp.arange(-A + 1, A + 1, dtype=jnp.float32)   # 8 taps
    x = t[None] - offs[(slice(None),) + (None,) * t.ndim]
    pix = jnp.pi * x
    w = jnp.where(jnp.abs(x) < 1e-7, 1.0,
                  A * jnp.sin(pix) * jnp.sin(pix / A) /
                  (pix * pix))
    w = jnp.where(jnp.abs(x) < A, w, 0.0)
    return w / jnp.sum(w, axis=0)


def _gather_plane(plane, yi, xi):
    """plane[yi, xi] with out-of-bounds → 0 (BORDER_TRANSPARENT-ish)."""
    import jax.numpy as jnp

    H, W = plane.shape
    inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
    yc = jnp.clip(yi, 0, H - 1)
    xc = jnp.clip(xi, 0, W - 1)
    v = plane[yc, xc]
    return jnp.where(inb, v, 0.0), inb


def sample_plane(plane, sy, sx, method: int):
    """Sample (H,W) plane at float coords (sy, sx) arrays → values.

    Out-of-bounds samples contribute 0 (black border, matching the
    stacking path's black fill)."""
    import jax.numpy as jnp

    if method == INTERP_NEAREST or method == INTERP_NONE:
        yi = jnp.round(sy).astype(jnp.int32)
        xi = jnp.round(sx).astype(jnp.int32)
        v, _ = _gather_plane(plane, yi, xi)
        return v
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    ty = sy - y0
    tx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    if method in (INTERP_BILINEAR, INTERP_AREA):
        acc = 0.0
        for dy, wy in ((0, 1.0 - ty), (1, ty)):
            for dx, wx in ((0, 1.0 - tx), (1, tx)):
                v, _ = _gather_plane(plane, y0i + dy, x0i + dx)
                acc = acc + v * wy * wx
        return acc
    if method == INTERP_BICUBIC:
        wy = _cubic_weights(ty)
        wx = _cubic_weights(tx)
        acc = 0.0
        for iy in range(4):
            for ix in range(4):
                v, _ = _gather_plane(plane, y0i + iy - 1, x0i + ix - 1)
                acc = acc + v * wy[iy] * wx[ix]
        return acc
    if method == INTERP_LANCZOS4:
        wy = _lanczos_weights(ty)
        wx = _lanczos_weights(tx)
        acc = 0.0
        for iy in range(8):
            for ix in range(8):
                v, _ = _gather_plane(plane, y0i + iy - 3, x0i + ix - 3)
                acc = acc + v * wy[iy] * wx[ix]
        return acc
    raise ValueError(f"bad interpolation {method}")


from functools import lru_cache


def _warp_body(planes, Hinv, out_h: int, out_w: int, method: int,
               clamp: bool):
    """Shared warp body: (C,H,W) planes + one Hinv → (C,out_h,out_w)."""
    import jax
    import jax.numpy as jnp

    yy, xx = jnp.mgrid[0:out_h, 0:out_w]
    xf = xx.astype(jnp.float32)
    yf = yy.astype(jnp.float32)
    d = Hinv[2, 0] * xf + Hinv[2, 1] * yf + Hinv[2, 2]
    sx = (Hinv[0, 0] * xf + Hinv[0, 1] * yf + Hinv[0, 2]) / d
    sy = (Hinv[1, 0] * xf + Hinv[1, 1] * yf + Hinv[1, 2]) / d

    def one(p):
        out = sample_plane(p, sy, sx, method)
        if clamp and method in (INTERP_BICUBIC, INTERP_LANCZOS4):
            guide = sample_plane(p, sy, sx, INTERP_BILINEAR)
            mask = out < CLAMPING_FACTOR * guide
            mask = _dilate3(mask)
            out = jnp.where(mask, guide, out)
        return out

    return jax.vmap(one)(planes)


@lru_cache(maxsize=32)
def _warp_fn(out_h: int, out_w: int, method: int, clamp: bool):
    """Compiled warp for one (output shape, method, clamp) config —
    memoized so repeated per-frame warps reuse one device executable
    (a fresh jit per frame costs a multi-second program reload through
    the axon tunnel)."""
    import jax

    @jax.jit
    def run(planes, Hinv):
        return _warp_body(planes, Hinv, out_h, out_w, method, clamp)

    return run


@lru_cache(maxsize=16)
def _warp_batch_fn(out_h: int, out_w: int, method: int, clamp: bool):
    """Batched warp: (N,C,H,W) frames + (N,3,3) inverse homographies in
    ONE device call — the fused-pipeline path keeps every frame resident
    and warps the whole stack at once."""
    import jax

    @jax.jit
    def run(frames, Hinvs):
        return jax.vmap(
            lambda p, h: _warp_body(p, h, out_h, out_w, method, clamp)
        )(frames, Hinvs)

    return run


def _run_chunked(run, chunk: int, frames_dev, *arrays):
    """Apply ``run(frames_chunk, *per_frame_chunks)`` over bounded frame
    chunks, padding the tail to the full chunk shape so ONE compiled
    executable serves every call (the single chunk-loop used by all
    three batched warps)."""
    import jax.numpy as jnp

    n = frames_dev.shape[0]
    if n <= chunk:
        return run(frames_dev, *arrays)
    outs = []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        if e - s == chunk:
            outs.append(run(frames_dev[s:e], *(a[s:e] for a in arrays)))
        else:
            pad = chunk - (e - s)

            def padded(a):
                return jnp.concatenate(
                    [a[s:e], a[e - 1:e].repeat(pad, axis=0)])

            outs.append(run(padded(frames_dev),
                            *(padded(a) for a in arrays))[: e - s])
    return jnp.concatenate(outs, axis=0)


def warp_homography_batch(frames_dev, Hs, out_shape: Tuple[int, int],
                          method: int = INTERP_LANCZOS4,
                          clamp: bool = True):
    """Device-resident batched warp.  ``frames_dev``: (N,C,H,W) on device;
    ``Hs``: (N,3,3) frame→ref homographies.  Returns a device array.

    Large stacks are warped in frame chunks: one vmapped lanczos4+clamp
    program over 20×4 Mpix frames exhausts the remote compiler, and the
    chunked executable is reused across chunks anyway."""
    import jax.numpy as jnp

    Hinvs = jnp.asarray(np.linalg.inv(np.asarray(Hs, np.float64)),
                        jnp.float32)
    px = int(np.prod(frames_dev.shape[1:]))
    chunk = max(int((64 << 20) // max(px * 4, 1)), 1)
    run = _warp_batch_fn(int(out_shape[0]), int(out_shape[1]), int(method),
                         bool(clamp))
    return _run_chunked(run, chunk, frames_dev, Hinvs)


def warp_homography(data, H, out_shape: Tuple[int, int],
                    method: int = INTERP_LANCZOS4,
                    clamp: bool = True):
    """Warp (C,H,W) by 3×3 homography: out(x) = in(H⁻¹·x)
    (cvTransformImage semantics: H maps source → target; we invert).

    Returns (C, out_h, out_w) with black outside.
    """
    import jax.numpy as jnp

    from siril_tpu.utils.fetch import fetch_np

    Hinv = np.linalg.inv(np.asarray(H, np.float64))
    run = _warp_fn(int(out_shape[0]), int(out_shape[1]), int(method),
                   bool(clamp))
    return fetch_np(run(jnp.asarray(data, jnp.float32),
                        jnp.asarray(Hinv, jnp.float32)))


def _dilate3(mask):
    import jax.numpy as jnp

    m = mask
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            m = m | jnp.roll(jnp.roll(mask, dy, -2), dx, -1)
    return m


def resize(data, to_w: int, to_h: int, method: int = INTERP_BILINEAR,
           clamp: bool = False):
    """cvResizeGaussian equivalent: scale (C,H,W) to (C,to_h,to_w)."""
    c, h, w = data.shape
    # affine scale mapping expressed as homography (pixel-center aligned,
    # OpenCV convention: src = (dst + 0.5) * scale - 0.5)
    sx = w / to_w
    sy = h / to_h
    H = np.array([[1.0 / sx, 0, (1.0 / sx) * 0.5 - 0.5 + 0],
                  [0, 1.0 / sy, (1.0 / sy) * 0.5 - 0.5],
                  [0, 0, 1.0]])
    # we need src = f(dst): build inverse directly
    Hinv = np.array([[sx, 0, 0.5 * sx - 0.5],
                     [0, sy, 0.5 * sy - 0.5],
                     [0, 0, 1.0]])
    return warp_homography(data, np.linalg.inv(Hinv), (to_h, to_w),
                           method, clamp)


@lru_cache(maxsize=8)
def _warp_sip_fn(out_h: int, out_w: int, method: int, clamp: bool,
                 order: int, invert: bool = False):
    """Warp + SIP distortion handling in ONE sampling pass
    (registration/distorsion.c pixmap composition).  With
    ``invert=False`` the source coords Hinv·x are displaced by +P(s)
    (A/B are the displacement to apply); with ``invert=True`` A/B are
    the FORWARD distortion and the kernel solves s + P(s) = x with two
    Newton iterations (undistortion without AP/BP terms)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(planes, Hinv, A, B, crpix):
        yy, xx = jnp.mgrid[0:out_h, 0:out_w]
        xf = xx.astype(jnp.float32)
        yf = yy.astype(jnp.float32)
        d = Hinv[2, 0] * xf + Hinv[2, 1] * yf + Hinv[2, 2]
        sx = (Hinv[0, 0] * xf + Hinv[0, 1] * yf + Hinv[0, 2]) / d
        sy = (Hinv[1, 0] * xf + Hinv[1, 1] * yf + Hinv[1, 2]) / d

        def poly(px, py):
            u = px - crpix[0]
            v = py - crpix[1]
            du = jnp.zeros_like(u)
            dv = jnp.zeros_like(v)
            for p in range(order + 1):
                for q in range(order + 1 - p):
                    term = (u ** p) * (v ** q)
                    du = du + A[p, q] * term
                    dv = dv + B[p, q] * term
            return du, dv

        if invert:
            cx, cy = sx, sy
            for _ in range(3):
                du, dv = poly(cx, cy)
                cx = sx - du
                cy = sy - dv
            sx, sy = cx, cy
        else:
            du, dv = poly(sx, sy)
            sx = sx + du
            sy = sy + dv

        def one(pl):
            out = sample_plane(pl, sy, sx, method)
            if clamp and method in (INTERP_BICUBIC, INTERP_LANCZOS4):
                guide = sample_plane(pl, sy, sx, INTERP_BILINEAR)
                mask = out < CLAMPING_FACTOR * guide
                mask = _dilate3(mask)
                out = jnp.where(mask, guide, out)
            return out

        return jax.vmap(one)(planes)

    return run


def warp_homography_sip(data, H, sip_a, sip_b, crpix,
                        out_shape: Tuple[int, int],
                        method: int = INTERP_LANCZOS4,
                        clamp: bool = True, invert: bool = False):
    """Warp with SIP master-distortion correction (register -disto=).
    ``invert=True`` treats A/B as the forward distortion to undo."""
    import jax.numpy as jnp

    Hinv = np.linalg.inv(np.asarray(H, np.float64))
    order = int(sip_a.shape[0]) - 1
    run = _warp_sip_fn(int(out_shape[0]), int(out_shape[1]), int(method),
                       bool(clamp), order, bool(invert))
    return np.asarray(run(jnp.asarray(data, jnp.float32),
                          jnp.asarray(Hinv, jnp.float32),
                          jnp.asarray(sip_a, jnp.float32),
                          jnp.asarray(sip_b, jnp.float32),
                          jnp.asarray(np.asarray(crpix, np.float32))))


@lru_cache(maxsize=16)
def _shift_batch_fn(method: int, clamp: bool = False, margin: int = 32,
                    donate: bool = False):
    """Batched PURE-TRANSLATION warp: integer part by padded slice,
    fractional part by a separable 8-tap (lanczos4) / 4-tap (cubic) /
    2-tap (bilinear) filter applied as statically-shifted weighted sums —
    elementwise VPU work instead of arbitrary gathers, ~100× faster on
    TPU than the general homography warp.

    ``margin`` (static) bounds |integer shift|: frames pad by
    margin+A+1 per side instead of a whole image (a full-size pad was
    24 GiB for 40×4K frames — the caller buckets the real max shift
    into powers of two to bound recompiles)."""
    import jax
    import jax.numpy as jnp

    if method == INTERP_LANCZOS4:
        A = 4
    elif method == INTERP_BICUBIC:
        A = 2
    else:
        A = 1

    def frac_weights(t):
        offs = jnp.arange(-A + 1, A + 1, dtype=jnp.float32)
        x = t - offs
        if method == INTERP_LANCZOS4:
            pix = jnp.pi * x
            w = jnp.where(jnp.abs(x) < 1e-7, 1.0,
                          A * jnp.sin(pix) * jnp.sin(pix / A) / (pix * pix))
            w = jnp.where(jnp.abs(x) < A, w, 0.0)
        elif method == INTERP_BICUBIC:
            a = -0.75
            ax = jnp.abs(x)
            w = jnp.where(ax <= 1.0,
                          ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
                          jnp.where(ax < 2.0,
                                    ((ax - 5.0) * ax + 8.0) * ax * a
                                    - 4.0 * a, 0.0))
        else:
            w = jnp.stack([1.0 - t, t])
        return w / jnp.sum(w)

    def run_impl(frames, shifts):
        # frames [N,C,H,W]; shifts [N,2] = (dx,dy) frame→ref translation:
        # out(x) = in(x − d)
        N, C, H, W = frames.shape
        pad = margin + A + 1

        def one(fr, d):
            dx, dy = d[0], d[1]
            sx = -dx
            sy = -dy
            ix = jnp.clip(jnp.floor(sx).astype(jnp.int32), -margin, margin)
            iy = jnp.clip(jnp.floor(sy).astype(jnp.int32), -margin, margin)
            fx = sx - ix
            fy = sy - iy
            big = jnp.pad(fr, ((0, 0), (pad, pad), (pad, pad)))
            base = jax.lax.dynamic_slice(
                big, (0, pad + iy - (A - 1), pad + ix - (A - 1)),
                (C, H + 2 * A, W + 2 * A))
            wx = frac_weights(fx)
            wy = frac_weights(fy)
            accy = jnp.zeros((C, H, W + 2 * A))
            for k in range(2 * A):
                accy = accy + wy[k] * jax.lax.dynamic_slice_in_dim(
                    base, k, H, axis=1)
            acc = jnp.zeros((C, H, W))
            for k in range(2 * A):
                acc = acc + wx[k] * jax.lax.dynamic_slice_in_dim(
                    accy, k, W, axis=2)
            if clamp and method in (INTERP_BICUBIC, INTERP_LANCZOS4):
                # Ringing clamp (opencv.cpp:264-276) on the fast path: a
                # separable 2-tap bilinear guide from the same base slice
                # (offsets 0,1 live at taps A-1, A).
                gy = ((1.0 - fy) * jax.lax.dynamic_slice_in_dim(
                          base, A - 1, H, axis=1)
                      + fy * jax.lax.dynamic_slice_in_dim(
                          base, A, H, axis=1))
                guide = ((1.0 - fx) * jax.lax.dynamic_slice_in_dim(
                             gy, A - 1, W, axis=2)
                         + fx * jax.lax.dynamic_slice_in_dim(
                             gy, A, W, axis=2))
                mask = _dilate3(acc < CLAMPING_FACTOR * guide)
                acc = jnp.where(mask, guide, acc)
            return acc

        return jax.vmap(one)(frames, shifts)

    # donate=True lets XLA reuse the input chunk's HBM for the output —
    # the chunked fused pipeline warps in place instead of doubling the
    # stack footprint
    run = jax.jit(run_impl, donate_argnums=(0,) if donate else ())
    return run


def warp_translation_batch(frames_dev, shifts, method: int = INTERP_LANCZOS4,
                           clamp: bool = False, donate: bool = False):
    """Device-resident batched pure-translation warp.  ``shifts``:
    (N, 2) frame→ref (dx, dy).

    Frames are processed in bounded chunks: the separable filter holds
    ~4 intermediate planes per frame, so an unchunked vmap over a 4K
    sequence peaks at several× the stack size (OOM at 40×16 Mpix)."""
    import jax.numpy as jnp

    sh = np.asarray(shifts, np.float32)
    need = int(np.ceil(np.abs(sh).max())) + 1 if sh.size else 1
    margin = 32
    while margin < need:
        margin *= 2
    run = _shift_batch_fn(int(method), bool(clamp), margin, bool(donate))
    n = frames_dev.shape[0]
    px = int(np.prod(frames_dev.shape[1:]))
    chunk = max(1, min(n, (256 << 20) // max(px * 4, 1)))   # ~1 GiB working
    return _run_chunked(run, chunk, frames_dev, jnp.asarray(sh))


def translations_from_Hs(Hs, atol: float = 1e-9):
    """(N,2) translations if every H is a pure translation, else None."""
    Hs = np.asarray(Hs)
    if not np.allclose(Hs[:, :2, :2], np.eye(2)[None], atol=atol):
        return None
    if not np.allclose(Hs[:, 2, :2], 0.0, atol=atol):
        return None
    return Hs[:, :2, 2].copy()


def rotations_from_Hs(Hs, size, max_err_px: float = 0.15,
                      max_deg: float = 15.0):
    """(p, q, t) of the INVERSE maps if every H is approximable by a
    pure rotation+translation, else None.

    Gate: the nearest rotation (Procrustes snap of the 2×2 block) must
    reproduce the FULL projective map within ``max_err_px`` at the four
    image corners — resolution-aware, so the ~1e-4 scale/skew noise a
    RANSAC homography carries on aligned star fields passes, while a
    real scale/skew/perspective component is rejected at any size.
    The inverse map is src = M·dst + t with M = [[p, q], [−q, p]],
    p² + q² = 1 — the form the three-shear FFT warp consumes.  Field
    rotation / meridian-flip residuals (the common deep-sky `register`
    case) are exactly this family."""
    Hs = np.asarray(Hs, np.float64)
    # NaN/degenerate guard: every gate below is `if bad: return None`,
    # and NaN compares False everywhere, so unfiltered NaNs would
    # otherwise sail straight through the fast path
    if not np.isfinite(Hs).all() or (np.abs(Hs[:, 2, 2]) < 1e-12).any():
        return None
    Hs = Hs / Hs[:, 2:3, 2:3]
    A = Hs[:, :2, :2]
    p = (A[:, 0, 0] + A[:, 1, 1]) / 2.0
    q = (A[:, 0, 1] - A[:, 1, 0]) / 2.0
    nrm = np.hypot(p, q)
    if (nrm < 0.5).any():                    # reflection / degenerate
        return None
    p, q = p / nrm, q / nrm
    theta = np.arctan2(q, p)
    # meridian flip: θ near ±180° factors as R(π)·R(θ∓π) — the exact
    # double-flip is free (axis reversal), only the small residual is
    # sheared; gate the RESIDUAL by max_deg
    flip = np.abs(theta) > np.pi / 2
    resid = np.where(flip, theta - np.sign(theta) * np.pi, theta)
    if np.abs(resid).max() > np.deg2rad(max_deg):
        return None
    Hi, Wi = int(size[0]), int(size[1])
    corners = np.array([[0.0, 0.0, 1.0], [Wi - 1.0, 0.0, 1.0],
                        [0.0, Hi - 1.0, 1.0],
                        [Wi - 1.0, Hi - 1.0, 1.0]])      # (4, 3)
    full = np.einsum("nij,cj->nci", Hs, corners)          # (N, 4, 3)
    w = full[..., 2]
    if (np.abs(w) < 1e-6).any():
        return None
    full = full[..., :2] / w[..., None]
    t = Hs[:, :2, 2]
    M = np.stack([np.stack([p, q], -1),
                  np.stack([-q, p], -1)], -2)             # (N, 2, 2)
    snap = np.einsum("nij,cj->nci", M, corners[:, :2]) + t[:, None, :]
    err = np.hypot(*(full - snap).transpose(2, 0, 1))
    if not np.isfinite(err).all() or err.max() > max_err_px:
        return None
    # exact rotation inverse: Mi = Mᵀ, ti = −Mᵀ·t
    pi_, qi = p, -q
    Mi = np.stack([np.stack([pi_, qi], -1),
                   np.stack([-qi, pi_], -1)], -2)         # (N, 2, 2)
    ti = -np.einsum("nij,nj->ni", Mi, t)
    # fold the flip into the params: src = Mi·d + ti = s − (Mi′·d + s − ti)
    # with Mi′ = −Mi and s = (W−1, H−1), so the shear program warps the
    # double-flipped image by (−p, −q, s − t); in-bounds masks are
    # unchanged (s − u ∈ [0, s] ⇔ u ∈ [0, s])
    s_vec = np.array([Wi - 1.0, Hi - 1.0])
    pe = np.where(flip, -pi_, pi_)
    qe = np.where(flip, -qi, qi)
    te = np.where(flip[:, None], s_vec[None] - ti, ti)
    return (pe.astype(np.float32), qe.astype(np.float32),
            te.astype(np.float32), flip)


def rot_shear_core(frames, p, q, t, flipmask, clamp: bool = True):
    """Three-shear rotation+translation warp via per-line FFT phase
    ramps (Paeth decomposition: R = Sx(α)·Sy(β)·Sx(α) with
    α = tan(θ/2), β = −sinθ) — batched 1-D FFTs + elementwise phases,
    no gathers, so it runs at HBM speed on TPU (~40× the gather-based
    homography warp at 16 Mpix).  Interpolation is sinc (exact for
    band-limited data); out-of-field pixels are masked to 0 from the
    analytic inverse map like the gather warp.

    Pure traced function — jitted by _rot_shear_fn for the single-chip
    path and composed into the frame-sharded multi-chip step
    (parallel/sharding.py) where the batch axis is the sharded one, so
    every FFT stays device-local.

    frames (N, C, H, W); inverse map src = M·dst + t,
    M = [[p, q], [−q, p]].  Centered form: src = M(d−c)+c+t′,
    t′ = t + M·c − c.  Flipped frames (meridian flip) were factored
    upstream (rotations_from_Hs): double-flip here, shear the residual.
    """
    import jax.numpy as jnp

    H, W = (int(d) for d in frames.shape[-2:])
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0

    def _fft_apply_last(img, phases, n):
        # 1-D filters along the LAST axis sharing one forward FFT,
        # flattened to 2-D: XLA's CPU fft thunk RET_CHECKs any
        # non-dim0-major operand layout, which fused transposes /
        # sharded batch dims otherwise produce
        import jax

        shp = img.shape
        flat = jax.lax.optimization_barrier(img.reshape(-1, shp[-1]))
        spec = jnp.fft.rfft(flat, axis=-1)
        return [jnp.fft.irfft(spec * ph.reshape(-1, ph.shape[-1]), n=n,
                              axis=-1).reshape(shp) for ph in phases]

    def _transfers(s, n, batch_shape):
        # sinc shift e^{iωs}; bilinear shift ((1−f) + f·e^{iω})·e^{iωs0}
        # — the clamp guide is the exact linear interpolant as a filter
        k = jnp.arange(n // 2 + 1, dtype=jnp.float32)
        w = 2j * jnp.pi / n * k
        sinc = jnp.exp(w * s[..., None])
        out = [jnp.broadcast_to(sinc, batch_shape + (n // 2 + 1,))]
        if clamp:
            s0 = jnp.floor(s)
            f = (s - s0)[..., None]
            bil = ((1.0 - f) + f * jnp.exp(w)) * jnp.exp(w * s0[..., None])
            out.append(jnp.broadcast_to(bil, batch_shape + (n // 2 + 1,)))
        return out

    def shift_rows(imgs, s):
        # imgs: [main] or [main, guide]; out[y, x] = img[y, x + s[y]]
        phases = _transfers(s, W, imgs[0].shape[:-1])
        if clamp:
            m = _fft_apply_last(imgs[0], phases[:1], W)
            g = _fft_apply_last(imgs[-1], phases[1:], W)
            return [m[0], g[0]]
        return _fft_apply_last(imgs[0], phases, W)

    def shift_cols(imgs, s):
        # out[y, x] = img[y + s[x], x] — transpose, shift along the last
        # axis, transpose back (TPU FFT transposes internally anyway)
        imgsT = [jnp.swapaxes(i, -1, -2) for i in imgs]
        phases = _transfers(s, H, imgsT[0].shape[:-1])
        if clamp:
            m = _fft_apply_last(imgsT[0], phases[:1], H)
            g = _fft_apply_last(imgsT[-1], phases[1:], H)
            outs = [m[0], g[0]]
        else:
            outs = _fft_apply_last(imgsT[0], phases, H)
        return [jnp.swapaxes(o, -1, -2) for o in outs]

    frames = jnp.where(flipmask[:, None, None, None],
                       frames[..., ::-1, ::-1], frames)
    txp = p * cx + q * cy - cx + t[:, 0]
    typ = -q * cx + p * cy - cy + t[:, 1]
    theta = jnp.arctan2(q, p)
    alpha = jnp.tan(theta / 2.0)
    yy = jnp.arange(H, dtype=jnp.float32) - cy          # (H,)
    xx = jnp.arange(W, dtype=jnp.float32) - cx          # (W,)
    # pass 1 (x per row): w(y) = α(y−cy) + tx′ − α·ty′
    s1 = alpha[:, None] * yy[None] + (txp - alpha * typ)[:, None]
    # pass 2 (y per column): v(x) = −q(x−cx) + ty′
    s2 = -q[:, None] * xx[None] + typ[:, None]
    # pass 3 (x per row): u(y) = α(y−cy)
    s3 = alpha[:, None] * yy[None]
    g = shift_rows([frames, frames] if clamp else [frames],
                   s1[:, None, :])
    g = shift_cols(g, s2[:, None, :])
    g = shift_rows(g, s3[:, None, :])
    out = g[0]
    if clamp:
        # ringing clamp (opencv.cpp:264-276), same rule as the gather
        # warp: where the sinc result undershoots the bilinear guide,
        # take the guide (dilated so halo pixels are caught too)
        mask = _dilate3(out < CLAMPING_FACTOR * g[-1])
        out = jnp.where(mask, g[-1], out)
    # analytic validity mask of the exact inverse map
    dx = xx[None, None, :]
    dy = yy[None, :, None]
    sx = (p[:, None, None] * dx + q[:, None, None] * dy
          + (cx + txp)[:, None, None])
    sy = (-q[:, None, None] * dx + p[:, None, None] * dy
          + (cy + typ)[:, None, None])
    ok = ((sx >= 0.0) & (sx <= W - 1.0)
          & (sy >= 0.0) & (sy <= H - 1.0))
    return out * ok[:, None, :, :]


@lru_cache(maxsize=8)
def _rot_shear_fn(H: int, W: int, clamp: bool = True):
    """Jitted rot_shear_core for one (H, W, clamp) — memoized."""
    import functools

    import jax

    return jax.jit(functools.partial(rot_shear_core, clamp=clamp))


def warp_rotation_batch(frames_dev, rot, clamp: bool = True):
    """Batched rotation+translation warp (FFT three-shear, with an
    exact double-flip front-end for meridian-flipped frames).
    ``frames_dev``: (N, C, H, W) device array; ``rot``: the
    (p, q, t, flip) tuple from rotations_from_Hs.  Chunked like
    warp_homography_batch so transients stay within the HBM budget."""
    import jax.numpy as jnp

    p, q, t, flip = rot
    H, W = (int(d) for d in frames_dev.shape[-2:])
    px = int(np.prod(frames_dev.shape[1:]))
    # FFT transients are ~4× the chunk (spectrum + phase + output)
    chunk = max(int((64 << 20) // max(px * 4, 1)), 1)
    run = _rot_shear_fn(H, W, bool(clamp))
    return _run_chunked(run, chunk, frames_dev,
                        jnp.asarray(p, jnp.float32),
                        jnp.asarray(q, jnp.float32),
                        jnp.asarray(t, jnp.float32),
                        jnp.asarray(np.asarray(flip, bool)))


# ---------------------------------------------------------------------------
# general AFFINE warp: two-pass chirp-Z (Bluestein) resampling
# ---------------------------------------------------------------------------
#
# The rotation three-shear path covers the rotation+translation family;
# scale and skew (session-to-session focal drift, similarity transforms
# from star matching, differential refraction) still fell back to the
# gather warp.  A 1-D resample out[k] = in(σ·k + s) at a uniform rate σ
# with a per-line offset s is a chirp-Z transform of the line's DFT:
#
#   in(u)  = Re[(1/W)·Σ_f IN[f]·e^{2πi f' u / W}]      (f' symmetric)
#   out[k] = Re[(1/W)·e^{−2πiM0(σk+s)/W}·e^{iπσk²/W}
#              ·Σ_m (P[m]·e^{2πi m s/W}·e^{iπσm²/W}) · q[k−m]],
#   q[j]   = e^{−iπσj²/W},   P = roll(IN, M0),  M0 = W//2,
#
# via Bluestein's identity mk = (m²+k²−(m−k)²)/2 — the sum is a linear
# convolution, done with zero-padded FFTs of length L ≥ 2W−1.  Every
# pass is batched 1-D FFTs + elementwise phases: no gathers, so it runs
# at HBM speed on TPU like the shear path (the MXU-free VPU/FFT路 is
# ~10× the lanczos4 gather warp at 16 Mpix; the rotation shear path
# stays 3× cheaper and is preferred when it applies).
#
# Any invertible 2×2 pull-back affine src = M·dst + b factors into two
# such passes (a row pass then a column pass):
#
#   pass X:  tmp[y, x] = in[y, e·x + g·y + t1]
#   pass Y:  out[y, x] = tmp[f·y + s·x + t2, x]
#   with  f = m11, s = m10, t2 = by,
#         g = m01/m11, e = det(M)/m11, t1 = bx − g·by
#
# (composition: out[y,x] = in[f·y+s·x+t2, e·x+g·(f·y+s·x+t2)+t1] =
# in[m10·x+m11·y+by, (e+g·s)·x+g·f·y+...] and e+g·s = m00, g·f = m01.)
# Near-180° affines are double-flipped first (M ← −M, b ← size−1−b),
# exactly like the rotation path, so both pass scales stay near +1.


def _mod2_exact(a_hi, a_lo, i):
    """((a_hi+a_lo)·i) mod 2 for EXACT int32 ``i`` (|i| < 2²⁷) and a
    host-f64 coefficient shipped as an f32 Veltkamp pair — the chirp
    phases πσm²/W have arguments up to ~σW rad, far beyond f32 arg
    precision, so the mod-2 reduction is done with split products
    (every product is either exact or has a small value, so the mod-2
    amplification of rounding never bites; phase error ~1e-6 rad
    instead of ~1e-3)."""
    import jax.numpy as jnp

    def mod2(x):
        return x - 2.0 * jnp.floor(x * 0.5)

    i_hi = ((i >> 14) << 14).astype(jnp.float32)      # ≤2²⁷, 13-bit mant.
    i_lo = (i & 16383).astype(jnp.float32)            # 14-bit
    # Veltkamp split of a_hi at 13 bits: a1 keeps 11, a2 ≤ 12 (exact
    # in f32 round-to-nearest); a1·i_hi is then ≤ 24 mantissa bits —
    # EXACT — and that is the only large-valued product; the other
    # three have values ≤ ~|a|·2¹⁴ ≪ 1/ulp, so plain f32 suffices
    c = a_hi * 8193.0                                 # 2¹³+1
    a1 = c - (c - a_hi)
    a2 = a_hi - a1
    t = mod2(a1 * i_hi) + mod2(a1 * i_lo) + mod2(a2 * i_hi) \
        + mod2(a2 * i_lo) + a_lo * (i_hi + i_lo)
    return mod2(t)


def _cis_pi(x):
    """e^{iπx} from a mod-2 phase."""
    import jax.numpy as jnp

    return jnp.exp(1j * jnp.pi * x).astype(jnp.complex64)


def _czt_resample_last(img, s, sig_hi, sig_lo):
    """Band-limited 1-D resample along the LAST axis:
    out[..., r, k] = in(σ·k + s[..., r]) per line, σ per FRAME.

    ``img``: (N, ..., R, W) real; ``s``: broadcastable to img[..., :-1];
    ``sig_hi/sig_lo``: (N,) f32 Veltkamp pair of the host-f64 σ/W.
    Sinc interpolation (exact for band-limited data), like the shear
    warp's phase ramps; out-of-support columns are NOT masked here (the
    caller owns the analytic validity mask)."""
    import jax
    import jax.numpy as jnp

    W = int(img.shape[-1])
    M0 = W // 2
    L = 1 << int(np.ceil(np.log2(max(2 * W - 1, 2))))
    # σ (per frame) broadcast to the img rank: (N, 1, ..., 1)
    shp = (slice(None),) + (None,) * (img.ndim - 1)
    # Q (per frame, L) broadcast: (N, 1, ..., 1, L)
    shq = (slice(None),) + (None,) * (img.ndim - 2) + (slice(None),)

    # IN and roll to m-order (m = f' + M0, native f → m = (f+M0) mod W)
    flat = jax.lax.optimization_barrier(img.reshape(-1, W))
    IN = jnp.fft.fft(flat.astype(jnp.complex64), axis=-1)
    IN = jnp.roll(IN, M0, axis=-1).reshape(img.shape[:-1] + (W,))

    m = jnp.arange(W, dtype=jnp.int32)
    k = jnp.arange(W, dtype=jnp.int32)
    # chirp_m[m] = e^{iπ σ m²/W} per frame — (N, 1..., W)
    ch_m = _cis_pi(_mod2_exact(sig_hi[shp], sig_lo[shp], (m * m)[None]))
    # shift phase e^{2πi m s/W}: small args, plain f32
    mf = m.astype(jnp.float32)
    ph_s = jnp.exp((2j * jnp.pi / W) * mf * s[..., None]).astype(
        jnp.complex64)
    P = IN * ph_s * ch_m

    # kernel q[j] = e^{−iπσj²/W}, j ∈ [−(W−1), W−1] laid circularly in L
    j_pos = jnp.arange(W, dtype=jnp.int32)
    j_neg = jnp.arange(-(W - 1), 0, dtype=jnp.int32)
    q_pos = _cis_pi(-_mod2_exact(sig_hi[:, None], sig_lo[:, None],
                                 (j_pos * j_pos)[None]))
    q_neg = _cis_pi(-_mod2_exact(sig_hi[:, None], sig_lo[:, None],
                                 (j_neg * j_neg)[None]))
    qz = jnp.zeros((sig_hi.shape[0], L - 2 * W + 1), jnp.complex64)
    q_arr = jnp.concatenate([q_pos, qz, q_neg], axis=-1)    # (N, L)
    Q = jnp.fft.fft(q_arr, axis=-1)

    pad = jnp.zeros(P.shape[:-1] + (L - W,), jnp.complex64)
    Pp = jnp.concatenate([P, pad], axis=-1)
    flatP = jax.lax.optimization_barrier(Pp.reshape(-1, L))
    CF = jnp.fft.fft(flatP, axis=-1).reshape(Pp.shape)
    conv = jnp.fft.ifft(
        jax.lax.optimization_barrier(
            (CF * Q[shq]).reshape(-1, L)), axis=-1
    ).reshape(Pp.shape)[..., :W]

    # post factor: e^{iπσk²/W} · e^{−2πiM0σk/W} · e^{−2πiM0 s/W} / W
    ch_k = _cis_pi(_mod2_exact(sig_hi[shp], sig_lo[shp], (k * k)[None]))
    ch_k = ch_k * _cis_pi(-_mod2_exact(sig_hi[shp], sig_lo[shp],
                                       (2 * M0 * k)[None]))
    ph_r = jnp.exp((-2j * jnp.pi * M0 / W) * s[..., None]).astype(
        jnp.complex64)
    return (conv * ch_k * ph_r).real / W


def _sig_pair(sigma):
    """Host-f64 σ/W → f32 Veltkamp pair (arrays over frames)."""
    hi = np.asarray(sigma, np.float64).astype(np.float32)
    lo = (np.asarray(sigma, np.float64) - hi.astype(np.float64)).astype(
        np.float32)
    return hi, lo


def _fold_gate_inverse_affine(Mi, bi, size, scale_band, max_shear):
    """Flip-fold an inverse-affine batch (near-180° negative trace →
    double-flip so both pass scales are ~+1) and apply the chirp-Z
    alias-band gates (Catmull-Smith bottleneck).  Shared by the affine
    and perspective families so their bands can never drift apart.
    Returns (Mf (N,2,2), bf (N,2), flip (N,)) or None."""
    Hi, Wi = int(size[0]), int(size[1])
    flip = (Mi[:, 0, 0] + Mi[:, 1, 1]) < 0.0
    s_vec = np.array([Wi - 1.0, Hi - 1.0])
    Mf = np.where(flip[:, None, None], -Mi, Mi)
    bf = np.where(flip[:, None], s_vec[None] - bi, bi)
    m00, m01 = Mf[:, 0, 0], Mf[:, 0, 1]
    m10, m11 = Mf[:, 1, 0], Mf[:, 1, 1]
    detf = m00 * m11 - m01 * m10
    if (np.abs(m11) < 1e-9).any() or (np.abs(detf) < 1e-9).any():
        return None
    e = detf / m11                                    # pass-X scale
    lo, hi = 1.0 - scale_band, 1.0 + scale_band
    if ((e < lo) | (e > hi) | (m11 < lo) | (m11 > hi)
            | (np.abs(m01 / m11) > max_shear)
            | (np.abs(m10) > max_shear)).any():
        return None
    return Mf, bf, flip


def _czt_sigmas(M, H, W):
    """Veltkamp sigma pairs of the two CZT pass scales (host f64)."""
    m11 = M[:, 1, 1]
    det = M[:, 0, 0] * m11 - M[:, 0, 1] * M[:, 1, 0]
    return _sig_pair(det / m11 / W), _sig_pair(m11 / H)


def affines_from_Hs(Hs, size, max_err_px: float = 0.15,
                    scale_band: float = 0.25, max_shear: float = 0.25):
    """Two-pass CZT warp parameters if every H is affine within
    ``max_err_px`` at the image corners, else None.

    Accepts the scale/skew family the rotation gate rejects (focal
    drift, similarity/affine star-match transforms) as long as both
    pass scales stay within ±``scale_band`` of 1 and the shears within
    ``max_shear`` — the two-pass decomposition is exact for any affine,
    the bounds only keep the intermediate image alias-free (Catmull-
    Smith bottleneck).  Returns (M (N,2,2), b (N,2), flip (N,)) of the
    flip-folded INVERSE maps src = M·dst + b."""
    Hs = np.asarray(Hs, np.float64)
    if not np.isfinite(Hs).all() or (np.abs(Hs[:, 2, 2]) < 1e-12).any():
        return None
    Hs = Hs / Hs[:, 2:3, 2:3]
    Hi, Wi = int(size[0]), int(size[1])
    corners = np.array([[0.0, 0.0, 1.0], [Wi - 1.0, 0.0, 1.0],
                        [0.0, Hi - 1.0, 1.0],
                        [Wi - 1.0, Hi - 1.0, 1.0]])
    full = np.einsum("nij,cj->nci", Hs, corners)
    w = full[..., 2]
    if (np.abs(w) < 1e-6).any():
        return None
    full = full[..., :2] / w[..., None]
    A = Hs[:, :2, :2]
    t = Hs[:, :2, 2]
    aff = np.einsum("nij,cj->nci", A, corners[:, :2]) + t[:, None, :]
    err = np.hypot(*(full - aff).transpose(2, 0, 1))
    if not np.isfinite(err).all() or err.max() > max_err_px:
        return None
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    if (np.abs(det) < 1e-9).any():
        return None
    # inverse affine: src = Mi·dst + bi
    Mi = np.stack([np.stack([A[:, 1, 1], -A[:, 0, 1]], -1),
                   np.stack([-A[:, 1, 0], A[:, 0, 0]], -1)],
                  -2) / det[:, None, None]
    bi = -np.einsum("nij,nj->ni", Mi, t)
    return _fold_gate_inverse_affine(Mi, bi, size, scale_band, max_shear)


def _affine_czt_passes(frames, M, b, sig_x, sig_y):
    """The two chirp-Z passes of a flip-folded affine warp — shared by
    the affine path and the perspective (affine + residual) path.
    Returns the resampled frames WITHOUT clamp or validity mask."""
    import jax.numpy as jnp

    H, W = (int(d) for d in frames.shape[-2:])
    m01 = M[:, 0, 1]
    m10 = M[:, 1, 0]
    bx, by = b[:, 0], b[:, 1]
    g = m01 / M[:, 1, 1]
    t1 = bx - g * by
    yy = jnp.arange(H, dtype=jnp.float32)
    xx = jnp.arange(W, dtype=jnp.float32)
    # pass X (rows): src_x = e·x + (g·y + t1)
    s_row = g[:, None] * yy[None] + t1[:, None]             # (N, H)
    out = _czt_resample_last(frames, s_row[:, None, :], *sig_x)
    # pass Y (cols): src_y = f·y + (m10·x + t2)
    s_col = m10[:, None] * xx[None] + by[:, None]           # (N, W)
    outT = jnp.swapaxes(out, -1, -2)
    outT = _czt_resample_last(outT, s_col[:, None, :], *sig_y)
    return jnp.swapaxes(outT, -1, -2)


def affine_czt_core(frames, M, b, flipmask, sig_x, sig_y,
                    clamp: bool = True):
    """Two-pass chirp-Z affine warp (see the family note above).
    ``frames`` (N, C, H, W); ``M`` (N,2,2)/``b`` (N,2) flip-folded
    inverse affines; ``sig_x``/``sig_y``: (hi, lo) f32 pairs of the
    host-f64 pass scales over W and H.  The ringing clamp uses a
    4-tap bilinear gather guide (the CZT transfer trick only works for
    shifts; at 4 taps the guide costs ~1/16 of the lanczos4 gather this
    path replaces)."""
    import jax
    import jax.numpy as jnp

    H, W = (int(d) for d in frames.shape[-2:])
    frames = jnp.where(flipmask[:, None, None, None],
                       frames[..., ::-1, ::-1], frames)
    m01 = M[:, 0, 1]
    m10 = M[:, 1, 0]
    m11 = M[:, 1, 1]
    bx, by = b[:, 0], b[:, 1]
    yy = jnp.arange(H, dtype=jnp.float32)
    xx = jnp.arange(W, dtype=jnp.float32)
    out = _affine_czt_passes(frames, M, b, sig_x, sig_y)

    # analytic inverse map for mask (and the bilinear clamp guide)
    dx = xx[None, None, :]
    dy = yy[None, :, None]
    sx = (M[:, 0, 0, None, None] * dx + m01[:, None, None] * dy
          + bx[:, None, None])
    sy = (m10[:, None, None] * dx + m11[:, None, None] * dy
          + by[:, None, None])
    if clamp:
        guide = jax.vmap(lambda p, vy, vx: jax.vmap(
            lambda pl: sample_plane(pl, vy, vx, INTERP_BILINEAR))(p))(
                frames, sy, sx)
        mask = _dilate3(out < CLAMPING_FACTOR * guide)
        out = jnp.where(mask, guide, out)
    ok = ((sx >= 0.0) & (sx <= W - 1.0)
          & (sy >= 0.0) & (sy <= H - 1.0))
    return out * ok[:, None, :, :]


@lru_cache(maxsize=8)
def _affine_czt_fn(H: int, W: int, clamp: bool = True):
    import functools

    import jax

    return jax.jit(functools.partial(affine_czt_core, clamp=clamp))


def warp_affine_batch(frames_dev, aff, clamp: bool = True):
    """Batched affine warp via two chirp-Z passes.  ``aff``: the
    (M, b, flip) tuple from affines_from_Hs.  Chunked like the other
    batched warps; CZT transients are ~8× the chunk (complex64 at the
    2W-padded conv length), so the chunk budget is halved vs the shear
    path."""
    import jax.numpy as jnp

    M, b, flip = aff
    H, W = (int(d) for d in frames_dev.shape[-2:])
    px = int(np.prod(frames_dev.shape[1:]))
    chunk = max(int((32 << 20) // max(px * 4, 1)), 1)
    (sx_hi, sx_lo), (sy_hi, sy_lo) = _czt_sigmas(M, H, W)
    run = _affine_czt_fn(H, W, bool(clamp))

    def call(fr, Md, bd, fd, a, c, d_, e_):
        return run(fr, Md, bd, fd, (a, c), (d_, e_))

    return _run_chunked(call, chunk, frames_dev,
                        jnp.asarray(M, jnp.float32),
                        jnp.asarray(b, jnp.float32),
                        jnp.asarray(np.asarray(flip, bool)),
                        jnp.asarray(sx_hi), jnp.asarray(sx_lo),
                        jnp.asarray(sy_hi), jnp.asarray(sy_lo))


# ---------------------------------------------------------------------------
# general PERSPECTIVE warp: affine chirp-Z + bounded residual shift passes
# ---------------------------------------------------------------------------
#
# The last warp family off the fast path was genuine perspective
# (mosaic tiles, astrometric registration) and smooth residual
# distortion: the projective pull-back src = pi(Hinv.d) deviates from
# any affine, so neither the three-shear nor the chirp-Z path applies
# and the 64-gather lanczos4 kernel ran instead.  But the deviation is
# SMALL: the best-fit affine over the frame leaves a remainder bounded
# by the perspective curvature (g.W^2/8 for a third row ~g), a few px
# for a survey tile at 4k.  So factor the warp:
#
#   pi(Hinv.d) = M.q(d) + b,     q(d) = pi(K.d)  with  q ~ d + O(D)
#
# (K folds M^-1 and b into Hinv, exact — no approximation), warp the
# affine part with the chirp-Z passes (tmp[q] = in(M.q + b), sinc-
# exact), and apply the near-identity remainder q as a Catmull-Smith
# two-pass resample where every 1-D pass is a sum of 2(D+4)+1
# STATICALLY shifted slices with per-pixel lanczos4 weights —
# elementwise VPU work, no gathers in the resample (the ringing-clamp
# guide is a 4-tap bilinear gather of the original frames at the
# analytic source map, like the affine path).  The row pass
# needs the source-row map hx(y',x) = qx(sigma,x) with qy(sigma,x)=y';
# sigma comes from two Newton steps on the analytic projective map
# (remainder Jacobian is within D/min(H,W) of identity, so Newton is
# exact to ~1e-6 px).
#
# Reference behavior: cvTransformImage (opencv.cpp:518) lanczos4 +
# clamp, BORDER_TRANSPARENT.  A <=D+~8 px band at the frame edge is
# ceded to the validity mask vs the gather path (tmp is materialized on
# the output grid only, and the shift-pass tap windows must not read
# its zero-pad or chirp-Z wrap); registration borders are black-filled
# either way.


def _shift_resample_last(img, u, D: int):
    """Windowed-sinc (lanczos4) 1-D resample along the LAST axis at a
    bounded per-pixel displacement: out[..., x] = img(x + u[..., x]),
    |u| <= D — 2(D+4)+1 statically shifted slices with per-pixel
    weights.  Zeros beyond the edges; sinc weights renormalized over
    the window exactly like the gather kernel's per-axis w/sum(w)."""
    import jax.numpy as jnp
    from jax import lax

    A = 4
    pad = D + A
    Wl = int(img.shape[-1])
    nd = img.ndim
    zp = [(0, 0)] * (nd - 1) + [(pad, pad)]
    big = jnp.pad(img, zp)
    uc = jnp.clip(u, -float(D), float(D))
    acc = jnp.float32(0.0)
    wsum = jnp.float32(0.0)
    for i in range(-pad, pad + 1):
        t = uc - i
        at = jnp.abs(t)
        pit = jnp.pi * t
        w = jnp.where(at < 1e-6, 1.0,
                      4.0 * jnp.sin(pit) * jnp.sin(pit * 0.25)
                      / (pit * pit))
        w = jnp.where(at < 4.0, w, 0.0)
        sl = lax.slice_in_dim(big, i + pad, i + pad + Wl, axis=nd - 1)
        acc = acc + w * sl
        wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-20)


def perspective_split_from_Hs(Hs, size, max_D: int = 16,
                              scale_band: float = 0.25,
                              max_shear: float = 0.25):
    """Affine+residual warp parameters when every H factors into an
    in-band affine plus a remainder bounded by ``max_D`` px, else None.

    ``Hs``: (N,3,3) frame->ref homographies; the pull-back inverse maps
    are fitted.  Gates: the horizon line must stay out of the frame,
    the best-fit affine must satisfy the chirp-Z alias bounds
    (Catmull-Smith bottleneck, same bands as affines_from_Hs), the
    remainder displacement and the row-pass Newton conditioning are
    grid-checked.  Returns (M (N,2,2), b (N,2), flip (N,), K (N,3,3),
    D int) with D bucketed to {2,4,8,16} to bound recompiles."""
    Hs = np.asarray(Hs, np.float64)
    if Hs.ndim != 3 or not np.isfinite(Hs).all() \
            or (np.abs(Hs[:, 2, 2]) < 1e-12).any():
        return None
    # normalize before the degeneracy gate — homographies are
    # scale-equivalent, so a uniformly scaled-down valid H must pass
    Hn = Hs / Hs[:, 2:3, 2:3]
    if (np.abs(np.linalg.det(Hn)) < 1e-9).any():
        return None
    Hinv = np.linalg.inv(Hn)
    Hi, Wi = int(size[0]), int(size[1])
    gx = np.linspace(0.0, Wi - 1.0, 33)
    gy = np.linspace(0.0, Hi - 1.0, 33)
    GX, GY = (a.ravel() for a in np.meshgrid(gx, gy))
    pts = np.stack([GX, GY, np.ones_like(GX)], axis=1)     # (P, 3)
    full = np.einsum("nij,pj->npi", Hinv, pts)
    den = full[..., 2]
    # horizon in (or near) frame -> the projective map blows up
    # (per-frame scale: one frame's larger third row must not raise the
    # proximity threshold for the others)
    if (np.abs(den) < 1e-6 * np.abs(den).max(axis=1, keepdims=True)).any() \
            or ((den.min(1) * den.max(1)) <= 0.0).any():
        return None
    src = full[..., :2] / den[..., None]
    # per-frame best-fit affine src ~ pts @ coef (shared grid pinv)
    coef = np.einsum("jp,npk->njk", np.linalg.pinv(pts), src)
    A = coef[:, :2, :].transpose(0, 2, 1)                   # (N,2,2)
    t = coef[:, 2, :]                                       # (N,2)
    resid = src - (np.einsum("nij,pj->npi", A, pts[:, :2]) + t[:, None])
    rmax = np.abs(resid).max()
    if not np.isfinite(rmax) or rmax > max_D:
        return None
    # flip fold + chirp-Z alias gates: the SAME helper as the affine
    # family, so the bands can never drift between ladder rungs
    fold = _fold_gate_inverse_affine(A, t, size, scale_band, max_shear)
    if fold is None:
        return None
    Mf, bf, flip = fold
    S = np.array([[-1.0, 0.0, Wi - 1.0],
                  [0.0, -1.0, Hi - 1.0],
                  [0.0, 0.0, 1.0]])
    Hf = np.where(flip[:, None, None], np.einsum("ij,njk->nik", S, Hinv),
                  Hinv)
    m00, m01 = Mf[:, 0, 0], Mf[:, 0, 1]
    m10, m11 = Mf[:, 1, 0], Mf[:, 1, 1]
    detf = m00 * m11 - m01 * m10
    # tmp-space projective map q(d) = pi(K.d): K = [Mf^-1(Hf01 - bf x
    # Hf2); Hf2] — exact fold of "subtract bf, apply Mf^-1" into Hf
    Minv = np.stack([np.stack([m11, -m01], -1),
                     np.stack([-m10, m00], -1)], -2) / detf[:, None, None]
    K = np.concatenate(
        [np.einsum("nij,njk->nik",
                   Minv, Hf[:, :2] - bf[:, :, None] * Hf[:, 2:3]),
         Hf[:, 2:3]], axis=1)
    # grid-check the two pass displacement fields (host Newton, f64)
    kden = np.einsum("nj,pj->np", K[:, 2], pts)
    qx = np.einsum("nj,pj->np", K[:, 0], pts) / kden
    qy = np.einsum("nj,pj->np", K[:, 1], pts) / kden
    u_y = qy - GY[None]
    sig = np.broadcast_to(GY[None], qy.shape).copy()
    for _ in range(3):
        dn = K[:, 2, 0:1] * GX[None] + K[:, 2, 1:2] * sig + K[:, 2, 2:3]
        qs = (K[:, 1, 0:1] * GX[None] + K[:, 1, 1:2] * sig
              + K[:, 1, 2:3]) / dn
        dq = (K[:, 1, 1:2] - qs * K[:, 2, 1:2]) / dn
        if (dq < 0.25).any():               # row map not monotone enough
            return None
        sig = sig - (qs - GY[None]) / dq
    dn = K[:, 2, 0:1] * GX[None] + K[:, 2, 1:2] * sig + K[:, 2, 2:3]
    hx = (K[:, 0, 0:1] * GX[None] + K[:, 0, 1:2] * sig
          + K[:, 0, 2:3]) / dn
    u_x = hx - GX[None]
    umax = max(np.abs(u_x).max(), np.abs(u_y).max())
    if not np.isfinite(umax) or umax + 1.0 > max_D:
        return None
    # bucket D to bound recompiles; the largest bucket also caps the
    # family regardless of a larger caller-supplied max_D
    D = next((B for B in (2, 4, 8, 16) if umax + 1.0 <= B), None)
    if D is None:
        return None
    return Mf, bf, flip, K, D


def perspective_czt_core(frames, M, b, K, flipmask, sig_x, sig_y,
                         D: int, clamp: bool = True):
    """Affine chirp-Z passes + near-identity residual shift passes (see
    the family note above).  ``K``: (N,3,3) tmp-space projective maps
    from perspective_split_from_Hs; ``D``: static shift bound.  The
    ringing clamp uses a 4-tap bilinear gather of the ORIGINAL frames
    at the analytic source map — like the affine/rotation paths, so the
    guide is free of the sinc passes' own ringing."""
    import jax
    import jax.numpy as jnp

    H, W = (int(d) for d in frames.shape[-2:])
    frames = jnp.where(flipmask[:, None, None, None],
                       frames[..., ::-1, ::-1], frames)
    tmp = _affine_czt_passes(frames, M, b, sig_x, sig_y)

    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]

    def kdot(row, xf, yf):
        return (K[:, row, 0, None, None] * xf
                + K[:, row, 1, None, None] * yf
                + K[:, row, 2, None, None])

    # pass X over tmp rows y': hx(y',x) = qx(x, sigma), qy(x, sigma)=y'
    sig = jnp.broadcast_to(yy, (K.shape[0], H, W))
    for _ in range(2):
        dn = kdot(2, xx, sig)
        qs = kdot(1, xx, sig) / dn
        dq = (K[:, 1, 1, None, None] - qs * K[:, 2, 1, None, None]) / dn
        sig = sig - (qs - yy) / dq
    u_x = kdot(0, xx, sig) / kdot(2, xx, sig) - xx
    V = _shift_resample_last(tmp, u_x[:, None], D)
    # pass Y: vy(y,x) = qy(x,y)
    dn0 = kdot(2, xx, yy)
    qx0 = kdot(0, xx, yy) / dn0
    qy0 = kdot(1, xx, yy) / dn0
    outT = _shift_resample_last(jnp.swapaxes(V, -1, -2),
                                jnp.swapaxes(qy0 - yy, -1, -2)[:, None], D)
    out = jnp.swapaxes(outT, -1, -2)
    # analytic source map pi(Hinv·d) = M·q(d) + b — the validity mask
    # and the bilinear clamp guide
    srcx = (M[:, 0, 0, None, None] * qx0 + M[:, 0, 1, None, None] * qy0
            + b[:, 0, None, None])
    srcy = (M[:, 1, 0, None, None] * qx0 + M[:, 1, 1, None, None] * qy0
            + b[:, 1, None, None])
    if clamp:
        guide = jax.vmap(lambda p, vy, vx: jax.vmap(
            lambda pl: sample_plane(pl, vy, vx, INTERP_BILINEAR))(p))(
                frames, srcy, srcx)
        mask = _dilate3(out < CLAMPING_FACTOR * guide)
        out = jnp.where(mask, guide, out)
    # validity: the shift passes read tmp in a tap window around q
    # (lanczos radius A per pass, +~2 px of cross-pass drift of the
    # column map over the row window).  That window must stay on tmp's
    # materialized grid AND its affine pre-image must stay inside the
    # original frame — outside it tmp holds chirp-Z periodic wrap, and
    # past the grid the window reads zero-padding: either would enter
    # the stack darkened-but-"valid".  The gather path renormalizes
    # edge taps instead; this band is ceded like the <=D band (family
    # note above), and registration borders are black-filled either way.
    A = 4.0
    mqx, mqy = A + 2.0, A
    rsx = (jnp.abs(M[:, 0, 0]) * mqx + jnp.abs(M[:, 0, 1]) * mqy
           + 0.5)[:, None, None]
    rsy = (jnp.abs(M[:, 1, 0]) * mqx + jnp.abs(M[:, 1, 1]) * mqy
           + 0.5)[:, None, None]
    ok = ((srcx >= rsx) & (srcx <= W - 1.0 - rsx)
          & (srcy >= rsy) & (srcy <= H - 1.0 - rsy)
          & (qx0 >= mqx) & (qx0 <= W - 1.0 - mqx)
          & (qy0 >= mqy) & (qy0 <= H - 1.0 - mqy))
    return out * ok[:, None, :, :]


@lru_cache(maxsize=8)
def _perspective_czt_fn(H: int, W: int, D: int, clamp: bool = True):
    import functools

    import jax

    return jax.jit(functools.partial(perspective_czt_core, D=D,
                                     clamp=clamp))


def warp_perspective_batch(frames_dev, persp, clamp: bool = True):
    """Batched perspective warp: affine chirp-Z + residual shift
    passes.  ``persp``: the (M, b, flip, K, D) tuple from
    perspective_split_from_Hs.  Chunked at the CZT budget (the shift
    passes add ~5 W-padded transients on top of the CZT's ~8x)."""
    import jax.numpy as jnp

    M, b, flip, K, D = persp
    H, W = (int(d) for d in frames_dev.shape[-2:])
    px = int(np.prod(frames_dev.shape[1:]))
    # tighter than the affine path: the shift passes add padded slice
    # transients on top of the CZT's ~8x
    chunk = max(int((24 << 20) // max(px * 4, 1)), 1)
    (sx_hi, sx_lo), (sy_hi, sy_lo) = _czt_sigmas(M, H, W)
    run = _perspective_czt_fn(H, W, int(D), bool(clamp))

    def call(fr, Md, bd, Kd, fd, a, c, d_, e_):
        return run(fr, Md, bd, Kd, fd, (a, c), (d_, e_))

    return _run_chunked(call, chunk, frames_dev,
                        jnp.asarray(M, jnp.float32),
                        jnp.asarray(b, jnp.float32),
                        jnp.asarray(K, jnp.float32),
                        jnp.asarray(np.asarray(flip, bool)),
                        jnp.asarray(sx_hi), jnp.asarray(sx_lo),
                        jnp.asarray(sy_hi), jnp.asarray(sy_lo))
