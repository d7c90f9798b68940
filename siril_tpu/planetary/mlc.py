"""MultiLevelCorrelation — the true MPP per-AP shift solver.

Semantic spec: ``multilevel_correlation`` (reference
src/registration/mpp/mpp_align.cpp:308-408, PSS-derived) with the
first-phase penalty weight matrix
(``stack_build_first_phase_weight_matrix``, mpp_stack.cpp:216-231:
``1 − pen·(tx²+ty²)``) and the 3×3 quadratic-surface sub-pixel solve
(mpp_align.cpp:269-304).  Round 2 approximated this with single-phase FFT
phase correlation + neighbor smoothing; this is the faithful two-phase
search:

  Phase 1 (coarse): stride-2 window of the blurred frame around the box,
    Gaussian-blurred again, TM_CCOEFF_NORMED against the stride-2
    reference box; the (2·sw1+1)² surface is multiplied by the penalty
    matrix; argmax → even coarse shift.  A hit on the search border
    fails the solve.
  Phase 2 (fine): full-resolution ±sw2(=4) window around the coarse
    shift, TM_CCOEFF_NORMED against the full-res reference box; argmax →
    fine shift; border hit → keep the coarse estimate with
    ``success=False`` (PSS behavior).
  Sub-pixel: least-squares quadratic surface through the 3×3 correlation
    neighborhood of the phase-2 peak; the correction is SUBTRACTED
    (mpp_align.cpp:400) and discarded when |corr| > 1.

TPU-native formulation: everything is batched over (frame, AP) boxes in
ONE jit — the sliding-window correlations are ``lax.conv`` calls (MXU),
normalization sums are box-filter convs, the data-dependent phase-2
window is a per-box ``dynamic_slice`` under ``vmap``, and the quadratic
solve is a 6×9 matmul (the design pseudo-inverse is computed at import
time from the quadratic monomial design, not hardcoded).
"""

from __future__ import annotations

import functools

import numpy as np


def gaussian_kernel1d(ksize: int) -> np.ndarray:
    """OpenCV getGaussianKernel semantics with sigma=0 → derived sigma
    0.3·((ksize−1)/2 − 1) + 0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _subpixel_design() -> np.ndarray:
    """Pseudo-inverse of the quadratic design a·y²+b·x²+c·xy+d·x+e·y+f on
    the 3×3 grid centred at (0,0) — rows order (a,b,c,d,e,f)."""
    rows = []
    for y in (-1, 0, 1):
        for x in (-1, 0, 1):
            rows.append([y * y, x * x, x * y, x, y, 1.0])
    return np.linalg.pinv(np.asarray(rows)).astype(np.float32)  # (6, 9)


def penalty_matrix(sw1: int, penalty_factor: float) -> np.ndarray:
    """stack_build_first_phase_weight_matrix: (2·sw1+1)² with centre 1.0
    and quadratic off-centre penalty."""
    t = np.arange(2 * sw1 + 1, dtype=np.float32) / sw1 - 1.0
    return (1.0 - penalty_factor * (t[:, None] ** 2 + t[None, :] ** 2)
            ).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _blur_fn(ksize: int):
    import jax
    import jax.numpy as jnp

    k = jnp.asarray(gaussian_kernel1d(ksize))

    @jax.jit
    def blur(x):
        # reflect-pad separable blur over the trailing two axes (cv
        # BORDER_REFLECT_101 default), expressed as statically-shifted
        # weighted sums (VPU-friendly, fuses)
        p = ksize // 2
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(p, p), (p, p)],
                     mode="reflect")
        out = 0.0
        for i in range(ksize):
            out = out + k[i] * xp[..., i:i + x.shape[-2], :]
        out2 = 0.0
        for i in range(ksize):
            out2 = out2 + k[i] * out[..., :, i:i + x.shape[-1]]
        return out2

    return blur


def blur_gauss(x, ksize: int = 7):
    """Gaussian blur (frame_mono_blurred prep, cfg.frames_gauss_width)."""
    return _blur_fn(int(ksize))(x)


def _tm_ccoeff_normed(windows, templ):
    """Batched TM_CCOEFF_NORMED: windows (B, Hw, Ww), templ (B, h, w) →
    (B, Hw−h+1, Ww−w+1).  Zero-mean template correlation with local
    window mean/variance normalization (OpenCV matchTemplate docs).

    TPU formulation: the per-window templates made the natural conv a
    ``feature_group_count=B`` GROUPED (depthwise) conv, which cannot
    use the MXU and measured ~10 GFLOP/s — it dominated the whole MPP
    register stage (1555 s at config-4 full scale).  Instead:

      * correlation AND the window sums s1/s2 = a static
        (Hw−h+1)×(Ww−w+1) shift ladder of elementwise multiply-reduces
        (VPU streaming, fuses, no big im2col materialization).  Direct
        slice-reduces, not integral-image lookups: the ii differencing
        cancels ~4 significant digits at 56² window magnitudes, which
        moved sub-pixel peak fits by up to ~0.06 px against the pinned
        MPP goldens.
    """
    import jax.numpy as jnp

    B, Hw, Ww = windows.shape
    h, w = templ.shape[1], templ.shape[2]
    no_y, no_x = Hw - h + 1, Ww - w + 1
    area = float(h * w)
    t = templ - templ.mean(axis=(1, 2), keepdims=True)
    tnorm = jnp.sqrt((t * t).sum(axis=(1, 2)))           # (B,)
    w2sq = windows * windows

    rows = []
    for oy in range(no_y):
        cols = []
        for ox in range(no_x):
            win = windows[:, oy:oy + h, ox:ox + w]
            c = (win * t).sum(axis=(1, 2))
            s1 = win.sum(axis=(1, 2))
            s2 = w2sq[:, oy:oy + h, ox:ox + w].sum(axis=(1, 2))
            ivar = s2 - s1 * s1 / area                    # Σ(I−Ī)²
            denom = tnorm * jnp.sqrt(jnp.maximum(ivar, 0.0))
            cols.append(jnp.where(denom > 1e-12,
                                  c / jnp.maximum(denom, 1e-12), 0.0))
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)                       # (B, no_y, no_x)


def mlc_core(box: int, sw1: int, sw2: int, gauss_width: int,
             penalty_factor: float, subpixel: bool):
    """Pure (un-jitted) batched two-phase solver for one static geometry
    — composable into larger fused programs (the MPP shift stage runs
    it inside ONE chunk program together with align/blur/window-cut).

    Input: big windows (B, box+2·E, box+2·E) where E = index_ext + sw2 =
    2·sw1 + sw2, cut from the BLURRED frame centred on each AP box, and
    reference boxes (B, box, box) (+ their stride-2 versions).
    Returns (dy, dx, success) each (B,).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    index_ext = 2 * sw1
    E = index_ext + sw2
    pen = jnp.asarray(penalty_matrix(sw1, penalty_factor))
    design = jnp.asarray(_subpixel_design())

    def run(big, ref_full, ref_p1):
        B = big.shape[0]
        # ---- phase 1: stride-2 + blur, penalty-weighted argmax --------
        w1 = big[:, sw2:sw2 + box + 2 * index_ext,
                 sw2:sw2 + box + 2 * index_ext]
        w1s = w1[:, ::2, ::2]
        w1b = blur_gauss(w1s, gauss_width)
        ccr1 = _tm_ccoeff_normed(w1b, ref_p1) * pen[None]
        n1 = ccr1.shape[1]
        flat1 = ccr1.reshape(B, -1)
        am1 = jnp.argmax(flat1, axis=1)
        my1 = (am1 // n1).astype(jnp.int32)
        mx1 = (am1 % n1).astype(jnp.int32)
        sy1 = (sw1 - my1) * 2
        sx1 = (sw1 - mx1) * 2
        ok1 = (jnp.abs(sy1) != index_ext) & (jnp.abs(sx1) != index_ext)

        # ---- phase 2: full-res ±sw2 around the coarse shift -----------
        def cut(b, sy, sx):
            # window [box+2·sw2]² at offset (E − sy − sw2, E − sx − sw2)
            return lax.dynamic_slice(
                b, (E - sy - sw2, E - sx - sw2),
                (box + 2 * sw2, box + 2 * sw2))

        w2 = jax.vmap(cut)(big, sy1, sx1)
        ccr2 = _tm_ccoeff_normed(w2, ref_full)
        n2 = 2 * sw2 + 1
        flat2 = ccr2.reshape(B, -1)
        am2 = jnp.argmax(flat2, axis=1)
        my2 = (am2 // n2).astype(jnp.int32)
        mx2 = (am2 % n2).astype(jnp.int32)
        sy2 = sw2 - my2
        sx2 = sw2 - mx2
        ok2 = (jnp.abs(sy2) != sw2) & (jnp.abs(sx2) != sw2)

        y_tot = (sy1 + jnp.where(ok2, sy2, 0)).astype(jnp.float32)
        x_tot = (sx1 + jnp.where(ok2, sx2, 0)).astype(jnp.float32)

        if subpixel:
            # 3×3 neighborhood of the phase-2 peak (clamped; interior-
            # only gate like the reference)
            interior = ok2 & (my2 > 0) & (my2 < n2 - 1) & \
                (mx2 > 0) & (mx2 < n2 - 1)
            cy = jnp.clip(my2, 1, n2 - 2)
            cx = jnp.clip(mx2, 1, n2 - 2)

            def nb(c, y, x):
                return lax.dynamic_slice(c, (y - 1, x - 1), (3, 3))

            patch = jax.vmap(nb)(ccr2, cy, cx).reshape(B, 9)
            co = patch @ design.T                     # (B, 6): a,b,c,d,e,f
            a_f, b_f, c_f, d_f, e_f = (co[:, 0], co[:, 1], co[:, 2],
                                       co[:, 3], co[:, 4])
            denom_y = c_f * c_f - 4.0 * a_f * b_f
            yc = jnp.where(jnp.abs(denom_y) > 1e-10,
                           (2.0 * a_f * e_f - c_f * d_f)
                           / jnp.where(jnp.abs(denom_y) > 1e-10,
                                       denom_y, 1.0), 0.0)
            xc_a = (-c_f * yc - d_f) / jnp.where(jnp.abs(a_f) > 1e-10,
                                                 2.0 * a_f, 1.0)
            xc_c = (-2.0 * b_f * yc - e_f) / jnp.where(
                jnp.abs(c_f) > 1e-10, c_f, 1.0)
            use_a = (jnp.abs(denom_y) > 1e-10) & (jnp.abs(a_f) > 1e-10)
            use_c = (jnp.abs(denom_y) > 1e-10) & ~(jnp.abs(a_f) > 1e-10) \
                & (jnp.abs(c_f) > 1e-10)
            xc = jnp.where(use_a, xc_a, jnp.where(use_c, xc_c, 0.0))
            solved = use_a | use_c
            good = interior & solved & (jnp.abs(yc) <= 1.0) & \
                (jnp.abs(xc) <= 1.0)
            y_tot = y_tot - jnp.where(good, yc, 0.0)
            x_tot = x_tot - jnp.where(good, xc, 0.0)

        success = ok1 & ok2
        y_tot = jnp.where(ok1, y_tot, 0.0)
        x_tot = jnp.where(ok1, x_tot, 0.0)
        return y_tot, x_tot, success

    return run


@functools.lru_cache(maxsize=32)
def _mlc_fn(box: int, sw1: int, sw2: int, gauss_width: int,
            penalty_factor: float, subpixel: bool):
    import jax

    return jax.jit(mlc_core(box, sw1, sw2, gauss_width, penalty_factor,
                            subpixel))


def multilevel_correlation_batch(big_windows, ref_boxes, *,
                                 search_width: int = 14,
                                 gauss_width: int = 7,
                                 penalty_factor: float = 0.00025,
                                 subpixel: bool = True):
    """Solve per-box shifts for a batch.

    ``big_windows``: (B, box+2·E, box+2·E) float32 windows of the BLURRED
    frame centred on each AP box (E = search extent, see
    ``mlc_window_extent``).  ``ref_boxes``: (B, box, box) float32 cut
    from the blurred mean/reference frame.
    Returns (dy, dx, success) numpy arrays, each (B,).
    """
    import jax.numpy as jnp

    sw2 = 4
    sw1 = (search_width - sw2) // 2
    box = int(ref_boxes.shape[1])
    ref_p1 = ref_boxes[:, ::2, ::2]
    run = _mlc_fn(box, sw1, sw2, int(gauss_width), float(penalty_factor),
                  bool(subpixel))
    dy, dx, ok = run(jnp.asarray(big_windows, jnp.float32),
                     jnp.asarray(ref_boxes, jnp.float32),
                     jnp.asarray(ref_p1, jnp.float32))
    return np.asarray(dy), np.asarray(dx), np.asarray(ok)


def mlc_window_extent(search_width: int = 14) -> int:
    """Half-extent E to add around the AP box when cutting frame windows:
    index_ext (phase 1) + sw2 (phase 2)."""
    sw2 = 4
    sw1 = (search_width - sw2) // 2
    return 2 * sw1 + sw2
