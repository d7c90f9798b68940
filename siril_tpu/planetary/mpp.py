"""Multipoint planetary processing (MPP) — TPU-native re-design of the
reference's C++ engine (``src/registration/mpp/``, 8,900 LoC; 3-stage
pipeline mpp.h:130-155, AutoStakkert-style):

Stage A — analyze (mpp_analyze):
  1. rank all frames by gradient quality (planetary/quality.py — one
     batched device pass)
  2. global align: batched FFT phase correlation of every frame against
     the best frame, parabolic sub-pixel refine (mpp.h:70-77)
  3. reference image = mean of the best R% globally-aligned frames
  4. alignment-point (AP) grid auto-placement on the reference where
     local structure (gradient energy) exceeds a threshold

Stage B — compute shifts (mpp_compute_shifts):
  per-AP per-frame local shifts by phase correlation of AP patches —
  batched as ONE device call over (frames × APs) patch pairs; shifts
  regularized toward the global shift when correlation is weak (the
  reference's penalty matrix).

Stage C — stack (mpp_stack_apply):
  per-AP best-N% frame selection by local patch quality, sub-pixel
  patch alignment (Fourier shift), taper-weighted accumulation
  (Hann window per AP), normalized by total weight; background filled
  from the globally-aligned mean.

The ``.mpp`` sidecar (mpp_sidecar.c) persists stages A+B between the
`register_mpp` and `stack_mpp` commands — here a compressed .npz.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.planetary.quality import quality_batch
from siril_tpu.utils.log import log_message


@dataclass
class MPPArgs:
    layer: int = 0
    ap_size: int = 48                 # alignment point box (px)
    ap_overlap: float = 0.5           # grid step = ap_size·(1−overlap)
    structure_threshold: float = 0.1  # relative gradient energy for AP
    global_best_pct: float = 25.0     # frames for the reference mean
    stack_best_pct: float = 50.0      # per-AP frames stacked
    frame_batch: int = 64
    max_frames: int = 0               # 0 = all
    scale: float = 1.0                # drizzle-like output scale (1–3)
    search_width: int = 14            # alignment_points_search_width
    gauss_width: int = 7              # frames_gauss_width
    penalty_factor: float = 0.00025   # alignment_points_penalty_factor


@dataclass
class MPPState:
    """Analyze+shift state (the .mpp sidecar content)."""

    quality: np.ndarray                # (N,)
    global_shifts: np.ndarray          # (N, 2) dx,dy frame→ref
    reference: np.ndarray              # (H, W) mean reference
    ap_xy: np.ndarray                  # (A, 2) AP centers
    ap_shifts: Optional[np.ndarray] = None    # (N, A, 2)
    ap_quality: Optional[np.ndarray] = None   # (N, A)
    args: Optional[MPPArgs] = None

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            self._savez(f)

    def _savez(self, f) -> None:
        np.savez_compressed(
            f, quality=self.quality, global_shifts=self.global_shifts,
            reference=self.reference, ap_xy=self.ap_xy,
            ap_shifts=self.ap_shifts if self.ap_shifts is not None else np.zeros(0),
            ap_quality=self.ap_quality if self.ap_quality is not None else np.zeros(0),
            ap_size=self.args.ap_size if self.args else 48)

    @staticmethod
    def load(path: str) -> "MPPState":
        z = np.load(path)
        st = MPPState(quality=z["quality"], global_shifts=z["global_shifts"],
                      reference=z["reference"], ap_xy=z["ap_xy"])
        if z["ap_shifts"].size:
            st.ap_shifts = z["ap_shifts"]
        if z["ap_quality"].size:
            st.ap_quality = z["ap_quality"]
        a = MPPArgs()
        a.ap_size = int(z["ap_size"])
        st.args = a
        return st


def _read_frames(seq, indices, layer, batch):
    for start in range(0, len(indices), batch):
        chunk = indices[start:start + batch]
        yield chunk, np.stack([seq.read_frame(int(i)).host()[layer]
                               for i in chunk])


def _subpixel_shift_batch(frames, shifts):
    """Shift (N,H,W) frames by per-frame (dx,dy) via Fourier phase ramp."""
    import jax.numpy as jnp

    from siril_tpu.utils.fetch import fetch_np

    N, H, W = frames.shape
    return fetch_np(_cached_shift_fn(H, W)(
        jnp.asarray(frames, jnp.float32), jnp.asarray(shifts, jnp.float32)))


@lru_cache(maxsize=8)
def _cached_shift_fn(H: int, W: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(frames, shifts):
        fy = jnp.fft.fftfreq(H)[None, :, None]
        fx = jnp.fft.rfftfreq(W)[None, None, :]
        F = jnp.fft.rfft2(frames)
        phase = jnp.exp(-2j * jnp.pi * (shifts[:, 0, None, None] * fx +
                                        shifts[:, 1, None, None] * fy))
        return jnp.fft.irfft2(F * phase, s=(H, W))

    return run


# ---------------------------------------------------------------------------
# Stage A
# ---------------------------------------------------------------------------


def mpp_analyze(seq, args: Optional[MPPArgs] = None) -> MPPState:
    from siril_tpu.registration.shift import phase_correlate

    args = args or MPPArgs()
    layer = args.layer
    indices = seq.selected_indices()
    if args.max_frames:
        indices = indices[: args.max_frames]
    n = len(indices)
    H, W = seq.ry, seq.rx
    if H == 0:
        img0 = seq.read_frame(int(indices[0]))
        H, W = img0.height, img0.width
        seq.ry, seq.rx = H, W

    # 1. quality of every frame (batched)
    qual = np.zeros(n)
    for chunk, frames in _read_frames(seq, indices, layer, args.frame_batch):
        q = quality_batch(frames)
        for k, i in enumerate(chunk):
            qual[np.nonzero(indices == i)[0][0]] = q[k]
    best = int(np.argmax(qual))
    log_message(f"MPP analyze: best frame {indices[best]} "
                f"(q={qual[best]:.3g})")

    # 2. global align vs the best frame
    ref0 = seq.read_frame(int(indices[best])).host()[layer]
    gshifts = np.zeros((n, 2))
    for chunk, frames in _read_frames(seq, indices, layer, args.frame_batch):
        sh = phase_correlate(ref0, frames)
        for k, i in enumerate(chunk):
            gshifts[np.nonzero(indices == i)[0][0]] = sh[k]

    # 3. reference = mean of best R% globally aligned
    n_best = max(int(round(n * args.global_best_pct / 100.0)), 1)
    best_idx = np.argsort(-qual)[:n_best]
    acc = np.zeros((H, W), np.float64)
    for chunk, frames in _read_frames(seq, indices[best_idx], layer,
                                      args.frame_batch):
        pos = [np.nonzero(indices == i)[0][0] for i in chunk]
        # gshift is the frame→ref translation: aligned(x) = frame(x − d),
        # i.e. shift content by +d
        shifted = _subpixel_shift_batch(frames, gshifts[pos])
        acc += shifted.sum(axis=0)
    reference = (acc / n_best).astype(np.float32)

    # 4. AP grid where structure is significant
    aps = _place_aps(reference, args)
    step = max(int(args.ap_size * (1.0 - args.ap_overlap)), 8)
    log_message(f"MPP analyze: {len(aps)} alignment points "
                f"(box {args.ap_size}, step {step})")
    return MPPState(quality=qual, global_shifts=gshifts,
                    reference=reference, ap_xy=np.asarray(aps, float),
                    args=args)


def _place_aps(reference: np.ndarray, args: MPPArgs) -> np.ndarray:
    """AP grid auto-placement (mpp_ap.cpp): keep grid cells whose local
    gradient energy is significant.  Threshold against a PERCENTILE of
    the patch energies, not the global max — a sharp planet limb
    concentrates the max into a thin arc and a fraction-of-max rule then
    rejects every interior box."""
    H, W = reference.shape
    gy, gx = np.gradient(reference)
    energy = gx * gx + gy * gy
    step = max(int(args.ap_size * (1.0 - args.ap_overlap)), 8)
    half = args.ap_size // 2
    cells = []
    for y in range(half, H - half + 1, step):
        for x in range(half, W - half + 1, step):
            cells.append((x, y, energy[y - half:y + half,
                                       x - half:x + half].mean()))
    if cells:
        es = np.array([c[2] for c in cells])
        ref_e = float(np.percentile(es[es > 0], 75)) if (es > 0).any() \
            else 1.0
        thr = args.structure_threshold * 0.1 * ref_e
        aps = [(x, y) for x, y, e in cells if e >= thr]
    else:
        aps = []
    if not aps:
        aps = [(W // 2, H // 2)]
    return np.array(aps, float)


# ---------------------------------------------------------------------------
# Stage B
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def _ap_corr_fn(S: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(ref_patches, frame_patches):
        """(A,S,S) ref & (A,S,S) frame patches → (A,2) shifts + (A,) peak."""
        win = jnp.hanning(S)[:, None] * jnp.hanning(S)[None, :]
        R = jnp.fft.rfft2(ref_patches * win)
        F = jnp.fft.rfft2(frame_patches * win)
        cross = R * jnp.conj(F)
        cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
        corr = jnp.fft.irfft2(cross, s=(S, S))
        flat = corr.reshape(corr.shape[0], -1)
        peak = jnp.argmax(flat, axis=1)
        pv = jnp.max(flat, axis=1)
        py = peak // S
        px = peak % S

        def parab(cm, c0, cp):
            den = cm - 2 * c0 + cp
            return jnp.where(jnp.abs(den) > 1e-12,
                             jnp.clip(0.5 * (cm - cp) / den, -1, 1), 0.0)

        ar = jnp.arange(corr.shape[0])
        cy0 = corr[ar, py, px]
        dy = py.astype(jnp.float32) + parab(corr[ar, (py - 1) % S, px], cy0,
                                            corr[ar, (py + 1) % S, px])
        dx = px.astype(jnp.float32) + parab(corr[ar, py, (px - 1) % S], cy0,
                                            corr[ar, py, (px + 1) % S])
        dy = jnp.where(dy > S / 2, dy - S, dy)
        dx = jnp.where(dx > S / 2, dx - S, dx)
        return jnp.stack([dx, dy], axis=1), pv

    return run


def mpp_compute_shifts(seq, state: MPPState,
                       args: Optional[MPPArgs] = None) -> MPPState:
    """Stage B — the TRUE MultiLevelCorrelation shift solve
    (mpp_shift.cpp + multilevel_correlation, mpp_align.cpp:308): per
    (frame, AP) two-phase penalty-weighted template-match search, batched
    as ONE device call per frame chunk (round 2's phase-correlation +
    neighbor-smoothing approximation is replaced)."""
    import jax.numpy as jnp

    from siril_tpu.planetary.mlc import (
        blur_gauss,
        mlc_window_extent,
        multilevel_correlation_batch,
    )

    args = args or state.args or MPPArgs()
    layer = args.layer
    indices = seq.selected_indices()[: len(state.quality)]
    n = len(indices)
    A = len(state.ap_xy)
    S = args.ap_size
    half = S // 2
    H, W = state.reference.shape
    E = mlc_window_extent(args.search_width)

    # blurred reference boxes, cut once (mpp_shift.cpp:93-95: boxes come
    # from the post-blur mean frame; first_phase = stride-2 of the box)
    refb = np.asarray(blur_gauss(jnp.asarray(state.reference,
                                             jnp.float32)[None],
                                 args.gauss_width))[0]
    origins = [(int(np.clip(int(y) - half, 0, H - S)),
                int(np.clip(int(x) - half, 0, W - S)))
               for x, y in state.ap_xy]
    ref_boxes = np.stack([refb[y0:y0 + S, x0:x0 + S]
                          for (y0, x0) in origins]).astype(np.float32)

    ap_shifts = np.zeros((n, A, 2))
    ap_qual = np.zeros((n, A))
    for chunk, frames in _read_frames(seq, indices, layer, args.frame_batch):
        pos = [int(np.nonzero(indices == i)[0][0]) for i in chunk]
        # globally align the whole frame (one FFT shift) so boxes are
        # extracted on the exact reference grid; only LOCAL shifts remain
        # (the reference folds the global shift into the box bounds,
        # mpp_shift.cpp:37-42 — same effect)
        aligned = _subpixel_shift_batch(frames, state.global_shifts[pos])
        B = len(pos)
        # frame_mono_blurred prep + big windows around every AP box
        blurred = np.asarray(blur_gauss(jnp.asarray(aligned, jnp.float32),
                                        args.gauss_width))
        padded = np.pad(blurred, ((0, 0), (E, E), (E, E)), mode="edge")
        big = np.empty((B, A, S + 2 * E, S + 2 * E), np.float32)
        for k in range(B):
            for a, (y0, x0) in enumerate(origins):
                big[k, a] = padded[k, y0:y0 + S + 2 * E,
                                   x0:x0 + S + 2 * E]
        refs_rep = np.broadcast_to(ref_boxes, (B, A, S, S)).reshape(
            B * A, S, S)
        dy, dx, ok = multilevel_correlation_batch(
            big.reshape(B * A, S + 2 * E, S + 2 * E), refs_rep,
            search_width=args.search_width, gauss_width=args.gauss_width,
            penalty_factor=args.penalty_factor, subpixel=True)
        dy = dy.reshape(B, A)
        dx = dx.reshape(B, A)
        ok = ok.reshape(B, A)
        # AP-local quality on the unblurred patches (best-N selection)
        patches_all = np.stack([
            np.stack([aligned[k][y0:y0 + S, x0:x0 + S]
                      for (y0, x0) in origins]) for k in range(B)])
        q_all = quality_batch(
            patches_all.reshape(B * A, S, S)).reshape(B, A)
        for k, p in enumerate(pos):
            # content at ref position x sits at x − dx in the aligned
            # frame; failed solves fall back to global-only (zero local)
            ap_shifts[p, :, 0] = np.where(ok[k], dx[k], 0.0)
            ap_shifts[p, :, 1] = np.where(ok[k], dy[k], 0.0)
            ap_qual[p] = q_all[k]
    state.ap_shifts = ap_shifts
    state.ap_quality = ap_qual
    log_message(f"MPP shifts: {n} frames × {A} APs (multilevel "
                f"correlation, sw={args.search_width})")
    return state


# ---------------------------------------------------------------------------
# Stage C
# ---------------------------------------------------------------------------


def mpp_stack(seq, state: MPPState,
              args: Optional[MPPArgs] = None) -> SirilImage:
    args = args or state.args or MPPArgs()
    layer = args.layer
    indices = seq.selected_indices()[: len(state.quality)]
    n = len(indices)
    A = len(state.ap_xy)
    S = args.ap_size
    half = S // 2
    H, W = state.reference.shape

    n_keep = max(int(round(n * args.stack_best_pct / 100.0)), 1)
    # per-AP frame selection by local quality
    sel = np.argsort(-state.ap_quality, axis=0)[:n_keep]     # (n_keep, A)

    win = (np.hanning(S)[:, None] * np.hanning(S)[None, :]).astype(np.float64)
    acc = np.zeros((H, W), np.float64)
    wacc = np.zeros((H, W), np.float64)

    # iterate frames (stream once), accumulate the APs that selected them
    use_by_frame = {}
    for a in range(A):
        for r in range(n_keep):
            p = int(sel[r, a])
            use_by_frame.setdefault(p, []).append(a)

    for chunk, frames in _read_frames(seq, indices, layer, args.frame_batch):
        pos = [int(np.nonzero(indices == i)[0][0]) for i in chunk]
        aligned = _subpixel_shift_batch(frames, state.global_shifts[pos])
        # gather every selected AP patch of the whole chunk, then ONE
        # bucketed device call — a per-frame shift call meant a device
        # round trip AND a fresh compile per distinct AP count
        chunk_patches, chunk_resid, chunk_aps = [], [], []
        for k, p in enumerate(pos):
            aps = use_by_frame.get(p)
            if not aps:
                continue
            fr = aligned[k]
            for a in aps:
                x, y = state.ap_xy[a]
                lx, ly = state.ap_shifts[p, a]
                # local content at ref position x sits at x − lx in the
                # globally-aligned frame
                cx = x - lx
                cy = y - ly
                ix = int(np.clip(round(cx) - half, 0, W - S))
                iy = int(np.clip(round(cy) - half, 0, H - S))
                chunk_patches.append(fr[iy:iy + S, ix:ix + S])
                # subpixel residual centering: the desired center sits
                # at patch coord half+resid; move content by −resid
                chunk_resid.append((cx - (ix + half), cy - (iy + half)))
                chunk_aps.append(a)
        if not chunk_patches:
            continue
        allp = np.stack(chunk_patches).astype(np.float32)
        allr = np.asarray(chunk_resid, np.float32)
        T = len(allp)
        T2 = 1 << max(int(np.ceil(np.log2(max(T, 1)))), 6)
        if T2 != T:                       # bucket: one compile per size
            allp = np.concatenate(
                [allp, np.zeros((T2 - T, S, S), np.float32)])
            allr = np.concatenate([allr, np.zeros((T2 - T, 2), np.float32)])
        shifted = _subpixel_shift_batch(allp, -allr)[:T]
        for j, a in enumerate(chunk_aps):
            x, y = state.ap_xy[a].astype(int)
            y0 = int(np.clip(y - half, 0, H - S))
            x0 = int(np.clip(x - half, 0, W - S))
            acc[y0:y0 + S, x0:x0 + S] += shifted[j] * win
            wacc[y0:y0 + S, x0:x0 + S] += win

    out = np.where(wacc > 1e-6, acc / np.maximum(wacc, 1e-6),
                   state.reference).astype(np.float32)
    if args.scale != 1.0:
        from siril_tpu.ops.interp import INTERP_LANCZOS4, resize

        out = resize(out[None], int(W * args.scale), int(H * args.scale),
                     INTERP_LANCZOS4, clamp=True)[0]
    img = SirilImage(data=np.clip(out, 0.0, 1.0)[None])
    img.log_history(
        f"MPP stack ({n_keep}/{n} frames per AP, {A} APs, box {S})")
    log_message(f"MPP stack done: {A} APs, best {n_keep}/{n} frames each")
    return img


def mpp_full(seq, args: Optional[MPPArgs] = None,
             sidecar: Optional[str] = None) -> SirilImage:
    """`mpp` command: all three stages."""
    args = args or MPPArgs()
    state = mpp_analyze(seq, args)
    state = mpp_compute_shifts(seq, state, args)
    if sidecar:
        state.save(sidecar)
    return mpp_stack(seq, state, args)
