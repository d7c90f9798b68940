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
    """Chunked frame sweep — device-resident for fitting SER videos
    (see planetary/source.py), streamed host reads otherwise."""
    from siril_tpu.planetary.source import frame_chunks

    yield from frame_chunks(seq, indices, layer, batch)


def _shift_core(frames, shifts):
    """Pure Fourier phase-ramp shift, (N, H, W) × (N, 2 dx,dy) —
    composable into fused chunk programs."""
    import jax.numpy as jnp

    H, W = frames.shape[1], frames.shape[2]
    fy = jnp.fft.fftfreq(H)[None, :, None]
    fx = jnp.fft.rfftfreq(W)[None, None, :]
    F = jnp.fft.rfft2(frames)
    phase = jnp.exp(-2j * jnp.pi * (shifts[:, 0, None, None] * fx +
                                    shifts[:, 1, None, None] * fy))
    return jnp.fft.irfft2(F * phase, s=(H, W))


@lru_cache(maxsize=8)
def _aligned_sum_fn(H: int, W: int):
    import jax

    def run(frames, shifts):
        return _shift_core(frames, shifts).sum(axis=0)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Stage A
# ---------------------------------------------------------------------------


def mpp_analyze(seq, args: Optional[MPPArgs] = None) -> MPPState:
    import jax.numpy as jnp

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

    from siril_tpu.planetary.quality import quality_batch_device
    from siril_tpu.registration.shift import (
        decode_phasecorr_peaks,
        phase_correlate_device,
    )
    from siril_tpu.utils.devfetch import DeviceCollector

    # frame_chunks sweeps `indices` in order, so per-chunk results are
    # positional; results stay on device and are fetched ONCE per sweep
    # (each per-chunk fetch costs a full tunnel round trip)
    pos_of = {int(i): p for p, i in enumerate(indices)}

    # 1. quality of every frame (batched)
    col = DeviceCollector()
    for chunk, frames in _read_frames(seq, indices, layer, args.frame_batch):
        col.append(quality_batch_device(frames))
    qual = col.concat()[:n].astype(np.float64)
    best = int(np.argmax(qual))
    log_message(f"MPP analyze: best frame {indices[best]} "
                f"(q={qual[best]:.3g})")

    # 2. global align vs the best frame
    ref0 = seq.read_frame(int(indices[best])).host()[layer]
    ref_dev = jnp.asarray(ref0, jnp.float32)
    col = DeviceCollector()
    for chunk, frames in _read_frames(seq, indices, layer, args.frame_batch):
        col.append(phase_correlate_device(
            ref_dev, jnp.asarray(frames, jnp.float32)))
    gshifts = decode_phasecorr_peaks(col.concat()[:n], H, W)

    # 3. reference = mean of best R% globally aligned
    n_best = max(int(round(n * args.global_best_pct / 100.0)), 1)
    best_idx = np.argsort(-qual)[:n_best]
    acc = None
    for chunk, frames in _read_frames(seq, indices[best_idx], layer,
                                      args.frame_batch):
        pos = [pos_of[int(i)] for i in chunk]
        # gshift is the frame→ref translation: aligned(x) = frame(x − d),
        # i.e. shift content by +d; sum ON DEVICE — only the final
        # (H, W) mean is fetched
        part = _aligned_sum_fn(H, W)(
            jnp.asarray(frames, jnp.float32),
            jnp.asarray(gshifts[pos].astype(np.float32)))
        acc = part if acc is None else acc + part
    reference = (np.asarray(acc) / n_best).astype(np.float32)

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
def _shift_stage_fn(S: int, E: int, gauss_width: int, sw1: int, sw2: int,
                    penalty_factor: float):
    """Stage-B fused chunk program: global FFT align → Gaussian blur →
    per-AP window cut (vmap dynamic_slice) → MultiLevelCorrelation →
    AP-patch quality, ALL on device.  The round-2 committed version
    fetched blurred frames, built the 9400+ windows per chunk in Python
    loops and re-uploaded ~300 MB/chunk — through the slow axon tunnel
    that dominated stage B.  Only tiny (B, A) results leave the device."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from siril_tpu.planetary.mlc import blur_gauss, mlc_core
    from siril_tpu.planetary.quality import quality_core

    core = mlc_core(S, sw1, sw2, gauss_width, penalty_factor, True)
    WN = S + 2 * E

    @jax.jit
    def run(frames, gshifts, ref_full, ref_p1, oy, ox):
        B = frames.shape[0]
        A = oy.shape[0]
        aligned = _shift_core(frames, gshifts)
        blurred = blur_gauss(aligned, gauss_width)
        padded = jnp.pad(blurred, ((0, 0), (E, E), (E, E)), mode="edge")

        def cutw(p):
            return jax.vmap(lambda y0, x0: lax.dynamic_slice(
                p, (y0, x0), (WN, WN)))(oy, ox)

        big = jax.vmap(cutw)(padded).reshape(B * A, WN, WN)
        refs = jnp.broadcast_to(ref_full[None], (B, A, S, S)
                                ).reshape(B * A, S, S)
        refs1 = jnp.broadcast_to(ref_p1[None], (B,) + ref_p1.shape
                                 ).reshape((B * A,) + ref_p1.shape[1:])
        dy, dx, ok = core(big, refs, refs1)

        def cutp(fr):
            return jax.vmap(lambda y0, x0: lax.dynamic_slice(
                fr, (y0, x0), (S, S)))(oy, ox)

        patches = jax.vmap(cutp)(aligned).reshape(B * A, S, S)
        q = quality_core(patches)
        return (dy.reshape(B, A), dx.reshape(B, A), ok.reshape(B, A),
                q.reshape(B, A))

    return run


def mpp_compute_shifts(seq, state: MPPState,
                       args: Optional[MPPArgs] = None) -> MPPState:
    """Stage B — the TRUE MultiLevelCorrelation shift solve
    (mpp_shift.cpp + multilevel_correlation, mpp_align.cpp:308): per
    (frame, AP) two-phase penalty-weighted template-match search, ONE
    fused device program per frame chunk (see _shift_stage_fn)."""
    import jax.numpy as jnp

    from siril_tpu.planetary.mlc import blur_gauss, mlc_window_extent

    args = args or state.args or MPPArgs()
    layer = args.layer
    indices = seq.selected_indices()[: len(state.quality)]
    n = len(indices)
    A = len(state.ap_xy)
    S = args.ap_size
    half = S // 2
    H, W = state.reference.shape
    E = mlc_window_extent(args.search_width)
    sw2 = 4
    sw1 = (args.search_width - sw2) // 2

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
    oy = np.asarray([o[0] for o in origins], np.int32)
    ox = np.asarray([o[1] for o in origins], np.int32)
    ref_d = jnp.asarray(ref_boxes)
    ref_p1_d = jnp.asarray(ref_boxes[:, ::2, ::2])
    oy_d = jnp.asarray(oy)
    ox_d = jnp.asarray(ox)
    fn = _shift_stage_fn(S, E, int(args.gauss_width), sw1, sw2,
                         float(args.penalty_factor))

    B0 = args.frame_batch
    ap_shifts = np.zeros((n, A, 2))
    ap_qual = np.zeros((n, A))
    for chunk, frames in _read_frames(seq, indices, layer, B0):
        pos = [int(np.nonzero(indices == i)[0][0]) for i in chunk]
        B = len(pos)
        gsh = state.global_shifts[pos].astype(np.float32)
        if B < B0:      # pad the tail chunk: ONE compiled shape
            frames = jnp.concatenate(
                [jnp.asarray(frames, jnp.float32),
                 jnp.zeros((B0 - B,) + tuple(frames.shape[1:]),
                           jnp.float32)])
            gsh = np.concatenate([gsh, np.zeros((B0 - B, 2), np.float32)])
        dy, dx, ok, q = fn(jnp.asarray(frames, jnp.float32),
                           jnp.asarray(gsh), ref_d, ref_p1_d, oy_d, ox_d)
        dy = np.asarray(dy)[:B]
        dx = np.asarray(dx)[:B]
        ok = np.asarray(ok)[:B]
        q = np.asarray(q)[:B]
        for k, p in enumerate(pos):
            # content at ref position x sits at x − dx in the aligned
            # frame; failed solves fall back to global-only (zero local)
            ap_shifts[p, :, 0] = np.where(ok[k], dx[k], 0.0)
            ap_shifts[p, :, 1] = np.where(ok[k], dy[k], 0.0)
            ap_qual[p] = q[k]
    state.ap_shifts = ap_shifts
    state.ap_quality = ap_qual
    log_message(f"MPP shifts: {n} frames × {A} APs (multilevel "
                f"correlation, sw={args.search_width})")
    return state


# ---------------------------------------------------------------------------
# Stage C
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def _stack_stage_fn(S: int):
    """Stage-C fused chunk program: global FFT align → per-(frame, AP)
    patch cut at the solved integer origin → batched sub-pixel residual
    shift → selection-masked accumulate into the DONATED per-AP sum
    planes.  Only the (A, S, S) sums ever leave the device (once, at the
    end) — the round-2 committed version fetched every aligned frame and
    every shifted patch through the slow tunnel."""
    import functools as ft

    import jax
    import jax.numpy as jnp
    from jax import lax

    @ft.partial(jax.jit, donate_argnums=(0,))
    def run(acc_ap, frames, gshifts, iy, ix, resid, selmask):
        B, A = iy.shape
        aligned = _shift_core(frames, gshifts)

        def cutp(fr, iyr, ixr):
            return jax.vmap(lambda y0, x0: lax.dynamic_slice(
                fr, (y0, x0), (S, S)))(iyr, ixr)

        patches = jax.vmap(cutp)(aligned, iy, ix).reshape(-1, S, S)
        # subpixel residual centering: the desired center sits at patch
        # coord half+resid; move content by −resid
        shifted = _shift_core(patches, -resid.reshape(-1, 2))
        shifted = shifted.reshape(B, A, S, S) * \
            selmask[:, :, None, None]
        return acc_ap + shifted.sum(0)

    return run


def mpp_stack(seq, state: MPPState,
              args: Optional[MPPArgs] = None) -> SirilImage:
    import jax.numpy as jnp

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
    selm = np.zeros((n, A), np.float32)
    np.put_along_axis(selm, sel, 1.0, axis=0)

    xs = state.ap_xy[None, :, 0]
    ys = state.ap_xy[None, :, 1]
    fn = _stack_stage_fn(S)
    acc_ap = jnp.zeros((A, S, S), jnp.float32)
    B0 = args.frame_batch
    for chunk, frames in _read_frames(seq, indices, layer, B0):
        pos = [int(np.nonzero(indices == i)[0][0]) for i in chunk]
        B = len(pos)
        # local content at ref position x sits at x − lx in the
        # globally-aligned frame
        cx = xs - state.ap_shifts[pos, :, 0]
        cy = ys - state.ap_shifts[pos, :, 1]
        ix = np.clip(np.round(cx) - half, 0, W - S).astype(np.int32)
        iy = np.clip(np.round(cy) - half, 0, H - S).astype(np.int32)
        resid = np.stack([cx - (ix + half), cy - (iy + half)],
                         -1).astype(np.float32)
        gsh = state.global_shifts[pos].astype(np.float32)
        smk = selm[pos]
        if B < B0:      # pad the tail chunk: ONE compiled shape
            pad = B0 - B
            frames = jnp.concatenate(
                [jnp.asarray(frames, jnp.float32),
                 jnp.zeros((pad,) + tuple(frames.shape[1:]),
                           jnp.float32)])
            gsh = np.concatenate([gsh, np.zeros((pad, 2), np.float32)])
            iy = np.concatenate([iy, np.zeros((pad, A), np.int32)])
            ix = np.concatenate([ix, np.zeros((pad, A), np.int32)])
            resid = np.concatenate(
                [resid, np.zeros((pad, A, 2), np.float32)])
            smk = np.concatenate([smk, np.zeros((pad, A), np.float32)])
        acc_ap = fn(acc_ap, jnp.asarray(frames, jnp.float32),
                    jnp.asarray(gsh), jnp.asarray(iy), jnp.asarray(ix),
                    jnp.asarray(resid), jnp.asarray(smk))

    # final assembly on host: 147-odd windowed patch placements
    ap_sums = np.asarray(acc_ap, np.float64)
    win = (np.hanning(S)[:, None] * np.hanning(S)[None, :]).astype(np.float64)
    acc = np.zeros((H, W), np.float64)
    wacc = np.zeros((H, W), np.float64)
    counts = selm.sum(0)                                     # (A,)
    for a in range(A):
        x, y = state.ap_xy[a].astype(int)
        y0 = int(np.clip(y - half, 0, H - S))
        x0 = int(np.clip(x - half, 0, W - S))
        acc[y0:y0 + S, x0:x0 + S] += ap_sums[a] * win
        wacc[y0:y0 + S, x0:x0 + S] += win * counts[a]

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
