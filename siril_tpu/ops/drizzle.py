"""Drizzle — equivalent of ``src/drizzle/`` (STScI cdrizzle port:
do_kernel_square cdrizzlebox.c:941, dobox:1124, pixel mapping
cdrizzlemap.c; kernels square/turbo/point/gaussian/lanczos2/3, pixfrac,
per-pixel weight/coverage output; Bayer drizzle from CFA with per-color
weight planes).

TPU-native re-design: the reference scatters each input pixel's flux
onto the output grid — scatter-add lowers poorly on TPU.  Here drizzle
is expressed as a GATHER: every output pixel inverse-maps to input
coordinates and integrates the shrunken input pixels (side = pixfrac)
that its footprint overlaps.  For the affine/homography transforms used
in registration this is exact for 'turbo' (axis-aligned overlap — the
reference's fast path) and matches 'square' within the footprint
linearization; 'point' and 'gaussian'/'lanczos' kernels are direct tap
weights.  Each frame is one fused device pass; weight maps accumulate
alongside.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.utils.log import log_message

KERNEL_SQUARE = 0
KERNEL_TURBO = 1
KERNEL_POINT = 2
KERNEL_GAUSSIAN = 3
KERNEL_LANCZOS2 = 4
KERNEL_LANCZOS3 = 5

KERNEL_NAMES = {"square": KERNEL_SQUARE, "turbo": KERNEL_TURBO,
                "point": KERNEL_POINT, "gaussian": KERNEL_GAUSSIAN,
                "lanczos2": KERNEL_LANCZOS2, "lanczos3": KERNEL_LANCZOS3}


@dataclass
class DrizzleArgs:
    scale: float = 2.0
    pixfrac: float = 1.0
    kernel: int = KERNEL_SQUARE
    use_bayer: bool = False            # CFA-direct drizzle
    pattern: str = "RGGB"


def _frame_core(out_h: int, out_w: int, kernel: int, taps: int,
                nplanes: int = 1):
    import jax.numpy as jnp

    def run(frame, wplane, pid, Hinv, pixfrac, inv_scale, y_off=0):
        """One frame → ([nplanes] out, wht) contributions for the
        output row band [y_off, y_off+out_h).  ``y_off`` is a traced
        scalar so every band of a tiled output reuses ONE compiled
        program (each static-offset variant would be its own compile —
        a real hazard on this box's flaky remote-compile service).

        frame: (H, W); wplane: (H, W) input weights; pid: (H, W) int32
        plane id per input pixel (Bayer CFA: one call drizzles all three
        colors — the expensive tap gathers of frame/weights happen once
        instead of per plane); Hinv maps OUTPUT pixel coords → INPUT
        pixel coords.
        """
        H_in, W_in = frame.shape
        yy, xx = jnp.mgrid[0:out_h, 0:out_w]
        yy = yy + y_off
        xf = xx.astype(jnp.float32)
        yf = yy.astype(jnp.float32)
        d = Hinv[2, 0] * xf + Hinv[2, 1] * yf + Hinv[2, 2]
        sx = (Hinv[0, 0] * xf + Hinv[0, 1] * yf + Hinv[0, 2]) / d
        sy = (Hinv[1, 0] * xf + Hinv[1, 1] * yf + Hinv[1, 2]) / d
        # output pixel footprint half-size in input pixels
        half = 0.5 * inv_scale
        pf_half = 0.5 * pixfrac
        acc = [jnp.zeros((out_h, out_w), jnp.float32)
               for _ in range(nplanes)]
        wht = [jnp.zeros((out_h, out_w), jnp.float32)
               for _ in range(nplanes)]
        r = taps // 2
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                ix = jnp.round(sx).astype(jnp.int32) + dx
                iy = jnp.round(sy).astype(jnp.int32) + dy
                inb = (ix >= 0) & (ix < W_in) & (iy >= 0) & (iy < H_in)
                ixc = jnp.clip(ix, 0, W_in - 1)
                iyc = jnp.clip(iy, 0, H_in - 1)
                v = frame[iyc, ixc]
                wv = wplane[iyc, ixc]
                # framework convention: pixel center AT the integer index
                cx = ix.astype(jnp.float32)
                cy = iy.astype(jnp.float32)
                if kernel in (KERNEL_SQUARE, KERNEL_TURBO):
                    # 1D overlap of [sx−half, sx+half] with the shrunken
                    # pixel [cx−pf_half, cx+pf_half], per axis
                    ox = jnp.maximum(
                        jnp.minimum(sx + half, cx + pf_half) -
                        jnp.maximum(sx - half, cx - pf_half), 0.0)
                    oy = jnp.maximum(
                        jnp.minimum(sy + half, cy + pf_half) -
                        jnp.maximum(sy - half, cy - pf_half), 0.0)
                    w = ox * oy / (pixfrac * pixfrac)
                elif kernel == KERNEL_POINT:
                    w = ((jnp.abs(sx - cx) < 0.5) &
                         (jnp.abs(sy - cy) < 0.5)).astype(jnp.float32)
                elif kernel == KERNEL_GAUSSIAN:
                    sig = 0.42466 * pixfrac + 1e-6
                    d2 = (sx - cx) ** 2 + (sy - cy) ** 2
                    w = jnp.exp(-0.5 * d2 / (sig * sig))
                else:   # lanczos
                    a = 2.0 if kernel == KERNEL_LANCZOS2 else 3.0
                    tx = (sx - cx)
                    ty = (sy - cy)

                    def lcz(t):
                        pt = jnp.pi * t
                        s = jnp.where(jnp.abs(t) < 1e-7, 1.0,
                                      a * jnp.sin(pt) * jnp.sin(pt / a) /
                                      (pt * pt))
                        return jnp.where(jnp.abs(t) < a, s, 0.0)

                    w = lcz(tx) * lcz(ty)
                w = jnp.where(inb, w * wv, 0.0)
                if nplanes == 1:
                    acc[0] = acc[0] + w * v
                    wht[0] = wht[0] + w
                else:
                    p = pid[iyc, ixc]
                    for c in range(nplanes):
                        wc = jnp.where(p == c, w, 0.0)
                        acc[c] = acc[c] + wc * v
                        wht[c] = wht[c] + wc
        return jnp.stack(acc), jnp.stack(wht)

    return run


@lru_cache(maxsize=32)
def _drizzle_fn(out_h: int, out_w: int, kernel: int, taps: int,
                nplanes: int = 1):
    import jax

    return jax.jit(_frame_core(out_h, out_w, kernel, taps, nplanes))


@lru_cache(maxsize=32)
def _drizzle_batch_fn(out_h: int, out_w: int, kernel: int, taps: int,
                      cfa: bool, in_l: int, is_i16: bool):
    """Chunk-batched accumulate: ONE program per [K, L, H, W] frame
    chunk — a ``lax.scan`` over frames adds each drizzled contribution
    into the DONATED acc/wht planes.  Per-frame dispatch costs ~0.65 s
    of program overhead through the axon tunnel and re-reads the
    (multi-GB at 24 MP x2) accumulator from HBM per frame; the scan
    keeps one frame's contribution live at a time and XLA updates
    acc/wht in place.  ``cfa``: one CFA mosaic plane in → 3 color
    planes out; otherwise each of the ``in_l`` channels drizzles to its
    own plane."""
    import functools as ft

    import jax
    import jax.numpy as jnp
    from jax import lax

    nplanes = 3 if cfa else 1
    core = _frame_core(out_h, out_w, kernel, taps, nplanes)

    @ft.partial(jax.jit, donate_argnums=(0, 1))
    def run(acc, wht, frames, weights, wplane, pid, Hinvs, pixfrac,
            inv_scale, y_off):
        def body(carry, xs):
            a, w = carry
            f, wt, Hi = xs                     # f: (L, H, W)
            ff = (f.astype(jnp.float32) + 32768.0) * (1.0 / 65535.0) \
                if is_i16 else f
            if cfa:
                da, dw = core(ff[0], wplane * wt, pid, Hi, pixfrac,
                              inv_scale, y_off)
            else:
                parts = [core(ff[c], wplane * wt, pid, Hi, pixfrac,
                              inv_scale, y_off) for c in range(in_l)]
                da = jnp.concatenate([p[0] for p in parts])
                dw = jnp.concatenate([p[1] for p in parts])
            return (a + da, w + dw), None

        (acc, wht), _ = lax.scan(body, (acc, wht),
                                 (frames, weights, Hinvs))
        return acc, wht

    return run


def _taps_for(kernel: int, pixfrac: float, inv_scale: float) -> int:
    if kernel == KERNEL_POINT:
        return 3
    if kernel == KERNEL_LANCZOS2:
        return 5
    if kernel == KERNEL_LANCZOS3:
        return 7
    if kernel == KERNEL_GAUSSIAN:
        return 2 * int(np.ceil(3.0 * (0.42466 * pixfrac) + 0.5)) + 1
    # square/turbo: the 1-D overlap of [sx±inv_scale/2] with the shrunken
    # pixel [c±pixfrac/2] is zero beyond |c−sx| > (pixfrac+inv_scale)/2,
    # and |c − round(sx)| ≤ |c − sx| + 0.5 — the old ceil(support/2+0.5)
    # visited 25 taps where 9 carry weight (2.8× wasted gathers at 2×/0.9)
    reach = 0.5 * (pixfrac + inv_scale)
    return 2 * int(np.floor(reach + 0.5)) + 1


@lru_cache(maxsize=16)
def _finalize_fn(C: int, h: int, W: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(acc, wht, inv_n):
        out = jnp.clip(jnp.where(wht > 1e-9,
                                 acc / jnp.maximum(wht, 1e-9), 0.0),
                       0.0, 1.0)
        return jnp.stack([out, wht * inv_n])

    return run


class DrizzleAccumulator:
    """Accumulates drizzled frames into output + weight planes.

    The output is split into ROW BANDS of ≤ ~64M elements each: one
    (C, H, W) program at 200x24 Mpix x2 scale needs ~27 concurrent
    output-sized gather temporaries (~10 GB) plus double-buffered scan
    carries and reproducibly takes down the TPU worker; per-band
    programs bound the peak at a small cost in dispatch count, and the
    final fetch streams band by band."""

    BAND_ELEMS = 64 << 20

    def __init__(self, out_shape: Tuple[int, int, int],
                 args: Optional[DrizzleArgs] = None):
        import jax.numpy as jnp

        self.args = args or DrizzleArgs()
        self.C, self.H, self.W = out_shape
        n_bands = max(1, -(-(self.C * self.H * self.W)
                           // self.BAND_ELEMS))
        band_h = -(-self.H // n_bands)
        # uniform band height (the last band may overhang past H; its
        # extra rows are dropped at finalize) → ONE compiled program
        # covers every band via the runtime y_off
        self.bands = [(y0, band_h) for y0 in range(0, self.H, band_h)]
        # device-resident: per-frame host accumulation would fetch
        # 2×C×H×W through the slow device→host tunnel every frame
        self.acc = [jnp.zeros((self.C, h, self.W), jnp.float32)
                    for (_, h) in self.bands]
        self.wht = [jnp.zeros((self.C, h, self.W), jnp.float32)
                    for (_, h) in self.bands]
        self.nframes = 0

    def add_frame(self, img: SirilImage, H_reg: np.ndarray,
                  weight: float = 1.0, weight_plane=None):
        """H_reg maps frame coords → reference coords (regdata H).
        ``weight_plane``: optional per-pixel input weights (e.g. the
        master flat, cdrizzle weight map semantics)."""
        import jax.numpy as jnp

        a = self.args
        S = np.array([[a.scale, 0, 0], [0, a.scale, 0], [0, 0, 1.0]])
        Hfull = S @ H_reg                  # frame → output
        Hinv = np.linalg.inv(Hfull)
        inv_scale = 1.0 / a.scale
        taps = _taps_for(a.kernel, a.pixfrac, inv_scale)
        data = img.host()
        wp = (np.asarray(weight_plane, np.float32)
              if weight_plane is not None else None)
        if a.use_bayer and img.is_cfa():
            from siril_tpu.ops.demosaic import _cfa_masks, effective_pattern

            pat = effective_pattern(img.keywords.bayer_pattern or a.pattern,
                                    img.keywords.bayer_xoffset,
                                    img.keywords.bayer_yoffset)
            rm, gm, bm = _cfa_masks(pat, data.shape[1], data.shape[2])
            pid = (gm.astype(np.int32) + 2 * bm.astype(np.int32))
            w = np.full(data.shape[1:], weight, np.float32)
            if wp is not None:
                w = w * wp
            # upload once, OUTSIDE the band loop: per-band jnp.asarray
            # re-sent the full frame/weight/pid over the tunnel n_bands
            # times (~3× the wire traffic at 24 Mpix ×2 scale)
            data_d = jnp.asarray(data[0], jnp.float32)
            w_d = jnp.asarray(w)
            pid_d = jnp.asarray(pid)
            hinv_d = jnp.asarray(Hinv, jnp.float32)
            for bi, (y0, h) in enumerate(self.bands):
                fn = _drizzle_fn(h, self.W, a.kernel, taps, nplanes=3)
                acc, wht = fn(data_d, w_d, pid_d, hinv_d,
                              np.float32(a.pixfrac),
                              np.float32(inv_scale), np.int32(y0))
                self.acc[bi] = self.acc[bi] + acc
                self.wht[bi] = self.wht[bi] + wht
        else:
            pid0 = jnp.zeros((1, 1), jnp.int32)      # unused, nplanes=1
            wplane = np.full(data.shape[1:], weight, np.float32)
            if wp is not None:
                wplane = wplane * wp
            w_d = jnp.asarray(wplane)
            hinv_d = jnp.asarray(Hinv, jnp.float32)
            planes_d = [jnp.asarray(data[c], jnp.float32)
                        for c in range(min(self.C, data.shape[0]))]
            for bi, (y0, h) in enumerate(self.bands):
                fn = _drizzle_fn(h, self.W, a.kernel, taps)
                for c, plane_d in enumerate(planes_d):
                    acc, wht = fn(plane_d, w_d, pid0, hinv_d,
                                  np.float32(a.pixfrac),
                                  np.float32(inv_scale), np.int32(y0))
                    self.acc[bi] = self.acc[bi].at[c].add(acc[0])
                    self.wht[bi] = self.wht[bi].at[c].add(wht[0])
        self.nframes += 1

    def add_frames(self, frames: np.ndarray, Hs: np.ndarray,
                   weights=None, weight_plane=None,
                   pattern: Optional[str] = None):
        """Chunk-batched accumulate (ONE device program): ``frames`` is
        a [K, L, H, W] host array — i16 (u16-coded FITS fast path) or
        f32 — and ``Hs`` [K, 3, 3] frame→reference transforms.
        ``pattern``: effective Bayer pattern → CFA drizzle to 3 planes."""
        import jax.numpy as jnp

        a = self.args
        K, L = frames.shape[:2]
        cfa = pattern is not None
        S = np.array([[a.scale, 0, 0], [0, a.scale, 0], [0, 0, 1.0]],
                     np.float32)
        Hinvs = np.stack([np.linalg.inv(S @ Hs[k]).astype(np.float32)
                          for k in range(K)])
        inv_scale = 1.0 / a.scale
        taps = _taps_for(a.kernel, a.pixfrac, inv_scale)
        wts = (np.ones(K, np.float32) if weights is None
               else np.asarray(weights, np.float32))
        wplane = (np.asarray(weight_plane, np.float32)
                  if weight_plane is not None
                  else np.ones((1, 1), np.float32))
        if cfa:
            from siril_tpu.ops.demosaic import _cfa_masks

            rm, gm, bm = _cfa_masks(pattern, frames.shape[2],
                                    frames.shape[3])
            pid = (gm.astype(np.int32) + 2 * bm.astype(np.int32))
        else:
            pid = np.zeros((1, 1), np.int32)
        frames_d = jnp.asarray(frames)
        wts_d = jnp.asarray(wts)
        wplane_d = jnp.asarray(wplane)
        pid_d = jnp.asarray(pid)
        Hinvs_d = jnp.asarray(Hinvs)
        for bi, (y0, h) in enumerate(self.bands):
            fn = _drizzle_batch_fn(h, self.W, a.kernel, taps, cfa, L,
                                   frames.dtype == np.int16)
            self.acc[bi], self.wht[bi] = fn(
                self.acc[bi], self.wht[bi], frames_d, wts_d, wplane_d,
                pid_d, Hinvs_d, np.float32(a.pixfrac),
                np.float32(inv_scale), np.int32(y0))
        self.nframes += K

    def prime(self) -> None:
        """Compile the finalize program up front (on the zeroed
        accumulator).  Without this the normalize program's first
        compile happens AFTER the whole accumulation — the worst place
        for this box's remote compile service to hang."""
        if self.bands:
            out = _finalize_fn(*self.acc[0].shape)(
                self.acc[0], self.wht[0], np.float32(1.0))
            # block_until_ready() is a no-op on axon; a scalar fetch
            # actually waits for the compile + execution
            _ = np.asarray(out.ravel()[0])

    def finalize(self, want_weight: bool = True
                 ) -> Tuple[SirilImage, Optional[SirilImage]]:
        from siril_tpu.utils.fetch import fetch_np

        # normalize on device in ONE jitted program per band (eager
        # op-by-op would pay ~0.65 s dispatch per op per band), then
        # stream the result band by band
        out_h = np.empty((self.C, self.H, self.W), np.float32)
        wmap_h = np.empty((self.C, self.H, self.W), np.float32) \
            if want_weight else None
        inv_n = np.float32(1.0 / max(self.nframes, 1))
        for bi, (y0, h) in enumerate(self.bands):
            keep = min(h, self.H - y0)          # last band may overhang
            packed = fetch_np(_finalize_fn(*self.acc[bi].shape)(
                self.acc[bi], self.wht[bi], inv_n))
            out_h[:, y0:y0 + keep] = packed[0][:, :keep]
            if want_weight:
                wmap_h[:, y0:y0 + keep] = packed[1][:, :keep]
        img = SirilImage(data=np.ascontiguousarray(out_h))
        img.log_history(
            f"Drizzle stack x{self.args.scale} (pixfrac "
            f"{self.args.pixfrac}, {self.nframes} frames)")
        wmap = None if wmap_h is None else \
            SirilImage(data=np.ascontiguousarray(wmap_h))
        return img, wmap


def drizzle_sequence(seq, args: Optional[DrizzleArgs] = None,
                     reglayer: int = 0, frame_chunk: int = 8):
    """Drizzle-stack a registered sequence (the applyreg drizzle path,
    applyreg.c:1111 initialize_drizzle_params) without materializing the
    drizzled frames: chunks of raw frames upload (u16 when the FITS
    allows) and accumulate in one device program per chunk, with a
    read-ahead thread hiding disk latency."""
    import concurrent.futures as cf

    args = args or DrizzleArgs()
    reg = seq.reg(reglayer)
    sel = [int(i) for i in seq.selected_indices() if reg.valid[i]]
    if not sel:
        raise ValueError(
            "no selected frames with registration data to drizzle")
    first = seq.read_frame(sel[0])
    use_cfa = args.use_bayer and first.is_cfa()
    pattern = None
    if use_cfa:
        from siril_tpu.ops.demosaic import effective_pattern

        pattern = effective_pattern(
            first.keywords.bayer_pattern or args.pattern,
            first.keywords.bayer_xoffset, first.keywords.bayer_yoffset)
    C = 3 if use_cfa else first.nchans
    L, H_in, W_in = first.nchans, first.height, first.width
    out_shape = (C, int(seq.ry * args.scale), int(seq.rx * args.scale))
    acc = DrizzleAccumulator(out_shape, args)
    acc.prime()
    from siril_tpu.pipeline import _raw_reader

    read_chunk = _raw_reader(seq, sel, L, H_in, W_in)
    import time as _time

    starts = list(range(0, len(sel), frame_chunk))
    pool = cf.ThreadPoolExecutor(max_workers=1)
    pending = pool.submit(read_chunk, 0, min(frame_chunk, len(sel)))
    t_start = _time.perf_counter()
    for si, start in enumerate(starts):
        frames = pending.result()
        if si + 1 < len(starts):
            s2 = starts[si + 1]
            pending = pool.submit(read_chunk, s2,
                                  min(frame_chunk, len(sel) - s2))
        Hs = np.stack([reg.H[i] for i in
                       sel[start:start + frames.shape[0]]])
        acc.add_frames(frames, Hs, pattern=pattern)
        # backpressure: without this the loop dispatches every chunk as
        # fast as the disk reads, piling ~10 GB of in-flight input
        # buffers into HBM ahead of execution (crashes the worker at
        # 200x24 Mpix); the read-ahead thread still overlaps disk I/O.
        # On the axon platform block_until_ready() returns immediately —
        # only an actual fetch blocks — so sync via a 1-scalar fetch
        _ = np.asarray(acc.acc[-1].ravel()[0])
        if (si + 1) % 4 == 0 or si + 1 == len(starts):
            log_message(
                f"drizzle: {min(start + frame_chunk, len(sel))}"
                f"/{len(sel)} frames "
                f"({_time.perf_counter() - t_start:.0f}s)")
    pool.shutdown(wait=False)
    out, wmap = acc.finalize()
    log_message(f"Drizzle: {acc.nframes} frames → "
                f"{out.width}x{out.height}")
    return out, wmap
