"""Fused HBM-resident preprocessing pipeline — the TPU-first answer to
the reference's staged workflow (calibrate → register → stack, each
materializing a prefixed sequence on disk: preprocess.c, global.c,
stacking.c).

The reference materializes because files ARE its checkpoint system.  On
TPU the dominant costs are device→host fetches (the axon tunnel is
asymmetric: uploads ~1.7 GB/s, fetches 1–30 MB/s) and disk I/O, so this
pipeline keeps the whole stack resident in HBM across stages:

  raw u16 upload (once) → device decode → fused calibrate kernel →
  batched star detection → [host: triangle match + RANSAC, tiny] →
  batched warp (one call for all frames) → on-device estimators +
  rejection stack → ONE result fetch

For BASELINE's north-star config (calibrate+register+sigma-stack of
N×16MP lights) this moves N×2 bytes/px over the wire instead of
N×(4+4+4+4) for the staged path, and writes nothing intermediate.
Sequences that exceed the HBM budget raise MemoryError; the fusedstack
command surfaces it as a clean error telling the user to run the staged
calibrate/register/stack commands instead.

Checkpoint parity: pass ``write_intermediate=True`` to also materialize
``pp_``/``r_`` sequences like the reference (slower, resumable).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from siril_tpu.core.sequence import SEQ_FITSEQ, SEQ_REGULAR, Sequence
from siril_tpu.ops.calibration import CalibArgs, prepare_calibration
from siril_tpu.ops.normalization import NO_NORM, NormCoeffs
from siril_tpu.ops.stacking import StackArgs, StackResult, _finalize_metadata
from siril_tpu.ops import rejection as rj
from siril_tpu.registration.matching import (
    HOMOGRAPHY_TRANSFORMATION,
    SHIFT_TRANSFORMATION,
    match_stars,
)
from siril_tpu.registration.starfinder import StarFinderParams, detect_stars
from siril_tpu.utils.log import log_error, log_message

def _hbm_budget_bytes() -> int:
    """Fused-pipeline working-set budget from the real device HBM ×
    setmem ratio (utils/devmem.py); 6 GiB fallback off-device."""
    from siril_tpu.utils.devmem import device_hbm_bytes, memory_budget_bytes

    if device_hbm_bytes() is None:
        return 6 << 30
    return memory_budget_bytes()


@dataclass
class FusedArgs:
    calib: Optional[CalibArgs] = None
    register: bool = True
    ttype: int = SHIFT_TRANSFORMATION
    starfinder: StarFinderParams = field(default_factory=StarFinderParams)
    max_stars: int = 500
    min_pairs: int = 4
    interpolation: int = 3               # INTERP_LANCZOS4
    clamp: bool = True
    stack: StackArgs = field(default_factory=lambda: StackArgs(
        method="rej", rejection=rj.WINSORIZED))
    frame_chunk: int = 16                # calibrate/decode batch size


def fused_preprocess_stack(seq: Sequence, args: Optional[FusedArgs] = None
                           ) -> StackResult:
    import jax
    import jax.numpy as jnp

    args = args or FusedArgs()
    t0 = time.perf_counter()
    indices = seq.selected_indices()
    n = len(indices)
    if n == 0:
        raise ValueError("no frames selected")
    first = seq.read_frame(int(indices[0]))
    L, H, W = first.nchans, first.height, first.width
    if seq.nb_layers < 0:
        seq.nb_layers = L
    if seq.ry == 0:
        seq.ry, seq.rx = H, W
    total_f32 = n * L * H * W * 4
    # chunked working set: the stack itself + ~2 chunk-sized temporaries
    # (warp in/out, stream block) — frames are never held twice
    need = total_f32 + 3 * args.frame_chunk * L * H * W * 4
    if need > _hbm_budget_bytes():
        raise MemoryError(
            f"fused pipeline needs ~{need >> 30} GiB HBM; use the "
            "staged calibrate/register/stack commands for this sequence")

    # ---- 1. upload + decode + calibrate, in frame chunks -----------------
    from siril_tpu.utils.trace import stage

    cal_state = None
    if args.calib is not None:
        with stage("fused.prepare_masters"):
            cal_state = prepare_calibration(args.calib, first)
    layer = min(args.stack.reglayer, L - 1)
    decoded: List = []
    detect_parts: List = []
    pool_read = _raw_reader(seq, indices, L, H, W)
    sync_trace = bool(os.environ.get("SIRIL_TPU_SYNC_TRACE"))
    # read-ahead double buffering: decode chunk k+1 on a worker thread
    # while chunk k uploads/computes
    from concurrent.futures import ThreadPoolExecutor

    starts = list(range(0, n, args.frame_chunk))
    ahead = ThreadPoolExecutor(max_workers=2)

    def _count(s):
        return len(indices[s:s + args.frame_chunk])

    # depth-2 prefetch (~2 chunks of host RAM): disk streams at
    # ~180 MB/s here, so a single-chunk lookahead still stalls the loop
    pending = [ahead.submit(pool_read, s, _count(s)) for s in starts[:2]]
    for si, start in enumerate(starts):
        chunk_idx = indices[start:start + args.frame_chunk]
        with stage("fused.read" if sync_trace else "fused.read.async"):
            raw = pending.pop(0).result()               # np i16 or f32
            if si + 2 < len(starts):
                s2 = starts[si + 2]
                pending.append(ahead.submit(pool_read, s2, _count(s2)))
        with stage("fused.upload" if sync_trace else "fused.upload.async"):
            dev = jax.device_put(raw)
            if sync_trace:
                dev.block_until_ready()
        # ONE fused program per chunk: decode + calibrate + detection
        # stats/candidates.  Splitting these into separate dispatches
        # (and per-frame slices) costs ~0.5 s per intermediate program
        # execution through the axon tunnel — fusing them took the
        # 40×16 Mpix upload+detect phase from ~120 s to ~15 s
        want_detect = args.register and n > 1
        prog = _chunk_program(
            raw.dtype == np.int16, cal_state,
            want_detect, H, W, args.starfinder, args.max_stars, layer)
        out = prog(dev, *_calib_operands(cal_state))
        xf = out[0]
        if sync_trace:
            xf.block_until_ready()
        decoded.append(xf)
        if want_detect:
            detect_parts.append(tuple(out[1:]))
    ahead.shutdown(wait=False)
    # frames stay a LIST of chunk arrays end-to-end: one [N,...] array
    # plus its warped copy would double the HBM footprint (OOM at
    # 100×16 Mpix); every later stage operates per chunk or per
    # pixel-row block
    frames = decoded
    del decoded
    log_message(f"fused: {n} frames resident "
                f"({total_f32 >> 20} MiB f32) in "
                f"{time.perf_counter() - t0:.1f}s")

    # ---- 2. registration (star detect on device slices) ------------------
    sa = args.stack
    do_norm = sa.normalize != NO_NORM
    coeffs = None
    Hs = np.tile(np.eye(3), (n, 1, 1))
    if args.register and n > 1:
        ref_pos = 0
        ref_abs = seq.get_reference()
        if ref_abs in list(indices):
            ref_pos = int(np.nonzero(indices == ref_abs)[0][0])
        from siril_tpu.registration.starfinder import detect_stars_batch

        with stage("fused.star_detection"):
            # stats+candidates were dispatched chunk-by-chunk during
            # upload; pack them into ONE array on device and fetch once
            # (each separate fetch pays 1–2 s of tunnel latency), then
            # finish (patch gather + PSF fit)
            with stage("fused.fetch_pre"):
                from siril_tpu.utils.fetch import fetch_np

                K = int(detect_parts[0][1].shape[1])
                nfit = int(detect_parts[0][3].shape[-1])
                with stage("fused.fetch_pre.pack"):
                    packed_det = _detect_pack_fn(
                        tuple(int(p[1].shape[0]) for p in detect_parts))(
                            detect_parts)
                with stage("fused.fetch_pre.wait"):
                    _ = np.asarray(packed_det.ravel()[0])
                with stage("fused.fetch_pre.fetch"):
                    hd = fetch_np(packed_det)
                o1, o2, o3 = 3 * n, 3 * n + n * K, 3 * n + 2 * n * K
                stats_h = hd[:o1].reshape(3, n)
                vals_h = hd[o1:o2].reshape(n, K)
                idx_h = np.ascontiguousarray(
                    hd[o2:o3]).view(np.int32).reshape(n, K)
                fits_h = hd[o3:].reshape(n, K, nfit)
                pre = (stats_h, vals_h, idx_h, fits_h)
            stars_all = detect_stars_batch([c[:, layer] for c in frames],
                                           args.starfinder,
                                           max_stars=args.max_stars,
                                           precomputed=pre)
        ref_stars = stars_all[ref_pos]
        if len(ref_stars) < args.min_pairs:
            raise RuntimeError("not enough stars on the reference frame")
        reg = seq.reg(layer)
        ok = 0
        # matching is host-side numpy — run frames concurrently (the
        # vectorized triangle matcher spends its time in BLAS/numpy which
        # releases the GIL)
        from concurrent.futures import ThreadPoolExecutor

        def _match(k):
            if k == ref_pos:
                return None
            return match_stars(ref_stars, stars_all[k], ttype=args.ttype,
                               min_pairs=args.min_pairs)

        with stage("fused.match"), \
                ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 4)) \
                as pool:
            matches = list(pool.map(_match, range(n)))
        for k in range(n):
            if k == ref_pos:
                reg.H[int(indices[k])] = np.eye(3)
                reg.valid[int(indices[k])] = True
                ok += 1
                continue
            m = matches[k]
            if m is None:
                log_error(f"fused: frame {int(indices[k]) + 1} failed to "
                          "match; excluded")
                seq.incl[int(indices[k])] = False
                Hs[k] = np.nan
                continue
            Hs[k] = m.H
            reg.H[int(indices[k])] = m.H
            reg.valid[int(indices[k])] = True
            ok += 1
        log_message(f"fused: registered {ok}/{n} frames in "
                    f"{time.perf_counter() - t0:.1f}s")
        # ---- 3. batched warp (one device call) ---------------------------
        from siril_tpu.ops.interp import warp_homography_batch

        good = ~np.isnan(Hs[:, 0, 0])
        if not good.all():
            kept, base = [], 0
            for c in frames:
                m = good[base:base + c.shape[0]]
                base += c.shape[0]
                if m.all():
                    kept.append(c)
                elif m.any():
                    kept.append(c[np.nonzero(m)[0]])
            frames = kept
            Hs = Hs[good]
            indices = indices[good]
            n = len(indices)
        # normalization estimators run on the PRE-warp calibrated frames
        # (still resident here; the translation warp donates them).  The
        # reference computes them post-warp (normalization.c) only
        # because its staged pipeline stacks from materialized r_ files;
        # the ringing clamp (opencv.cpp:539) substitutes the bilinear
        # guide on noise undershoots, which smooths background noise
        # ~40% on every NON-reference frame (the identity-warped
        # reference keeps raw noise) — post-warp IKSS scale estimates
        # then make additive-scaling amplify every other frame's stars
        # ~1.6x.  Pre-warp estimators measure the frame's true
        # gain/level, which is what normalization is meant to equalize.
        if do_norm:
            coeffs = _device_norm_coeffs(frames, n, L, sa, seq, indices)
        with stage("fused.warp"):
            from siril_tpu.ops.interp import (
                affines_from_Hs,
                perspective_split_from_Hs,
                rotations_from_Hs,
                translations_from_Hs,
                warp_affine_batch,
                warp_homography_batch,
                warp_perspective_batch,
                warp_rotation_batch,
                warp_translation_batch,
            )

            from siril_tpu.ops.interp import INTERP_LANCZOS4

            shifts = translations_from_Hs(Hs)
            # the FFT shear/CZT paths interpolate with exact sinc —
            # only substitute them for the lanczos4 (truncated-sinc)
            # request; nearest/bilinear/cubic users get the gather warp
            # with the kernel they asked for.  Family ladder, cheapest
            # first: translation → rotation (3-shear) → affine (2-pass
            # chirp-Z: focal drift / similarity / skew) → perspective
            # (affine chirp-Z + bounded residual shifts: mosaic tiles,
            # astrometric H) → gather (strong perspective, SIP
            # distortion).
            rot = aff = persp = None
            if shifts is None and args.interpolation == INTERP_LANCZOS4:
                rot = rotations_from_Hs(Hs, (H, W))
                if rot is None:
                    aff = affines_from_Hs(Hs, (H, W))
                if rot is None and aff is None:
                    persp = perspective_split_from_Hs(Hs, (H, W))
            base = 0
            for ci, c in enumerate(frames):
                ni = c.shape[0]
                if shifts is not None:
                    # pure translations: separable shift filter (VPU)
                    # instead of the gather-based homography warp
                    # (~100x on TPU); donated input — warped chunk
                    # reuses the decoded chunk's HBM
                    frames[ci] = warp_translation_batch(
                        c, shifts[base:base + ni], args.interpolation,
                        args.clamp, donate=True)
                elif rot is not None:
                    # rotation+translation (field rotation, the common
                    # `register` case): FFT three-shear warp — batched
                    # 1-D FFTs + phase ramps, no gathers (~40x the
                    # gather warp at 16 Mpix)
                    frames[ci] = warp_rotation_batch(
                        c, tuple(a[base:base + ni] for a in rot),
                        clamp=args.clamp)
                elif aff is not None:
                    # scale/skew (focal drift, similarity): two-pass
                    # chirp-Z resample — batched FFTs, no gathers
                    # (~10x the gather warp; the clamp guide is the
                    # only gather left, at 4 taps)
                    frames[ci] = warp_affine_batch(
                        c, tuple(a[base:base + ni] for a in aff),
                        clamp=args.clamp)
                elif persp is not None:
                    # mild perspective (mosaic tiles, astrometric H):
                    # affine chirp-Z passes + near-identity residual
                    # shift passes — statically shifted slices with
                    # per-pixel lanczos weights, still no gathers
                    M, b, flip, K, D = persp
                    sl = np.s_[base:base + ni]
                    frames[ci] = warp_perspective_batch(
                        c, (M[sl], b[sl], flip[sl], K[sl], D),
                        clamp=args.clamp)
                else:
                    frames[ci] = warp_homography_batch(
                        c, Hs[base:base + ni], (H, W),
                        args.interpolation, args.clamp)
                base += ni
            del c

    # ---- 4. on-device estimators + rejection stack -----------------------
    log_message(f"fused: warp done in {time.perf_counter() - t0:.1f}s")
    if coeffs is None:
        coeffs = _device_norm_coeffs(frames, n, L, sa, seq, indices) \
            if do_norm \
            else NormCoeffs(np.zeros((L, n)), np.ones((L, n)), np.ones((L, n)))

    # stream the rejection kernel over pixel-row blocks: each block
    # gathers the same rows from every chunk into one (n, rows·W) array,
    # so only the stack itself (chunked) + one block live in HBM.
    # Each block is ONE fused program (slice-from-every-chunk + concat +
    # kernel): eager per-block jnp ops each execute as a separate program
    # through the axon tunnel (~0.65 s dispatch), which used to add
    # ~30 s at 40×16 Mpix.  The block row offset and channel are runtime
    # scalars so all full blocks share one executable.
    rows = max(1, min(H, (256 << 20) // max(n * W * 4, 1)))
    nblocks = -(-H // rows)
    rtype = sa.rejection if sa.method == "rej" else rj.NO_REJEC
    # GESDT needs its outlier budget + ESD critical-value table wired in
    # (same wiring as the staged path, ops/stacking.py) — with
    # max_outliers=0 the kernel would silently reject nothing
    max_outliers = 0
    critical = np.zeros(1, np.float32)
    if rtype == rj.GESDT:
        max_outliers = int(np.floor(n * sa.siglow))
        critical = rj.gesdt_critical_values(n, sa.sighigh, max_outliers)
    crit_dev = jnp.asarray(critical, jnp.float32)
    kernel_cfg = (rtype, sa.normalize if do_norm else NO_NORM,
                  float(sa.siglow), float(sa.sighigh), n, max_outliers)
    shapes_key = tuple(tuple(ch.shape) for ch in frames)
    means, rls, rhs = [], [], []
    for c in range(L):
        sc = jnp.asarray(coeffs.scale[c], jnp.float32)
        off = jnp.asarray(coeffs.offset[c], jnp.float32)
        mu = jnp.asarray(coeffs.mul[c], jnp.float32)
        for b in range(nblocks):
            y0 = b * rows
            blk_rows = min(rows, H - y0)
            # a short tail block compiles its own executable (padding
            # would push normalized pad pixels through rejection and
            # pollute the counts); the compile cache amortizes it
            fn = _block_stream_fn(shapes_key, blk_rows, kernel_cfg)
            mean, rl, rh = fn(*frames, sc, off, mu, crit_dev,
                              np.int32(y0), np.int32(c))
            means.append(mean)
            rls.append(rl)
            rhs.append(rh)

    packed = _pack_fn(tuple(int(m.shape[0]) for m in means))(
        tuple(means), tuple(rls), tuple(rhs))
    with stage("fused.stack+fetch"):
        from siril_tpu.utils.fetch import fetch_np

        host = fetch_np(packed)                          # the ONE fetch
    result = host[:L * H * W].reshape(L, H, W).astype(np.float32)
    tot = (int(host[-2]), int(host[-1]))
    if sa.output_norm:
        from siril_tpu.ops.stacking import norm_to_0_1_range

        result = norm_to_0_1_range(result)
    else:
        result = np.clip(result, 0.0, 1.0)
    img = _finalize_metadata(seq, indices, result)
    img.log_history("Fused calibrate+register+stack (HBM-resident)")
    res = StackResult(image=img, total_rejected=tot,
                      elapsed_s=time.perf_counter() - t0)
    log_message(f"fused pipeline: {n} frames → stack in "
                f"{res.elapsed_s:.2f}s, rejected {tot[0]}/{tot[1]} px")
    return res


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=32)
def _block_stream_fn(shapes_key, blk_rows, kernel_cfg):
    """ONE fused program per pixel-row block of the streamed rejection
    stack: dynamic-slice the same ``blk_rows`` rows (runtime offset
    ``y0``, runtime channel ``c``) out of every resident chunk, stack
    them into the (n, rows·W) block, and run the fused
    normalize+reject+mean kernel — a single dispatch per block."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from siril_tpu.ops.stacking import make_block_kernel

    rtype, mode, siglow, sighigh, n, max_outliers = kernel_cfg
    kernel = make_block_kernel(rtype, mode, siglow, sighigh, n,
                               max_outliers, False, want_maps=False)

    @jax.jit
    def run(*args):
        chunks = args[:len(shapes_key)]
        sc, off, mu, crit, y0, c = args[len(shapes_key):]
        parts = []
        for ch in chunks:
            ni, _, Hc, Wc = ch.shape
            sl = lax.dynamic_slice(ch, (0, c, y0, 0),
                                   (ni, 1, blk_rows, Wc))
            parts.append(sl.reshape(ni, blk_rows * Wc))
        block = jnp.concatenate(parts, axis=0)
        return kernel(block, sc, off, mu,
                      jnp.zeros((1, 1), jnp.float32), crit)

    return run


@functools.lru_cache(maxsize=8)
def _detect_pack_fn(chunk_ns):
    """Pack per-chunk detection outputs (stats [3,nᵢ], vals [nᵢ,K],
    idx [nᵢ,K] i32) into ONE flat f32 array for a single fetch; i32
    candidate indices ride as bitcast f32 (exact for any value)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(parts):
        stats = jnp.concatenate([p[0] for p in parts], axis=1)
        vals = jnp.concatenate([p[1] for p in parts], axis=0)
        idx = jnp.concatenate([p[2] for p in parts], axis=0)
        fits = jnp.concatenate([p[3] for p in parts], axis=0)
        return jnp.concatenate([
            stats.ravel(), vals.ravel(),
            lax.bitcast_convert_type(idx.astype(jnp.int32),
                                     jnp.float32).ravel(),
            fits.ravel()])

    return run


@functools.lru_cache(maxsize=8)
def _pack_fn(mean_lens):
    """Single program packing all block means + total rejection counts
    into one flat array for the ONE result fetch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(means, rls, rhs):
        rl = sum(r.astype(jnp.float32) for r in rls)
        rh = sum(r.astype(jnp.float32) for r in rhs)
        return jnp.concatenate(list(means) + [rl[None], rh[None]])

    return run


def _raw_reader(seq: Sequence, indices, L, H, W):
    """Returns chunk reader producing native i16 (u16 FITS fast path) or
    f32 host arrays, [chunk, L, H, W] top-down."""
    import concurrent.futures as cf

    u16 = False
    if seq.seq_type in (SEQ_REGULAR, SEQ_FITSEQ):
        try:
            r0 = seq.open_reader(int(indices[0]))
            u16 = (r0.hdu.bitpix == 16 and r0.hdu.bzero == 32768.0
                   and r0.hdu.bscale == 1.0)
        except (ValueError, OSError):
            u16 = False
    pool = cf.ThreadPoolExecutor(max_workers=8)

    def read_chunk(start, count):
        if u16:
            out = np.empty((count, L, H, W), np.int16)

            def one(j):
                r = seq.open_reader(int(indices[start + j]))
                mm = r._mm
                a = mm[:, ::-1, :] if r.bottom_up else mm
                out[j] = np.ascontiguousarray(a).astype("<i2")
        else:
            out = np.empty((count, L, H, W), np.float32)

            def one(j):
                out[j] = seq.read_frame(int(indices[start + j])).host()

        list(pool.map(one, range(count)))
        return out

    return read_chunk


@functools.lru_cache(maxsize=1)
def _decode_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x16):
        return (x16.astype(jnp.float32) + 32768.0) * (1.0 / 65535.0)

    return run


def _calib_operands(st):
    """Uniform operand tuple for the fused chunk program."""
    import jax.numpy as jnp

    if st is None:
        return ()
    bias = st["bias"] if st["bias"] is not None else jnp.zeros((1, 1, 1))
    dark = st["dark"] if st["dark"] is not None else jnp.zeros((1, 1, 1))
    flat = st["flat"] if st["flat"] is not None else jnp.ones((1, 1, 1))
    return (bias, dark, np.float32(1.0), flat,
            np.float32(st["inv_flat_mu"]), st["cold"], st["hot"])


@functools.lru_cache(maxsize=16)
def _chunk_program_builder(is_i16, calib_key, want_detect, R, K, sigma,
                           profile, layer):
    import jax
    import jax.numpy as jnp

    kern = None
    if calib_key is not None:
        from siril_tpu.ops.calibration import make_calibrate_batch_kernel

        kern = make_calibrate_batch_kernel(*calib_key)
    stats_cand = None
    if want_detect:
        from siril_tpu.registration.starfinder import _stats_cand_fit_fn

        stats_cand = _stats_cand_fit_fn(R, K, sigma, profile)

    @jax.jit
    def run(raw, *cal):
        xf = (raw.astype(jnp.float32) + 32768.0) * (1.0 / 65535.0) \
            if is_i16 else raw
        if kern is not None:
            xf = kern(xf, *cal)
        if stats_cand is None:
            return (xf,)
        stats, vals, idx, fits = stats_cand(xf[:, layer])
        return (xf, stats, vals, idx, fits)

    return run


def _chunk_program(is_i16, cal_state, want_detect, H, W, p, max_stars,
                   layer):
    """ONE jitted program per chunk config: decode + fused calibrate +
    detection stats/candidates + batched PSF fit (see the call-site
    comment on why)."""
    from siril_tpu.registration.starfinder import detection_radius

    calib_key = None
    if cal_state is not None:
        calib_key = (cal_state["bias"] is not None,
                     cal_state["dark"] is not None,
                     cal_state["flat"] is not None,
                     cal_state["has_cc"], cal_state["is_cfa"])
    R = detection_radius(H, W, p) if want_detect else 0
    return _chunk_program_builder(is_i16, calib_key, want_detect, R,
                                  int(max_stars),
                                  float(p.sigma) if want_detect else 0.0,
                                  int(p.profile) if want_detect else 0,
                                  layer)


@functools.lru_cache(maxsize=4)
def _est_fn(lite: bool):
    """Jitted per-layer estimator pass — eager jnp ops here would load a
    separate executable per op through the tunnel (~70 s at 20×4 Mpix)."""
    import jax
    import jax.numpy as jnp

    from siril_tpu.ops.statistics import norm_estimators_hist_jax

    @jax.jit
    def run(layer_flat):
        e = norm_estimators_hist_jax(layer_flat, lite=lite)
        return jnp.stack([e["location"], e["scale"]])

    return run


def _device_norm_coeffs(frames, n, L, sa: StackArgs, seq, indices
                        ) -> NormCoeffs:
    """Per-frame estimators on the resident stack → offset/scale/mul
    (compute_factors_from_estimators semantics, normalization.c:146)."""
    import jax.numpy as jnp

    from siril_tpu.ops.normalization import (
        ADDITIVE,
        ADDITIVE_SCALING,
        MULTIPLICATIVE,
        MULTIPLICATIVE_SCALING,
    )

    from siril_tpu.utils.trace import stage

    # frames: a list of [n_i, L, H, W] chunk arrays (fused pipeline) or
    # one [N, L, H, W] array; estimators are per-frame independent, so
    # sub-chunk each piece to bound the IKSS temporaries (~5× its input)
    chunks = list(frames) if isinstance(frames, (list, tuple)) else [frames]
    px = int(np.prod(chunks[0].shape[2:]))
    run = _est_fn(bool(sa.lite_norm))
    sub = max(1, (512 << 20) // max(px * 4, 1))
    with stage("fused.estimators"):
        cols = []
        for c in range(L):
            parts = []
            for ch in chunks:
                flat = ch[:, c].reshape(ch.shape[0], -1)
                for s0 in range(0, flat.shape[0], sub):
                    parts.append(run(flat[s0:s0 + sub]))
            cols.append(jnp.concatenate(parts, axis=1))
        host = np.asarray(jnp.stack(cols))          # [L, 2, N] one fetch
    loc = host[:, 0]
    sca = host[:, 1]
    ref_abs = seq.get_reference()
    try:
        ref_pos = int(np.nonzero(indices == ref_abs)[0][0])
    except IndexError:
        ref_pos = 0
    offset = np.zeros((L, n))
    scale = np.ones((L, n))
    mul = np.ones((L, n))
    for c in range(L):
        loc0, sca0 = loc[c, ref_pos], sca[c, ref_pos]
        if sa.normalize in (ADDITIVE_SCALING, MULTIPLICATIVE_SCALING):
            s = sca[c]
            scale[c] = np.where(s == 0, 1.0, sca0 / np.where(s == 0, 1, s))
        if sa.normalize in (ADDITIVE, ADDITIVE_SCALING):
            offset[c] = scale[c] * loc[c] - loc0
        elif sa.normalize in (MULTIPLICATIVE, MULTIPLICATIVE_SCALING):
            lv = loc[c]
            mul[c] = np.where(lv == 0, 1.0, loc0 / np.where(lv == 0, 1, lv))
    return NormCoeffs(offset, mul, scale)
