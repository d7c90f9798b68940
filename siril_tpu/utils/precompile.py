"""Kernel pre-compilation — the FFTW-wisdom analog (settings.h:310-316).

The reference persists FFTW plans ("wisdom") so repeated FFT shapes are
instant; here the costly artifact is the XLA/Mosaic executable, and the
persistent compilation cache (utils/jaxcache.py) is the wisdom store.
``precompile`` AOT-compiles the standard kernel set at the exact shapes a
given stack configuration will use — block rejection kernels (Pallas or
jnp path, whatever the dispatcher would pick), the u16 decode, the fused
calibrate kernel, batched warps, and the normalization estimators — so a
later ``stack``/``fusedstack`` on a cold process starts hot.

Compilation uses ``jit(f).lower(ShapeDtypeStruct...).compile()``: no
device data is transferred, but the executable lands in the persistent
cache keyed by its HLO hash, which is what subsequent real calls hit.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _sds(shape, dtype):
    import jax

    return jax.ShapeDtypeStruct(shape, dtype)


def _compile(jitted, *args, **kwargs) -> float:
    t0 = time.perf_counter()
    jitted.lower(*args, **kwargs).compile()
    return time.perf_counter() - t0


def precompile_stack_kernels(n: int, width: int, height: int,
                             channels: int = 1,
                             rejections: Optional[Sequence[int]] = None,
                             normalize: Optional[int] = None,
                             siglow: float = 3.0, sighigh: float = 3.0,
                             block_mb: int = 2048,
                             log=None) -> List[Tuple[str, float]]:
    """Compile the rejection block kernels for an N×(C,H,W) stack at both
    the staged-stack block shape and the fused-pipeline block shapes.

    Returns [(kernel description, seconds)] for reporting.
    """
    import jax.numpy as jnp

    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.normalization import ADDITIVE_SCALING
    from siril_tpu.ops.stacking import make_block_kernel, plan_blocks

    if normalize is None:
        normalize = ADDITIVE_SCALING
    if rejections is None:
        rejections = [rj.WINSORIZED, rj.SIGMA]
    done: List[Tuple[str, float]] = []

    # block widths: staged stack pads every block to the planned height;
    # the fused pipeline uses 256 MB blocks plus a short tail block
    widths = {plan_blocks(height, width, n, block_mb) * width}
    fused_rows = max(1, min(height, (256 << 20) // max(n * width * 4, 1)))
    widths.add(fused_rows * width)
    if height % fused_rows:
        widths.add((height % fused_rows) * width)

    coef = _sds((n,), jnp.float32)
    for rtype in rejections:
        max_outliers = 0
        crit_shape = (1,)
        if rtype == rj.GESDT:
            max_outliers = max(int(np.floor(n * siglow)), 1)
            crit_shape = (max_outliers,)
        for pw in sorted(widths):
            for want_maps in (False, True):
                kern = make_block_kernel(
                    rtype, normalize, float(siglow), float(sighigh),
                    n, max_outliers, False, want_maps=want_maps)
                name = (f"reject[{rj_name(rtype)}] block=({n},{pw}) "
                        f"maps={want_maps}")
                t = _compile(kern, _sds((n, pw), jnp.float32), coef, coef,
                             coef, _sds((1, 1), jnp.float32),
                             _sds(crit_shape, jnp.float32))
                done.append((name, t))
                if log:
                    log(f"precompile: {name}: {t:.1f}s")
    return done


def precompile_pipeline_kernels(n: int, width: int, height: int,
                                channels: int = 1, frame_chunk: int = 16,
                                log=None) -> List[Tuple[str, float]]:
    """Compile the fused-pipeline per-chunk kernels: u16 decode, the
    calibrate kernel, translation warp, and the IKSS estimator pass."""
    import jax
    import jax.numpy as jnp

    done: List[Tuple[str, float]] = []
    chunk = min(frame_chunk, n)
    px = channels * height * width

    from siril_tpu.pipeline import _decode_fn, _est_fn

    chunk_sizes = {chunk}
    if n % frame_chunk:
        chunk_sizes.add(n % frame_chunk)          # tail chunk
    for cs in sorted(chunk_sizes):
        t = _compile(_decode_fn(),
                     _sds((cs, channels, height, width), jnp.int16))
        done.append((f"decode ({cs},{channels},{height},{width})", t))

    from siril_tpu.ops.calibration import make_calibrate_kernel

    kern = make_calibrate_kernel(True, True, True, True, False)
    img = _sds((channels, height, width), jnp.float32)
    t = _compile(kern, img, img, img, np.float32(1.0), img,
                 np.float32(1.0), _sds((height, width), jnp.bool_),
                 _sds((height, width), jnp.bool_))
    done.append((f"calibrate ({channels},{height},{width})", t))

    from siril_tpu.ops.interp import INTERP_LANCZOS4, _shift_batch_fn

    # warp_translation_batch sub-chunks each pipeline chunk to ~1 GiB
    wchunk = max(1, min(chunk, (256 << 20) // max(px * 4, 1)))
    wchunks = {wchunk}
    if chunk % wchunk:
        wchunks.add(chunk % wchunk)
    for wc in sorted(wchunks):
        t = _compile(
            _shift_batch_fn(INTERP_LANCZOS4, True, 32, True),
            _sds((wc, channels, height, width), jnp.float32),
            _sds((wc, 2), jnp.float32))
        done.append((f"warp_translation ({wc},{channels},"
                     f"{height},{width})", t))

    # rotation (FFT three-shear) warp — warp_rotation_batch is called
    # once per PIPELINE chunk and sub-chunks to ~64 MiB, padding tails
    # to the full sub-chunk, so the only executed shape per pipeline
    # chunk size is min(sub-chunk, pipeline-chunk)
    from siril_tpu.ops.interp import _rot_shear_fn

    rchunk = max(1, (64 << 20) // max(px * 4, 1))
    rchunks = {min(rchunk, cs) for cs in chunk_sizes}
    for rc in sorted(rchunks):
        t = _compile(_rot_shear_fn(height, width),
                     _sds((rc, channels, height, width), jnp.float32),
                     _sds((rc,), jnp.float32), _sds((rc,), jnp.float32),
                     _sds((rc, 2), jnp.float32), _sds((rc,), jnp.bool_))
        done.append((f"warp_rotation ({rc},{channels},"
                     f"{height},{width})", t))

    # affine (two-pass chirp-Z) warp — warp_affine_batch sub-chunks to
    # ~32 MiB (the CZT conv transients are ~8× the chunk, so its budget
    # is half the shear path's)
    from siril_tpu.ops.interp import _affine_czt_fn

    achunk = max(1, (32 << 20) // max(px * 4, 1))
    achunks = {min(achunk, cs) for cs in chunk_sizes}
    for ac in sorted(achunks):
        sig = (_sds((ac,), jnp.float32), _sds((ac,), jnp.float32))
        t = _compile(_affine_czt_fn(height, width),
                     _sds((ac, channels, height, width), jnp.float32),
                     _sds((ac, 2, 2), jnp.float32),
                     _sds((ac, 2), jnp.float32),
                     _sds((ac,), jnp.bool_), sig, sig)
        done.append((f"warp_affine ({ac},{channels},"
                     f"{height},{width})", t))

    # perspective (affine chirp-Z + residual shift passes) — rare
    # family, so it is compiled only when requested (see the -persp
    # flag); helper kept next to its siblings
    # _device_norm_coeffs sub-chunks estimator input to ~512 MiB
    hw = height * width
    sub = max(1, (512 << 20) // max(hw * 4, 1))
    subs = {min(sub, chunk)}
    if chunk % sub:
        subs.add(chunk % sub)
    for s in sorted(subs):
        t = _compile(_est_fn(False), _sds((s, hw), jnp.float32))
        done.append((f"estimators ({s},{hw})", t))

    # the fused per-chunk program (u16 decode + calibrate + detection
    # stats/candidates + batched LM PSF fit) — the program the fused
    # pipeline actually dispatches per chunk
    from siril_tpu.pipeline import _block_stream_fn, _chunk_program_builder
    from siril_tpu.registration.starfinder import (
        StarFinderParams,
        detection_radius,
    )

    p = StarFinderParams()
    R = detection_radius(height, width, p)
    calib_key = (True, True, True, True, False)
    img = _sds((channels, height, width), jnp.float32)
    bmask = _sds((height, width), jnp.bool_)
    for cs in sorted(chunk_sizes):
        prog = _chunk_program_builder(True, calib_key, True, R, 500,
                                      float(p.sigma), int(p.profile), 0)
        t = _compile(prog,
                     _sds((cs, channels, height, width), jnp.int16),
                     img, img, np.float32(1.0), img, np.float32(1.0),
                     bmask, bmask)
        done.append((f"fused chunk ({cs},{channels},{height},{width})", t))

    # the fused block-stream rejection programs (full + tail block)
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.normalization import ADDITIVE_SCALING

    shapes = []
    left = n
    while left > 0:
        cs = min(frame_chunk, left)
        shapes.append((cs, channels, height, width))
        left -= cs
    shapes_key = tuple(shapes)
    fused_rows = max(1, min(height, (256 << 20) // max(n * width * 4, 1)))
    row_set = {fused_rows}
    if height % fused_rows:
        row_set.add(height % fused_rows)
    coef = _sds((n,), jnp.float32)
    for rtype in (rj.WINSORIZED, rj.SIGMA):
        for blk_rows in sorted(row_set):
            fn = _block_stream_fn(shapes_key, blk_rows,
                                  (rtype, ADDITIVE_SCALING, 3.0, 3.0, n, 0))
            args = [_sds(s, jnp.float32) for s in shapes]
            args += [coef, coef, coef, _sds((1,), jnp.float32),
                     _sds((), jnp.int32), _sds((), jnp.int32)]
            t = _compile(fn, *args)
            done.append((f"block_stream[{rj_name(rtype)}] "
                         f"rows={blk_rows} n={n}", t))
    if log:
        for name, t in done:
            log(f"precompile: {name}: {t:.1f}s")
    return done


def precompile_perspective_kernels(n: int, width: int, height: int,
                                   channels: int = 1,
                                   frame_chunk: int = 16,
                                   dbuckets: Sequence[int] = (2, 4),
                                   log=None) -> List[Tuple[str, float]]:
    """Compile the perspective warp programs (affine chirp-Z + residual
    shift passes, ops/interp.py warp_perspective_batch).  Projective
    registrations are the rare family, and the program is parameterized
    by the static shift bound D (bucketed to {2,4,8,16}), so this is a
    separate opt-in set: pass the buckets the sequence is expected to
    hit (small-curvature fields land in 2 and 4)."""
    import jax.numpy as jnp

    from siril_tpu.ops.interp import _perspective_czt_fn

    done: List[Tuple[str, float]] = []
    px = channels * height * width
    chunk = min(frame_chunk, n)
    chunk_sizes = {chunk}
    if n % frame_chunk:
        chunk_sizes.add(n % frame_chunk)
    # warp_perspective_batch sub-chunks to ~24 MiB and pads tails to the
    # full sub-chunk, so the only executed batch per pipeline chunk size
    # is min(sub-chunk, pipeline-chunk)
    pchunk = max(int((24 << 20) // max(px * 4, 1)), 1)
    pchunks = {min(pchunk, cs) for cs in chunk_sizes}
    for D in sorted(set(int(d) for d in dbuckets)):
        for pc in sorted(pchunks):
            sig = (_sds((pc,), jnp.float32), _sds((pc,), jnp.float32))
            t = _compile(_perspective_czt_fn(height, width, D),
                         _sds((pc, channels, height, width), jnp.float32),
                         _sds((pc, 2, 2), jnp.float32),
                         _sds((pc, 2), jnp.float32),
                         _sds((pc, 3, 3), jnp.float32),
                         _sds((pc,), jnp.bool_), sig, sig)
            done.append((f"warp_perspective D={D} ({pc},{channels},"
                         f"{height},{width})", t))
            if log:
                log(f"precompile: {done[-1][0]}: {t:.1f}s")
    return done


def rj_name(rtype: int) -> str:
    from siril_tpu.ops import rejection as rj

    return {rj.NO_REJEC: "none", rj.PERCENTILE: "percentile",
            rj.SIGMA: "sigma", rj.MAD: "mad", rj.SIGMEDIAN: "sigmedian",
            rj.WINSORIZED: "winsorized", rj.LINEARFIT: "linearfit",
            rj.GESDT: "gesdt"}.get(rtype, str(rtype))
