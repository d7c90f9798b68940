"""Device-resident compute-only throughput probe.

The e2e bench number is wire-bound: the axon tunnel's H2D rate varies
7 MB/s – 1.7 GB/s across days, so on a degraded-tunnel day the e2e
capture says nothing about the chip.  This probe measures the chip's
actual pipeline throughput with (almost) zero wire traffic:

  * the raw u16 frames are GENERATED ON DEVICE (threefry),
  * the full fused chain — decode → calibrate → star-detection
    stats/candidates/PSF-fit → separable shift warp → normalization
    estimators → rejection stack — runs ``iters`` times inside ONE
    ``lax.fori_loop`` program (one dispatch, no per-iteration tunnel
    round-trips),
  * the only transfers are the program dispatch and one scalar fetch,
    whose round-trip latency is measured with a null program and
    subtracted.

The host-side triangle match + RANSAC step of the real pipeline is
excluded (it is host numpy, microseconds per frame, and does not touch
the chip); fixed per-frame shifts stand in for its output.  Everything
else is the same code the e2e pipeline dispatches (pipeline.py
``_chunk_program_builder``, ops/interp.py ``_shift_batch_fn``,
ops/stacking.py ``make_block_kernel``).

Reference equivalence: this is the work of preprocess.c:124 (calibrate),
findstar/PSF (algos/star_finder.c), the warp (opencv.cpp), and the
normalized winsorized stack (stacking/median_and_mean.c:590-1103), minus
disk I/O.
"""

from __future__ import annotations

import functools
import time

import numpy as np


@functools.lru_cache(maxsize=4)
def _probe_fn(n: int, size: int, iters: int, rtype: int, mode: int,
              stage: str):
    import jax
    import jax.numpy as jnp
    from jax import lax, random

    from siril_tpu.ops.calibration import make_calibrate_batch_kernel
    from siril_tpu.ops.statistics import norm_estimators_hist_jax
    from siril_tpu.ops.stacking import make_block_kernel
    from siril_tpu.registration.starfinder import (
        StarFinderParams,
        _stats_cand_fit_fn,
        detection_radius,
    )

    H = W = size
    calib = make_calibrate_batch_kernel(True, True, True, False, False)
    stats_cand = None
    if stage == "full":
        p = StarFinderParams()
        R = detection_radius(H, W, p)
        stats_cand = _stats_cand_fit_fn(R, 500, float(p.sigma),
                                        int(p.profile))
    kernel = make_block_kernel(rtype, mode, 3.0, 3.0, n, 0, False,
                               want_maps=False)
    from siril_tpu.ops.interp import _shift_batch_fn

    shift_warp = _shift_batch_fn(3, True, 32, False)    # lanczos4 + clamp

    def one_iter(i, raw, shifts, bias, dark, flat):
        # perturb the raw input with the loop index so XLA cannot hoist
        # the body out of the fori_loop
        x16 = raw + i.astype(jnp.int16)
        xf = (x16.astype(jnp.float32) + 32768.0) * (1.0 / 65535.0)
        xf = calib(xf, bias, dark, jnp.float32(1.0), flat,
                   jnp.float32(1.0),
                   jnp.zeros((0, 2), jnp.int32), jnp.zeros((0, 2), jnp.int32))
        acc = jnp.float32(0.0)
        if stats_cand is not None:
            stats, vals, idx, fits = stats_cand(xf[:, 0])
            acc = acc + stats.sum() + fits.sum()
        if stage == "stack":
            # smallest compile surface: decode+calibrate+reject-stack
            # (the pallas north-star kernel) — the fallback tier when
            # the remote compile service can't finish the full chain
            scale = jnp.ones(n, jnp.float32)
            offset = jnp.zeros(n, jnp.float32)
            warped = xf
        else:
            warped = shift_warp(xf, shifts + 1e-3 * i.astype(jnp.float32))
            est = norm_estimators_hist_jax(warped[:, 0].reshape(n, -1))
            scale = est["scale"][0] / jnp.where(est["scale"] == 0, 1.0,
                                                est["scale"])
            offset = scale * est["location"] - est["location"][0]
        mean, rl, rh = kernel(warped.reshape(n, -1), scale, offset,
                              jnp.ones(n, jnp.float32),
                              jnp.zeros((1, 1), jnp.float32),
                              jnp.zeros(1, jnp.float32))
        return acc + mean.sum() + rl + rh

    @jax.jit
    def run(seed):
        key = random.PRNGKey(seed)
        raw = random.randint(key, (n, 1, H, W), -32768, 32767, jnp.int16)
        shifts = random.uniform(random.fold_in(key, 1), (n, 2),
                                minval=-3.0, maxval=3.0)
        yy = jnp.linspace(0.0, 1.0, H)[:, None]
        xx = jnp.linspace(0.0, 1.0, W)[None, :]
        bias = jnp.full((1, H, W), 0.02, jnp.float32)
        dark = 0.004 + 0.001 * (yy * xx)[None]
        flat = 1.0 - 0.2 * ((yy - 0.5) ** 2 + (xx - 0.5) ** 2)[None]

        def body(i, acc):
            return acc + one_iter(i, raw, shifts, bias, dark, flat)

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return run


def _status(msg: str) -> None:
    import sys

    print(f"[compute_probe] {msg}", file=sys.stderr, flush=True)


def device_compute_probe(n: int = 8, size: int = 4096, iters: int = 3,
                         rtype: int | None = None, mode: int | None = None,
                         stage: str = "full") -> dict:
    """Measure device-resident fused-pipeline throughput.

    ``stage``: "full" (decode+calibrate+detect+warp+estimators+stack),
    "nodetect" (drops the PSF-fit stage), or "stack" (decode+calibrate+
    stack only — the smallest compile surface; use as a fallback when the
    remote compile service is degraded).

    Returns ``{"compute_mpix_s", "t_loop_s", "t_rtt_s", "n", "size",
    "iters", "stage", "checksum"}``.  The first call compiles
    (persistent-cache eligible); timing uses a second dispatch with a
    different seed, with the null-program round-trip latency subtracted.
    """
    import jax
    import jax.numpy as jnp

    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.normalization import ADDITIVE_SCALING

    rtype = rj.WINSORIZED if rtype is None else rtype
    mode = ADDITIVE_SCALING if mode is None else mode
    fn = _probe_fn(n, size, iters, rtype, mode, stage)

    # null round-trip: dispatch + scalar fetch latency through the tunnel
    t0 = time.monotonic()
    null = jax.jit(lambda s: s * jnp.float32(1.000001))
    float(null(jnp.float32(1.0)))                      # warm/compile
    _status(f"null program warm in {time.monotonic() - t0:.1f}s")
    t0 = time.monotonic()
    float(null(jnp.float32(2.0)))
    t_rtt = time.monotonic() - t0
    _status(f"round-trip latency {t_rtt:.2f}s; compiling {stage} "
            f"probe ({n}x{size}²×{iters})")

    t0 = time.monotonic()
    chk = float(fn(0))                                 # compile + warm
    _status(f"probe compiled+warm in {time.monotonic() - t0:.1f}s")
    t0 = time.monotonic()
    chk = float(fn(1))
    t_loop = time.monotonic() - t0
    t_compute = max(t_loop - t_rtt, 1e-3)
    mpix = iters * n * size * size / 1e6
    return {
        "compute_mpix_s": round(mpix / t_compute, 2),
        "t_loop_s": round(t_loop, 3),
        "t_rtt_s": round(t_rtt, 3),
        "n": n, "size": size, "iters": iters, "stage": stage,
        "checksum": chk,
    }
