"""Device-resident compute-only throughput probe.

The e2e bench number is wire-bound: the axon tunnel's H2D rate varies
7 MB/s – 1.7 GB/s across days, so on a degraded-tunnel day the e2e
capture says nothing about the chip.  This probe measures the chip's
actual pipeline throughput with (almost) zero wire traffic:

  * the raw u16 frames are GENERATED ON DEVICE (threefry),
  * the requested stage subset of the fused chain — decode → calibrate
    → star-detection stats/candidates/PSF-fit → separable shift warp →
    normalization estimators → rejection stack — runs ``iters`` times
    inside ONE ``lax.fori_loop`` program (one dispatch, no
    per-iteration tunnel round-trips),
  * the only transfers are the program dispatch and one scalar fetch,
    whose round-trip latency is measured with a null program and
    subtracted.

The host-side triangle match + RANSAC step of the real pipeline is
excluded (it is host numpy, microseconds per frame, and does not touch
the chip); fixed per-frame shifts stand in for its output.  Everything
else is the same code the e2e pipeline dispatches (pipeline.py
``_chunk_program_builder``, ops/interp.py ``_shift_batch_fn``,
ops/stacking.py ``make_block_kernel``).

Stage ladder (cumulative unless noted) for per-stage attribution —
the driver-facing ``stages_mpix_s`` dict (VERDICT r4 ask #2):

  sum       one streaming read of the raw i16 stack (roofline probe)
  calib     decode u16→f32 + bias/dark/flat calibration
  stats     + detection background/noise (histogram medians)
  cand      + local-maxima candidates (max-pool + top-k)
  detect    + patch gather + batched LM PSF fit  (= full detection)
  warp      calib + separable lanczos4 shift warp      (detect skipped)
  est       calib + warp + IKSS normalization estimators
  stack     calib + rejection stack                    (smallest surface)
  nodetect  calib + warp + est + stack
  full      everything (the headline chain)

Reference equivalence: this is the work of preprocess.c:124 (calibrate),
findstar/PSF (algos/star_finder.c), the warp (opencv.cpp), and the
normalized winsorized stack (stacking/median_and_mean.c:590-1103), minus
disk I/O.
"""

from __future__ import annotations

import functools
import time

import numpy as np

# feature sets per stage name; order here is the canonical ladder order
STAGE_FEATURES = {
    "sum": frozenset(),
    "calib": frozenset({"calib"}),
    "stats": frozenset({"calib", "stats"}),
    "cand": frozenset({"calib", "stats", "cand"}),
    "detect": frozenset({"calib", "stats", "cand", "fit"}),
    "warp": frozenset({"calib", "warp"}),
    "est": frozenset({"calib", "warp", "est"}),
    "stack": frozenset({"calib", "stack"}),
    "nodetect": frozenset({"calib", "warp", "est", "stack"}),
    "full": frozenset({"calib", "stats", "cand", "fit", "warp", "est",
                       "stack"}),
}


@functools.lru_cache(maxsize=16)
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
        _candidate_fn,
        _stats_cand_fit_fn,
        detection_radius,
    )

    feats = STAGE_FEATURES[stage]
    H = W = size
    calib = make_calibrate_batch_kernel(True, True, True, False, False)
    p = StarFinderParams()
    R = detection_radius(H, W, p)
    stats_cand = None
    if "fit" in feats:
        stats_cand = _stats_cand_fit_fn(R, 500, float(p.sigma),
                                        int(p.profile))
    kernel = None
    if "stack" in feats:
        kernel = make_block_kernel(rtype, mode, 3.0, 3.0, n, 0, False,
                                   want_maps=False)
    shift_warp = None
    if "warp" in feats:
        from siril_tpu.ops.interp import _shift_batch_fn

        shift_warp = _shift_batch_fn(3, True, 32, False)  # lanczos4 + clamp

    def one_iter(i, raw, shifts, bias, dark, flat):
        # perturb the raw input with the loop index so XLA cannot hoist
        # the body out of the fori_loop
        x16 = raw + i.astype(jnp.int16)
        if not feats:                       # "sum": roofline streaming read
            return x16.astype(jnp.float32).sum() * jnp.float32(1e-9)
        xf = (x16.astype(jnp.float32) + 32768.0) * (1.0 / 65535.0)
        xf = calib(xf, bias, dark, jnp.float32(1.0), flat,
                   jnp.float32(1.0),
                   jnp.zeros((0, 2), jnp.int32), jnp.zeros((0, 2), jnp.int32))
        acc = jnp.float32(0.0)
        if "fit" in feats:
            # the fused per-frame stats+candidates+gather+LM-fit program
            # — the exact detection code the e2e pipeline dispatches
            stats, vals, idx, fits = stats_cand(xf[:, 0])
            acc = acc + stats.sum() + fits.sum()
        elif "stats" in feats:
            # the same stats the fused program computes, standalone
            from siril_tpu.ops.statistics import hist_median_jax

            flat2 = xf[:, 0].reshape(n, -1)
            valid = jnp.isfinite(flat2)
            med = hist_median_jax(flat2, valid)
            mad = hist_median_jax(jnp.abs(flat2 - med[:, None]), valid)
            acc = acc + med.sum() + mad.sum()
            if "cand" in feats:
                thrs = med + jnp.float32(p.sigma) * jnp.maximum(
                    1.4826 * mad, 1e-7)
                cfn = _candidate_fn(R, 500)
                v, _ = lax.map(lambda a: cfn(a[0], a[1]),
                               (xf[:, 0], thrs.astype(jnp.float32)))
                acc = acc + jnp.where(jnp.isfinite(v), v, 0.0).sum()
        if "stack" in feats and "warp" not in feats:
            # smallest compile surface: decode+calibrate+reject-stack
            # (the pallas north-star kernel) — the fallback tier when
            # the remote compile service can't finish the full chain
            scale = jnp.ones(n, jnp.float32)
            offset = jnp.zeros(n, jnp.float32)
            warped = xf
        elif "warp" in feats:
            warped = shift_warp(xf, shifts + 1e-3 * i.astype(jnp.float32))
            if "est" in feats:
                est = norm_estimators_hist_jax(warped[:, 0].reshape(n, -1))
                scale = est["scale"][0] / jnp.where(est["scale"] == 0, 1.0,
                                                    est["scale"])
                offset = scale * est["location"] - est["location"][0]
                if "stack" not in feats:
                    return acc + scale.sum() + offset.sum()
            else:
                return acc + warped.sum() * jnp.float32(1e-9)
        else:                                # calib / stats / cand / detect
            if "stats" not in feats:
                acc = acc + xf.sum() * jnp.float32(1e-9)
            return acc
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


def _measure_rtt():
    import jax
    import jax.numpy as jnp

    t0 = time.monotonic()
    null = jax.jit(lambda s: s * jnp.float32(1.000001))
    float(null(jnp.float32(1.0)))                      # warm/compile
    _status(f"null program warm in {time.monotonic() - t0:.1f}s")
    t0 = time.monotonic()
    float(null(jnp.float32(2.0)))
    return time.monotonic() - t0


def _run_stage(fn, stage, n, size, iters, t_rtt):
    t0 = time.monotonic()
    chk = float(fn(0))                                 # compile + warm
    t_compile = time.monotonic() - t0
    _status(f"[{stage}] compiled+warm in {t_compile:.1f}s")
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


def device_compute_probe(n: int = 8, size: int = 4096, iters: int = 3,
                         rtype: int | None = None, mode: int | None = None,
                         stage: str = "full") -> dict:
    """Measure device-resident fused-pipeline throughput for one stage.

    ``stage``: any key of ``STAGE_FEATURES`` — "full" is the headline
    chain; "nodetect"/"stack" are the smaller fallback compile surfaces;
    the rest are the attribution ladder.

    Returns ``{"compute_mpix_s", "t_loop_s", "t_rtt_s", "n", "size",
    "iters", "stage", "checksum"}``.  The first call compiles
    (persistent-cache eligible); timing uses a second dispatch with a
    different seed, with the null-program round-trip latency subtracted.
    """
    rtype, mode = _default_config(rtype, mode)
    fn = _probe_fn(n, size, iters, rtype, mode, stage)
    t_rtt = _measure_rtt()
    _status(f"round-trip latency {t_rtt:.2f}s; compiling {stage} "
            f"probe ({n}x{size}²×{iters})")
    return _run_stage(fn, stage, n, size, iters, t_rtt)


def _default_config(rtype, mode):
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.normalization import ADDITIVE_SCALING

    return (rj.WINSORIZED if rtype is None else rtype,
            ADDITIVE_SCALING if mode is None else mode)


def device_stage_probe(stages=("sum", "calib", "stats", "cand", "detect",
                               "warp", "est", "stack", "nodetect", "full"),
                       n: int = 8, size: int = 4096, iters: int = 3,
                       rtype: int | None = None, mode: int | None = None,
                       deadline_s: float | None = None) -> dict:
    """Run the stage-attribution ladder in ONE process (one tunnel
    warm-up, shared RTT measurement).  Returns
    ``{"stages_mpix_s": {stage: rate}, "details": {stage: record},
    "t_rtt_s": ...}`` — the per-stage breakdown the driver reads from
    the bench JSON (the reference's per-op ``show_time`` analog,
    core/siril.h:49-50).  Stops early when ``deadline_s`` (monotonic
    budget) runs out; whatever completed is returned."""
    rtype, mode = _default_config(rtype, mode)
    t_start = time.monotonic()
    t_rtt = _measure_rtt()
    out: dict = {"stages_mpix_s": {}, "details": {}, "t_rtt_s": round(
        t_rtt, 3), "n": n, "size": size, "iters": iters}
    for stage in stages:
        if deadline_s is not None and \
                time.monotonic() - t_start > deadline_s:
            out["truncated_at"] = stage
            _status(f"deadline reached — stopping before [{stage}]")
            break
        try:
            r = _run_stage(_probe_fn(n, size, iters, rtype, mode, stage),
                           stage, n, size, iters, t_rtt)
        except Exception as e:              # noqa: BLE001
            _status(f"[{stage}] failed: {e}")
            out["details"][stage] = {"error": str(e)[:300]}
            continue
        out["stages_mpix_s"][stage] = r["compute_mpix_s"]
        out["details"][stage] = r
        _status(f"[{stage}] {r['compute_mpix_s']} Mpix/s "
                f"(loop {r['t_loop_s']}s)")
    return out


def main(argv=None):
    import argparse
    import json
    import signal
    import sys

    signal.signal(signal.SIGTERM, lambda *_: sys.exit(0))
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--stages", default="full",
                    help="comma list from: " + ",".join(STAGE_FEATURES))
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--deadline", type=float, default=None)
    args = ap.parse_args(argv)
    from siril_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    stages = [s for s in args.stages.split(",") if s]
    for s in stages:
        if s not in STAGE_FEATURES:
            ap.error(f"unknown stage {s!r}")
    if len(stages) == 1:
        r = device_compute_probe(n=args.n, size=args.size, iters=args.iters,
                                 stage=stages[0])
    else:
        r = device_stage_probe(stages, n=args.n, size=args.size,
                               iters=args.iters, deadline_s=args.deadline)
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
