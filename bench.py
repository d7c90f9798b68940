"""Benchmark: the BASELINE north-star workload — full calibration
(bias/dark/flat + cosmetic) + global-star registration + winsorized
rejection stack with IKSS additive-scaling normalization, 100×16 Mpix
(4096²) mono lights (BASELINE.md config 2 / BASELINE.json north_star),
end-to-end: FITS decode → device → fused pipeline → result fetched.

Driver-survivability (round-3 redesign):
  * per-stage status lines stream to stderr (flushed);
  * the synthetic dataset is cached under .bench_data/ (per-frame
    deterministic seeds → incremental generation, any N reuses frames);
  * the TPU measurement runs in a watchdog subprocess killed at the
    budget (BENCH_BUDGET_S, default 420 s) so a hung remote compile
    can never eat the whole allowance;
  * the JSON result is emitted as soon as a TPU number exists — the
    warm pass alone is enough; the hot pass only tightens it;
  * SIGTERM/SIGINT print the best-so-far JSON before exiting, so an
    outer `timeout` still leaves a parseable tail.

vs_baseline comes from scripts/cpu_baseline.json — a MEASURED record of
the strongest available CPU implementation of the same workload on this
host (see that file's "source"; BASELINE.md procedure).  If the record
is missing and budget remains, a small JAX-CPU twin is measured live.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

S = 4096
SIGMA = (3.0, 3.0)
T0 = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "100"))
N_FALLBACK = int(os.environ.get("BENCH_FRAMES_FALLBACK", "40"))
REPO = os.path.dirname(os.path.abspath(__file__))
DATA_DIR = os.environ.get("BENCH_DATA_DIR",
                          os.path.join(REPO, ".bench_data", f"ns{S}"))
CPU_RECORD = os.path.join(REPO, "scripts", "cpu_baseline.json")

_best = {}          # mutated as results arrive; printed at exit


def status(msg):
    print(f"[bench {time.monotonic() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.monotonic() - T0)


HISTORY = os.path.join(REPO, "scripts", "bench_history.jsonl")


def _load_best_prior():
    """Best prior captured run (largest n, then Mpix/s) — included in
    the JSON as context because throughput is wire-bound and the tunnel
    rate varies 7 MB/s – 1.7 GB/s across days (tunnel_h2d_mbs records
    the rate each number was taken at)."""
    try:
        with open(HISTORY) as f:
            lines = f.readlines()
    except OSError:
        return None
    best = best_key = None
    for line in lines:
        # per-line tolerance: a SIGTERM mid-append can truncate the
        # last line; one bad record must not discard the others
        try:
            r = json.loads(line)
            key = (int(r.get("n") or 0), float(r.get("value") or 0.0))
        except (ValueError, TypeError):
            continue
        if best is None or key > best_key:
            best, best_key = r, key
    return best


def _append_history():
    try:
        with open(HISTORY, "a") as f:
            f.write(json.dumps({
                "date": time.strftime("%Y-%m-%d %H:%M"),
                "n": _best.get("_n", 0),
                "value": _best.get("value"),
                "unit": _best.get("unit"),
                "vs_baseline": _best.get("vs_baseline"),
                "tunnel_h2d_mbs": _best.get("tunnel_h2d_mbs"),
            }) + "\n")
    except OSError:
        pass


def _cache_entries():
    try:
        d = os.environ.get("SIRIL_TPU_JAX_CACHE",
                           os.path.expanduser("~/.cache/siril_tpu_jax"))
        return sum(1 for f in os.listdir(d) if f.endswith("-cache"))
    except OSError:
        return 0


_PROBE_CHAIN = {
    "full": "decode+calibrate+detect+warp+estimators+stack",
    "nodetect": "decode+calibrate+warp+estimators+stack (detect absent "
                "— fallback compile surface)",
    "stack": "decode+calibrate+stack only (smallest fallback compile "
             "surface)",
}


def _finish_probe_fields():
    """Merge the stage ladder / deep-run captures into compute_probe and
    derive the north-star scale model (VERDICT r4 asks #2/#3)."""
    cp = _best.get("compute_probe")
    if cp is not None:
        if _best.get("_stages"):
            cp["stages_mpix_s"] = _best["_stages"]
        if _best.get("_deep"):
            d = _best["_deep"]
            cp[f"deep_n{d.get('n', 32)}"] = d
    cpu = _best.get("cpu_baseline") or {}
    compute = _best.get("compute_mpix_s")
    percore = cpu.get("native_e2e_mpix_s")
    if compute and percore:
        _best["northstar"] = {
            "native_e2e_percore_mpix_s": percore,
            "chip_compute_mpix_s": compute,
            "vs_multicore_model": {
                str(c): round(compute / (percore * c), 2)
                for c in (8, 16, 32)},
            "note": "SCALE MODEL, not a measurement: chip device-"
                    "resident fused-chain rate ÷ (native C++ e2e CPU "
                    "twin per-core rate × N cores); the twin's stages "
                    "are frame/row-parallel so ×cores is its best case",
        }
    if _best.get("_wall"):
        _best["wall_split_s"] = _best["_wall"]


def emit(final=False):
    _finish_probe_fields()
    if _best.get("value"):
        prior = _load_best_prior()
        if prior and (int(prior.get("n") or 0),
                      float(prior.get("value") or 0.0)) > \
                (_best.get("_n", 0), _best.get("value", 0.0)):
            _best["best_prior_run"] = prior
        if final:
            _append_history()
        print(json.dumps({k: v for k, v in _best.items()
                          if not k.startswith("_")}), flush=True)
    elif final and _best.get("compute_mpix_s"):
        # No e2e capture, but the tunnel-independent chip metric landed:
        # headline it (clearly labeled compute-only) — a degraded tunnel
        # must not zero out the chip's evidenced capability.  Metric
        # name/note derive from the stage that actually captured
        # (ADVICE r4: a fallback-stage capture must not be labeled as
        # the full chain).
        cp = _best.get("compute_probe") or {}
        pstage = cp.get("stage", "full")
        pn = cp.get("n", 8)
        out = {
            "metric": f"device_compute_only_{pstage}_{pn}x16Mpix",
            "value": _best["compute_mpix_s"], "unit": "Mpix/s",
            "vs_baseline": None,
            "note": "e2e capture failed this run (degraded tunnel); "
                    "value is the DEVICE-RESIDENT rate of: "
                    + _PROBE_CHAIN.get(pstage, pstage)
                    + ", zero wire traffic",
            "compute_probe": cp,
            "northstar": _best.get("northstar"),
            "compile_probe_s": _best.get("compile_probe_s"),
            "tunnel_h2d_mbs": _best.get("tunnel_h2d_mbs"),
            "cache_entries": _cache_entries(),
            "best_prior_run": _load_best_prior(),
            "cpu_baseline": _best.get("cpu_baseline"),
        }
        cpu = _best.get("cpu_baseline") or {}
        if cpu.get("native_e2e_mpix_s"):
            out["vs_native_e2e"] = round(
                _best["compute_mpix_s"] / cpu["native_e2e_mpix_s"], 2)
        print(json.dumps(out), flush=True)
    elif final:
        # No capture — emit a parseable diagnostic record instead of an
        # empty tail (the round-2 artifact was rc=124 with NOTHING; the
        # cause was undiagnosable from the JSON).  value=null is honest:
        # no number was measured THIS run; best_prior_run carries the
        # most recent captured run of the same workload for context.
        diag = {
            "metric": f"fused_calib_register_winsorized_stack_"
                      f"{N_FRAMES}x16Mpix",
            "value": None, "unit": "Mpix/s", "vs_baseline": None,
            "error": "no TPU pass completed within budget "
                     "(cold compile cache and/or degraded tunnel; "
                     "see compile_probe_s / tunnel_h2d_mbs; each "
                     "attempt ratchets the persistent cache forward)",
            "compile_probe_s": _best.get("compile_probe_s"),
            "tunnel_h2d_mbs": _best.get("tunnel_h2d_mbs"),
            "cache_entries": _cache_entries(),
            "best_prior_run": _load_best_prior(),
            "cpu_baseline": _best.get("cpu_baseline"),
        }
        print(json.dumps(diag), flush=True)


def _on_signal(signum, frame):
    status(f"signal {signum} — emitting best-so-far result")
    emit(final=True)
    os._exit(0)


def _record(n, t):
    """Fold a completed TPU pass (n frames in t seconds) into _best.

    Preference order: largest n (the north star is the FULL 100-frame
    config), then best throughput at that n.  A slower 100-frame number
    never gets displaced by a hot 40-frame rerun."""
    tput = n * S * S / 1e6 / t
    if _best.get("_n", 0) > n:
        return
    if _best.get("_n", 0) == n and _best.get("value", 0.0) >= tput:
        return
    _best.update({
        "_n": n,
        "metric": f"fused_calib_register_winsorized_stack_{n}x16Mpix",
        "value": round(tput, 2),
        "unit": "Mpix/s",
        "vs_baseline": _best.get("vs_baseline", 0.0),
    })
    cpu = _best.get("cpu_baseline")
    if cpu:
        _best["vs_baseline"] = round(tput / cpu["tput_mpix_s"], 2)
        # honest ratios against the STRONGER CPU twins too, so the
        # JAX-CPU-twin vs_baseline is never the only number quoted
        if cpu.get("native_stack_stage_mpix_s"):
            _best["vs_native_stack_twin"] = round(
                tput / cpu["native_stack_stage_mpix_s"], 2)
        if cpu.get("native_e2e_mpix_s"):
            _best["vs_native_e2e"] = round(
                tput / cpu["native_e2e_mpix_s"], 2)


# ---------------------------------------------------------------------------
# dataset (cached, per-frame deterministic)
# ---------------------------------------------------------------------------

def _star_field():
    rng = np.random.default_rng(7)
    n_stars = 400
    sx = rng.uniform(20, S - 20, n_stars).astype(np.float32)
    sy = rng.uniform(20, S - 20, n_stars).astype(np.float32)
    amp = rng.uniform(0.1, 0.7, n_stars).astype(np.float32)
    return sx, sy, amp


def _masters():
    rng = np.random.default_rng([42, 1 << 20])
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
    sky = (0.06 + 0.02 * xx + 0.015 * yy).astype(np.float32)
    bias = 0.02
    dark = (rng.standard_normal((S, S), dtype=np.float32) * 0.0005
            + 0.004)
    hot = (rng.integers(0, S, 300), rng.integers(0, S, 300))
    dark[hot] = 0.3
    r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2
    flat = (1.0 - 0.35 * r2 / r2.max()).astype(np.float32)
    return sky, bias, dark, flat


def write_masters(d, bias, dark, flat):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import write_fits

    img = SirilImage(data=np.full((1, S, S), bias, np.float32))
    write_fits(img, os.path.join(d, "bias.fit"), bitdepth=16)
    img = SirilImage(data=np.clip(bias + dark, 0, 1)[None])
    img.keywords.exposure = 120.0
    write_fits(img, os.path.join(d, "dark.fit"), bitdepth=16)
    img = SirilImage(data=(0.5 * flat)[None])
    write_fits(img, os.path.join(d, "flat.fit"), bitdepth=16)


def write_frame(d, i, sky, bias, dark, flat, sx, sy, amp):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng([42, i])
    shift = rng.uniform(-4, 4, 2).astype(np.float32)
    if i == 0:
        shift[:] = 0
    gy, gx = np.mgrid[-3:4, -3:4].astype(np.float32)
    f = sky.copy()
    x0 = sx + shift[0]
    y0 = sy + shift[1]
    xi = x0.astype(np.int32)
    yi = y0.astype(np.int32)
    ok = (xi >= 3) & (xi < S - 3) & (yi >= 3) & (yi < S - 3)
    g = amp[ok, None, None] * np.exp(
        -((gx[None] - (x0[ok] - xi[ok])[:, None, None]) ** 2
          + (gy[None] - (y0[ok] - yi[ok])[:, None, None]) ** 2)
        / (2 * 1.6 ** 2))
    iy = (yi[ok][:, None, None] + gy[None].astype(np.int32)).ravel()
    ix = (xi[ok][:, None, None] + gx[None].astype(np.int32)).ravel()
    np.add.at(f, (iy, ix), g.ravel().astype(np.float32))
    f = (f * flat + dark + bias
         + rng.standard_normal((S, S), dtype=np.float32) * 0.003)
    img = SirilImage(data=np.clip(f, 1e-4, 1.0)[None])
    img.keywords.exposure = 120.0
    tmp = os.path.join(d, f".tmp_light_{i:05d}.fit")
    write_fits(img, tmp, bitdepth=16)
    os.replace(tmp, os.path.join(d, f"light_{i:05d}.fit"))


def ensure_dataset(n):
    """Generate any missing frames; returns actual frame count written
    (may be < n if the budget forces a cut)."""
    os.makedirs(DATA_DIR, exist_ok=True)
    need = [i for i in range(n)
            if not os.path.exists(os.path.join(DATA_DIR,
                                               f"light_{i:05d}.fit"))]
    masters_ok = all(os.path.exists(os.path.join(DATA_DIR, f))
                     for f in ("bias.fit", "dark.fit", "flat.fit"))
    if not need and masters_ok:
        status(f"dataset cache hit: {n} frames at {DATA_DIR}")
        return n
    status(f"dataset: generating {len(need)} missing frames "
           f"(+masters={not masters_ok})")
    sky, bias, dark, flat = _masters()
    if not masters_ok:
        write_masters(DATA_DIR, bias, dark, flat)
    sx, sy, amp = _star_field()
    t_gen = time.monotonic()
    done = 0
    for i in need:
        write_frame(DATA_DIR, i, sky, bias, dark, flat, sx, sy, amp)
        done += 1
        if done in (3, 10) or done % 25 == 0:
            per = (time.monotonic() - t_gen) / done
            left = per * (len(need) - done)
            status(f"dataset: {done}/{len(need)} ({per:.2f}s/frame)")
            # generation must leave >=180s for the TPU run; cut N if not
            if remaining() - left < 180 and n > N_FALLBACK:
                have = sum(os.path.exists(os.path.join(
                    DATA_DIR, f"light_{j:05d}.fit")) for j in range(n))
                cut = max(N_FALLBACK, have)
                if cut < n:
                    status(f"dataset: budget-cutting N {n} -> {cut}")
                    extra = [i for i in need if i < cut and
                             not os.path.exists(os.path.join(
                                 DATA_DIR, f"light_{i:05d}.fit"))]
                    for i in extra:
                        write_frame(DATA_DIR, i, sky, bias, dark, flat,
                                    sx, sy, amp)
                    return cut
    status(f"dataset ready: {n} frames")
    return n


# ---------------------------------------------------------------------------
# pipeline (also imported by the child subprocess)
# ---------------------------------------------------------------------------

def run_pipeline(d, n=None):
    from siril_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.io.fits_io import read_fits
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.calibration import CalibArgs
    from siril_tpu.ops.normalization import ADDITIVE_SCALING
    from siril_tpu.ops.stacking import StackArgs
    from siril_tpu.pipeline import FusedArgs, fused_preprocess_stack

    seq = Sequence.scan("light_", d)
    if n is not None and seq.number > n:
        for i in range(n, seq.number):
            seq.incl[i] = False
    calib = CalibArgs(bias=read_fits(os.path.join(d, "bias.fit")),
                      dark=read_fits(os.path.join(d, "dark.fit")),
                      flat=read_fits(os.path.join(d, "flat.fit")))
    args = FusedArgs(calib=calib,
                     stack=StackArgs(method="rej", rejection=rj.WINSORIZED,
                                     siglow=SIGMA[0], sighigh=SIGMA[1],
                                     normalize=ADDITIVE_SCALING))
    res = fused_preprocess_stack(seq, args)
    return res.elapsed_s


def _child(d, plan, deadline_s):
    """Runs in the watchdog subprocess: escalate through the frame-count
    ``plan`` (e.g. [40, 100]) in ONE process so later passes reuse the
    warm compile cache and uploaded masters, streaming a RESULT line
    after each pass so the parent has a number even if the next pass
    hangs.  Escalation to plan[i+1] happens only if a linear scaling of
    the freshest pass time (plus 15% headroom) fits the remaining
    deadline; otherwise re-run the current n hot to tighten it."""
    t_start = time.monotonic()

    # A SIGTERM must unwind Python (SystemExit → client teardown) so
    # the chip lease is released: the default handler terminates with
    # no cleanup, and the NEXT process then stalls minutes on the
    # dangling lease.  (No effect while blocked inside a C device wait
    # — the parent's 10 s SIGKILL fallback covers that.)
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(0))

    def left():
        return deadline_s - (time.monotonic() - t_start)

    def out(n, val):
        print(f"BENCH_RESULT {n} {val}", flush=True)

    # FIRST CONTACT, synchronous and visible: the tunnel's first
    # device_put+fetch of a fresh process can take 200-300 s on a
    # degraded day (measured 2026-08-20: 40 s put + 164 s first fetch,
    # then everything after ran at full speed).  Absorb that cost in ONE
    # stage with stall heartbeats BEFORE any probe threads — previously
    # the probes hit this wall first, burned their 60+45 s join budgets,
    # and left daemon threads racing the pipeline while the parent saw
    # zero output for minutes.
    from siril_tpu.utils.trace import stage as _stage

    with _stage("bench.tunnel_warmup"):
        import jax

        tw = time.monotonic()
        warm = jax.device_put(np.ones((64, 64), np.float32))
        _ = float(warm.sum())
        print(f"BENCH_WARMUP {time.monotonic() - tw:.1f}", flush=True)

    # Upload-rate probe: e2e throughput is wire-bound when the tunnel
    # degrades (measured 7 MB/s – 1.7 GB/s across days), so the JSON
    # records the H2D rate this number was taken at.  The sync fetch's
    # own round-trip latency (~1-2 s) is measured with a 4-byte upload
    # and subtracted, otherwise a fast tunnel reads ~5 MB/s.  The probe
    # runs in a daemon thread with a hard join timeout so a dead/
    # crawling tunnel cannot eat the measurement budget (the connection
    # is already warm here, so a healthy tunnel answers in ~2 s).
    rate_box = {}

    def _probe():
        try:
            import jax

            def timed_put(arr):
                tp = time.monotonic()
                dev = jax.device_put(arr)
                _ = np.asarray(dev.ravel()[0])
                return time.monotonic() - tp

            tiny = np.zeros(2, np.int16)
            big = np.zeros((4 << 20,), np.int16)     # 8 MB
            timed_put(tiny)                          # warm backend
            t_lat = timed_put(tiny)
            t_big = timed_put(big)
            rate_box["rate"] = big.nbytes / max(t_big - t_lat, 1e-3) / 1e6
        except Exception:
            pass

    import threading
    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout=60)
    rate = rate_box.get("rate")
    if rate is not None:
        print(f"BENCH_TUNNEL {rate:.0f}", flush=True)

    # Compile-latency probe: the remote compile service's speed varies
    # ~100x across days (a trivial reduction compiled in 29 s on
    # 2026-08-20 vs <1 s healthy), and on a COLD persistent cache the
    # pipeline's program chain cannot finish inside the watchdog on a
    # slow day — each killed attempt still ratchets the cache forward
    # one program, so the FAILURE diagnostics (this probe + cache entry
    # counts) go into the emitted JSON.  A unique shape per run keeps
    # the probe itself out of the cache.
    comp_box = {}

    def _cprobe():
        try:
            import jax
            import jax.numpy as jnp

            # per-PROCESS unique shape: minute-resolution time made the
            # fallback child (spawned in the same minute) re-probe a
            # shape the first child had just written to the persistent
            # cache, reading "fast compile" on exactly the slow days
            # the probe exists to detect
            k = 3 + (os.getpid() * 7919
                     + int.from_bytes(os.urandom(2), "little")) % 89
            # a per-run random CONSTANT is baked into the HLO so this
            # probe can never hit the persistent cache — committed
            # cache_seed/ entries would otherwise make a slow-compile
            # day read "fast" on a fresh VM (89 shapes collide
            # eventually; 2^32 constants do not)
            c = 1.0 + int.from_bytes(os.urandom(4), "little") / 2 ** 52
            f = jax.jit(lambda x: (x * c + 0.5).sum())
            tc = time.monotonic()
            f.lower(jax.ShapeDtypeStruct((k, 257), jnp.float32)).compile()
            comp_box["s"] = time.monotonic() - tc
        except Exception:
            pass

    thc = threading.Thread(target=_cprobe, daemon=True)
    thc.start()
    thc.join(timeout=45)
    comp_s = comp_box.get("s")
    print(f"BENCH_COMPILE {comp_s:.1f}" if comp_s is not None
          else "BENCH_COMPILE timeout", flush=True)
    if (comp_s is None or comp_s > 30) and plan and plan[0] > 4:
        # slow-compile day: a full-chain completion is only plausible at
        # the smallest tier (execution is cheap there; compile cost is
        # per-program, so banking ANY number beats none) — escalation
        # still upgrades if the cache turns out warm
        plan = [4] + list(plan)
    # collapsed tunnel (~7 MB/s days exist): even the fallback-size pass
    # may not finish — bank a tiny tier first so SOMETHING is always
    # captured; at ~1 MB/s (measured 2026-08-19 pm) only a 4-frame pass
    # fits the watchdog.  A probe TIMEOUT is usually a slow cold compile
    # (measured 2026-08-19: join expired, tunnel was at 333 MB/s), not a
    # dead tunnel — seed only the 12 tier then, and keep the thread
    # running: the late rate is re-read before each escalation below.
    if rate is None and plan and plan[0] > 12:
        plan = [12] + list(plan)
    elif rate is not None and rate < 20 and plan and plan[0] > 12:
        plan = [12] + list(plan)
        if rate < 4 and plan[0] > 4:
            plan = [4] + list(plan)

    def run_and_report(n_run):
        """One pipeline pass + its upload-vs-device wall split from the
        trace registry (VERDICT r4 ask #3: the captured pass's split must
        be readable from the JSON, not from ARCHITECTURE.md)."""
        from siril_tpu.utils import trace

        trace.reset()
        t = run_pipeline(d, n_run)
        try:
            import json as _json

            split = {k: round(v[1], 2) for k, v in trace.timings().items()
                     if k.startswith("fused.")}
            if split:
                print("BENCH_WALL " + _json.dumps(split), flush=True)
        except Exception:       # noqa: BLE001 — diagnostics only
            pass
        return t

    plan = list(plan)
    n = plan.pop(0)
    t1 = run_and_report(n)
    out(n, t1)
    t_last, n_last = t1, n

    # Device-resident compute-only metric from THIS warm process (a
    # separate subprocess would pay the first-contact warm-up again).
    # Stage ladder: full chain first, smaller compile surfaces as
    # fallbacks; each compile that lands also ratchets the cache.
    if left() > 90:
        try:
            import json as _json

            from siril_tpu.tools.compute_probe import (
                device_compute_probe,
                device_stage_probe,
            )

            # headline tier first at n=24 (the VERDICT r4 ask #1 done-
            # criterion is the chain rate at n≥16; per-frame fixed costs
            # amortize with depth), then smaller compile surfaces
            for pstage, pn, pit in (("full", 24, 1), ("full", 8, 3),
                                    ("nodetect", 8, 3), ("stack", 8, 3)):
                if left() < 60:
                    break
                try:
                    r = device_compute_probe(n=pn, size=4096, iters=pit,
                                             stage=pstage)
                    print("BENCH_COMPUTE_ONLY " + _json.dumps(r),
                          flush=True)
                    break
                except Exception as e:      # noqa: BLE001
                    print(f"BENCH_NOTE compute probe [{pstage} n={pn}] "
                          f"failed: {e}", flush=True)
            # per-stage attribution ladder + a deeper n=24 run (VERDICT
            # r4 asks #1/#2) — cache_seed makes these a few seconds each
            # on a warm cache; the deadline keeps a cold compile service
            # from starving the e2e escalation below
            if left() > 240:
                try:
                    r2 = device_stage_probe(
                        ("stats", "cand", "detect", "warp", "est",
                         "stack", "nodetect", "full"),
                        n=8, size=4096, iters=3,
                        deadline_s=min(left() - 150, 150))
                    if r2.get("stages_mpix_s"):
                        print("BENCH_STAGES "
                              + _json.dumps(r2["stages_mpix_s"]),
                              flush=True)
                except Exception as e:      # noqa: BLE001
                    print(f"BENCH_NOTE stage ladder failed: {e}",
                          flush=True)
            if left() > 200:
                try:
                    r3 = device_compute_probe(n=32, size=4096, iters=1,
                                              stage="full")
                    print("BENCH_COMPUTE_DEEP " + _json.dumps(r3),
                          flush=True)
                except Exception as e:      # noqa: BLE001
                    print(f"BENCH_NOTE deep probe failed: {e}",
                          flush=True)
        except Exception as e:              # noqa: BLE001
            print(f"BENCH_NOTE compute probe import failed: {e}",
                  flush=True)
    # Escalate / tighten until the budget runs dry.  The first pass's
    # time includes compile + tunnel warm-up, so a linear scaling can
    # OVERestimate an escalated pass by 30×; a hot rerun of the current
    # tier re-proves the true rate, after which the skipped tier is
    # RE-CONSIDERED (a cold 1069 s first pass must not permanently veto
    # the 100-frame capture when hot passes run in 30 s).  Every pass's
    # result is streamed immediately, so a watchdog-killed attempt loses
    # nothing.
    passes = 1
    # Re-prove the rate HOT before any escalation decision: the first
    # pass's time includes compile + connection warm-up and overstates
    # the steady rate 2-3×, which blocks the direct jump to the top
    # tier (observed: cold 30 s vs hot 14 s at n=4 — only the hot rate
    # proves 4→100 fits).  One micro-tier hot pass costs ~15 s.
    if plan and left() > 45:
        t = run_and_report(n_last)
        out(n_last, t)
        t_last = min(t_last, t)
        passes += 1
    while left() > 30 and passes < 8:
        if rate is None and rate_box.get("rate") is not None:
            rate = rate_box["rate"]            # late probe landed
            print(f"BENCH_TUNNEL {rate:.0f}", flush=True)
        # an intermediate tier whose bigger sibling already fits: skip
        # straight to the biggest feasible tier.  The timing check uses
        # the freshest pass (hot after one rerun), which prices the
        # day's real wire rate in — the probe's rate only vetoes on
        # clearly-collapsed tunnels (it read 8 MB/s on a day the actual
        # transfer ran at 30, and that conservatism cost the 100-frame
        # capture)
        while (len(plan) > 1 and (rate is None or rate >= 15)
               and t_last * (plan[1] / n_last) <= left() * 1.3):
            print(f"BENCH_SKIP_TIER {plan[0]}", flush=True)
            plan.pop(0)
        if plan and t_last * (plan[0] / n_last) <= left() * 1.3:
            nxt = plan.pop(0)
            t = run_and_report(nxt)
            out(nxt, t)
            t_last, n_last = t, nxt
        else:
            if plan:
                print(f"BENCH_DEFER {plan[0]} "
                      f"est={t_last * plan[0] / n_last:.0f}s "
                      f"left={left():.0f}s — hot rerun first", flush=True)
            t = run_and_report(n_last)
            out(n_last, t)
            t_last = min(t_last, t)
        passes += 1
    if plan:
        print(f"BENCH_SKIP {plan[0]} left={left():.0f}s", flush=True)


STALL_KILL_S = float(os.environ.get("BENCH_STALL_KILL_S", "185"))
# heartbeat cadence MUST match the child's trace.py knob
BEAT_S = float(os.environ.get("SIRIL_TPU_STALL_LOG_S", "90"))


def measure_tpu(d, plan, cap=None):
    """Watchdog-spawn the TPU measurement over an escalating frame-count
    ``plan``; every completed (n, t) pass is folded into ``_best``
    immediately.  Returns True if anything was captured.

    Stall recovery (round-4): the child's trace heartbeats report how
    long a device wait has been stuck ("[stall] ... after Ns").  Once a
    single stage exceeds STALL_KILL_S with no BENCH_RESULT since, the
    run is dead (r03 burned 220 s watching a hung tunnel); kill the
    child NOW so the caller can retry the micro tier in a fresh
    process — or at least emit diagnostics early."""
    import re

    deadline = remaining() - 20
    if cap is not None:
        deadline = min(deadline, cap)
    if deadline < 60:
        status("insufficient budget for TPU run")
        return False
    code = ("import sys; sys.path.insert(0, %r); import bench; "
            "bench._child(%r, %r, %f)" % (REPO, d, list(plan), deadline))
    status(f"TPU run: plan {list(plan)} frames, watchdog {deadline:.0f}s")
    p = subprocess.Popen([sys.executable, "-u", "-c", code],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    results = []
    # stall[stage_name] = (reported_s, monotonic_when_seen).  Heartbeats
    # land every BEAT_S (trace.py SIRIL_TPU_STALL_LOG_S — read the SAME
    # knob, a mismatched hardcode silently disables the watchdog), so
    # the poll loop extrapolates the stall age from the last beat; a
    # kill additionally requires a SECOND-beat-confirmed report
    # (rep >= threshold − BEAT − margin): after a single beat we cannot
    # distinguish "completed at 91 s" from "still stuck at 184 s", and
    # entries whose next beat never arrives expire as completed.
    # Per-NAME keying: merging stages into one bucket let a recovered
    # stage's old age leak onto a later stage's first beat.
    stall = {}
    t_kill = time.monotonic() + deadline
    import threading

    def pump():
        for line in p.stdout:
            line = line.rstrip()
            if line.startswith("BENCH_RESULT"):
                _, n_s, t_s = line.split()
                results.append((int(n_s), float(t_s)))
                stall.clear()
                status(f"TPU pass {len(results)}: {n_s} frames in "
                       f"{float(t_s):.1f}s")
                # record best-so-far immediately so a SIGTERM arriving
                # mid-run still emits a parseable JSON tail
                _record(int(n_s), float(t_s))
            elif line.startswith("BENCH_TUNNEL"):
                _best["tunnel_h2d_mbs"] = float(line.split()[1])
                status(f"tunnel H2D: {_best['tunnel_h2d_mbs']:.0f} MB/s")
            elif line.startswith("BENCH_COMPILE"):
                tok = line.split()[1]
                _best["compile_probe_s"] = (None if tok == "timeout"
                                            else float(tok))
                status(f"compile probe: {tok} s for a trivial program")
            elif line.startswith("BENCH_WARMUP"):
                _best["tunnel_warmup_s"] = float(line.split()[1])
                stall.clear()
                status(f"tunnel first-contact warm-up: "
                       f"{_best['tunnel_warmup_s']:.0f}s")
            elif line.startswith("BENCH_COMPUTE_ONLY"):
                r = json.loads(line.split(None, 1)[1])
                _best["compute_mpix_s"] = r["compute_mpix_s"]
                _best["compute_probe"] = r
                status(f"compute-only [{r['stage']}]: "
                       f"{r['compute_mpix_s']} Mpix/s on device")
            elif line.startswith("BENCH_STAGES"):
                _best["_stages"] = json.loads(line.split(None, 1)[1])
                stall.clear()
                status(f"stage ladder: {_best['_stages']}")
            elif line.startswith("BENCH_COMPUTE_DEEP"):
                _best["_deep"] = json.loads(line.split(None, 1)[1])
                stall.clear()
                status(f"deep probe n={_best['_deep'].get('n')}: "
                       f"{_best['_deep']['compute_mpix_s']} Mpix/s")
            elif line.startswith("BENCH_WALL"):
                _best["_wall"] = json.loads(line.split(None, 1)[1])
                status(f"wall split: {_best['_wall']}")
            else:
                m = re.search(r"\[stall\].*'([^']*)'.*after (\d+)s", line)
                if m:
                    # the first-contact warm-up legitimately blocks for
                    # 200-300 s on a degraded day and then succeeds —
                    # give THAT stage a longer leash before declaring
                    # the run dead
                    name = m.group(1)
                    prev = stall.get(name, (0.0, 0.0))[0]
                    stall[name] = (max(prev, float(m.group(2))),
                                   time.monotonic())
                status(f"  | {line[-150:]}")

    th = threading.Thread(target=pump, daemon=True)
    th.start()
    killed_stalled = False
    while p.poll() is None and time.monotonic() < t_kill:
        time.sleep(0.5)
        if results and remaining() < 30:
            break
        now = time.monotonic()
        dead = None
        for name in list(stall):
            rep, seen = stall[name]
            since = now - seen
            if since > BEAT_S + 10.0:   # next beat never came: stage done
                stall.pop(name, None)
                continue
            # warm leash 280 s: longest OBSERVED successful warm-up is
            # 264.6 s, and killing later leaves the micro-tier retry
            # too little budget to pay ITS warm-up (r4g: killed at
            # 332 s, the retry had 68 s and missed a bank by ~10 s)
            thr = 280.0 if "tunnel_warmup" in name else STALL_KILL_S
            # require the LAST beat below the threshold to have been
            # reported (second-beat confirmation): after one 90 s beat
            # alone, "completed at 91 s" and "stuck at 184 s" are
            # indistinguishable and extrapolation would kill healthy
            # children
            rep_min = int((thr - 1.0) // BEAT_S) * BEAT_S
            if rep >= rep_min and rep + since >= thr:
                dead = (name, rep + since)
                break
        if dead is not None:
            status(f"watchdog: stage '{dead[0]}' stalled "
                   f"{dead[1]:.0f}s — killing stalled TPU subprocess "
                   "early")
            killed_stalled = True
            break
    if p.poll() is None:
        if not killed_stalled:
            status("watchdog: killing TPU subprocess")
        # SIGTERM first: a SIGKILLed client leaves the chip lease
        # dangling and the NEXT process's first contact then blocks for
        # minutes waiting it out (observed 200-300 s on 2026-08-20); a
        # clean exit lets the runtime release the device
        p.terminate()
        try:
            p.wait(timeout=10)
        except subprocess.TimeoutExpired:
            p.kill()
    th.join(timeout=5)
    _best["_stall_killed"] = killed_stalled
    return bool(results)


def measure_compute(cap=None):
    """Device-resident compute-only metric (tunnel-independent): the full
    fused chain looped on device inside one program; only a dispatch and
    a scalar ride the wire.  Captured in ``_best['compute_mpix_s']`` —
    the number that still evidences the chip on a degraded-tunnel day."""
    for stage in ("full", "nodetect", "stack"):
        deadline = remaining() - 15
        if cap is not None:
            deadline = min(deadline, cap)
        if deadline < 45:
            status("insufficient budget for compute-only probe")
            return False
        code = (
            "import sys, json, signal; "
            "signal.signal(signal.SIGTERM, lambda *a: sys.exit(0)); "
            "sys.path.insert(0, %r); "
            "from siril_tpu.utils.jaxcache import enable_compilation_cache; "
            "enable_compilation_cache(); "
            "from siril_tpu.tools.compute_probe import device_compute_probe; "
            "r = device_compute_probe(n=24 if %r == 'full' else 8, size=4096, iters=1 if %r == 'full' else 3, stage=%r); "
            "print('BENCH_COMPUTE_ONLY', json.dumps(r), flush=True)"
            % (REPO, stage, stage, stage))
        status(f"compute-only probe [{stage}]: watchdog {deadline:.0f}s")
        # Popen + SIGTERM-first: subprocess.run's timeout SIGKILLs,
        # leaving the dangling single-client chip lease that stalls the
        # NEXT process's first contact for minutes (the cascade would
        # kill the remaining fallback stages too)
        p = subprocess.Popen([sys.executable, "-u", "-c", code],
                             stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE, text=True)
        try:
            out_s, err_s = p.communicate(timeout=deadline)
        except subprocess.TimeoutExpired:
            p.terminate()
            try:
                out_s, err_s = p.communicate(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
                out_s, err_s = p.communicate()
            # compile too slow for this chain — fall back to a smaller
            # compile surface (the cache ratchets forward regardless)
            status(f"compute-only probe [{stage}]: timed out")
            continue
        for line in out_s.splitlines():
            if line.startswith("BENCH_COMPUTE_ONLY"):
                r = json.loads(line.split(None, 1)[1])
                _best["compute_mpix_s"] = r["compute_mpix_s"]
                _best["compute_probe"] = r
                status(f"compute-only [{stage}]: {r['compute_mpix_s']} "
                       f"Mpix/s (loop {r['t_loop_s']}s, "
                       f"rtt {r['t_rtt_s']}s)")
                return True
        tail = (out_s + err_s)[-300:].replace("\n", " | ")
        status(f"compute-only probe [{stage}] failed: {tail}")
    return False


def load_cpu_record():
    """Pre-load the measured CPU record so vs_baseline is computable the
    moment the first TPU pass lands (partial emissions included)."""
    if os.path.exists(CPU_RECORD):
        with open(CPU_RECORD) as f:
            rec = json.load(f)
        status(f"cpu baseline (recorded): {rec['tput_mpix_s']} Mpix/s "
               f"[{rec['source']}]")
        _best["cpu_baseline"] = rec
        return True
    return False


def cpu_baseline(n_used, tput_tpu):
    """Live JAX-CPU twin fallback when no measured record exists."""
    if remaining() < 120:
        return None, None
    n_cpu = int(os.environ.get("BENCH_FRAMES_CPU", "4"))
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; sys.path.insert(0, %r); import bench; "
            "print('BENCH_RESULT', bench.run_pipeline(%r, %d))"
            % (REPO, DATA_DIR, n_cpu))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, env=env,
                             timeout=max(60, remaining() - 15))
    except subprocess.TimeoutExpired:
        return None, None
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT"):
            t = float(line.split()[1])
            tput = n_cpu * S * S / 1e6 / t
            return tput, {"tput_mpix_s": round(tput, 3),
                          "source": f"live JAX-CPU twin ({n_cpu} frames)"}
    return None, None


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    sys.path.insert(0, REPO)
    status(f"budget {BUDGET_S:.0f}s, target {N_FRAMES}x16Mpix")

    have_record = load_cpu_record()
    n = ensure_dataset(N_FRAMES)
    # One escalating subprocess: bank a MICRO tier first (4×16 Mpix —
    # seconds of wire even at 10 MB/s, so ANY live tunnel yields a
    # nonzero capture), then the fallback size, then the SAME warm
    # process upgrades to the full target if its measured pass time
    # proves the full pass fits — reusing the compile cache, masters,
    # and tunnel warm-up.  (The _child skip-tier logic jumps straight
    # to the big tier on a healthy tunnel, so the micro tier costs
    # almost nothing when everything works.)
    # every tier clamped to the dataset size: a tier larger than the
    # sequence would stack fewer frames than it reports and overstate
    # the throughput
    plan = sorted({min(4, n), min(N_FALLBACK, n), n})
    ok = measure_tpu(DATA_DIR, plan)
    if not ok:
        # Nothing captured — one fresh-process retry at the micro tier
        # only (a transient tunnel hang often clears; a fresh process
        # re-probes and the compile cache is warmer than before).
        ok = measure_tpu(DATA_DIR, [4], cap=150)
    # Tunnel-independent chip metric: normally captured inside the warm
    # child (BENCH_COMPUTE_ONLY); this subprocess fallback only runs if
    # the child died before reaching it — on a degraded-tunnel day this
    # is the only number that means anything.
    if not _best.get("compute_mpix_s"):
        measure_compute(cap=200 if ok else None)
    if not ok:
        status("FAILED: no e2e TPU measurement")
        emit(final=True)
        sys.exit(0 if _best.get("compute_mpix_s") else 1)
    if not have_record:
        cpu_tput, rec = cpu_baseline(n, _best["value"])
        if cpu_tput:
            _best["cpu_baseline"] = rec
            _best["vs_baseline"] = round(_best["value"] / cpu_tput, 2)
    emit(final=True)


if __name__ == "__main__":
    main()
