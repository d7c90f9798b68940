"""Measure the CPU baseline record used by bench.py (vs_baseline).

The reference siril-cli CANNOT be built in this environment (no meson, no
cfitsio/glib/gsl/wcslib dev packages, zero network egress), so per
BASELINE.md the strongest AVAILABLE CPU implementations are measured:

1. **e2e JAX-CPU twin** — the identical fused calibrate+register+
   winsorized-stack pipeline on the JAX CPU backend (the number
   vs_baseline is computed against, like rounds 1–2).
2. **native C++ OpenMP winsorized stack** — the hot-loop twin
   (native/sirilio.cpp stack_winsorized, mean_and_reject semantics) —
   an upper bound on how fast the reference's C stacking inner loop
   could run on THIS host.  Reported alongside for honesty: the
   reference's own stack stage would run at about this rate here.

Writes scripts/cpu_baseline.json.  Re-run after hardware changes:
    python scripts/measure_cpu_baseline.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "scripts", "cpu_baseline.json")
S = 4096


def measure_native_stack(n=50, p=2_000_000):
    from siril_tpu import native

    if not native.available():
        return None
    rng = np.random.default_rng(0)
    stack = np.abs(rng.normal(0.3, 0.05, (n, p))).astype(np.float32)
    stack[rng.random((n, p)) < 0.02] = 0.9
    scale = np.ones(n, np.float32)
    off = np.zeros(n, np.float32)
    native.stack_winsorized(stack[:, :1000], scale, off, 3.0, 3.0)  # warm
    t0 = time.perf_counter()
    native.stack_winsorized(stack, scale, off, 3.0, 3.0)
    t = time.perf_counter() - t0
    return n * p / 1e6 / t


def measure_native_e2e(n=8):
    """Native C++ OpenMP e2e twin: decode + calibrate + detect + match +
    warp + normalize + winsorized stack over n×16 Mpix frames resident
    in RAM (native/cpu_twin.cpp).  Every stage is frame/row-parallel
    (like the reference: processing.c:204-207, median_and_mean.c:1384),
    so the multicore rate scale-models as rate × cores."""
    from siril_tpu import native

    if native.get_twin_lib() is None:
        return None
    import bench

    have = bench.ensure_dataset(n)
    n = min(n, have)
    from siril_tpu.io.fits_io import read_fits

    frames = np.empty((n, S, S), np.float32)
    for i in range(n):
        img = read_fits(os.path.join(bench.DATA_DIR, f"light_{i:05d}.fit"))
        frames[i] = img.host()[0]
    bias = read_fits(os.path.join(bench.DATA_DIR, "bias.fit")).host()[0]
    dark = read_fits(os.path.join(bench.DATA_DIR, "dark.fit")).host()[0]
    flat = read_fits(os.path.join(bench.DATA_DIR, "flat.fit")).host()[0]
    # decode stage timed separately on the raw u16 view (the chain's
    # first stage; read_fits above already decoded, so re-decode a
    # synthetic i16 buffer of the same size for the timing)
    raw16 = (frames[:1] * 65535.0 - 32768.0).astype(np.int16)
    dec = np.empty(raw16.size, np.float32)
    lib = native.get_twin_lib()
    import ctypes
    t0 = time.perf_counter()
    lib.twin_decode_i16(raw16.ctypes.data_as(
        ctypes.POINTER(ctypes.c_int16)),
        dec.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), raw16.size)
    t_decode = (time.perf_counter() - t0) * n        # per-frame × n
    t0 = time.perf_counter()
    res = native.twin_e2e(frames, bias, dark, flat)
    t_chain = time.perf_counter() - t0
    if res is None:
        return None
    stacked, stages = res
    t_total = t_chain + t_decode
    tput = n * S * S / 1e6 / t_total
    return {
        "n": n, "tput_mpix_s": round(tput, 3),
        "t_total_s": round(t_total, 2),
        "stages_s": {k: round(v, 2) for k, v in zip(
            ("calibrate", "detect", "match", "warp", "normalize",
             "stack"), stages)},
        "t_decode_s": round(t_decode, 2),
        "threads": int(lib.twin_threads()),
        "stack_mean": float(stacked.mean()),
    }


def measure_e2e_jaxcpu(n=4):
    import bench

    data_dir = bench.DATA_DIR
    have = bench.ensure_dataset(n)
    if have < n:
        n = have
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; sys.path.insert(0, %r); import bench; "
            "print('RES', bench.run_pipeline(%r, %d))"
            % (REPO, data_dir, n))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RES"):
            t = float(line.split()[1])
            return n * S * S / 1e6 / t, n
    raise RuntimeError(out.stdout[-1000:] + out.stderr[-1000:])


def main():
    ncpu = os.cpu_count()
    print(f"host: {ncpu} CPU(s)")
    native_tput = measure_native_stack()
    if native_tput is None:
        print("native C++ winsorized stack: unavailable (no toolchain)")
    else:
        print(f"native C++ winsorized stack: {native_tput:.2f} "
              "frame-Mpix/s")
    native_e2e = measure_native_e2e()
    if native_e2e is None:
        print("native C++ e2e twin: unavailable (no toolchain)")
    else:
        print(f"native C++ e2e twin ({native_e2e['n']}×16 Mpix, "
              f"{native_e2e['threads']} thread(s)): "
              f"{native_e2e['tput_mpix_s']} Mpix/s  "
              f"stages={native_e2e['stages_s']}")
    e2e_tput, n_used = measure_e2e_jaxcpu()
    print(f"e2e JAX-CPU twin ({n_used}×16 Mpix): {e2e_tput:.3f} Mpix/s")
    rec = {
        "tput_mpix_s": round(e2e_tput, 3),
        "source": f"e2e JAX-CPU twin, {n_used}x16Mpix, {ncpu}-core host "
                  "(reference siril-cli unbuildable here: no meson/cfitsio)",
        "native_stack_stage_mpix_s": round(native_tput, 2)
        if native_tput else None,
        "native_stack_note": "C++ OpenMP winsorized hot-loop twin "
                             "(mean_and_reject equivalent) — the rate the "
                             "reference's stack INNER LOOP would reach on "
                             "this host; e2e reference would be slower "
                             "(adds I/O, star detect, PSF fit, warp)",
        "host_cpus": ncpu,
    }
    if native_e2e is not None:
        rec["native_e2e_mpix_s"] = native_e2e["tput_mpix_s"]
        rec["native_e2e_detail"] = native_e2e
        rec["native_e2e_note"] = (
            "C++ OpenMP e2e twin (native/cpu_twin.cpp): decode+calibrate+"
            "detect+match+warp+normalize+winsorized-stack, frames RAM-"
            "resident; every stage takes the FASTEST available CPU "
            "algorithm (moment centroids, translation match, separable "
            "warp), so this is an UPPER bound on the reference chain's "
            "rate here. All stages are frame/row-parallel — multicore "
            f"scale-model: rate × cores ({ncpu} core(s) measured).")
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
