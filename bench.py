"""Benchmark: the BASELINE north-star workload — full calibration
(bias/dark/flat + cosmetic) + global-star registration + winsorized
rejection stack with IKSS additive-scaling normalization, 100×16 Mpix
(4096²) mono lights (BASELINE.md config 2 / BASELINE.json north_star),
end-to-end: FITS decode → device → fused pipeline → result fetched.

vs_baseline = TPU throughput / multicore-CPU throughput of the SAME
pipeline (JAX CPU backend as the stand-in for the reference's OpenMP
engine — the reference publishes no numbers, BASELINE.md).  The CPU twin
runs fewer frames of the same 16 Mpix geometry (per-frame work is
independent, so Mpix/s is scale-free there) to keep the bench bounded.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "100"))
N_FRAMES_CPU = int(os.environ.get("BENCH_FRAMES_CPU", "6"))
S = 4096
SIGMA = (3.0, 3.0)


def make_dataset(d, n):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
    sky = (0.06 + 0.02 * xx + 0.015 * yy).astype(np.float32)

    n_stars = 400
    sx = rng.uniform(20, S - 20, n_stars).astype(np.float32)
    sy = rng.uniform(20, S - 20, n_stars).astype(np.float32)
    amp = rng.uniform(0.1, 0.7, n_stars).astype(np.float32)
    gy, gx = np.mgrid[-3:4, -3:4].astype(np.float32)

    # masters: constant bias, dark with hot pixels, vignetted flat
    bias = 0.02
    dark = rng.normal(0.004, 0.0005, (S, S)).astype(np.float32)
    hot = (rng.integers(0, S, 300), rng.integers(0, S, 300))
    dark[hot] = 0.3
    r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2
    flat = (1.0 - 0.35 * r2 / r2.max()).astype(np.float32)

    img = SirilImage(data=np.full((1, S, S), bias, np.float32))
    write_fits(img, os.path.join(d, "bias.fit"), bitdepth=16)
    img = SirilImage(data=np.clip(bias + dark, 0, 1)[None])
    img.keywords.exposure = 120.0
    write_fits(img, os.path.join(d, "dark.fit"), bitdepth=16)
    img = SirilImage(data=(0.5 * flat)[None])
    write_fits(img, os.path.join(d, "flat.fit"), bitdepth=16)

    shifts = rng.uniform(-4, 4, (n, 2)).astype(np.float32)
    shifts[0] = 0
    for i in range(n):
        f = sky.copy()
        # vectorized star render: 7×7 gaussian patches scatter-added
        x0 = sx + shifts[i, 0]
        y0 = sy + shifts[i, 1]
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
             + rng.normal(0, 0.003, (S, S)).astype(np.float32))
        img = SirilImage(data=np.clip(f, 1e-4, 1.0)[None])
        img.keywords.exposure = 120.0
        write_fits(img, os.path.join(d, f"light_{i:05d}.fit"), bitdepth=16)


def run_pipeline(d):
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
    calib = CalibArgs(bias=read_fits(os.path.join(d, "bias.fit")),
                      dark=read_fits(os.path.join(d, "dark.fit")),
                      flat=read_fits(os.path.join(d, "flat.fit")))
    args = FusedArgs(calib=calib,
                     stack=StackArgs(method="rej", rejection=rj.WINSORIZED,
                                     siglow=SIGMA[0], sighigh=SIGMA[1],
                                     normalize=ADDITIVE_SCALING))
    res = fused_preprocess_stack(seq, args)
    return res.elapsed_s


def measure(platform: str, d) -> float:
    """Run in a subprocess so the JAX platform can differ."""
    force = ("import jax; jax.config.update('jax_platforms', 'cpu');"
             if platform == "cpu" else "")
    code = (
        force +
        "import sys, json; sys.path.insert(0, %r);"
        "import bench; t1 = bench.run_pipeline(%r);"  # warm (compile)
        "t2 = bench.run_pipeline(%r);"                 # hot
        "print('BENCH_RESULT', json.dumps(min(t1, t2)))"
        % (os.path.dirname(os.path.abspath(__file__)), d, d)
    )
    env = dict(os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=5400)
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT"):
            return float(json.loads(line.split(None, 1)[1]))
    raise RuntimeError(f"bench subprocess failed ({platform}):\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as d:
        make_dataset(d, N_FRAMES)
        mpix = N_FRAMES * S * S / 1e6
        t_tpu = measure("default", d)
        tput_tpu = mpix / t_tpu

    vs_baseline = 0.0
    try:
        with tempfile.TemporaryDirectory() as d2:
            make_dataset(d2, N_FRAMES_CPU)
            t_cpu = measure("cpu", d2)
            tput_cpu = N_FRAMES_CPU * S * S / 1e6 / t_cpu
            vs_baseline = tput_tpu / tput_cpu
    except Exception:
        pass

    print(json.dumps({
        "metric": f"fused_calib_register_winsorized_stack_"
                  f"{N_FRAMES}x16Mpix",
        "value": round(tput_tpu, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
