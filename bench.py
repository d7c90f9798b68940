"""Benchmark: BASELINE config 1 — sigma-clipped average stack of 50×1024²
pre-registered mono FITS lights, end-to-end (FITS decode → device →
rejection kernel → result), reported as input Mpix/s.

vs_baseline = TPU throughput / multicore-CPU throughput of the SAME
pipeline (JAX CPU backend as the stand-in for the reference's OpenMP
multicore stacking — the reference publishes no numbers, BASELINE.md).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

N_FRAMES = 50
H = W = 1024
SIGMA = (3.0, 3.0)


def make_dataset(d):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng(42)
    scene = (0.1 + 0.6 * rng.random((H, W))).astype(np.float32)
    for i in range(N_FRAMES):
        f = scene + rng.normal(0, 0.01, (H, W)).astype(np.float32)
        if i % 5 == 0:
            ys, xs = rng.integers(0, H, 200), rng.integers(0, W, 200)
            f[ys, xs] = 0.9
        img = SirilImage(data=np.clip(f, 1e-4, 1.0)[None])
        img.keywords.exposure = 60.0
        write_fits(img, os.path.join(d, f"light_{i:05d}.fit"), bitdepth=16)


def run_stack(d):
    from siril_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.stacking import StackArgs, stack_sequence

    seqfile = os.path.join(d, "light_.seq")
    if os.path.exists(seqfile):
        from siril_tpu.io.seqfile import read_seqfile

        seq = read_seqfile(seqfile)      # reuses cached per-frame stats
    else:
        seq = Sequence.scan("light_", d)
    # the reference's default deep-sky stack: winsorized sigma clipping
    # with IKSS additive+scaling normalization
    # (OSC_Preprocessing.ssf: `stack r_pp_light rej 3 3 -norm=addscale`)
    from siril_tpu.ops.normalization import ADDITIVE_SCALING

    args = StackArgs(method="rej", rejection=rj.WINSORIZED,
                     siglow=SIGMA[0], sighigh=SIGMA[1],
                     normalize=ADDITIVE_SCALING)
    res = stack_sequence(seq, args)
    return res.elapsed_s


def measure(platform: str, d) -> float:
    """Run in a subprocess so the JAX platform can differ."""
    # the axon sitecustomize pins JAX_PLATFORMS at interpreter startup, so
    # an env var is not enough — override via jax.config before any
    # backend initialization
    force = ("import jax; jax.config.update('jax_platforms', 'cpu');"
             if platform == "cpu" else "")
    code = (
        force +
        "import sys, json; sys.path.insert(0, %r);"
        "import bench; t1 = bench.run_stack(%r);"   # warm (compile)
        "t2 = bench.run_stack(%r);"                  # hot
        "print('BENCH_RESULT', json.dumps(min(t1, t2)))"
        % (os.path.dirname(os.path.abspath(__file__)), d, d)
    )
    env = dict(os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT"):
            return float(json.loads(line.split(None, 1)[1]))
    raise RuntimeError(f"bench subprocess failed ({platform}):\n"
                       f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    with tempfile.TemporaryDirectory() as d:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        make_dataset(d)
        mpix = N_FRAMES * H * W / 1e6

        t_tpu = measure("default", d)
        tput_tpu = mpix / t_tpu
        try:
            t_cpu = measure("cpu", d)
            vs = (mpix / t_cpu)
            vs_baseline = tput_tpu / vs
        except Exception:
            vs_baseline = 0.0

        print(json.dumps({
            "metric": "winsorized_addscale_stack_throughput_50x1Mpix",
            "value": round(tput_tpu, 2),
            "unit": "Mpix/s",
            "vs_baseline": round(vs_baseline, 2),
        }))


if __name__ == "__main__":
    main()
