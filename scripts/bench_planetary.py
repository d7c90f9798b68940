"""Config-4 probe: planetary SER — quality rank → MPP register →
MPP stack → Richardson–Lucy, via the CLI (BASELINE config 4 at reduced
scale).

Usage: python scripts/bench_planetary.py [N] [S]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from siril_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500
S = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def make_dataset(d):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.ser import SER_MONO, SerWriter

    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    c = S / 2.0
    r = np.hypot(xx - c, yy - c)
    # a banded "planet" disc
    disc = np.clip(1.0 - (r / (S * 0.35)) ** 8, 0, 1)
    bands = 0.5 + 0.2 * np.sin(yy / S * 23.0) + 0.1 * np.sin(yy / S * 57.0)
    planet = (disc * bands * 0.7).astype(np.float32)

    w = SerWriter(os.path.join(d, "planet.ser"), S, S, SER_MONO, 16)
    t0 = time.perf_counter()
    for i in range(N):
        dx, dy = rng.normal(0, 2.0, 2)
        f = np.roll(np.roll(planet, int(round(dy)), 0), int(round(dx)), 1)
        blur = rng.uniform(0, 1.5)     # variable seeing
        if blur > 0.7:                  # cheap box blur for bad frames
            k = int(blur * 2) * 2 + 1
            f = np.cumsum(f, 0)
            f = (np.roll(f, -k, 0) - f) / -k
            f = np.cumsum(f, 1)
            f = (np.roll(f, -k, 1) - f) / -k
        f = f + rng.normal(0, 0.01, (S, S)).astype(np.float32)
        w.write_frame(SirilImage(data=np.clip(f, 0, 1)[None]))
    w.close()
    print(f"dataset: {N}x{S}² SER in {time.perf_counter()-t0:.1f}s",
          flush=True)


def run(d):
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line as cmd

    ctx = Session(cwd=d)
    t0 = time.perf_counter()
    assert cmd(ctx, "seqquality planet") == 0
    t1 = time.perf_counter()
    print(f"quality: {t1-t0:.1f}s", flush=True)
    assert cmd(ctx, "register_mpp planet -apsize=64 -bestpct=30") == 0
    t2 = time.perf_counter()
    print(f"mpp register: {t2-t1:.1f}s", flush=True)
    assert cmd(ctx, "stack_mpp planet -bestpct=30 -out=res") == 0
    t3 = time.perf_counter()
    print(f"mpp stack: {t3-t2:.1f}s", flush=True)
    assert cmd(ctx, "load res") == 0
    assert cmd(ctx, "rl -iters=20") == 0
    t4 = time.perf_counter()
    print(f"RL deconv: {t4-t3:.1f}s", flush=True)
    print(f"config4 e2e: {t4-t0:.1f}s = {N/(t4-t0):.0f} frames/s",
          flush=True)
    from siril_tpu.utils.trace import report
    print(report(), flush=True)


def main():
    d = os.environ.get("PLANET_DIR") or tempfile.mkdtemp(prefix="planet_")
    os.makedirs(d, exist_ok=True)
    if not os.path.exists(os.path.join(d, "planet.ser")):
        make_dataset(d)
    print("dataset dir:", d, flush=True)
    run(d)


if __name__ == "__main__":
    main()
