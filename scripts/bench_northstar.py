"""North-star probe: fused calibrate+register+winsorized-stack at
N x (S x S) u16 lights (BASELINE config 2 shape).

Usage: python scripts/bench_northstar.py [N] [S] [--cpu]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

from siril_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else 40
S = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("-") else 4096


def make_dataset(d):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng(42)
    # star field + sky gradient; frames dithered by a few pixels
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
    sky = (0.08 + 0.02 * xx + 0.015 * yy).astype(np.float32)
    n_stars = 400
    sx = rng.uniform(20, S - 20, n_stars).astype(np.float32)
    sy = rng.uniform(20, S - 20, n_stars).astype(np.float32)
    amp = rng.uniform(0.1, 0.7, n_stars).astype(np.float32)

    def render(dx, dy):
        img = sky.copy()
        for k in range(n_stars):
            x0, y0 = sx[k] + dx, sy[k] + dy
            xi, yi = int(x0), int(y0)
            if 3 <= xi < S - 3 and 3 <= yi < S - 3:
                gy, gx = np.mgrid[-3:4, -3:4].astype(np.float32)
                g = np.exp(-((gx - (x0 - xi)) ** 2 + (gy - (y0 - yi)) ** 2)
                           / (2 * 1.6 ** 2))
                img[yi - 3:yi + 4, xi - 3:xi + 4] += amp[k] * g
        return img

    t0 = time.perf_counter()
    shifts = rng.uniform(-4, 4, (N, 2)).astype(np.float32)
    shifts[0] = 0
    for i in range(N):
        f = render(shifts[i, 0], shifts[i, 1])
        f = f + rng.normal(0, 0.003, (S, S)).astype(np.float32)
        img = SirilImage(data=np.clip(f, 1e-4, 1.0)[None])
        img.keywords.exposure = 120.0
        write_fits(img, os.path.join(d, f"light_{i:05d}.fit"), bitdepth=16)
    print(f"dataset: {N}x{S}x{S} in {time.perf_counter()-t0:.1f}s",
          flush=True)


def run(d):
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.pipeline import FusedArgs, fused_preprocess_stack
    from siril_tpu.ops.stacking import StackArgs
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.normalization import ADDITIVE_SCALING

    seq = Sequence.scan("light_", d)
    args = FusedArgs(stack=StackArgs(method="rej", rejection=rj.WINSORIZED,
                                     siglow=3.0, sighigh=3.0,
                                     normalize=ADDITIVE_SCALING))
    t0 = time.perf_counter()
    res = fused_preprocess_stack(seq, args)
    dt = time.perf_counter() - t0
    mpix = N * S * S / 1e6
    print(f"fused e2e: {dt:.1f}s = {mpix/dt:.1f} Mpix/s "
          f"(reported elapsed {res.elapsed_s:.1f}s)", flush=True)
    from siril_tpu.utils.trace import report
    print(report(), flush=True)
    return dt


def main():
    d = os.environ.get("NORTHSTAR_DIR")
    if d and os.path.exists(os.path.join(d, "light_00000.fit")):
        print("reusing dataset", d, flush=True)
    else:
        d = d or tempfile.mkdtemp(prefix="northstar_")
        os.makedirs(d, exist_ok=True)
        make_dataset(d)
        print("dataset dir:", d, flush=True)
    t1 = run(d)     # compile + run
    t2 = run(d)     # hot
    print(f"best: {min(t1, t2):.1f}s", flush=True)


if __name__ == "__main__":
    main()
