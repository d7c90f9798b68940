"""Rotation probe: fused calibrate+register+winsorized-stack where the
frames carry small ROTATIONS (field rotation / meridian flip residuals)
— forces the gather-based homography warp branch (pipeline.py), not the
pure-translation separable fast path the north-star bench rides.

Usage: python scripts/bench_rotation.py [N] [S] [--cpu]
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

args = [a for a in sys.argv[1:] if not a.startswith("-")]
N = int(args[0]) if args else 40
S = int(args[1]) if len(args) > 1 else 4096


def make_dataset(d):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
    sky = (0.08 + 0.02 * xx + 0.015 * yy).astype(np.float32)
    n_stars = 400
    sx = rng.uniform(20, S - 20, n_stars).astype(np.float32)
    sy = rng.uniform(20, S - 20, n_stars).astype(np.float32)
    amp = rng.uniform(0.1, 0.7, n_stars).astype(np.float32)
    gy, gx = np.mgrid[-3:4, -3:4].astype(np.float32)
    c = S / 2.0
    t0 = time.perf_counter()
    for i in range(N):
        # rotation up to ±0.3° + a few px of translation per frame
        th = 0.0 if i == 0 else rng.uniform(-0.3, 0.3) * np.pi / 180.0
        tx, ty = (0.0, 0.0) if i == 0 else rng.uniform(-4, 4, 2)
        ca, sa = np.cos(th), np.sin(th)
        x0 = ca * (sx - c) - sa * (sy - c) + c + tx
        y0 = sa * (sx - c) + ca * (sy - c) + c + ty
        f = sky.copy()
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
        f += rng.standard_normal((S, S), dtype=np.float32) * 0.003
        img = SirilImage(data=np.clip(f, 1e-4, 1.0)[None])
        img.keywords.exposure = 120.0
        write_fits(img, os.path.join(d, f"light_{i:05d}.fit"),
                   bitdepth=16)
        if (i + 1) % 10 == 0:
            print(f"dataset {i + 1}/{N}", flush=True)
    print(f"dataset: {N}x{S}² rotated in {time.perf_counter()-t0:.1f}s",
          flush=True)


def main():
    d = os.environ.get("ROT_DIR") or tempfile.mkdtemp(prefix="rot_")
    os.makedirs(d, exist_ok=True)
    if not os.path.exists(os.path.join(d, f"light_{N-1:05d}.fit")):
        make_dataset(d)
    print("dataset dir:", d, flush=True)

    from siril_tpu.core.sequence import Sequence
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.normalization import ADDITIVE_SCALING
    from siril_tpu.ops.stacking import StackArgs
    from siril_tpu.pipeline import FusedArgs, fused_preprocess_stack
    from siril_tpu.registration.matching import HOMOGRAPHY_TRANSFORMATION

    seq = Sequence.scan("light_", d)
    fargs = FusedArgs(
        calib=None, ttype=HOMOGRAPHY_TRANSFORMATION,
        stack=StackArgs(method="rej", rejection=rj.WINSORIZED,
                        siglow=3.0, sighigh=3.0,
                        normalize=ADDITIVE_SCALING))
    t0 = time.perf_counter()
    res = fused_preprocess_stack(seq, fargs)
    t = time.perf_counter() - t0
    mpix = N * S * S / 1e6
    print(f"rotation e2e: {t:.1f}s = {mpix/t:.2f} Mpix/s "
          f"(homography warp branch)", flush=True)


if __name__ == "__main__":
    main()
