"""Perspective probe: fused calibrate+register+winsorized-stack where
frames carry MILD PROJECTIVE distortions (camera-tilt differences,
mosaic-tile geometry) on top of rotation+translation — forces the
perspective split path (affine chirp-Z + bounded residual shift passes,
ops/interp.py warp_perspective_batch), the newest rung of the warp
ladder, below the gather fallback.

Usage: python scripts/bench_perspective.py [N] [S] [--cpu]
Env: PERSP_DIR= to cache the dataset between runs.
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

    rng = np.random.default_rng(1234)
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
    sky = (0.08 + 0.02 * xx + 0.015 * yy).astype(np.float32)
    n_stars = 400
    sx = rng.uniform(20, S - 20, n_stars).astype(np.float64)
    sy = rng.uniform(20, S - 20, n_stars).astype(np.float64)
    amp = rng.uniform(0.1, 0.7, n_stars).astype(np.float32)
    gy, gx = np.mgrid[-3:4, -3:4].astype(np.float32)
    c = S / 2.0
    t0 = time.perf_counter()
    for i in range(N):
        if i == 0:
            x0, y0 = sx, sy
        else:
            # small rotation + translation + perspective terms sized so
            # the residual after the best-fit affine is a few px at the
            # corners (lands in the D in {2,4,8} buckets)
            th = rng.uniform(-0.1, 0.1) * np.pi / 180.0
            tx, ty = rng.uniform(-4, 4, 2)
            lim = 5.0 / (S / 2.0) ** 2
            g, h = rng.uniform(-lim, lim, 2)
            u, v = sx - c, sy - c
            den = 1.0 + g * u + h * v
            ca, sa = np.cos(th), np.sin(th)
            x0 = (ca * u - sa * v) / den + c + tx
            y0 = (sa * u + ca * v) / den + c + ty
        f = sky.copy()
        xi = x0.astype(np.int32)
        yi = y0.astype(np.int32)
        ok = (xi >= 3) & (xi < S - 3) & (yi >= 3) & (yi < S - 3)
        gsub = amp[ok, None, None] * np.exp(
            -(((gx[None] - (x0[ok] - xi[ok])[:, None, None]) ** 2)
              + ((gy[None] - (y0[ok] - yi[ok])[:, None, None]) ** 2))
            / (2 * 1.6 ** 2)).astype(np.float32)
        iy = (yi[ok][:, None, None] + gy[None].astype(np.int32)).ravel()
        ix = (xi[ok][:, None, None] + gx[None].astype(np.int32)).ravel()
        np.add.at(f, (iy, ix), gsub.ravel())
        f += rng.standard_normal((S, S), dtype=np.float32) * 0.003
        img = SirilImage(data=np.clip(f, 1e-4, 1.0)[None])
        img.keywords.exposure = 120.0
        write_fits(img, os.path.join(d, f"light_{i:05d}.fit"),
                   bitdepth=16)
        if (i + 1) % 10 == 0:
            print(f"dataset {i + 1}/{N}", flush=True)
    print(f"dataset: {N}x{S}² projective in {time.perf_counter()-t0:.1f}s",
          flush=True)


def main():
    d = os.environ.get("PERSP_DIR") or tempfile.mkdtemp(prefix="persp_")
    os.makedirs(d, exist_ok=True)
    if not os.path.exists(os.path.join(d, f"light_{N-1:05d}.fit")):
        make_dataset(d)
    print("dataset dir:", d, flush=True)

    # count which warp family actually runs
    from siril_tpu.ops import interp as interp_mod
    counts = {}

    def spy(name, fn):
        def wrapped(*a, **k):
            counts[name] = counts.get(name, 0) + 1
            return fn(*a, **k)
        return wrapped

    for nm in ("warp_translation_batch", "warp_rotation_batch",
               "warp_affine_batch", "warp_perspective_batch",
               "warp_homography_batch"):
        setattr(interp_mod, nm, spy(nm, getattr(interp_mod, nm)))

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
    out = res.image.data[0]
    print(f"warp calls: {counts}", flush=True)
    print(f"stack peak={out.max():.3f} (aligned stars stay sharp; "
          f"a smeared stack reads ~sky)", flush=True)
    print(f"perspective e2e: {t:.1f}s = {mpix/t:.2f} Mpix/s "
          f"(perspective split branch)", flush=True)


if __name__ == "__main__":
    main()
