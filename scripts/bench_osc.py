"""Config-3 probe: OSC CFA lights → register (2-pass transform-only) →
fused Bayer-drizzle x2 co-add (no r_ materialization), via the CLI
commands (BASELINE config 3: 200x24MP — pass N=200 H=4000 W=6000).

The reference's drizzle workflow registers the CFA lights and drizzles
them straight to RGB (Bayer drizzle replaces the RCD demosaic step);
the staged seqapplyreg path (OSC_STAGED=1) materializes the drizzled
frames and rejection-stacks them like stackall does.

Usage: python scripts/bench_osc.py [N] [H] [W]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from siril_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
H = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
W = int(sys.argv[3]) if len(sys.argv) > 3 else H


def make_dataset(d):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    yy /= H
    xx /= W
    sky_r = 0.05 + 0.01 * xx
    sky_g = 0.07 + 0.012 * yy
    sky_b = 0.04 + 0.008 * (xx + yy)
    n_stars = max(300, N)
    sx = rng.uniform(20, W - 20, n_stars).astype(np.float32)
    sy = rng.uniform(20, H - 20, n_stars).astype(np.float32)
    amp = rng.uniform(0.1, 0.6, n_stars).astype(np.float32)
    gy, gx = np.mgrid[-3:4, -3:4].astype(np.float32)
    bayer = np.zeros((H, W, 3), np.float32)      # RGGB masks
    bayer[0::2, 0::2, 0] = 1
    bayer[0::2, 1::2, 1] = 1
    bayer[1::2, 0::2, 1] = 1
    bayer[1::2, 1::2, 2] = 1

    shifts = rng.uniform(-3, 3, (N, 2)).astype(np.float32)
    shifts[0] = 0
    t0 = time.perf_counter()
    for i in range(N):
        rgb = np.stack([sky_r, sky_g, sky_b], -1).copy()
        x0 = sx + shifts[i, 0]
        y0 = sy + shifts[i, 1]
        xi = x0.astype(np.int32)
        yi = y0.astype(np.int32)
        ok = (xi >= 3) & (xi < W - 3) & (yi >= 3) & (yi < H - 3)
        g = amp[ok, None, None] * np.exp(
            -((gx[None] - (x0[ok] - xi[ok])[:, None, None]) ** 2
              + (gy[None] - (y0[ok] - yi[ok])[:, None, None]) ** 2)
            / (2 * 1.6 ** 2))
        iy = (yi[ok][:, None, None] + gy[None].astype(np.int32)).ravel()
        ix = (xi[ok][:, None, None] + gx[None].astype(np.int32)).ravel()
        for c in range(3):
            np.add.at(rgb[..., c], (iy, ix), g.ravel())
        cfa = (rgb * bayer).sum(-1) + \
            rng.normal(0, 0.003, (H, W)).astype(np.float32)
        img = SirilImage(data=np.clip(cfa, 1e-4, 1.0)[None])
        img.keywords.exposure = 60.0
        img.keywords.bayer_pattern = "RGGB"
        write_fits(img, os.path.join(d, f"light_{i:05d}.fit"), bitdepth=16)
    print(f"dataset: {N}x{H}x{W} CFA in {time.perf_counter()-t0:.1f}s",
          flush=True)


def run(d):
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line as cmd

    ctx = Session(cwd=d)
    staged = bool(os.environ.get("OSC_STAGED"))
    t0 = time.perf_counter()
    assert cmd(ctx, "register light_ -2pass") == 0
    t1 = time.perf_counter()
    print(f"register: {t1-t0:.1f}s", flush=True)
    if staged:
        assert cmd(ctx, "seqapplyreg light_ -drizzle -scale=2.0 "
                        "-pixfrac=0.9 -kernel=square") == 0
        t2 = time.perf_counter()
        print(f"drizzle apply: {t2-t1:.1f}s", flush=True)
        assert cmd(ctx, "stack r_light_ rej w 3 3 -norm=addscale "
                        "-out=res") == 0
    else:
        assert cmd(ctx, "stack light_ -drizzle -scale=2.0 -pixfrac=0.9 "
                        "-kernel=square -out=res") == 0
    t3 = time.perf_counter()
    print(f"drizzle stack: {t3-t1:.1f}s", flush=True)
    mpix = N * H * W / 1e6
    print(f"config3 e2e: {t3-t0:.1f}s = {mpix/(t3-t0):.2f} Mpix/s input",
          flush=True)
    from siril_tpu.utils.trace import report
    print(report(), flush=True)


def main():
    d = os.environ.get("OSC_DIR") or tempfile.mkdtemp(prefix="osc_")
    os.makedirs(d, exist_ok=True)
    if not os.path.exists(os.path.join(d, "light_00000.fit")):
        make_dataset(d)
    print("dataset dir:", d, flush=True)
    run(d)


if __name__ == "__main__":
    main()
