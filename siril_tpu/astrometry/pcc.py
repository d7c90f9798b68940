"""Photometric color calibration — equivalent of
``src/algos/photometric_cc.c`` (apply_photometric_color_correction:811).

Per plate-solved star with a catalogue B−V color: measure its flux in
each channel (aperture photometry), compute the *expected* RGB ratios
from B−V via effective temperature (Ballesteros 2012 formula) → Planckian
locus xy → XYZ → linear sRGB; robust-fit per-channel white-balance
factors kw so measured/expected agree, normalized to G; then apply
  out_c = in_c · kw_c + (−bg_c·kw_c + mean(bg))
(background equalization, photometric_cc.c:811-848).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.utils.log import log_error, log_message

# XYZ → linear sRGB (D65)
_M_XYZ2RGB = np.array([[3.2404542, -1.5371385, -0.4985314],
                       [-0.9692660, 1.8760108, 0.0415560],
                       [0.0556434, -0.2040259, 1.0572252]])


def bv_to_temp(bv: float) -> float:
    """Ballesteros (2012) B−V → T_eff (K)."""
    return 4600.0 * (1.0 / (0.92 * bv + 1.7) + 1.0 / (0.92 * bv + 0.62))


def planck_xy(t: float) -> Tuple[float, float]:
    """Planckian locus approximation (CIE, 1667K–25000K)."""
    t = min(max(t, 1667.0), 25000.0)
    inv = 1000.0 / t
    if t < 4000.0:
        x = (-0.2661239 * inv ** 3 - 0.2343589 * inv ** 2
             + 0.8776956 * inv + 0.179910)
    else:
        x = (-3.0258469 * inv ** 3 + 2.1070379 * inv ** 2
             + 0.2226347 * inv + 0.240390)
    if t < 2222.0:
        y = (-1.1063814 * x ** 3 - 1.34811020 * x ** 2
             + 2.18555832 * x - 0.20219683)
    elif t < 4000.0:
        y = (-0.9549476 * x ** 3 - 1.37418593 * x ** 2
             + 2.09137015 * x - 0.16748867)
    else:
        y = (3.0817580 * x ** 3 - 5.87338670 * x ** 2
             + 3.75112997 * x - 0.37001483)
    return x, y


def bv_to_rgb(bv: float) -> np.ndarray:
    """Expected linear RGB (max-normalized) of a star of given B−V."""
    t = bv_to_temp(bv)
    x, y = planck_xy(t)
    Y = 1.0
    X = x / y * Y
    Z = (1 - x - y) / y * Y
    rgb = _M_XYZ2RGB @ np.array([X, Y, Z])
    rgb = np.maximum(rgb, 1e-6)
    return rgb / rgb.max()


def photometric_color_calibration(img: SirilImage, catalog,
                                  wcs=None, mag_limit: float = 13.0,
                                  bg_tolerance: float = 2.0
                                  ) -> Optional[SirilImage]:
    """`pcc` command: needs a plate-solved RGB image + catalogue with bv."""
    from siril_tpu.ops.photometry import PhotConfig, measure_star
    from siril_tpu.ops.statistics import STATS_BASIC, compute_stats_np

    if img.nchans != 3:
        raise ValueError("PCC requires an RGB image")
    w = wcs or img.wcs
    if w is None:
        raise ValueError("PCC requires a plate-solved image (run platesolve)")
    bv = getattr(catalog, "bv", None)
    if bv is None:
        raise ValueError("catalogue has no B-V color data")

    H, W = img.height, img.width
    fov = w.pixel_scale_arcsec * max(H, W) / 3600.0
    ra_c, dec_c = w.pix2world(np.array([W / 2.0]), np.array([H / 2.0]))
    cone = catalog.cone_search(float(ra_c[0]), float(dec_c[0]), fov,
                               mag_limit)
    cone_bv = cone.bv if cone.bv is not None else np.full(len(cone), 0.65)
    if len(cone) < 5:
        log_error("PCC: not enough catalogue stars in field")
        return None
    x, y = w.world2pix(cone.ra, cone.dec)
    data = img.host()
    cfg = PhotConfig(inner=8.0, outer=12.0, force_radius=True, aperture=5.0)
    ratios = []          # per star: measured flux per channel & expected rgb
    for k in range(len(cone)):
        if not (15 < x[k] < W - 15 and 15 < y[k] < H - 15):
            continue
        fluxes = []
        ok = True
        for c in range(3):
            r = measure_star(data[c], float(x[k]), float(y[k]), 4.0, cfg)
            if not r.intensity or r.intensity <= 0:
                ok = False
                break
            fluxes.append(r.intensity)
        if not ok:
            continue
        expected = bv_to_rgb(float(cone_bv[k]) if k < len(cone_bv) else 0.65)
        ratios.append((np.array(fluxes), expected))
    if len(ratios) < 4:
        log_error(f"PCC: only {len(ratios)} usable stars")
        return None

    # per-channel scale: kw_c = median over stars of
    # (expected_c/expected_G) / (flux_c/flux_G)
    kws = []
    for c in range(3):
        vals = [(e[c] / e[1]) / (f[c] / f[1]) for f, e in ratios
                if f[1] > 0 and e[1] > 0]
        kws.append(float(np.median(vals)))
    kw = np.array(kws)
    kw /= kw[1]
    bg = np.array([compute_stats_np(data[c], STATS_BASIC).median
                   for c in range(3)], np.float32)
    bg_mean = float(bg.mean())
    offset = -bg * kw + bg_mean
    out = np.clip(data * kw[:, None, None] + offset[:, None, None],
                  0.0, 1.0).astype(np.float32)
    res = img.copy(data=out)
    res.wcs = img.wcs
    res.log_history(
        f"PCC ({len(ratios)} stars, K=[{kw[0]:.3f} {kw[1]:.3f} {kw[2]:.3f}])")
    log_message(f"PCC white balance: K0={kw[0]:.3f} K1={kw[1]:.3f} "
                f"K2={kw[2]:.3f} from {len(ratios)} stars")
    return res


def background_neutralization(img: SirilImage) -> SirilImage:
    """Background equalization only (the PCC bg step standalone)."""
    from siril_tpu.ops.statistics import STATS_BASIC, compute_stats_np

    data = img.host()
    bg = np.array([compute_stats_np(data[c], STATS_BASIC).median
                   for c in range(img.nchans)])
    bg_mean = bg.mean()
    out = np.clip(data + (bg_mean - bg)[:, None, None], 0, 1).astype(np.float32)
    res = img.copy(data=out)
    res.log_history("Background neutralization")
    return res
