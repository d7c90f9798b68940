"""CCD inspector — equivalent of ``src/algos/ccd-inspector.c`` (658 LoC):
`tilt` quadrant-FWHM sensor tilt analysis and the aberration inspector,
plus `fix_xtrans` (X-Trans autofocus-pixel artifact fix,
fix_xtrans_af.c) and the `profile` cut tool (core/cut.c).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.utils.log import log_message


@dataclass
class TiltResult:
    fwhm_center: float
    fwhm_corners: Tuple[float, float, float, float]   # TL, TR, BL, BR
    tilt_pct: float
    nb_stars: int


def sensor_tilt(img: SirilImage, layer: int = 0) -> TiltResult:
    """`tilt` command: mean star FWHM per corner quadrant vs center;
    tilt = (max−min)/mean of the corner FWHMs."""
    from siril_tpu.registration.starfinder import detect_stars

    lay = img.host()[min(layer, img.nchans - 1)]
    H, W = lay.shape
    stars = detect_stars(lay)
    if len(stars) < 10:
        raise ValueError(f"not enough stars for tilt analysis ({len(stars)})")

    def region_fwhm(x0, x1, y0, y1):
        f = [s.fwhmx for s in stars if x0 <= s.x0 < x1 and y0 <= s.y0 < y1]
        return float(np.median(f)) if f else 0.0

    hw, hh = W / 2, H / 2
    corners = (region_fwhm(0, hw, 0, hh), region_fwhm(hw, W, 0, hh),
               region_fwhm(0, hw, hh, H), region_fwhm(hw, W, hh, H))
    center = region_fwhm(W * 0.25, W * 0.75, H * 0.25, H * 0.75)
    valid = [c for c in corners if c > 0]
    tilt = 100.0 * (max(valid) - min(valid)) / np.mean(valid) if valid else 0.0
    log_message(f"Tilt: corners TL={corners[0]:.2f} TR={corners[1]:.2f} "
                f"BL={corners[2]:.2f} BR={corners[3]:.2f}, "
                f"center={center:.2f}, tilt={tilt:.1f}%")
    return TiltResult(center, corners, tilt, len(stars))


def aberration_inspector(img: SirilImage, panel: int = 200,
                         grid: int = 3) -> SirilImage:
    """`inspector`: mosaic of grid×grid panels from corners/edges/center
    for visual aberration checking."""
    data = img.host()
    C, H, W = data.shape
    p = min(panel, H // grid, W // grid)
    out = np.zeros((C, p * grid, p * grid), np.float32)
    for gy in range(grid):
        for gx in range(grid):
            sy = int((H - p) * gy / (grid - 1)) if grid > 1 else 0
            sx = int((W - p) * gx / (grid - 1)) if grid > 1 else 0
            out[:, gy * p:(gy + 1) * p, gx * p:(gx + 1) * p] = \
                data[:, sy:sy + p, sx:sx + p]
    res = img.copy(data=out)
    res.log_history("Aberration inspector mosaic")
    return res


def fix_xtrans_af(img: SirilImage,
                  af_box: Optional[Tuple[int, int, int, int]] = None,
                  sample_box: Optional[Tuple[int, int, int, int]] = None
                  ) -> SirilImage:
    """fix_xtrans: X-Trans autofocus pixel rows read low; equalize the
    AF region's pixel rows to the surrounding sample statistics
    (fix_xtrans_af.c model)."""
    data = img.host().copy()
    C, H, W = data.shape
    if af_box is None:
        # X-T2-style default: central band
        af_box = (W // 4, H // 4, W // 2, H // 2)
    x, y, w, h = af_box
    sx, sy, sw, sh = sample_box or (max(x - w // 4, 0), max(y - h // 4, 0),
                                    w, h)
    for c in range(C):
        af = data[c, y:y + h, x:x + w]
        sample = data[c, sy:sy + sh, sx:sx + sw]
        # row-phase statistics: X-Trans AF pixels repeat every 3 rows
        for phase in range(3):
            af_rows = af[phase::3]
            s_rows = sample[phase::3]
            if af_rows.size and s_rows.size:
                ratio = np.median(s_rows) / max(np.median(af_rows), 1e-9)
                if 0.5 < ratio < 2.0:
                    af[phase::3] = np.clip(af_rows * ratio, 0, 1)
        data[c, y:y + h, x:x + w] = af
    out = img.copy(data=data)
    out.log_history("Fixed X-Trans AF pixels")
    return out


def intensity_profile(img: SirilImage, p0: Tuple[float, float],
                      p1: Tuple[float, float], layer: Optional[int] = None,
                      width: int = 1, spacing: float = 1.0,
                      arcsec: bool = False) -> np.ndarray:
    """`profile` cut tool (core/cut.c): sampled intensity along a line.
    ``width`` averages across a perpendicular band of that many pixels;
    ``spacing`` sets the sample step; ``arcsec`` converts the distance
    axis using the WCS pixel scale.  Returns (n, 1+C): distance +
    per-channel values."""
    from siril_tpu.ops.interp import INTERP_BILINEAR, sample_plane

    import jax.numpy as jnp

    data = img.device()
    length = np.hypot(p1[0] - p0[0], p1[1] - p0[1])
    n = max(int(length / max(spacing, 1e-6)) + 1, 2)
    t = np.linspace(0.0, 1.0, n)
    xs0 = p0[0] + t * (p1[0] - p0[0])
    ys0 = p0[1] + t * (p1[1] - p0[1])
    if width > 1:
        # average across the perpendicular band
        ux, uy = (p1[0] - p0[0]) / length, (p1[1] - p0[1]) / length
        px, py = -uy, ux
        offs = np.arange(width) - (width - 1) / 2.0
        xs = jnp.asarray((xs0[None, :] + offs[:, None] * px).ravel(),
                         jnp.float32)
        ys = jnp.asarray((ys0[None, :] + offs[:, None] * py).ravel(),
                         jnp.float32)
    else:
        xs = jnp.asarray(xs0, jnp.float32)
        ys = jnp.asarray(ys0, jnp.float32)
    chans = range(img.nchans) if layer is None else [layer]
    dist = t * length
    if arcsec and img.wcs is not None:
        dist = dist * img.wcs.pixel_scale_arcsec
    cols = [dist]
    for c in chans:
        v = np.asarray(sample_plane(data[c], ys, xs, INTERP_BILINEAR))
        if width > 1:
            v = v.reshape(width, n).mean(axis=0)
        cols.append(v)
    return np.stack(cols, axis=1)


def save_profile_plot(profile: np.ndarray, dat_path: str,
                      png_path: Optional[str] = None,
                      title: str = "Intensity profile") -> None:
    """siril_plot equivalent: .dat always, .png when matplotlib exists."""
    np.savetxt(dat_path, profile, header="distance " + " ".join(
        f"ch{c}" for c in range(profile.shape[1] - 1)))
    if png_path:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(8, 4.5))
            colors = ["#d62728", "#2ca02c", "#1f77b4"]
            for c in range(1, profile.shape[1]):
                ax.plot(profile[:, 0], profile[:, c],
                        color=colors[(c - 1) % 3], lw=1.0,
                        label=f"channel {c - 1}")
            ax.set_xlabel("distance (px)")
            ax.set_ylabel("intensity")
            ax.set_title(title)
            ax.legend()
            fig.tight_layout()
            fig.savefig(png_path, dpi=110)
            plt.close(fig)
        except ImportError:
            pass
