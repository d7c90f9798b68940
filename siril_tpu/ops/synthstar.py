"""Star resynthesis — equivalent of ``src/filters/synthstar.c`` (850 LoC):
`synthstar` / `unclipstars` rebuild (saturated) stars from their PSF fits.

Detect stars, fit profiles, then replace each star's footprint with the
synthetic profile; for `unclipstars` only saturated stars are rebuilt
with an amplitude extrapolated from the fit (de-clipping).
"""

from __future__ import annotations

import numpy as np

from siril_tpu.core.image import SirilImage


def resynthesize_stars(img: SirilImage, only_clipped: bool = False,
                       layer: int = 0) -> SirilImage:
    from siril_tpu.registration.starfinder import detect_stars

    data = img.host().copy()
    lay_i = min(layer, img.nchans - 1)
    stars = detect_stars(data[lay_i])
    if only_clipped:
        stars = [s for s in stars if s.has_saturated]
    H, W = data.shape[1:]
    yy, xx = np.mgrid[0:H, 0:W]
    for s in stars:
        sx = max(s.sx, 0.5)
        sy = max(s.sy, 0.5)
        r = int(3.0 * max(s.fwhmx, s.fwhmy)) + 2
        x0 = max(int(s.x0) - r, 0)
        x1 = min(int(s.x0) + r + 1, W)
        y0 = max(int(s.y0) - r, 0)
        y1 = min(int(s.y0) + r + 1, H)
        if x1 <= x0 or y1 <= y0:
            continue
        sub_x = xx[y0:y1, x0:x1] + 0.5 - s.x0
        sub_y = yy[y0:y1, x0:x1] + 0.5 - s.y0
        th = np.radians(s.angle)
        ca, sa = np.cos(th), np.sin(th)
        u = ca * sub_x - sa * sub_y
        v = sa * sub_x + ca * sub_y
        model = s.A * np.exp(-(u * u / sx + v * v / sy))
        for c in range(data.shape[0]):
            scale = 1.0
            if data.shape[0] == 3 and c != lay_i:
                # preserve the star's color ratio from the original pixels
                peak_orig = data[lay_i, int(s.y0), int(s.x0)]
                peak_c = data[c, int(s.y0), int(s.x0)]
                scale = peak_c / peak_orig if peak_orig > 1e-6 else 1.0
            region = data[c, y0:y1, x0:x1]
            synth = (s.B if c == lay_i else region.min()) + model * scale
            data[c, y0:y1, x0:x1] = np.maximum(region, synth.astype(np.float32))
    out = img.copy(data=np.clip(data, 0.0, 1.0))
    out.log_history("Star resynthesis" +
                    (" (unclip)" if only_clipped else ""))
    return out
