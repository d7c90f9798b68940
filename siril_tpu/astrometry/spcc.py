"""Spectrophotometric color calibration — equivalent of
``src/algos/spcc.c`` + ``src/io/spcc_json.c`` (sensor/filter spectral
response library) + the Gaia XP integration of ``io/healpix/xp_*``.

Physics: for each matched star, a source spectrum S(λ) is integrated
against each channel's total response R_c(λ) (sensor QE × filter):
  f_c = ∫ S(λ) R_c(λ) λ dλ      (photon counting)
The per-channel white balance is the robust fit of measured vs expected
flux ratios (like PCC but with full spectra instead of a Planckian
approximation).

Source spectra: Gaia XP sampled spectra from a local photometric
catalogue (``astrometry/gaia_local.py`` GaiaXPLocalCatalogue — xpsamp
half-float records or xpcts continuous coefficients reconstructed via
the baked design matrices in ``astrometry/xp_spectra.py``, the
xp_continuous.cpp equivalent), converted to relative photon counts
normalized at 550 nm (spcc.c:99 flux_to_relcount).  Blackbody SED from
the catalogue B−V (Ballesteros Teff) remains the documented fallback
when no XP database is installed.

The response library loads the reference's spcc-database JSON schema:
{"name": …, "wavelength": {"value": [...nm]}, "values": {"value": [...]}}.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.utils.log import log_error, log_message

# default wavelength grid (nm) — Gaia XP sampled range
WL = np.arange(336.0, 1021.0, 2.0)

_H = 6.62607015e-34
_C = 2.99792458e8
_KB = 1.380649e-23


@dataclass
class SpectralResponse:
    name: str
    wavelength: np.ndarray      # nm
    values: np.ndarray

    def resampled(self, wl: np.ndarray = WL) -> np.ndarray:
        return np.interp(wl, self.wavelength, self.values, left=0.0,
                         right=0.0)

    @staticmethod
    def from_json(path: str) -> "SpectralResponse":
        with open(path) as f:
            d = json.load(f)
        name = d.get("name", os.path.basename(path))
        wl = d.get("wavelength", {})
        vals = d.get("values", {})
        wl_v = np.asarray(wl.get("value", wl) if isinstance(wl, dict) else wl,
                          float)
        va_v = np.asarray(vals.get("value", vals) if isinstance(vals, dict)
                          else vals, float)
        # µm or Å → nm heuristics
        if wl_v.max() < 10.0:
            wl_v = wl_v * 1000.0
        elif wl_v.max() > 3000.0:
            wl_v = wl_v / 10.0
        return SpectralResponse(name, wl_v, va_v)


def builtin_responses() -> Dict[str, SpectralResponse]:
    """Generic built-in curves (typical CMOS QE + RGB dye filters) so
    SPCC works out of the box; JSON files override/extend these."""
    wl = WL

    def gauss(mu, sig, amp=1.0):
        return amp * np.exp(-0.5 * ((wl - mu) / sig) ** 2)

    qe = np.clip(0.9 * np.exp(-0.5 * ((wl - 530) / 220.0) ** 2), 0, 1)
    return {
        "generic_qe": SpectralResponse("generic_qe", wl, qe),
        "R": SpectralResponse("R", wl, gauss(600, 45)),
        "G": SpectralResponse("G", wl, gauss(530, 40)),
        "B": SpectralResponse("B", wl, gauss(460, 40)),
        "UVIR_cut": SpectralResponse(
            "UVIR_cut", wl,
            ((wl > 390) & (wl < 690)).astype(float)),
    }


class ResponseLibrary:
    """spcc_json.c equivalent: load all curves from a directory."""

    def __init__(self, directory: Optional[str] = None):
        self.curves = builtin_responses()
        d = directory or os.environ.get("SIRIL_TPU_SPCC_DIR")
        if d and os.path.isdir(d):
            for f in os.listdir(d):
                if f.endswith(".json"):
                    try:
                        r = SpectralResponse.from_json(os.path.join(d, f))
                        self.curves[r.name] = r
                    except (ValueError, KeyError, json.JSONDecodeError):
                        pass

    def names(self) -> List[str]:
        return sorted(self.curves)

    def get(self, name: str) -> SpectralResponse:
        if name not in self.curves:
            raise KeyError(f"unknown spectral curve '{name}'")
        return self.curves[name]


def blackbody_sed(teff: float, wl: np.ndarray = WL) -> np.ndarray:
    """Planck photon-flux spectrum, peak-normalized."""
    lam = wl * 1e-9
    with np.errstate(over="ignore"):
        b = 1.0 / (lam ** 4 * (np.exp(_H * _C / (lam * _KB * teff)) - 1.0))
    return b / b.max()


def expected_fluxes(sed: np.ndarray, responses: List[np.ndarray],
                    wl: np.ndarray = WL) -> np.ndarray:
    """∫ S(λ)·R_c(λ) dλ per channel (photon counting grid)."""
    return np.array([np.trapezoid(sed * r, wl) for r in responses])


def spcc(img: SirilImage, catalog, wcs=None,
         sensor: str = "generic_qe",
         filters: Tuple[str, str, str] = ("R", "G", "B"),
         library: Optional[ResponseLibrary] = None,
         mag_limit: float = 13.0,
         extra_responses=None, atmosphere=None) -> Optional[SirilImage]:
    """`spcc` command core."""
    from siril_tpu.astrometry.pcc import bv_to_temp
    from siril_tpu.ops.photometry import PhotConfig, measure_star
    from siril_tpu.ops.statistics import STATS_BASIC, compute_stats_np

    if img.nchans != 3:
        raise ValueError("SPCC requires an RGB image")
    w = wcs or img.wcs
    if w is None:
        raise ValueError("SPCC requires a plate-solved image")
    lib = library or ResponseLibrary()
    qe = lib.get(sensor).resampled()
    if extra_responses is not None:
        # synthesized narrowband responses replace the filter curves
        resp = [r * qe for r in extra_responses]
    else:
        resp = [lib.get(f).resampled() * qe for f in filters]
    if atmosphere is not None:
        resp = [r * atmosphere for r in resp]

    H, W = img.height, img.width
    fov = w.pixel_scale_arcsec * max(H, W) / 3600.0
    ra_c, dec_c = w.pix2world(np.array([W / 2.0]), np.array([H / 2.0]))
    cone = catalog.cone_search(float(ra_c[0]), float(dec_c[0]), fov,
                               mag_limit)
    if len(cone) < 5:
        log_error("SPCC: not enough catalogue stars in field")
        return None
    bv = cone.bv if cone.bv is not None else np.full(len(cone), 0.65)
    # Gaia XP sampled spectra (N, 343) in W·m⁻²·nm⁻¹ from the local
    # photometric catalogue; converted to relative photon counts
    # normalized at 550 nm like the reference (spcc.c:99 flux_to_relcount)
    xp = getattr(cone, "xp_sampled", None)
    if xp is None:
        xp = getattr(cone, "xp_spectra", None)    # legacy attribute
    if xp is not None:
        # BOTH attributes carry energy flux — always convert, or the
        # legacy path integrates raw W·m⁻²·nm⁻¹ as if it were counts
        from siril_tpu.astrometry.xp_spectra import flux_to_relcount

        xp = flux_to_relcount(xp)
    x, y = w.world2pix(cone.ra, cone.dec)
    data = img.host()
    cfg = PhotConfig(inner=8.0, outer=12.0, force_radius=True, aperture=5.0)
    ratios = []
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
        sed = xp[k] if xp is not None else \
            blackbody_sed(bv_to_temp(float(bv[k])))
        exp = expected_fluxes(sed, resp)
        if exp.min() <= 0:
            continue
        ratios.append((np.array(fluxes), exp))
    if len(ratios) < 4:
        log_error(f"SPCC: only {len(ratios)} usable stars")
        return None
    kws = []
    for c in range(3):
        vals = [(e[c] / e[1]) / (f[c] / f[1]) for f, e in ratios]
        kws.append(float(np.median(vals)))
    kw = np.array(kws)
    kw /= kw[1]
    bg = np.array([compute_stats_np(data[c], STATS_BASIC).median
                   for c in range(3)])
    offset = -bg * kw + bg.mean()
    out = np.clip(data * kw[:, None, None] + offset[:, None, None],
                  0, 1).astype(np.float32)
    res = img.copy(data=out)
    res.wcs = img.wcs
    res.log_history(f"SPCC ({len(ratios)} stars, sensor {sensor})")
    log_message(f"SPCC white balance: K=[{kw[0]:.3f} {kw[1]:.3f} "
                f"{kw[2]:.3f}] from {len(ratios)} stars")
    return res


def narrowband_filters(rwl: float = 656.28, gwl: float = 500.7,
                       bwl: float = 500.7, rbw: float = 3.0,
                       gbw: float = 3.0, bbw: float = 3.0):
    """Synthesize top-hat narrowband filter responses (spcc -narrowband
    -rwl/-gwl/-bwl/-rbw/-gbw/-bbw flags)."""
    out = []
    for wl0, bw in ((rwl, rbw), (gwl, gbw), (bwl, bbw)):
        v = ((WL >= wl0 - bw / 2.0) & (WL <= wl0 + bw / 2.0)).astype(float)
        out.append(v)
    return out


def atmospheric_transmission(obsheight_m: float = 0.0,
                             pressure_mbar: Optional[float] = None,
                             wl: np.ndarray = WL) -> np.ndarray:
    """Rayleigh-dominated atmospheric transmission at zenith (the spcc
    -atmos model: extinction scales with site pressure / altitude).
    τ_R(λ) ≈ 0.00877·(P/P0)·λ_um^-4.05 (Hayes & Latham 1975 form)."""
    p0 = 1013.25
    if pressure_mbar is None:
        # barometric altitude → pressure
        pressure_mbar = p0 * np.exp(-obsheight_m / 8434.0)
    lam_um = wl / 1000.0
    tau = 0.00877 * (pressure_mbar / p0) * lam_um ** -4.05
    return np.exp(-tau)
