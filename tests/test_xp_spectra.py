"""Gaia XP spectra: design-matrix bake, continuous→sampled GEMV, local
photometric catalogue round-trips (xpsamp + xpcts), and SPCC integration.

Reference semantics: src/io/healpix/xp_continuous.cpp (GEMV + merge),
tools/bake_xp_design.py + tools/numpy_repro.py (bake pipeline),
src/io/local_catalogues.c:758-812 (record decode), algos/spcc.c:99
(flux_to_relcount).
"""

import numpy as np
import pytest

from siril_tpu.astrometry import xp_spectra as xs
from siril_tpu.astrometry.gaia_local import (
    CAT_XPCTS, CAT_XPSAMP, GaiaXPLocalCatalogue, XPCTS_DTYPE, XPSAMP_DTYPE,
    write_gaia_xpcts, write_gaia_xpsamp,
)


def test_record_sizes_match_reference():
    """On-disk layouts: SourceEntryXPsamp = 701 B, SourceEntryXPcts = 456 B
    (siril_catalogues.h:144-153, xp_continuous.h:27-37)."""
    assert XPSAMP_DTYPE.itemsize == 701
    assert XPCTS_DTYPE.itemsize == 456


def test_hermite_orthonormality():
    """ψ_n are orthonormal under ∫dx — validates the recurrence."""
    x = np.linspace(-12, 12, 6001)
    h = xs.hermite_functions(8, x)
    gram = h @ h.T * (x[1] - x[0])
    np.testing.assert_allclose(gram, np.eye(8), atol=1e-6)


def test_merge_weights_crossfade():
    bp, rp = xs.merge_weights()
    np.testing.assert_allclose(bp + rp, 1.0)
    s = xs.SAMPLING
    assert np.all(bp[s < 635.0] == 1.0)
    assert np.all(bp[s > 643.0] == 0.0)
    assert np.all(np.diff(rp) >= 0)


def test_gemv_matches_scalar_oracle():
    """Batched xpcts_to_xpsampled equals the per-sample scalar loop of
    xp_continuous.cpp:40-48 (independent formulation)."""
    design = xs.synthetic_design(n_bases=10)
    rng = np.random.default_rng(3)
    nsrc = 4
    bp = rng.standard_normal((nsrc, 10)).astype(np.float32)
    rp = rng.standard_normal((nsrc, 10)).astype(np.float32)
    got = xs.xpcts_to_xpsampled(bp, rp, design)
    # scalar oracle
    for s in range(nsrc):
        for i in [0, 50, 171, 342]:
            bp_flux = sum(float(bp[s, k]) * design["bp_design"][k, i]
                          for k in range(10))
            rp_flux = sum(float(rp[s, k]) * design["rp_design"][k, i]
                          for k in range(10))
            want = (bp_flux * design["bp_merge"][i]
                    + rp_flux * design["rp_merge"][i])
            assert abs(got[s, i] - want) < 1e-12 * max(1.0, abs(want))


def test_gemv_truncation():
    design = xs.synthetic_design(n_bases=10)
    rng = np.random.default_rng(4)
    bp = rng.standard_normal((2, 10)).astype(np.float32)
    rp = rng.standard_normal((2, 10)).astype(np.float32)
    full = xs.xpcts_to_xpsampled(bp, rp, design, truncation=0)
    t3 = xs.xpcts_to_xpsampled(bp, rp, design, truncation=3)
    bp3 = bp.copy(); bp3[:, 3:] = 0
    rp3 = rp.copy(); rp3[:, 3:] = 0
    want = xs.xpcts_to_xpsampled(bp3, rp3, design, truncation=0)
    np.testing.assert_allclose(t3, want)
    assert not np.allclose(full, t3, rtol=1e-5, atol=0)
    # per-source hints
    hint = xs.xpcts_to_xpsampled(bp, rp, design,
                                 truncation=xs.XPCTS_USE_HINT,
                                 bp_n_relevant=np.array([3, 10]),
                                 rp_n_relevant=np.array([3, 10]))
    np.testing.assert_allclose(hint[0], want[0])
    np.testing.assert_allclose(hint[1], full[1])


def test_design_npz_roundtrip(tmp_path):
    design = xs.synthetic_design()
    p = str(tmp_path / "design.npz")
    np.savez_compressed(p, **design)
    loaded = xs.load_design(p)
    for k in design:
        np.testing.assert_allclose(loaded[k], design[k])


def test_parse_design_c(tmp_path):
    """Reference-format gaia_xp_design.c files parse back to the arrays."""
    design = xs.synthetic_design(n_bases=3)
    lines = ["#include \"gaia_xp_design.h\"\n"]
    for cname, key in (("gaia_xp_bp_design", "bp_design"),
                       ("gaia_xp_rp_design", "rp_design"),
                       ("gaia_xp_bp_merge", "bp_merge"),
                       ("gaia_xp_rp_merge", "rp_merge")):
        a = design[key].ravel()
        body = ",\n    ".join(f"{v:.17e}" for v in a)
        lines.append(f"const double {cname}[{a.size}] = {{\n    {body},\n}};\n")
    p = tmp_path / "gaia_xp_design.c"
    p.write_text("\n".join(lines))
    parsed = xs.parse_design_c(str(p))
    for k in design:
        np.testing.assert_allclose(parsed[k], design[k])


def _field(rng, n=30):
    ra = 120.0 + 0.4 * rng.standard_normal(n)
    dec = 30.0 + 0.4 * rng.standard_normal(n)
    mag = 8.0 + 4.0 * rng.random(n)
    return ra, dec, mag


def test_xpsamp_catalogue_roundtrip(tmp_path, rng):
    ra, dec, mag = _field(rng)
    # realistic magnitudes: ~1e-16 W/m^2/nm continuum
    flux = 1e-16 * (1.0 + rng.random((30, 343)))
    p = str(tmp_path / "field_xpsamp.cat")
    write_gaia_xpsamp(p, ra, dec, mag, flux)
    cat = GaiaXPLocalCatalogue(p)
    assert cat.cat_type == CAT_XPSAMP
    cone = cat.cone_search(120.0, 30.0, 2.0, mag_limit=20.0)
    assert len(cone) == 30
    assert cone.xp_sampled.shape == (30, 343)
    # half-float storage: ~3 decimal digits of mantissa
    order = np.argsort(cone.ra)
    want = flux[np.argsort(ra)]
    got = cone.xp_sampled[order]
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_xpcts_catalogue_roundtrip(tmp_path, rng):
    ra, dec, mag = _field(rng, n=20)
    design = xs.synthetic_design(n_bases=10)
    bp = rng.standard_normal((20, 10)).astype(np.float32)
    rp = rng.standard_normal((20, 10)).astype(np.float32)
    p = str(tmp_path / "field_xpcts.cat")
    write_gaia_xpcts(p, ra, dec, mag, bp, rp)
    cat = GaiaXPLocalCatalogue(p, design=design)
    assert cat.cat_type == CAT_XPCTS
    cone = cat.cone_search(120.0, 30.0, 2.0, mag_limit=20.0)
    assert len(cone) == 20
    order = np.argsort(cone.ra)
    want = xs.xpcts_to_xpsampled(bp[np.argsort(ra)], rp[np.argsort(ra)],
                                 design)
    np.testing.assert_allclose(cone.xp_sampled[order], want, rtol=1e-6)


def test_flux_to_relcount():
    """λ-weighting + index-82 normalization (spcc.c:99-107).  NOTE: the
    reference comment says "normalised at 550nm" but index 82 of the
    336..1020 step-2 grid is 500 nm — we replicate the CODE (y[82])."""
    assert xs.SAMPLING[82] == 500.0
    flux = np.ones((1, 343))
    y = xs.flux_to_relcount(flux)
    np.testing.assert_allclose(y[0, 82], 1.0)
    np.testing.assert_allclose(y[0], xs.SAMPLING / 500.0)


def test_spcc_white_balance_with_xp_spectra(tmp_path, rng):
    """End-to-end: SPCC on a synthetic field whose stars have known SEDs;
    the recovered white balance matches the per-channel flux-ratio oracle
    built from the same spectra (the apply_photometric_color_correction
    formula, photometric_cc.c:811)."""
    from siril_tpu.astrometry.spcc import ResponseLibrary, WL, spcc
    from siril_tpu.core.image import SirilImage
    from siril_tpu.ops.wcs import WCS

    H = W = 200
    n_stars = 24
    x = rng.uniform(25, W - 25, n_stars)
    y = rng.uniform(25, H - 25, n_stars)
    scale = 3.0 / 3600.0     # 3 arcsec/px
    w = WCS(crpix=(W / 2.0, H / 2.0), crval=(120.0, 30.0),
            cd=np.eye(2) * scale, height=H)
    ra, dec = w.pix2world(x, y)

    # spectra: flat SEDs with differing red/blue slopes
    slope = rng.uniform(-0.5, 0.5, n_stars)
    lam = (WL - 650.0) / 350.0
    flux = 1e-16 * (1.0 + slope[:, None] * lam[None, :])
    flux = np.clip(flux, 1e-18, None)

    lib = ResponseLibrary()
    qe = lib.get("generic_qe").resampled()
    resp = [lib.get(f).resampled() * qe for f in ("R", "G", "B")]

    # image channel fluxes ∝ ∫ S λ R dλ, with a known channel imbalance
    imbalance = np.array([1.6, 1.0, 0.7])
    photon = flux * WL[None, :]
    photon = photon / photon[:, 82:83]
    true_flux = np.stack([np.trapezoid(photon * r, WL, axis=1)
                          for r in resp])          # (3, n)
    data = np.full((3, H, W), 0.001, np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for k in range(n_stars):
        g = np.exp(-0.5 * (((xx - x[k]) ** 2 + (yy - y[k]) ** 2) / 2.0 ** 2))
        for c in range(3):
            data[c] += (0.02 * true_flux[c, k] / true_flux[1].mean()
                        * imbalance[c] * g).astype(np.float32)
    img = SirilImage(data=np.clip(data, 0, 1))
    img.wcs = w

    p = str(tmp_path / "spcc_field.cat")
    write_gaia_xpsamp(p, ra, dec, np.full(n_stars, 10.0), flux)
    cat = GaiaXPLocalCatalogue(p)
    out = spcc(img, cat, wcs=w, mag_limit=20.0)
    assert out is not None
    # oracle: the white balance must undo the injected channel imbalance
    # (G-relative gains 1/1.6 and 1/0.7).  Verify on star peak fluxes:
    # out_star_c / in_star_c ≈ K_c = imbalance[1]/imbalance[c].
    od = out.host()
    gains = []
    for c in (0, 2):
        rr = []
        for k in range(n_stars):
            xi, yi = int(round(x[k])), int(round(y[k]))
            peak_in = data[c, yi, xi] - 0.001
            peak_out = od[c, yi, xi] - np.median(od[c])
            if peak_in > 0.005:
                rr.append(peak_out / peak_in)
        gains.append(np.median(rr))
    np.testing.assert_allclose(gains, [1.0 / 1.6, 1.0 / 0.7], rtol=0.08)
