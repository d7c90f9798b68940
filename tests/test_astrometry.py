"""WCS + plate solving tests: projection round-trips, SIP handling, and a
synthetic end-to-end solve (catalogue → rendered star field → solver →
recovered WCS)."""

import numpy as np
import pytest

from siril_tpu.astrometry.catalog import Catalog
from siril_tpu.astrometry.solver import SolveArgs, fit_wcs, solve_image
from siril_tpu.core.image import SirilImage
from siril_tpu.ops.wcs import WCS, format_dec, format_ra, parse_dec, parse_ra


def make_wcs(ra=120.0, dec=35.0, scale=2.0, rot=15.0, h=256, w=256):
    th = np.radians(rot)
    s = scale / 3600.0
    cd = np.array([[-s * np.cos(th), s * np.sin(th)],
                   [s * np.sin(th), s * np.cos(th)]])
    return WCS(crpix=(w / 2 + 0.5, h / 2 + 0.5), crval=(ra, dec), cd=cd,
               height=h)


class TestWCS:
    def test_center_maps_to_crval(self):
        w = make_wcs()
        ra, dec = w.pix2world(np.array([127.5]), np.array([127.5]))
        assert float(ra[0]) == pytest.approx(120.0, abs=1e-4)
        assert float(dec[0]) == pytest.approx(35.0, abs=1e-4)

    def test_roundtrip(self, rng):
        w = make_wcs()
        x = rng.uniform(10, 240, 50)
        y = rng.uniform(10, 240, 50)
        ra, dec = w.pix2world(x, y)
        x2, y2 = w.world2pix(ra, dec)
        np.testing.assert_allclose(x2, x, atol=1e-6)
        np.testing.assert_allclose(y2, y, atol=1e-6)

    def test_pixel_scale(self):
        w = make_wcs(scale=2.5)
        assert w.pixel_scale_arcsec == pytest.approx(2.5, rel=1e-6)

    def test_header_roundtrip(self):
        from siril_tpu.io.fits_io import Header

        w = make_wcs()
        cards = w.to_cards()
        hdr = Header(list(cards) + [("NAXIS2", 256, "")])
        w2 = WCS.from_header(hdr)
        np.testing.assert_allclose(w2.cd, w.cd, rtol=1e-6)
        assert w2.crval == pytest.approx(w.crval)

    def test_sexagesimal(self):
        assert parse_ra("12:00:00") == pytest.approx(180.0)
        assert parse_dec("-45:30:00") == pytest.approx(-45.5)
        assert format_ra(180.0).startswith("12:00:00")
        assert format_dec(-45.5).startswith("-45:30:00")


class TestFitWCS:
    def test_recovers_known_wcs(self, rng):
        w = make_wcs(rot=22.0, scale=1.7)
        x = rng.uniform(10, 240, 40)
        y = rng.uniform(10, 240, 40)
        ra, dec = w.pix2world(x, y)
        sky = np.stack([np.asarray(ra), np.asarray(dec)], axis=1)
        pix = np.stack([x, y], axis=1)
        w2, resid = fit_wcs(pix, sky, (256, 256))
        assert resid < 0.05
        ra2, dec2 = w2.pix2world(x[:5], y[:5])
        np.testing.assert_allclose(np.asarray(ra2), np.asarray(ra)[:5],
                                   atol=1e-4)


class TestCatalog:
    def test_cone_search(self, rng):
        n = 50000
        cat = Catalog(ra=rng.uniform(0, 360, n), dec=rng.uniform(-90, 90, n),
                      mag=rng.uniform(5, 15, n))
        sub = cat.cone_search(100.0, 20.0, 5.0)
        assert len(sub) > 0
        from siril_tpu.astrometry.catalog import _ang_dist

        d = _ang_dist(sub.ra, sub.dec, 100.0, 20.0)
        assert (d <= 5.0).all()

    def test_save_load(self, tmp_path, rng):
        cat = Catalog(ra=rng.uniform(0, 360, 100),
                      dec=rng.uniform(-90, 90, 100),
                      mag=rng.uniform(5, 15, 100))
        p = str(tmp_path / "cat.npz")
        cat.save(p)
        back = Catalog.load(p)
        assert len(back) == 100


class TestPlateSolve:
    def test_end_to_end_solve(self, rng):
        # build a catalogue, render the star field through a known WCS,
        # then solve blind-ish from hints ~0.3 deg off
        true = make_wcs(ra=150.0, dec=40.0, scale=3.0, rot=10.0,
                        h=256, w=256)
        n = 600
        ra = 150.0 + rng.uniform(-0.6, 0.6, n)
        dec = 40.0 + rng.uniform(-0.6, 0.6, n)
        mag = rng.uniform(6, 12, n)
        cat = Catalog(ra=ra, dec=dec, mag=mag)

        img_data = 0.05 + rng.normal(0, 0.002, (256, 256)).astype(np.float32)
        x, y = true.world2pix(ra, dec)
        yy, xx = np.mgrid[0:256, 0:256]
        n_in = 0
        for xi, yi, mi in zip(x, y, mag):
            if 10 < xi < 246 and 10 < yi < 246:
                A = 10 ** (-0.4 * (mi - 12.0)) * 0.1
                A = min(A, 0.8)
                if A < 0.02:
                    continue
                img_data += (A * np.exp(-(((xx - xi) ** 2 + (yy - yi) ** 2)
                                          / 4.0))).astype(np.float32)
                n_in += 1
        assert n_in >= 12, f"test setup: only {n_in} stars rendered"
        img = SirilImage(data=np.clip(img_data, 0, 1)[None])

        res = solve_image(img, cat, SolveArgs(
            ra=150.2, dec=39.8, pixel_scale=3.1, mag_limit=13.0))
        assert res is not None, "solve failed"
        assert res.scale_arcsec == pytest.approx(3.0, rel=0.02)
        assert res.rotation_deg == pytest.approx(true.rotation_deg, abs=1.0)
        # solved center within a few arcsec of the truth
        ra_c, dec_c = res.wcs.pix2world(np.array([127.5]), np.array([127.5]))
        tra, tdec = true.pix2world(np.array([127.5]), np.array([127.5]))
        assert abs(float(ra_c[0]) - float(tra[0])) * 3600 < 10
        assert abs(float(dec_c[0]) - float(tdec[0])) * 3600 < 10
        assert img.wcs is not None

    def test_solve_fails_gracefully_wrong_field(self, rng):
        cat = Catalog(ra=rng.uniform(200, 210, 100),
                      dec=rng.uniform(-10, 0, 100),
                      mag=rng.uniform(6, 10, 100))
        img = SirilImage(
            data=(0.05 + 0.002 * rng.random((128, 128))).astype(np.float32)[None])
        res = solve_image(img, cat,
                          SolveArgs(ra=10.0, dec=50.0, pixel_scale=2.0))
        assert res is None


# ---------------------------------------------------------------------------
# binary local Gaia catalogue (local_catalogues.h / healpix.cpp format)
# ---------------------------------------------------------------------------


def test_gaia_local_catalogue_roundtrip(tmp_path):
    from siril_tpu.astrometry.gaia_local import (
        GaiaLocalCatalogue,
        write_gaia_astro,
    )

    rng = np.random.default_rng(61)
    n = 3000
    ra = rng.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    mag = rng.uniform(5, 16, n)
    # a known cluster to search for
    ra[:50] = 180.0 + rng.normal(0, 0.2, 50)
    dec[:50] = 10.0 + rng.normal(0, 0.2, 50)
    mag[:50] = rng.uniform(6, 12, 50)
    p = str(tmp_path / "gaia_astro.cat")
    write_gaia_astro(p, ra, dec, mag, level=8)

    cat = GaiaLocalCatalogue(p)
    assert cat.level == 8 and cat.n_healpixels == 12 * 256 * 256
    res = cat.cone_search(180.0, 10.0, 1.0, mag_limit=13.0)
    # all cluster members recovered, nothing out-of-cone
    assert len(res) >= 50
    sep = np.hypot((res.ra - 180.0) * np.cos(np.radians(10.0)),
                   res.dec - 10.0)
    assert sep.max() <= 1.0
    assert res.mag.max() <= 13.0
    # positions preserved to the i32 quantization (~1.7e-7 deg)
    got = np.sort(res.ra[res.mag < 12.5])
    exp = np.sort(ra[:50])
    common = min(len(got), 50)
    assert np.abs(np.sort(res.dec)[0] - np.sort(dec[:50])[0]) < 1e-5


def test_gaia_local_catalogue_platesolve(tmp_path):
    """platesolve -catalog=file.cat solves against the binary catalogue."""
    from siril_tpu.astrometry.gaia_local import write_gaia_astro
    from siril_tpu.cli.commands import COMMANDS
    from siril_tpu.cli.context import Session
    from siril_tpu.core.image import SirilImage
    from siril_tpu.ops.wcs import WCS

    rng = np.random.default_rng(62)
    h = w = 256
    scale = 2.8e-4
    wcs = WCS(crpix=(w / 2.0, h / 2.0), crval=(180.0, 10.0),
              cd=np.array([[-scale, 0.0], [0.0, scale]]), height=h)
    n = 40
    px = rng.uniform(20, w - 20, n)
    py = rng.uniform(20, h - 20, n)
    ra, dec = wcs.pix2world(px, py)
    mag = rng.uniform(7, 11, n)
    p = str(tmp_path / "field.cat")
    write_gaia_astro(p, ra, dec, mag, level=8)

    yy, xx = np.mgrid[0:h, 0:w]
    img = 0.05 + rng.normal(0, 0.002, (h, w)).astype(np.float32)
    for x0, y0, m in zip(px, py, mag):
        a = 0.6 * 10 ** (-0.4 * (m - 7.0))
        img += a * np.exp(-(((xx + 0.5 - x0) ** 2 +
                             (yy + 0.5 - y0) ** 2) / (2 * 2.0 ** 2)))
    ctx = Session(cwd=str(tmp_path))
    ctx.set_image(SirilImage(data=np.clip(img, 0, 1)[None]), "field")
    # scale = 2.8e-4 deg/px = 1.008"/px; focal = 206.265·px_um/scale_as
    COMMANDS["platesolve"].fn(
        ctx, ["180.0", "10.0", "-catalog=field.cat",
              "-pixelsize=3.8", "-focal=777.6"])
    assert ctx.image.wcs is not None
    ra_c, dec_c = ctx.image.wcs.pix2world(np.array([w / 2.0]),
                                          np.array([h / 2.0]))
    assert abs(float(ra_c[0]) - 180.0) < 0.01
    assert abs(float(dec_c[0]) - 10.0) < 0.01


def test_kstars_catalogue_roundtrip(tmp_path):
    """KStars HTM binary (Tycho/NOMAD format): write, reopen, cone
    search recovers a cluster with B−V colors."""
    from siril_tpu.astrometry.kstars_local import (
        KStarsCatalogue,
        write_kstars_catalogue,
    )

    rng = np.random.default_rng(64)
    n = 2500
    ra = rng.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    v = rng.uniform(5, 14, n)
    b = v + rng.uniform(-0.2, 1.2, n)
    ra[:40] = 120.0 + rng.normal(0, 0.3, 40)
    dec[:40] = -30.0 + rng.normal(0, 0.3, 40)
    v[:40] = rng.uniform(6, 10, 40)
    p = str(tmp_path / "tycho_test.dat")
    write_kstars_catalogue(p, ra, dec, v, bmag=b, level=3)

    cat = KStarsCatalogue(p)
    assert cat.level == 3 and cat.ntrixels == 512 and cat.nfields == 6
    res = cat.cone_search(120.0, -30.0, 1.5, mag_limit=11.0)
    assert len(res) >= 40
    sep = np.hypot((res.ra - 120.0) * np.cos(np.radians(-30.0)),
                   res.dec + 30.0)
    assert sep.max() <= 1.5
    assert res.mag.max() <= 11.0
    assert res.bv is not None and np.isfinite(res.bv).all()
    # position quantization: RA in hours·1e-6 → ≤ ~1.5e-5 deg
    i = int(np.argmin(res.mag))
    d = np.hypot((ra[:40] - res.ra[i]) * np.cos(np.radians(-30.0)),
                 dec[:40] - res.dec[i]).min()
    assert d < 5e-5


def test_format_ra_wraps_at_360():
    """RA just below 360° renders as 00:00:00.00, never 24:00:00.00
    (siril_world_cs.c:177-179 fmod wrap)."""
    assert format_ra(359.9999999) == "00:00:00.00"
    assert format_ra(360.0) == "00:00:00.00"
    assert format_ra(-15.0) == "23:00:00.00"
    assert format_ra(359.9) == "23:59:36.00"
