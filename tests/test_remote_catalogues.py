"""Remote catalogues behind the transport seam
(src/io/remote_catalogues.c URL construction + algos/search_objects.c
by-name lookup), tested offline with recorded-response fixtures."""

import numpy as np
import pytest

from siril_tpu.astrometry import remote as rc


def test_vizier_url_matches_reference_shape():
    """URL must match siril_catalog_conesearch_get_url byte-for-byte for
    the same inputs (remote_catalogues.c:201-232 with the %08.4f /
    %+08.4f / %3.2f / %3.1f field formats)."""
    url = rc.conesearch_url("tycho2", 120.5, -45.25, 30.0, 12.5)
    assert url.startswith(
        "https://tapvizier.u-strasbg.fr/TAPVizieR/tap/sync?REQUEST=doQuery"
        "&LANG=ADQL&FORMAT=csv&QUERY=SELECT+")
    assert "RAmdeg+as+ra" in url and "DEmdeg+as+dec" in url
    assert "+FROM+%22I/259/tyc2%22" in url
    assert ("WHERE+CONTAINS(POINT('ICRS',RAmdeg,DEmdeg),"
            "CIRCLE('ICRS',120.5000,-45.2500,0.50))=1") in url
    assert url.endswith("+AND+(VTmag<=12.5)")


def test_simbad_url():
    url = rc.conesearch_url("simbad", 10.0, 20.0, 60.0)
    assert url.startswith("https://simbad.u-strasbg.fr/simbad/sim-tap/")
    assert "+FROM+basic+JOIN+allfluxes+ON+oidref+=+oid" in url
    assert "CIRCLE('ICRS',010.0000,+20.0000,1.00))=1" in url


TAP_CSV = """ra,dec,pmra,pmdec,mag,bmag
120.001,-45.002,1.5,-2.5,10.1,10.8
120.050,-45.100,,,11.0,11.9
bad,row,,,,
120.200,-45.300,0.1,0.2,12.2,
"""


def test_parse_tap_csv():
    cat = rc.parse_tap_csv(TAP_CSV, "tycho2")
    assert len(cat) == 3                       # bad row dropped
    np.testing.assert_allclose(cat.ra[0], 120.001)
    np.testing.assert_allclose(cat.bv[0], 0.7, atol=1e-9)
    assert np.isnan(cat.bv[2])                 # missing bmag
    np.testing.assert_allclose(cat.pmra[0], 1.5)


def test_fixture_transport_roundtrip(tmp_path):
    t = rc.FixtureTransport(str(tmp_path))
    url = rc.conesearch_url("nomad", 1.0, 2.0, 10.0, 14.0)
    with pytest.raises(rc.TransportError):
        t.get(url)
    t.record(url, TAP_CSV)
    assert t.get(url) == TAP_CSV


def test_remote_catalogue_with_fixture(tmp_path, monkeypatch):
    t = rc.FixtureTransport(str(tmp_path))
    url = rc.conesearch_url("tycho2", 120.1, -45.1, 0.5 * 60.0, 0.0)
    t.record(url, TAP_CSV)
    cat = rc.RemoteCatalogue("tycho2", transport=t)
    cone = cat.cone_search(120.1, -45.1, 0.5)
    assert len(cone) == 3


def test_urllib_transport_gated_offline():
    """The live transport refuses network access in offline mode —
    never a silent outbound request."""
    from siril_tpu.core.settings import Preferences, set_active

    p = Preferences()
    p.online = False
    set_active(p)
    t = rc.UrllibTransport()
    with pytest.raises(rc.TransportError, match="offline"):
        t.get("https://example.invalid/query")


SESAME_TEXT = """\
C.D.S.  -  SESAME
Object M 31  ---  G  ---  OID=@1575544

Coordinates(ICRS,ep=J2000,eq=2000): 00 42 44.330 +41 16 07.50
"""


def test_parse_sesame():
    hit = rc.parse_sesame(SESAME_TEXT)
    assert hit is not None
    ra, dec, name = hit
    assert abs(ra - 10.68471) < 1e-3
    assert abs(dec - 41.26875) < 1e-3


def test_catsearch_command_with_fixture(tmp_path, monkeypatch):
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line

    t_dir = str(tmp_path / "fixtures")
    t = rc.FixtureTransport(t_dir)
    t.record(rc.object_search_url("HD 12345"), SESAME_TEXT)
    monkeypatch.setenv("SIRIL_TPU_CAT_FIXTURES", t_dir)
    ctx = Session(cwd=str(tmp_path))
    rcode = process_command_line(ctx, "catsearch HD 12345")
    assert rcode == 0


def test_conesearch_command_with_remote_fixture(tmp_path, monkeypatch, rng):
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line
    from siril_tpu.core.image import SirilImage
    from siril_tpu.ops.wcs import WCS

    ctx = Session(cwd=str(tmp_path))
    img = SirilImage(data=(0.2 * np.ones((1, 64, 64), np.float32)))
    img.wcs = WCS(crpix=(32.0, 32.0), crval=(120.1, -45.1),
                  cd=np.eye(2) * (30.0 / 3600.0), height=64)
    ctx.set_image(img)
    # compute the cone exactly as cmd_conesearch does
    ra_c, dec_c = img.wcs.pix2world(np.array([32.0]), np.array([32.0]))
    fov = img.wcs.pixel_scale_arcsec * 64 / 3600.0
    url = rc.conesearch_url("tycho2", float(ra_c[0]), float(dec_c[0]),
                            fov / 1.5 * 60.0, 13.0)
    t_dir = str(tmp_path / "fx")
    rc.FixtureTransport(t_dir).record(url, TAP_CSV)
    monkeypatch.setenv("SIRIL_TPU_CAT_FIXTURES", t_dir)
    rcode = process_command_line(ctx, "conesearch 13 -catalog=tycho2")
    assert rcode == 0
