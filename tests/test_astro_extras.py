"""SPCC machinery, comparison stars, annotations tests."""

import numpy as np
import pytest

from siril_tpu.astrometry.annotations import annotate_image, find_object
from siril_tpu.astrometry.catalog import Catalog
from siril_tpu.astrometry.compstars import CompStarArgs, find_comp_stars
from siril_tpu.astrometry.spcc import (
    ResponseLibrary,
    blackbody_sed,
    expected_fluxes,
    spcc,
)
from siril_tpu.core.image import SirilImage
from siril_tpu.ops.wcs import WCS


def make_wcs(ra=120.0, dec=35.0, scale=2.0, h=256, w=256):
    cd = np.array([[-scale / 3600.0, 0], [0, scale / 3600.0]])
    return WCS(crpix=(w / 2 + .5, h / 2 + .5), crval=(ra, dec), cd=cd,
               height=h)


class TestSPCC:
    def test_response_library(self):
        lib = ResponseLibrary()
        assert "R" in lib.names() and "generic_qe" in lib.names()
        r = lib.get("R").resampled()
        assert r.max() > 0

    def test_blackbody_color_ordering(self):
        lib = ResponseLibrary()
        qe = lib.get("generic_qe").resampled()
        resp = [lib.get(f).resampled() * qe for f in ("R", "G", "B")]
        cool = expected_fluxes(blackbody_sed(3500.0), resp)
        hot = expected_fluxes(blackbody_sed(15000.0), resp)
        assert cool[0] / cool[2] > hot[0] / hot[2]   # cool star redder

    def test_spcc_end_to_end(self, rng):
        w = make_wcs()
        n = 250
        ra = 120.0 + rng.uniform(-0.1, 0.1, n)
        dec = 35.0 + rng.uniform(-0.1, 0.1, n)
        cat = Catalog(ra=ra, dec=dec, mag=rng.uniform(7, 11, n),
                      bv=rng.uniform(0.0, 1.2, n))
        img_data = 0.05 + rng.normal(0, 0.002, (3, 256, 256)).astype(np.float32)
        x, y = w.world2pix(ra, dec)
        yy, xx = np.mgrid[0:256, 0:256]
        from siril_tpu.astrometry.pcc import bv_to_rgb

        for xi, yi, bvi, mi in zip(x, y, cat.bv, cat.mag):
            if 16 < xi < 240 and 16 < yi < 240:
                A = min(10 ** (-0.4 * (mi - 11.0)) * 0.1, 0.6)
                if A < 0.02:
                    continue
                g = np.exp(-(((xx - xi) ** 2 + (yy - yi) ** 2) / 4.0))
                rgb = bv_to_rgb(bvi) * np.array([1.4, 1.0, 0.6])
                for c in range(3):
                    img_data[c] += (A * rgb[c] * g).astype(np.float32)
        img = SirilImage(data=np.clip(img_data, 0, 1))
        img.wcs = w
        out = spcc(img, cat, mag_limit=12.0)
        assert out is not None
        # white balance must counteract the injected [1.4, 1, 0.6] cast
        hist = out.history[-1]
        assert "SPCC" in hist


class TestCompStars:
    def test_selection(self, rng):
        w = make_wcs()
        n = 120
        ra = 120.0 + rng.uniform(-0.08, 0.08, n)
        dec = 35.0 + rng.uniform(-0.08, 0.08, n)
        mag = rng.uniform(8, 14, n)
        bv = rng.uniform(0.0, 1.5, n)
        cat = Catalog(ra=ra, dec=dec, mag=mag, bv=bv)
        img = SirilImage(data=np.zeros((1, 256, 256), np.float32))
        img.wcs = w
        x, y = w.world2pix(ra, dec)
        # pick a target that's inside the frame
        inside = np.nonzero((x > 30) & (x < 220) & (y > 30) & (y < 220))[0]
        ti = int(inside[0])
        target, comps = find_comp_stars(img, cat, (float(x[ti]), float(y[ti])),
                                        CompStarArgs(delta_vmag=2.0,
                                                     delta_bv=0.6))
        assert target["mag"] == pytest.approx(float(mag[ti]))
        for c in comps:
            assert abs(c["mag"] - target["mag"]) <= 2.0
            assert abs(c["bv"] - target["bv"]) <= 0.6

    def test_no_star_near_target(self, rng):
        cat = Catalog(ra=np.array([120.0]), dec=np.array([35.0]),
                      mag=np.array([9.0]), bv=np.array([0.6]))
        img = SirilImage(data=np.zeros((1, 256, 256), np.float32))
        img.wcs = make_wcs()
        with pytest.raises(ValueError):
            find_comp_stars(img, cat, (10.0, 10.0))


class TestAnnotations:
    def test_find_object(self):
        a = find_object("M42")
        assert a is not None
        assert a.ra == pytest.approx(83.82, abs=0.1)
        assert find_object("m 42") is not None
        assert find_object("NOT_A_THING") is None

    def test_annotate_solved_image(self):
        img = SirilImage(data=np.zeros((1, 512, 512), np.float32))
        # center on M42 with a wide field
        img.wcs = make_wcs(ra=83.82, dec=-5.39, scale=20.0, h=512, w=512)
        anns = annotate_image(img)
        names = [a.name for a in anns]
        assert "M42" in names


def test_aavso_extended_report(tmp_path):
    from siril_tpu.ops.photometry import save_aavso_extended

    rows = [(0, "2026-08-10T01:02:03", 11.135, 0.003),
            (1, "2026-08-10T01:12:03", 11.140, 0.004)]
    p = str(tmp_path / "report.csv")
    n = save_aavso_extended(rows, p, starid="SS CYG", obscode="TST01",
                            chart="X16382L")
    assert n == 2
    lines = open(p).read().splitlines()
    assert lines[0] == "#TYPE=EXTENDED"
    assert "#OBSCODE=TST01" in lines
    assert lines[6].startswith("#NAME,DATE,MAG")
    first = lines[7].split(",")
    assert first[0] == "SS CYG"
    jd = float(first[1])
    assert 2461262.0 < jd < 2461263.0       # JD of 2026-08-10
    assert first[2] == "11.135"


def test_julian_date_roundtrip():
    from siril_tpu.utils.dates import (
        date_obs_to_julian,
        datetime_to_julian,
        julian_to_datetime,
        parse_date_obs,
    )

    # known value: 2000-01-01T12:00:00 UTC = JD 2451545.0
    dt = parse_date_obs("2000-01-01T12:00:00")
    assert abs(datetime_to_julian(dt) - 2451545.0) < 1e-6
    back = julian_to_datetime(2451545.0)
    assert back.year == 2000 and back.hour == 12
    assert date_obs_to_julian("") is None


def test_spcc_narrowband_and_atmosphere():
    from siril_tpu.astrometry.spcc import (
        WL,
        atmospheric_transmission,
        narrowband_filters,
    )

    r, g, b = narrowband_filters(rwl=656.28, gwl=500.7, bwl=486.1,
                                 rbw=3.0, gbw=3.0, bbw=3.0)
    # Ha band is ~3nm wide around 656.28
    assert r[np.argmin(np.abs(WL - 656.0))] == 1.0
    assert r[np.argmin(np.abs(WL - 600.0))] == 0.0
    assert abs(r.sum() * 2.0 - 3.0) < 2.5       # ~3nm integrated (2nm grid)
    # atmosphere: blue extinction exceeds red; altitude reduces it
    t0 = atmospheric_transmission(0.0)
    t2k = atmospheric_transmission(2000.0)
    blue = np.argmin(np.abs(WL - 400.0))
    red = np.argmin(np.abs(WL - 700.0))
    assert t0[blue] < t0[red] < 1.0
    assert t2k[blue] > t0[blue]


def test_light_curve_ninastars(tmp_path):
    """light_curve -ninastars= resolves NINA CSV targets through the WCS
    of the reference frame."""
    from siril_tpu.cli.commands import COMMANDS
    from siril_tpu.cli.context import Session
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.wcs import WCS

    rng = np.random.default_rng(33)
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w]
    scale = 2.8e-4
    wcs = WCS(crpix=(48.0, 48.0), crval=(180.0, 10.0),
              cd=np.array([[-scale, 0.0], [0.0, scale]]), height=h)
    stars_px = [(30.0, 30.0), (60.0, 50.0), (45.0, 70.0)]
    for i in range(4):
        img = rng.normal(0.05, 0.002, (h, w)).astype(np.float32)
        for sx, sy in stars_px:
            img += 0.4 * np.exp(-(((xx + 0.5 - sx) ** 2 +
                                   (yy + 0.5 - sy) ** 2) / (2 * 2.0 ** 2)))
        si = SirilImage(data=np.clip(img, 0, 1)[None])
        si.wcs = wcs
        si.keywords.date_obs = f"2026-08-10T0{i}:00:00"
        write_fits(si, str(tmp_path / f"lc_{i + 1:05d}.fit"), bitdepth=-32)
    # NINA csv in sky coordinates of those pixels
    with open(tmp_path / "stars.csv", "w") as f:
        f.write("Type,Name,HFR,xPos,yPos,AvgBright,MaxBright,Background,"
                "Ra,Dec\n")
        for kind, (px, py) in zip(("Target", "Comparison", "Comparison"),
                                  stars_px):
            ra, dec = wcs.pix2world(np.array([px]), np.array([py]))
            f.write(f"{kind},S,,,,,,,{float(ra[0]):.6f},"
                    f"{float(dec[0]):.6f}\n")
    ctx = Session(cwd=str(tmp_path))
    COMMANDS["light_curve"].fn(ctx, ["lc_", "0", "-ninastars=stars.csv",
                                     "-out=lc.dat"])
    lines = open(tmp_path / "lc.dat").read().splitlines()
    assert len(lines) >= 4       # header + >=3 measured frames


def test_kstars_byteswapped_catalogue(tmp_path):
    """A catalogue written on an opposite-endian host (endian ID reads
    0x534B) is byteswap-decoded, not silently misread."""
    import struct

    import numpy as np

    from siril_tpu.astrometry.kstars_local import (
        KStarsCatalogue,
        write_kstars_catalogue,
    )

    rng = np.random.default_rng(7)
    ra = rng.uniform(10.0, 20.0, 50)
    dec = rng.uniform(-5.0, 5.0, 50)
    mag = rng.uniform(6.0, 12.0, 50)
    p_le = tmp_path / "le.bin"
    write_kstars_catalogue(str(p_le), ra, dec, mag)

    # byteswap every multi-byte field to fake a big-endian-written file
    blob = bytearray(p_le.read_bytes())
    def bswap(off, n, size):
        for i in range(n):
            s = off + i * size
            blob[s:s + size] = blob[s:s + size][::-1]
    bswap(124, 1, 2)                      # endian ID → 0x534B
    nfields = struct.unpack_from("<H", blob, 127)[0]
    bswap(127, 1, 2)                      # nfields
    off = 129
    for _ in range(nfields):              # field table: scale i32 at +12
        bswap(off + 12, 1, 4)
        off += 16
    ntrix = struct.unpack_from("<I", blob, off)[0]
    bswap(off, 1, 4)                      # ntrixels
    off += 4
    bswap(off, ntrix * 3, 4)              # index u32 triplets
    off += ntrix * 12
    bswap(off, 1, 2); bswap(off + 2 + 1, 1, 2)  # expansion faint_mag, max_stars
    off += 5
    # records: i4,i4,i2,i2,i2,i2
    while off < len(blob):
        bswap(off, 2, 4)
        bswap(off + 8, 4, 2)
        off += 16
    p_be = tmp_path / "be.bin"
    p_be.write_bytes(bytes(blob))

    c_le = KStarsCatalogue(str(p_le)).cone_search(15.0, 0.0, 8.0)
    c_be = KStarsCatalogue(str(p_be)).cone_search(15.0, 0.0, 8.0)
    assert len(c_be.ra) == len(c_le.ra) > 0
    np.testing.assert_allclose(np.sort(c_be.ra), np.sort(c_le.ra), atol=1e-5)
    np.testing.assert_allclose(np.sort(c_be.mag), np.sort(c_le.mag), atol=1e-3)
