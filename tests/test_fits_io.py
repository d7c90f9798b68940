"""FITS I/O round-trip and partial-read tests (reference test model:
ser_test.c round-trips + compare_fits golden tolerance)."""

import numpy as np
import pytest

from siril_tpu.core.image import FLOAT_IMG, USHORT_IMG, Keywords, SirilImage
from siril_tpu.io.fits_io import FitsReader, read_fits, scan_hdus, write_fits


def make_image(rng, c=1, h=64, w=80):
    data = rng.random((c, h, w)).astype(np.float32)
    kw = Keywords()
    kw.exposure = 120.0
    kw.object = "M42"
    kw.instrume = "TestCam"
    kw.bayer_pattern = ""
    kw.extra["MYKEY"] = 42
    return SirilImage(data=data, keywords=kw)


class TestRoundTrip:
    def test_float32(self, rng, tmp_path):
        img = make_image(rng)
        p = tmp_path / "f32.fit"
        write_fits(img, p, bitdepth=FLOAT_IMG)
        back = read_fits(p)
        np.testing.assert_array_equal(back.host(), img.host())
        assert back.keywords.exposure == 120.0
        assert back.keywords.object == "M42"
        assert back.keywords.extra.get("MYKEY") == 42

    def test_u16(self, rng, tmp_path):
        img = make_image(rng)
        p = tmp_path / "u16.fit"
        write_fits(img, p, bitdepth=USHORT_IMG)
        back = read_fits(p)
        # u16 quantization: within half an ADU
        np.testing.assert_allclose(back.host(), img.host(), atol=0.5 / 65535)
        assert back.orig_bitdepth == USHORT_IMG

    def test_rgb(self, rng, tmp_path):
        img = make_image(rng, c=3)
        p = tmp_path / "rgb.fit"
        write_fits(img, p, bitdepth=FLOAT_IMG)
        back = read_fits(p)
        assert back.nchans == 3
        np.testing.assert_array_equal(back.host(), img.host())

    def test_history(self, rng, tmp_path):
        img = make_image(rng)
        img.log_history("calibrated with masters")
        p = tmp_path / "h.fit"
        write_fits(img, p)
        back = read_fits(p)
        assert any("calibrated" in h for h in back.history)


class TestPartialReads:
    def test_region_matches_full(self, rng, tmp_path):
        img = make_image(rng, c=3, h=100, w=60)
        p = tmp_path / "r.fit"
        write_fits(img, p, bitdepth=FLOAT_IMG)
        rd = FitsReader(p)
        full = rd.read_full()
        np.testing.assert_array_equal(full, img.host())
        for chan in range(3):
            reg = rd.read_region(chan, 10, 35)
            np.testing.assert_array_equal(reg, img.host()[chan, 10:35])
        rd.close()

    def test_u16_region(self, rng, tmp_path):
        img = make_image(rng, h=48, w=32)
        p = tmp_path / "r16.fit"
        write_fits(img, p, bitdepth=USHORT_IMG)
        rd = FitsReader(p)
        reg = rd.read_region(0, 0, 48)
        np.testing.assert_allclose(reg, img.host()[0], atol=0.5 / 65535)


class TestHeaderEdge:
    def test_scan_hdus(self, rng, tmp_path):
        img = make_image(rng)
        p = tmp_path / "s.fit"
        write_fits(img, p)
        hdus = scan_hdus(p)
        assert len(hdus) == 1
        assert hdus[0].shape_chw == (1, 64, 80)

    def test_string_quotes(self, rng, tmp_path):
        img = make_image(rng)
        img.keywords.object = "O'Neill cluster"
        p = tmp_path / "q.fit"
        write_fits(img, p)
        back = read_fits(p)
        assert back.keywords.object == "O'Neill cluster"

    def test_roworder_topdown(self, rng, tmp_path):
        img = make_image(rng)
        p = tmp_path / "td.fit"
        write_fits(img, p, row_order="TOP-DOWN")
        back = read_fits(p)
        np.testing.assert_array_equal(back.host(), img.host())


# ---------------------------------------------------------------------------
# XISF round-trip (io/xisf.py — SirilXISFReader.cpp equivalent)
# ---------------------------------------------------------------------------


def test_xisf_roundtrip(tmp_path):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.xisf import read_xisf, write_xisf

    rng = np.random.default_rng(17)
    data = rng.uniform(0, 1, (3, 24, 32)).astype(np.float32)
    img = SirilImage(data=data)
    img.keywords.extra["EXPTIME"] = 30
    p = str(tmp_path / "t.xisf")
    write_xisf(img, p, "Float32")
    back = read_xisf(p)
    np.testing.assert_allclose(back.host(), data, atol=1e-7)
    assert back.keywords.extra.get("EXPTIME") == 30

    # UInt16 + zlib compression
    p2 = str(tmp_path / "t16.xisf")
    write_xisf(img, p2, "UInt16", compress=True)
    back2 = read_xisf(p2)
    np.testing.assert_allclose(back2.host(), data, atol=1.0 / 65535.0)

    # interleaved (Normal) storage readable too
    import zlib

    raw = np.moveaxis((data * 65535 + 0.5).astype("<u2"), 0, -1).tobytes()
    hdr = ('<?xml version="1.0"?>'
           '<xisf xmlns="http://www.pixinsight.com/xisf" version="1.0">'
           '<Image geometry="32:24:3" sampleFormat="UInt16" '
           'pixelStorage="Normal" location="attachment:2064:%d"/></xisf>'
           % len(raw)).encode()
    p3 = str(tmp_path / "normal.xisf")
    with open(p3, "wb") as f:
        f.write(b"XISF0100" + len(hdr).to_bytes(4, "little") + b"\0" * 4)
        f.write(hdr + b"\0" * (2064 - 16 - len(hdr)))
        f.write(raw)
    back3 = read_xisf(p3)
    np.testing.assert_allclose(back3.host(), data, atol=1.0 / 65535.0)


def test_xisf_via_load_any(tmp_path):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.conversion import load_any
    from siril_tpu.io.xisf import write_xisf

    img = SirilImage(data=np.full((1, 8, 8), 0.25, np.float32))
    p = str(tmp_path / "x.xisf")
    write_xisf(img, p)
    assert abs(float(load_any(p).host().mean()) - 0.25) < 1e-6


# ---------------------------------------------------------------------------
# tiled FITS compression (io/fits_compress.py, setcompress)
# ---------------------------------------------------------------------------


def test_rice_codec_roundtrip():
    from siril_tpu.io.fits_compress import rice_decode, rice_encode

    rng = np.random.default_rng(0)
    for n in (1, 31, 32, 33, 257):
        for bp in (1, 2, 4):
            lim = {1: 120, 2: 30000, 4: 2_000_000_000}[bp]
            x = rng.integers(-lim, lim, n)
            assert np.array_equal(rice_decode(rice_encode(x, bp), n, bp), x)
    # smooth data actually compresses
    smooth = (np.sin(np.linspace(0, 20, 4096)) * 10000).astype(np.int64)
    enc = rice_encode(smooth, 2)
    assert len(enc) < 4096 * 2 * 0.6


def test_compressed_fits_roundtrip(tmp_path):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import read_fits, write_fits

    rng = np.random.default_rng(3)
    img = SirilImage(data=rng.uniform(0, 1, (3, 48, 64)).astype(np.float32))
    img.keywords.exposure = 25.0
    for comp, bd, tol in [("rice", 16, 1 / 65535), ("gzip1", 16, 1 / 65535),
                          ("gzip2", 16, 1 / 65535), ("rice", -32, 0.0),
                          ("gzip2", -32, 0.0)]:
        p = str(tmp_path / f"c_{comp}_{bd}.fits")
        write_fits(img, p, bitdepth=bd, compression=comp)
        back = read_fits(p)
        assert np.abs(back.host() - img.host()).max() <= tol + 1e-9
        assert back.keywords.exposure == 25.0
        # container really is a ZIMAGE BINTABLE, not a plain image
        blob = open(p, "rb").read(5760).decode("ascii", "replace")
        assert "ZIMAGE" in blob and "BINTABLE" in blob


def test_setcompress_save_path(tmp_path):
    from siril_tpu.cli.commands import COMMANDS
    from siril_tpu.cli.context import Session
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import read_fits, write_fits

    ctx = Session(cwd=str(tmp_path))
    img = SirilImage(data=np.full((1, 16, 16), 0.5, np.float32))
    write_fits(img, str(tmp_path / "a.fit"))
    COMMANDS["load"].fn(ctx, ["a.fit"])
    COMMANDS["setcompress"].fn(ctx, ["1", "-type=rice"])
    COMMANDS["save"].fn(ctx, ["b"])
    blob = open(str(tmp_path / "b.fit"), "rb").read(5760)
    assert b"ZIMAGE" in blob
    back = read_fits(str(tmp_path / "b.fit"))
    assert abs(float(back.host().mean()) - 0.5) < 1e-4


def test_pic_roundtrip(tmp_path):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.conversion import load_any
    from siril_tpu.io.internal_formats import read_pic, write_pic

    rng = np.random.default_rng(8)
    for c in (1, 3):
        img = SirilImage(data=rng.uniform(0, 1, (c, 20, 24))
                         .astype(np.float32))
        img.keywords.binning_x = 2
        p = str(tmp_path / f"t{c}.pic")
        write_pic(img, p)
        back = read_pic(p)
        assert back.nchans == c
        np.testing.assert_allclose(back.host(), img.host(),
                                   atol=1.0 / 65535.0)
        assert back.keywords.binning_x == 2
    assert load_any(str(tmp_path / "t1.pic")).width == 24
    import pytest

    with open(tmp_path / "bad.pic", "wb") as f:
        f.write(b"\x00" * 290)
    with pytest.raises(ValueError):
        read_pic(str(tmp_path / "bad.pic"))


def test_compare_fits_tool(tmp_path, capsys):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.tools.compare_fits import compare

    rng = np.random.default_rng(9)
    d = rng.uniform(0, 1, (1, 16, 16)).astype(np.float32)
    a = str(tmp_path / "a.fit")
    b = str(tmp_path / "b.fit")
    write_fits(SirilImage(data=d), a, bitdepth=-32)
    write_fits(SirilImage(data=d), b, bitdepth=-32)
    assert compare(a, b) == 0
    d2 = d.copy()
    d2[0, 3, 4] += 0.01
    write_fits(SirilImage(data=d2), b, bitdepth=-32)
    assert compare(a, b) == 1
    assert compare(a, b, tol=0.02) == 0
    out = capsys.readouterr().out
    assert "DIFFER" in out and "IDENTICAL" in out


def test_signed_i16_no_bzero(tmp_path):
    """Truly signed SHORT_IMG (no BZERO) is shifted by +32768 like the
    reference (image_format_fits.c:449-450): pixels land in [0,1]."""
    h, w = 4, 6
    vals = np.linspace(-32768, 32767, h * w).astype(">i2").reshape(h, w)
    cards = [
        "SIMPLE  =                    T",
        "BITPIX  =                   16",
        "NAXIS   =                    2",
        f"NAXIS1  = {w:>20}",
        f"NAXIS2  = {h:>20}",
        "END",
    ]
    hdr = "".join(c.ljust(80) for c in cards).ljust(2880).encode()
    raw = vals.tobytes()
    raw += b"\0" * (-len(raw) % 2880)
    p = tmp_path / "signed.fit"
    p.write_bytes(hdr + raw)
    img = read_fits(p)
    d = img.host()
    assert d.min() >= 0.0 and d.max() <= 1.0
    # -32768 → 0.0, 32767 → 1.0 (bottom-up flip: last row read first)
    expect = (vals.astype(np.float32) + 32768.0) / 65535.0
    np.testing.assert_allclose(d[0], expect[::-1], atol=1e-6)


def test_long_string_card_keeps_closing_quote(tmp_path, rng):
    """A >68-char string value is truncated with the closing quote intact
    so cfitsio-based readers still parse the card."""
    img = make_image(rng, h=8, w=8)
    img.keywords.object = "A" * 100 + "'"
    p = tmp_path / "long.fit"
    write_fits(img, p, bitdepth=FLOAT_IMG)
    blob = p.read_bytes()
    # every header card with a quote must have a closing quote
    for off in range(0, 2880, 80):
        card = blob[off:off + 80].decode("ascii")
        if "= '" in card:
            assert card.rstrip().endswith("'"), card
    back = read_fits(p)
    assert back.keywords.object.startswith("AAAA")
