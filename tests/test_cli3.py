"""Tests for the part-2 command surface (commands2.py): session helpers,
masks, limit/ffill, à-trous front-ends, streak detection, HEALPix/HTM
indexing, eqcrop, and the remaining seq-variants."""

import os

import numpy as np
import pytest

from siril_tpu.cli.commands import COMMANDS
from siril_tpu.cli.context import CommandError, Session
from siril_tpu.core.image import SirilImage
from siril_tpu.io.fits_io import write_fits


def run(ctx, name, *args):
    return COMMANDS[name].fn(ctx, [str(a) for a in args])


@pytest.fixture
def ctx(tmp_path):
    return Session(cwd=str(tmp_path))


@pytest.fixture
def starfield(ctx):
    rng = np.random.default_rng(7)
    h = w = 128
    img = rng.normal(0.1, 0.004, (1, h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for sx, sy, a in [(30, 30, .5), (90, 45, .4), (60, 100, .6)]:
        img[0] += a * np.exp(-(((xx - sx) ** 2 + (yy - sy) ** 2)
                               / (2 * 2.2 ** 2)))
    si = SirilImage(data=np.clip(img, 0, 1))
    ctx.set_image(si, "field")
    return ctx


def test_full_command_surface():
    """Every command in the reference's command_list.h is registered."""
    import re

    ref = "/root/reference/src/core/command_list.h"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    names = set(re.findall(r'\{\s*"([a-zA-Z_0-9]+)"', open(ref).read()))
    missing = [n for n in names if n.lower() not in COMMANDS]
    assert missing == []


def test_help_and_log(ctx, capsys):
    run(ctx, "help", "stack")
    run(ctx, "log", "hello")
    with pytest.raises(CommandError):
        run(ctx, "help", "nosuchcmd")


def test_cdg(starfield):
    cx, cy = run(starfield, "cdg")
    assert 25 < cx < 95 and 25 < cy < 105


def test_limit_modes(ctx):
    d = np.array([[[-0.5, 0.5, 2.0]]], np.float32)
    for mode, expected in [
        ("-clip", [0.0, 0.5, 1.0]),
        ("-posrescale", [0.0, 0.25, 1.0]),
        ("-rescale", [0.0, 0.4, 1.0]),
    ]:
        ctx.set_image(SirilImage(data=d.copy()), "t")
        run(ctx, "limit", mode)
        np.testing.assert_allclose(ctx.image.host()[0, 0], expected,
                                   atol=1e-6)


def test_ffill_symmetric(ctx):
    ctx.set_image(SirilImage(data=np.zeros((1, 64, 64), np.float32)), "t")
    run(ctx, "ffill", 65535, 2, 2, 8, 8)
    d = ctx.image.host()[0]
    assert d[2:10, 2:10].min() == 1.0
    assert d[54:62, 54:62].min() == 1.0     # symmetric counterpart
    assert d[20:40, 20:40].max() == 0.0


def test_mask_pipeline(starfield):
    run(starfield, "mask_from_lum")
    img = starfield.image
    assert img.mask is not None
    m0 = img.mask.copy()
    run(starfield, "mask_fmul", 0.5)
    assert np.allclose(img.mask, np.clip(m0 * 0.5, 0, 1))
    run(starfield, "mask_feather", "-dist=3")
    run(starfield, "mask_autostretch")
    run(starfield, "mask_bitpix", 8)
    assert set(np.unique(np.round(img.mask * 255) - img.mask * 255)) == {0.0}


def test_mask_from_color(ctx):
    d = np.zeros((3, 32, 32), np.float32)
    d[0, 10:20, 10:20] = 0.8          # red patch
    ctx.set_image(SirilImage(data=d), "rgb")
    run(ctx, "mask_from_color", "-cr=0.8", "-cg=0.0", "-cb=0.0", "-tol=0.2")
    assert ctx.image.mask is not None
    assert ctx.image.mask[15, 15] > 0.5
    assert ctx.image.mask[2, 2] < 0.5


def test_detect_streaks_finds_trail(ctx, tmp_path):
    rng = np.random.default_rng(3)
    h = w = 200
    img = rng.normal(0.1, 0.003, (1, h, w)).astype(np.float32)
    for t in np.linspace(0, 1, 600):
        x = int(10 + 170 * t)
        y = int(40 + 120 * t)
        img[0, y, x] += 0.4
    ctx.set_image(SirilImage(data=np.clip(img, 0, 1)), "t")
    tracks = run(ctx, "detect_streaks", "-out=streaks.csv", 100)
    assert len(tracks) >= 1
    best = max(tracks, key=lambda t: t.length)
    assert best.length > 120
    # slope ~ 120/170 → 35.2°
    ang = abs(best.angle_deg) % 180
    assert 25 < min(ang, 180 - ang) < 45
    assert os.path.exists(tmp_path / "streaks.csv")


def test_detect_streaks_clean_image(ctx):
    rng = np.random.default_rng(4)
    img = rng.normal(0.1, 0.003, (1, 128, 128)).astype(np.float32)
    ctx.set_image(SirilImage(data=np.clip(img, 0, 1)), "t")
    assert run(ctx, "detect_streaks") == []


def test_atrous_denoise_reduces_noise(ctx):
    rng = np.random.default_rng(5)
    clean = np.zeros((1, 64, 64), np.float32) + 0.3
    noisy = clean + rng.normal(0, 0.05, clean.shape).astype(np.float32)
    ctx.set_image(SirilImage(data=np.clip(noisy, 0, 1)), "t")
    run(ctx, "atrous", 4, 0, "-soft")
    res = ctx.image.host()
    assert res.std() < noisy.std() * 0.6


def test_extract_saves_planes(starfield, tmp_path):
    run(starfield, "extract", 3)
    for i in range(3):
        assert os.path.exists(tmp_path / f"layer_{i:02d}.fit")


def test_ssr_removes_stars(starfield):
    before = starfield.image.host().max()
    run(starfield, "ssr")
    after = starfield.image.host().max()
    assert after < before * 0.5


# ---------------------------------------------------------------------------
# HEALPix / HTM
# ---------------------------------------------------------------------------


def test_ang2pix_nest_ranges_and_hierarchy():
    from siril_tpu.astrometry.healpix import ang2pix_nest, nest_parent

    rng = np.random.default_rng(11)
    ra = rng.uniform(0, 360, 500)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, 500)))
    for nside in (1, 2, 16, 256):
        p = ang2pix_nest(nside, ra, dec)
        assert p.min() >= 0 and p.max() < 12 * nside * nside
    # NESTED hierarchy: order-8 parent at order-1 equals direct order-1 pix
    p1 = ang2pix_nest(2, ra, dec)
    p8 = ang2pix_nest(256, ra, dec)
    assert np.array_equal(nest_parent(p8, 8, 1), p1)
    # poles land on polar faces
    assert ang2pix_nest(1, [45.0], [89.9])[0] in range(0, 4)
    assert ang2pix_nest(1, [45.0], [-89.9])[0] in range(8, 12)


def test_htm_trixel_ids():
    from siril_tpu.astrometry.healpix import radec_to_htm

    rng = np.random.default_rng(12)
    ra = rng.uniform(0, 360, 300)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, 300)))
    for level in (0, 3):
        t = radec_to_htm(ra, dec, level)
        lo, hi = 8 * 4 ** level, 16 * 4 ** level
        assert t.min() >= lo and t.max() < hi
    # nearby points share a trixel at coarse level far more often than not
    t0 = radec_to_htm(ra, dec, 1)
    t1 = radec_to_htm(ra + 1e-6, dec + 1e-6, 1)
    assert np.mean(t0 == t1) > 0.98
    # level-3 coverage is broad
    assert len(np.unique(radec_to_htm(ra, dec, 3))) > 100


def test_eqcrop_and_healpix_cmd(ctx):
    from siril_tpu.ops.wcs import WCS

    d = np.zeros((1, 200, 200), np.float32)
    img = SirilImage(data=d)
    img.wcs = WCS(crpix=(100.0, 100.0), crval=(180.0, 10.0),
                  cd=np.array([[-2.8e-4, 0.0], [0.0, 2.8e-4]]))
    ctx.set_image(img, "solved")
    # eqcrop a ~20x20px window around the center
    run(ctx, "eqcrop", "180.006", "9.994", "179.994", "10.006",
        "-minsize=16")
    assert ctx.image.width < 60 and ctx.image.height < 60
    # healpix + trixel listings run on a solved image
    ctx.set_image(img, "solved")
    pix8 = run(ctx, "healpix")
    assert len(pix8) >= 1
    trix = run(ctx, "trixel")
    assert len(trix) >= 1


def test_seq_variants(ctx, tmp_path):
    rng = np.random.default_rng(9)
    for i in range(3):
        im = SirilImage(data=rng.uniform(0.1, 0.5, (1, 32, 32))
                        .astype(np.float32))
        write_fits(im, str(tmp_path / f"sv_{i + 1:05d}.fit"))
    run(ctx, "seqlinstretch", "sv_", "-BP=0.05")
    assert os.path.exists(tmp_path / "linstretch_sv_00001.fit")
    run(ctx, "seqmodasinh", "sv_", "-D=1.5")
    assert os.path.exists(tmp_path / "modasinh_sv_00001.fit")
    run(ctx, "sequpdate_key", "sv_", "MYKEY", "42")
    from siril_tpu.io.fits_io import read_fits

    img = read_fits(str(tmp_path / "sv_00001.fit"))
    assert img.keywords.extra.get("MYKEY") == 42


def test_load_seq_and_setcompress(ctx, tmp_path):
    rng = np.random.default_rng(10)
    for i in range(2):
        im = SirilImage(data=rng.uniform(0, 1, (1, 16, 16))
                        .astype(np.float32))
        write_fits(im, str(tmp_path / f"ls_{i + 1:05d}.fit"))
    run(ctx, "load_seq", "ls_")
    assert ctx.seq is not None and ctx.seq.number == 2
    run(ctx, "setcompress", 1, "-type=rice", 16)
    assert ctx.prefs.comp_enabled
    run(ctx, "setcompress", 0)
    assert not ctx.prefs.comp_enabled


def test_mosaic_end_to_end(ctx, tmp_path):
    """seqapplyreg derives H from WCS (astrometric path) and stacking with
    -overlap_norm equalizes mosaic panel levels."""
    from siril_tpu.ops.wcs import WCS

    rng = np.random.default_rng(41)
    scene = (0.2 + 0.3 * rng.random((96, 160))).astype(np.float32)
    scale = 2.8e-4
    crops = [(0, 0), (64, 0)]           # two panels, 96x96, 32px overlap
    offs = [0.0, 0.04]
    for k, ((sx, sy), o) in enumerate(zip(crops, offs)):
        d = scene[sy:sy + 96, sx:sx + 96] + o
        img = SirilImage(data=d[None])
        img.wcs = WCS(crpix=(48.0 - sx, 48.0 + sy), crval=(180.0, 10.0),
                      cd=np.array([[-scale, 0.0], [0.0, scale]]),
                      height=96)
        write_fits(img, str(tmp_path / f"pan_{k + 1:05d}.fit"),
                   bitdepth=-32)
    run(ctx, "seqapplyreg", "pan_", "-framing=max")
    assert ctx.seq is not None
    out = ctx.seq
    assert out.rx >= 150                # union of the two panels
    run(ctx, "stack", out.name, "rej", "3", "3", "-norm=add",
        "-overlap_norm", "-out=mosaic")
    res = ctx.image.host()[0]
    assert res.shape[1] >= 150
    # panel-2-only region must match the scene level (offset removed)
    h, w = res.shape
    right = res[40:56, w - 30:w - 6]
    sright = scene[40:56, scene.shape[1] - 30:scene.shape[1] - 6]
    assert abs(float(right.mean()) - float(sright.mean())) < 0.01


def test_digit_leading_flags_parse(ctx, tmp_path):
    """-2pass / -16b / -32b are flags, not positionals (parse_flags must
    accept digit-leading flag names; sexagesimal coords stay positional)."""
    from siril_tpu.cli.commands import parse_flags

    pos, flags = parse_flags(["seqname", "-2pass", "-16b", "-05:24:00",
                              "-3.5", "-out=x"])
    assert "2pass" in flags and "16b" in flags
    assert pos == ["seqname", "-05:24:00", "-3.5"]
    assert flags["out"] == "x"


def test_register_2pass_command(tmp_path):
    from siril_tpu.cli.commands import COMMANDS
    from siril_tpu.cli.context import Session

    rng = np.random.default_rng(19)
    h = w = 160
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.05 + rng.normal(0, 0.002, (h, w)).astype(np.float32)
    for _ in range(15):
        x0 = rng.uniform(30, w - 30)
        y0 = rng.uniform(30, h - 30)
        base += 0.5 * np.exp(-(((xx + 0.5 - x0) ** 2 +
                                (yy + 0.5 - y0) ** 2) / (2 * 2.0 ** 2)))
    base = np.clip(base, 0, 1)
    shifts = [(0, 0), (4, 2), (-3, 5), (6, -4)]
    for i, (dx, dy) in enumerate(shifts):
        f = np.roll(np.roll(base, dy, 0), dx, 1) \
            + rng.normal(0, 0.002, (h, w)).astype(np.float32)
        write_fits(SirilImage(data=np.clip(f, 0, 1)[None]),
                   str(tmp_path / f"rp_{i + 1:05d}.fit"), bitdepth=16)
    ctx2 = Session(cwd=str(tmp_path))
    COMMANDS["register"].fn(ctx2, ["rp_", "-2pass", "-transf=shift"])
    reg = ctx2.seq.reg(0)
    assert reg.valid.sum() == 4
    H0 = np.linalg.inv(reg.H[0]) @ reg.H[3]
    assert abs(H0[0, 2] - (-6)) < 0.3 and abs(H0[1, 2] - 4) < 0.3


class TestPrecompile:
    def test_perspective_kernels_compile(self):
        from siril_tpu.utils.precompile import precompile_perspective_kernels

        done = precompile_perspective_kernels(3, 48, 32, dbuckets=(2,))
        assert len(done) == 1
        name, t = done[0]
        assert "warp_perspective D=2" in name and t > 0

    def test_cli_flag(self, tmp_path):
        from siril_tpu.cli.context import Session
        from siril_tpu.cli.parser import process_command_line

        ctx = Session(cwd=str(tmp_path))
        assert process_command_line(
            ctx, "precompile 3 -width=48 -height=32 -rej=w -persp=2") == 0
