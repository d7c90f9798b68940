"""ICC, inspector, fitseq, profile tests."""

import os

import numpy as np
import pytest

from siril_tpu.core.image import FLOAT_IMG, SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.io.fits_io import FitseqWriter, read_fits, write_fits
from siril_tpu.ops.icc import assign_profile, convert_to_profile
from siril_tpu.ops.inspector import (
    aberration_inspector,
    fix_xtrans_af,
    intensity_profile,
    sensor_tilt,
)


class TestICC:
    def test_assign_and_convert_roundtrip(self, rng):
        img = SirilImage(data=rng.random((3, 16, 16)).astype(np.float32))
        a = assign_profile(img, "srgb")
        lin = convert_to_profile(a, "srgblinear")
        back = convert_to_profile(lin, "srgb")
        np.testing.assert_allclose(back.host(), a.host(), atol=2e-4)

    def test_linear_darker(self, rng):
        img = SirilImage(data=np.full((3, 8, 8), 0.5, np.float32))
        a = assign_profile(img, "srgb")
        lin = convert_to_profile(a, "srgblinear")
        assert lin.host().mean() < 0.3     # sRGB 0.5 → linear ~0.214

    def test_unknown_profile(self):
        img = SirilImage(data=np.zeros((3, 4, 4), np.float32))
        with pytest.raises(ValueError):
            assign_profile(img, "adobergb1998")


class TestInspector:
    def test_tilt_uniform_field(self, rng):
        img = np.full((256, 256), 0.05, np.float32)
        yy, xx = np.mgrid[0:256, 0:256]
        for _ in range(40):
            x, y = rng.uniform(20, 236, 2)
            img += 0.4 * np.exp(-(((xx - x) ** 2 + (yy - y) ** 2) / 6.0)
                                ).astype(np.float32)
        res = sensor_tilt(SirilImage(data=np.clip(img, 0, 1)[None]))
        assert res.nb_stars >= 20
        assert res.tilt_pct < 30.0

    def test_inspector_mosaic(self, rng):
        img = SirilImage(data=rng.random((1, 300, 300)).astype(np.float32))
        out = aberration_inspector(img, panel=64)
        assert out.shape == (1, 192, 192)

    def test_fix_xtrans_runs(self, rng):
        img = SirilImage(data=(0.3 + 0.01 * rng.random((1, 48, 48))
                               ).astype(np.float32))
        out = fix_xtrans_af(img)
        assert np.isfinite(out.host()).all()

    def test_profile_line(self):
        data = np.tile(np.linspace(0, 1, 32, dtype=np.float32), (32, 1))
        img = SirilImage(data=data[None])
        prof = intensity_profile(img, (0, 16), (31, 16))
        assert prof.shape[1] == 2
        assert prof[0, 1] == pytest.approx(0.0, abs=0.05)
        assert prof[-1, 1] == pytest.approx(1.0, abs=0.05)


class TestFitseq:
    def test_write_read_roundtrip(self, tmp_path, rng):
        frames = [rng.random((1, 16, 20)).astype(np.float32)
                  for _ in range(4)]
        p = str(tmp_path / "cube.fit")
        w = FitseqWriter(p, bitdepth=FLOAT_IMG)
        for f in frames:
            w.append(SirilImage(data=f))
        w.close()
        seq = Sequence.from_fitseq(p)
        assert seq.number == 4
        for i, f in enumerate(frames):
            np.testing.assert_allclose(seq.read_frame(i).host(), f,
                                       atol=1e-6)

    def test_region_read(self, tmp_path, rng):
        frames = [rng.random((1, 24, 16)).astype(np.float32)
                  for _ in range(3)]
        p = str(tmp_path / "cube.fit")
        w = FitseqWriter(p, bitdepth=FLOAT_IMG)
        for f in frames:
            w.append(SirilImage(data=f))
        w.close()
        seq = Sequence.from_fitseq(p)
        reg = seq.read_region(0, 1, 5, 15)
        np.testing.assert_allclose(reg, frames[1][0, 5:15], atol=1e-6)


def test_op_descriptor_registry():
    """op_descriptor.h equivalent: registry integrity + flags."""
    from siril_tpu.core.opdesc import (
        OP_MASK_CAPABLE,
        OP_REQ_RGB,
        all_ops,
        get,
    )

    ops = all_ops()
    assert len(ops) >= 40
    # ids are unique "area.op" identities
    assert all("." in k for k in ops)
    g = get("filters.gauss")
    assert g.mask_capable and g.mem_ratio >= 1.0
    assert get("color.ccm").flags & OP_REQ_RGB
    assert get("geom.crop").geometry_changing
    assert get("stack.rej").mem_ratio > get("stretch.mtf").mem_ratio
    assert get("nope.nope") is None


def test_siegel_and_poly_fit():
    from siril_tpu.ops.fitting import (
        find_linear_coeff,
        poly_fit,
        robust_poly_fit,
        siegel_fit,
    )

    rng = np.random.default_rng(13)
    x = np.linspace(0, 10, 60)
    y = 2.5 * x + 1.0 + rng.normal(0, 0.05, 60)
    y[::7] += 15.0                        # gross outliers
    s, i = siegel_fit(x, y)
    assert abs(s - 2.5) < 0.05 and abs(i - 1.0) < 0.3
    # plain LSQ is pulled by outliers; robust fit is not
    c_plain = poly_fit(x, y, 1)
    c_rob = robust_poly_fit(x, y, 1)
    assert abs(c_rob[1] - 2.5) < abs(c_plain[1] - 2.5)
    # linear match coefficients
    img = rng.uniform(0.1, 0.8, (64, 64)).astype(np.float32)
    ref = 0.7 * img + 0.05
    a, b = find_linear_coeff(img, ref)
    assert abs(a - 0.7) < 0.01 and abs(b - 0.05) < 0.01


def test_curve_transform():
    from siril_tpu.core.image import SirilImage
    from siril_tpu.ops.curves import CURVE_LINEAR, apply_curve, build_curve_lut

    # identity curve changes nothing
    lut = build_curve_lut([(0, 0), (1, 1)])
    assert abs(lut[2048] - 0.5) < 1e-3
    img = SirilImage(data=np.full((1, 16, 16), 0.25, np.float32))
    out = apply_curve(img, [(0, 0), (0.5, 0.8), (1, 1)])
    # S-boost lifts 0.25 above linear
    assert float(out.host().mean()) > 0.35
    out2 = apply_curve(img, [(0, 0), (1, 1)], algo=CURVE_LINEAR)
    assert abs(float(out2.host().mean()) - 0.25) < 1e-3
    # spline passes through control points
    lut2 = build_curve_lut([(0, 0), (0.5, 0.8), (1, 1)])
    assert abs(lut2[2048] - 0.8) < 2e-3


def test_align_rgb_channels():
    from siril_tpu.core.image import SirilImage
    from siril_tpu.ops.colors import align_rgb_channels

    rng = np.random.default_rng(14)
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w]
    g = 0.05 + rng.normal(0, 0.002, (h, w)).astype(np.float32)
    for x0, y0 in [(30, 30), (60, 40), (45, 70), (70, 70)]:
        g += 0.5 * np.exp(-(((xx - x0) ** 2 + (yy - y0) ** 2) / 8.0))
    r = np.roll(np.roll(g, 2, 0), 3, 1)       # R displaced by (3,2)
    b = np.roll(np.roll(g, -2, 0), -1, 1)
    img = SirilImage(data=np.clip(np.stack([r, g, b]), 0, 1))
    out = align_rgb_channels(img).host()
    interior = np.s_[10:-10, 10:-10]
    assert np.abs(out[0][interior] - g[interior]).mean() < 0.01
    assert np.abs(out[2][interior] - g[interior]).mean() < 0.01


def test_stage_timers_and_report():
    from siril_tpu.utils import trace

    trace.reset()
    with trace.stage("unit.demo"):
        pass
    with trace.stage("unit.demo"):
        pass
    t = trace.timings()
    assert t["unit.demo"][0] == 2
    rep = trace.report()
    assert "unit.demo" in rep and "calls" in rep
    trace.reset()
    assert trace.timings() == {}


def test_stack_records_stage_timings(tmp_path):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.stacking import StackArgs, stack_sequence
    from siril_tpu.utils import trace

    rng = np.random.default_rng(15)
    for i in range(4):
        write_fits(SirilImage(data=rng.uniform(0.1, 0.5, (1, 32, 32))
                              .astype(np.float32)),
                   str(tmp_path / f"tt_{i + 1:05d}.fit"), bitdepth=16)
    trace.reset()
    seq = Sequence.scan("tt_", str(tmp_path))
    stack_sequence(seq, StackArgs(method="rej", rejection=rj.SIGMA))
    t = trace.timings()
    assert any(k.startswith("stack.") for k in t)
