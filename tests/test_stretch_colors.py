"""Stretch + color tests: MTF identity/known values, GHT invertibility,
asinh, autostretch behavior; color round-trips and SCNR semantics."""

import numpy as np
import pytest

from siril_tpu.core.image import SirilImage
from siril_tpu.ops import colors as col
from siril_tpu.ops import stretch as st


def mk(data):
    return SirilImage(data=np.asarray(data, np.float32))


class TestMTF:
    def test_midpoint_maps_to_m(self):
        # MTF(m, m, 0, 1) == 0.5 — defining property of midtones balance
        for m in (0.1, 0.25, 0.5):
            y = float(np.asarray(st.mtf(np.float32(m), m, 0.0, 1.0)))
            assert y == pytest.approx(0.5, abs=1e-6)

    def test_clipping(self):
        x = np.array([0.05, 0.5, 0.95], np.float32)
        y = np.asarray(st.mtf(x, 0.5, 0.1, 0.9))
        assert y[0] == 0.0 and y[2] == 1.0

    def test_pseudoinverse_roundtrip(self):
        p = st.MTFParams(shadows=0.02, midtones=0.3, highlights=1.0)
        x = np.linspace(0.05, 0.9, 20).astype(np.float32)
        y = np.asarray(st.mtf(x, p.midtones, p.shadows, p.highlights))
        back = np.asarray(st.mtf_pseudoinverse(y, p))
        np.testing.assert_allclose(back, x, atol=1e-4)

    def test_autostretch_brightens_dark_image(self, rng):
        data = (0.01 + 0.02 * rng.random((1, 64, 64))).astype(np.float32)
        img = mk(data)
        out = st.autostretch(img)
        assert out.host().mean() > 0.15

    def test_identity_mtf(self):
        x = np.linspace(0, 1, 11).astype(np.float32)
        y = np.asarray(st.mtf(x, 0.5, 0.0, 1.0))
        np.testing.assert_allclose(y[1:-1], x[1:-1], atol=1e-6)


class TestGHT:
    @pytest.mark.parametrize("B", [-1.0, -0.5, 0.0, 0.5, 1.0])
    def test_monotone_and_range(self, B):
        p = st.GHTParams(B=B, D=2.0, LP=0.1, SP=0.3, HP=0.8)
        x = np.linspace(0, 1, 101).astype(np.float32)
        y = np.asarray(st.ght(x, p))
        assert (np.diff(y) >= -1e-5).all()
        assert y[0] == pytest.approx(0.0, abs=1e-5)
        assert y[-1] == pytest.approx(1.0, abs=1e-4)

    @pytest.mark.parametrize("B", [-1.0, -0.5, 0.0, 0.5])
    def test_inverse_roundtrip(self, B):
        pf = st.GHTParams(B=B, D=2.0, LP=0.1, SP=0.3, HP=0.8,
                          stretchtype=st.STRETCH_PAYNE_NORMAL)
        pi = st.GHTParams(B=B, D=2.0, LP=0.1, SP=0.3, HP=0.8,
                          stretchtype=st.STRETCH_PAYNE_INVERSE)
        x = np.linspace(0.02, 0.98, 49).astype(np.float32)
        y = np.asarray(st.ght(x, pf))
        back = np.asarray(st.ght(y, pi))
        np.testing.assert_allclose(back, x, atol=2e-3)

    def test_asinh_type_roundtrip(self):
        pf = st.GHTParams(D=5.0, SP=0.2, stretchtype=st.STRETCH_ASINH)
        pi = st.GHTParams(D=5.0, SP=0.2, stretchtype=st.STRETCH_INVASINH)
        x = np.linspace(0.02, 0.98, 25).astype(np.float32)
        y = np.asarray(st.ght(x, pf))
        back = np.asarray(st.ght(y, pi))
        np.testing.assert_allclose(back, x, atol=2e-3)

    def test_linear_bp(self):
        img = mk(np.full((1, 8, 8), 0.5))
        out = st.linstretch(img, 0.1)
        np.testing.assert_allclose(out.host(), (0.5 - 0.1) / 0.9, rtol=1e-5)

    def test_d0_identity(self):
        p = st.GHTParams(D=0.0)
        x = np.linspace(0, 1, 11).astype(np.float32)
        np.testing.assert_allclose(np.asarray(st.ght(x, p)), x)


class TestAsinh:
    def test_brightens(self, rng):
        img = mk(0.01 + 0.05 * rng.random((3, 16, 16)))
        out = st.asinh_stretch(img, beta=100.0)
        assert out.host().mean() > img.host().mean() * 2

    def test_beta_zero_identity(self):
        img = mk(np.full((1, 8, 8), 0.4))
        out = st.asinh_stretch(img, beta=0.0)
        np.testing.assert_allclose(out.host(), 0.4, atol=1e-6)


class TestCurves:
    def test_linear_identity(self):
        img = mk(np.linspace(0, 1, 64, dtype=np.float32).reshape(1, 8, 8))
        out = st.apply_curve(img, [(0, 0), (1, 1)], algo="linear")
        np.testing.assert_allclose(out.host(), img.host(), atol=1e-6)

    def test_spline_through_points(self):
        img = mk(np.full((1, 4, 4), 0.5))
        out = st.apply_curve(img, [(0, 0), (0.5, 0.7), (1, 1)])
        np.testing.assert_allclose(out.host(), 0.7, atol=1e-2)


class TestColors:
    def test_hsl_roundtrip(self, rng):
        r, g, b = [x.astype(np.float32) for x in rng.random((3, 32, 32))]
        h, s, l = col.rgb_to_hsl(r, g, b)
        r2, g2, b2 = col.hsl_to_rgb(h, s, l)
        np.testing.assert_allclose(np.asarray(r2), r, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2), g, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b2), b, atol=1e-5)

    def test_hsv_roundtrip(self, rng):
        r, g, b = [x.astype(np.float32) for x in rng.random((3, 16, 16))]
        h, s, v = col.rgb_to_hsv(r, g, b)
        r2, g2, b2 = col.hsv_to_rgb(h, s, v)
        np.testing.assert_allclose(np.asarray(r2), r, atol=1e-5)

    def test_lab_roundtrip(self, rng):
        r, g, b = [x.astype(np.float32) * 0.8 + 0.1
                   for x in rng.random((3, 16, 16))]
        x, y, z = col.rgb_to_xyz(r, g, b)
        L, a, bb = col.xyz_to_lab(x, y, z)
        x2, y2, z2 = col.lab_to_xyz(L, a, bb)
        r2, _, _ = col.xyz_to_rgb(x2, y2, z2)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-3)

    def test_scnr_reduces_green(self):
        img = mk(np.stack([np.full((8, 8), 0.3),
                           np.full((8, 8), 0.8),
                           np.full((8, 8), 0.3)]))
        out = col.scnr(img, preserve_lightness=False)
        assert out.host()[1].mean() < 0.5

    def test_negative(self):
        img = mk(np.full((1, 4, 4), 0.3))
        np.testing.assert_allclose(col.negative(img).host(), 0.7, atol=1e-6)

    def test_ccm_identity(self, rng):
        img = mk(rng.random((3, 8, 8)))
        out = col.apply_ccm(img, np.eye(3))
        np.testing.assert_allclose(out.host(), img.host(), atol=1e-6)

    def test_split_compose_roundtrip(self, rng):
        img = mk(rng.random((3, 8, 8)))
        r, g, b = col.split_channels(img, "rgb")
        back = col.rgb_compose(r, g, b)
        np.testing.assert_allclose(back.host(), img.host())

    def test_saturation_boost(self):
        img = mk(np.stack([np.full((8, 8), 0.6),
                           np.full((8, 8), 0.4),
                           np.full((8, 8), 0.4)]))
        out = col.saturation(img, amount=1.0)
        _, s0, _ = col.rgb_to_hsl(*[img.host()[i] for i in range(3)])
        _, s1, _ = col.rgb_to_hsl(*[out.host()[i] for i in range(3)])
        assert np.asarray(s1).mean() > np.asarray(s0).mean()


def test_lrgb_composition(tmp_path):
    from siril_tpu.core.image import SirilImage
    from siril_tpu.ops.colors import rgb_compose

    rng = np.random.default_rng(41)
    r = SirilImage(data=rng.uniform(0.2, 0.4, (1, 16, 16)).astype(np.float32))
    g = SirilImage(data=rng.uniform(0.2, 0.4, (1, 16, 16)).astype(np.float32))
    b = SirilImage(data=rng.uniform(0.2, 0.4, (1, 16, 16)).astype(np.float32))
    lum = SirilImage(data=np.full((1, 16, 16), 0.8, np.float32))
    out = rgb_compose(r, g, b, lum=lum).host()
    # lightness must follow the luminance layer
    L = 0.5 * (out.max(axis=0) + out.min(axis=0))
    np.testing.assert_allclose(L, 0.8, atol=0.02)
    plain = rgb_compose(r, g, b).host()
    assert plain.mean() < out.mean()
