"""Calibration + cosmetic correction tests (reference model: preprocess.c
formula and cosmetic_correction.c rules on synthetic masters)."""

import numpy as np
import pytest

from siril_tpu.core.image import FLOAT_IMG, SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.io.fits_io import write_fits
from siril_tpu.ops import arithmetic as ar
from siril_tpu.ops.calibration import (
    CalibArgs,
    calibrate_image,
    calibrate_sequence,
    dark_optimization_k,
    evaluate_offset_level,
)
from siril_tpu.ops.cosmetic import (
    auto_detect_and_correct,
    correct_deviant,
    detect_deviant_from_dark,
)


def mk(data):
    return SirilImage(data=np.asarray(data, np.float32))


class TestArithmetic:
    def test_imoper_ops(self, rng):
        a = rng.random((1, 8, 8)).astype(np.float32)
        b = rng.random((1, 8, 8)).astype(np.float32) + 0.1
        np.testing.assert_allclose(ar.imoper(a, b, ar.OPER_ADD), a + b)
        np.testing.assert_allclose(ar.imoper(a, b, ar.OPER_SUB), a - b)
        np.testing.assert_allclose(ar.imoper(a, b, ar.OPER_MUL), a * b)
        np.testing.assert_allclose(ar.imoper(a, b, ar.OPER_DIV), a / b,
                                   rtol=1e-6)

    def test_div_by_zero_pixel(self):
        a = np.full((1, 2, 2), 0.5, np.float32)
        b = np.zeros((1, 2, 2), np.float32)
        out = ar.imoper(a, b, ar.OPER_DIV)
        assert (out == 0).all()

    def test_clip16(self):
        a = np.array([[[0.5]]], np.float32)
        out = ar.soper(a, 2.0, ar.OPER_MUL, clip16=True)
        assert float(out[0, 0, 0]) == 1.0   # clipped to u16 max
        out2 = ar.soper(a, -2.0, ar.OPER_MUL, clip16=True)
        assert float(out2[0, 0, 0]) == 0.0

    def test_soper_div_zero_raises(self):
        with pytest.raises(ZeroDivisionError):
            ar.soper(np.ones((1, 2, 2), np.float32), 0.0, ar.OPER_DIV)

    def test_addmax(self, rng):
        a = rng.random((1, 4, 4)).astype(np.float32)
        b = rng.random((1, 4, 4)).astype(np.float32)
        np.testing.assert_array_equal(ar.addmax(a, b), np.maximum(a, b))


class TestOffsetExpr:
    def test_plain(self):
        img = mk(np.zeros((1, 2, 2)))
        assert evaluate_offset_level("500", img) == pytest.approx(500 / 65535)

    def test_with_offset_key(self):
        img = mk(np.zeros((1, 2, 2)))
        img.keywords.offset = 64
        assert evaluate_offset_level("=4*$OFFSET", img) == \
            pytest.approx(256 / 65535)

    def test_rejects_garbage(self):
        img = mk(np.zeros((1, 2, 2)))
        with pytest.raises(ValueError):
            evaluate_offset_level("=__import__('os')", img)


class TestCalibrationFormula:
    def test_full_chain(self, rng):
        h, w = 32, 32
        bias = np.full((1, h, w), 0.05, np.float32)
        dark = np.full((1, h, w), 0.02, np.float32)
        flat_pattern = (0.8 + 0.4 * rng.random((1, h, w))).astype(np.float32)
        truth = (0.2 + 0.3 * rng.random((1, h, w))).astype(np.float32)
        raw = (truth * flat_pattern + bias + dark).astype(np.float32)
        args = CalibArgs(bias=mk(bias), dark=mk(dark), flat=mk(flat_pattern),
                         use_cosmetic=False)
        out = calibrate_image(mk(raw), args)
        # expected: ((raw - bias - dark) / (flat/mu)) = truth * mu
        mu = flat_pattern.mean()
        np.testing.assert_allclose(out.host(), truth * mu, rtol=1e-4)
        assert any("master flat" in s for s in out.history)

    def test_bias_level_synthetic(self):
        raw = np.full((1, 8, 8), 0.5, np.float32)
        args = CalibArgs(bias_level=0.1, use_cosmetic=False)
        out = calibrate_image(mk(raw), args)
        np.testing.assert_allclose(out.host(), 0.4, rtol=1e-5)

    def test_dark_optimization_recovers_k(self, rng):
        # raw = scene + 0.7*dark_pattern + noise → search should find ≈0.7
        h, w = 64, 64
        dark_pat = (rng.random((1, h, w)) * 0.1).astype(np.float32)
        scene = np.full((1, h, w), 0.3, np.float32) + \
            rng.normal(0, 0.001, (1, h, w)).astype(np.float32)
        raw = scene + 0.7 * dark_pat
        k = dark_optimization_k(raw, dark_pat, use_exposure=False)
        assert k == pytest.approx(0.7, abs=0.05)

    def test_exposure_scaling(self):
        k = dark_optimization_k(None, None, use_exposure=True,
                                raw_exp=120.0, dark_exp=60.0)
        assert k == 2.0


class TestCosmetic:
    def test_dark_deviant_detection(self, rng):
        dark = (0.01 + rng.normal(0, 0.001, (64, 64))).astype(np.float32)
        dark[10, 10] = 0.9      # hot
        dark[20, 20] = 0.0      # cold (0 <= median - 3 sigma is unlikely;
        cold, hot = detect_deviant_from_dark(dark, 3.0, 3.0)
        assert hot[10, 10]
        assert not hot[15, 15]

    def test_correction_replaces_hot(self, rng):
        lay = np.full((32, 32), 0.2, np.float32)
        lay[5, 5] = 1.0
        hot = np.zeros((32, 32), bool)
        hot[5, 5] = True
        cold = np.zeros((32, 32), bool)
        out = np.asarray(correct_deviant(lay, cold, hot))
        assert out[5, 5] == pytest.approx(0.2, abs=1e-6)

    def test_cold_replaced_by_median(self, rng):
        lay = (0.3 + rng.normal(0, 0.01, (32, 32))).astype(np.float32)
        lay[8, 8] = 0.0
        cold = lay == 0.0
        out = np.asarray(correct_deviant(lay, cold, np.zeros_like(cold)))
        assert abs(out[8, 8] - 0.3) < 0.05

    def test_auto_detect(self, rng):
        lay = (0.3 + rng.normal(0, 0.005, (64, 64))).astype(np.float32)
        lay[12, 40] = 0.95
        out, cold, hot = auto_detect_and_correct(lay, sig_hot=5.0)
        assert hot[12, 40]
        assert abs(float(np.asarray(out)[12, 40]) - 0.3) < 0.05


class TestCalibrateSequence:
    def test_sequence_calibration(self, tmp_path, rng):
        h, w = 24, 24
        bias = np.full((1, h, w), 0.05, np.float32)
        truth = (0.2 + 0.3 * rng.random((1, h, w))).astype(np.float32)
        files = []
        for i in range(4):
            raw = truth + bias + rng.normal(0, 0.002, (1, h, w)).astype(np.float32)
            p = tmp_path / f"light_{i:05d}.fit"
            write_fits(SirilImage(data=raw.astype(np.float32)), p,
                       bitdepth=FLOAT_IMG)
            files.append(str(p))
        seq = Sequence.from_files(files, name="light_")
        args = CalibArgs(bias=mk(bias), use_cosmetic=False)
        res = calibrate_sequence(seq, args)
        assert res.processed == 4
        assert res.new_seq is not None
        assert res.new_seq.number == 4
        out0 = res.new_seq.read_frame(0).host()
        np.testing.assert_allclose(out0, truth, atol=0.01)
        assert res.new_seq.name.startswith("pp_")


def test_constant_dark_flags_nothing():
    """A zero-variance master dark must not mark every pixel deviant."""
    from siril_tpu.ops.cosmetic import detect_deviant_from_dark

    cold, hot = detect_deviant_from_dark(
        np.full((32, 32), 0.015, np.float32), 3.0, 3.0)
    assert cold.sum() == 0 and hot.sum() == 0
