"""Planetary pipeline tests: quality ranking, MPP stages on a synthetic
SER with per-frame seeing distortion (reference model: mpp_*_test.cpp
stage-by-stage)."""

import numpy as np
import pytest

from siril_tpu.core.image import SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.io.ser import SER_MONO, SerWriter
from siril_tpu.planetary.mpp import MPPArgs, MPPState, mpp_analyze, mpp_compute_shifts, mpp_full, mpp_stack
from siril_tpu.planetary.quality import barycentre, quality_batch, rank_sequence_quality


def planet_scene(h=128, w=128):
    """A synthetic planet: disc with surface bands."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt((xx - w / 2) ** 2 + (yy - h / 2) ** 2)
    disc = np.clip(1.0 - (r - 40) / 2.0, 0, 1)
    bands = 0.15 * np.sin(yy / 6.0) + 0.1 * np.sin(xx / 11.0 + 1)
    return (0.02 + disc * (0.5 + bands)).astype(np.float32)


def make_planetary_ser(tmp_path, rng, n=24, blur_some=True):
    from siril_tpu.ops.filters import gaussian_blur_chw

    scene = planet_scene()
    p = str(tmp_path / "planet.ser")
    w = SerWriter(p, 128, 128, SER_MONO, 16)
    shifts = []
    for i in range(n):
        dx, dy = int(rng.integers(-6, 7)), int(rng.integers(-6, 7))
        f = np.roll(np.roll(scene, dy, 0), dx, 1)
        if blur_some and i % 3 == 0:     # bad seeing frames
            f = np.asarray(gaussian_blur_chw(f[None], 2.5))[0]
        f = f + rng.normal(0, 0.004, f.shape).astype(np.float32)
        w.write_frame(SirilImage(data=np.clip(f, 0, 1)[None]))
        shifts.append((dx, dy))
    w.close()
    return Sequence.from_ser(p), scene, shifts


class TestQuality:
    def test_sharp_beats_blurred(self, rng):
        from siril_tpu.ops.filters import gaussian_blur_chw

        scene = planet_scene()
        blurred = np.asarray(gaussian_blur_chw(scene[None], 3.0))[0]
        q = quality_batch(np.stack([scene, blurred]))
        assert q[0] > q[1] * 1.2

    def test_rank_sequence(self, tmp_path, rng):
        seq, _, _ = make_planetary_ser(tmp_path, rng, n=9)
        qual = rank_sequence_quality(seq)
        reg = seq.reg(0)
        # blurred frames (every 3rd) must rank lower
        blurred = [i for i in range(9) if i % 3 == 0]
        sharp = [i for i in range(9) if i % 3 != 0]
        assert reg.quality[sharp].mean() > reg.quality[blurred].mean()

    def test_barycentre(self):
        scene = planet_scene()
        cx, cy = barycentre(scene)
        assert cx == pytest.approx(63.5, abs=3)
        assert cy == pytest.approx(63.5, abs=3)


class TestMPP:
    def test_analyze_recovers_global_shifts(self, tmp_path, rng):
        seq, scene, shifts = make_planetary_ser(tmp_path, rng, n=12,
                                                blur_some=False)
        state = mpp_analyze(seq, MPPArgs(ap_size=32))
        # phase_correlate returns frame→ref translation = −displacement
        # relative to the best frame; compare pairwise differences
        b = int(np.argmax(state.quality))
        for i in range(12):
            expect_dx = -(shifts[i][0] - shifts[b][0])
            expect_dy = -(shifts[i][1] - shifts[b][1])
            assert state.global_shifts[i][0] == pytest.approx(expect_dx, abs=0.5)
            assert state.global_shifts[i][1] == pytest.approx(expect_dy, abs=0.5)
        assert len(state.ap_xy) >= 4

    def test_full_pipeline_beats_single_frame(self, tmp_path, rng):
        seq, scene, _ = make_planetary_ser(tmp_path, rng, n=24)
        out = mpp_full(seq, MPPArgs(ap_size=32, stack_best_pct=50.0))
        res = out.host()[0]
        assert res.shape == scene.shape
        # the result lives in the best-frame geometry: align to the scene
        # first (integer roll from phase correlation), then compare
        from siril_tpu.registration.shift import phase_correlate

        d = phase_correlate(scene, res[None], subpixel=False)[0]
        aligned = np.roll(np.roll(res, int(round(d[1])), 0),
                          int(round(d[0])), 1)
        # compare inside the disc (r<28): the integer-roll test alignment
        # leaves sub-pixel error that dominates at the sharp disc edge
        yy, xx = np.mgrid[0:128, 0:128]
        inner = (xx - 64) ** 2 + (yy - 64) ** 2 < 28 ** 2
        err_stack = np.abs(aligned[inner] - scene[inner]).mean()
        assert err_stack < 0.02, f"stack err {err_stack}"
        assert np.isfinite(res).all()

    def test_sidecar_roundtrip(self, tmp_path, rng):
        seq, _, _ = make_planetary_ser(tmp_path, rng, n=8, blur_some=False)
        args = MPPArgs(ap_size=32)
        state = mpp_analyze(seq, args)
        state = mpp_compute_shifts(seq, state, args)
        p = str(tmp_path / "planet.mpp")
        state.save(p)
        back = MPPState.load(p)
        np.testing.assert_allclose(back.global_shifts, state.global_shifts)
        np.testing.assert_allclose(back.ap_shifts, state.ap_shifts)
        # stage C runs from the loaded sidecar
        out = mpp_stack(seq, back, args)
        assert np.isfinite(out.host()).all()
