"""Statistics parity: numpy backend vs formulas; jax batch estimators vs
numpy backend (the normalization inputs)."""

import numpy as np
import pytest

from siril_tpu.ops import statistics as st


class TestNumpyBackend:
    def test_basic(self, rng):
        x = rng.random((64, 64)).astype(np.float32) * 0.5 + 0.1
        s = st.compute_stats_np(x, st.STATS_MAIN)
        good = x[x != 0]
        assert s.ngoodpix == good.size
        assert s.mean == pytest.approx(float(good.mean()), rel=1e-6)
        assert s.median == pytest.approx(float(np.median(good)), rel=1e-6)
        assert s.sigma == pytest.approx(float(good.std(ddof=1)), rel=1e-5)
        assert s.min == pytest.approx(float(good.min()))
        assert s.max == pytest.approx(float(good.max()))
        assert s.mad == pytest.approx(
            float(np.median(np.abs(good - np.float32(np.median(good))))), rel=1e-5)
        assert s.avgdev == pytest.approx(
            float(np.abs(good - np.float32(np.median(good))).mean()), rel=1e-5)

    def test_zeros_excluded(self, rng):
        x = rng.random((32, 32)).astype(np.float32)
        x[:16] = 0.0
        s = st.compute_stats_np(x, st.STATS_BASIC)
        assert s.ngoodpix == (x != 0).sum()
        assert s.mean == pytest.approx(float(x[x != 0].mean()), rel=1e-6)

    def test_bgnoise_gaussian(self, rng):
        # flat background + gaussian noise: bgnoise ≈ sigma
        sigma = 0.01
        x = (0.2 + rng.normal(0, sigma, (256, 256))).astype(np.float32)
        s = st.compute_stats_np(x, st.STATS_BASIC)
        assert s.bgnoise == pytest.approx(sigma, rel=0.1)

    def test_ikss_gaussian(self, rng):
        # IKSS scale ≈ std for clean gaussian; location ≈ mean
        x = (0.3 + rng.normal(0, 0.02, (128, 128))).astype(np.float32)
        s = st.compute_stats_np(x, st.STATS_NORM)
        assert s.location == pytest.approx(0.3, abs=1e-3)
        assert s.scale == pytest.approx(0.02, rel=0.05)


class TestJaxEstimators:
    def test_norm_estimators_match_numpy(self, rng):
        N, P = 6, 4096
        frames = np.abs(rng.normal(0.3, 0.05, (N, P))).astype(np.float32)
        frames[0, :100] = 0.0
        out = st.norm_estimators_jax(frames)
        for i in range(N):
            good = frames[i][frames[i] != 0]
            med = np.median(good)
            assert float(out["median"][i]) == pytest.approx(float(med), rel=1e-4)
            mad = np.median(np.abs(good - med))
            assert float(out["mad"][i]) == pytest.approx(float(mad), rel=1e-3)
            r = st.ikss_lite_np(good, float(med), float(mad))
            assert r is not None
            loc, scale = r
            assert float(out["location"][i]) == pytest.approx(loc, rel=1e-3)
            assert float(out["scale"][i]) == pytest.approx(scale, rel=5e-3)

    def test_lite_mode(self, rng):
        N, P = 3, 1024
        frames = np.abs(rng.normal(0.4, 0.03, (N, P))).astype(np.float32)
        out = st.norm_estimators_jax(frames, lite=True)
        for i in range(N):
            med = np.median(frames[i])
            mad = np.median(np.abs(frames[i] - med))
            assert float(out["location"][i]) == pytest.approx(float(med), rel=1e-4)
            assert float(out["scale"][i]) == pytest.approx(1.5 * float(mad), rel=1e-3)
