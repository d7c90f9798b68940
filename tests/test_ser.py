"""SER container round-trip tests (reference model: src/tests/ser_test.c)."""

import numpy as np
import pytest

from siril_tpu.core.image import SirilImage
from siril_tpu.io.ser import (
    SER_BAYER_RGGB,
    SER_MONO,
    SER_RGB,
    SerFile,
    SerWriter,
    iso_to_ticks,
    ticks_to_iso,
)


def frames(rng, n, c, h, w):
    return [SirilImage(data=rng.random((c, h, w)).astype(np.float32))
            for _ in range(n)]


class TestSerRoundTrip:
    def test_mono16(self, rng, tmp_path):
        p = tmp_path / "m.ser"
        imgs = frames(rng, 5, 1, 32, 48)
        w = SerWriter(p, 48, 32, SER_MONO, 16, observer="obs")
        for im in imgs:
            w.write_frame(im)
        w.close()
        r = SerFile(p)
        assert r.frame_count == 5
        assert (r.width, r.height, r.nchans) == (48, 32, 1)
        assert r.header.observer == "obs"
        for i, im in enumerate(imgs):
            back = r.read_frame(i)
            np.testing.assert_allclose(back.host(), im.host(), atol=0.5 / 65535)

    def test_rgb(self, rng, tmp_path):
        p = tmp_path / "c.ser"
        imgs = frames(rng, 3, 3, 16, 16)
        w = SerWriter(p, 16, 16, SER_RGB, 16)
        for im in imgs:
            w.write_frame(im)
        w.close()
        r = SerFile(p)
        assert r.nchans == 3
        back = r.read_frame(1)
        np.testing.assert_allclose(back.host(), imgs[1].host(), atol=0.5 / 65535)

    def test_bayer_header(self, rng, tmp_path):
        p = tmp_path / "b.ser"
        w = SerWriter(p, 8, 8, SER_BAYER_RGGB, 16)
        w.write_frame(frames(rng, 1, 1, 8, 8)[0])
        w.close()
        r = SerFile(p)
        back = r.read_frame(0)
        assert back.keywords.bayer_pattern == "RGGB"

    def test_8bit(self, rng, tmp_path):
        p = tmp_path / "e.ser"
        w = SerWriter(p, 8, 8, SER_MONO, 8)
        img = frames(rng, 1, 1, 8, 8)[0]
        w.write_frame(img)
        w.close()
        r = SerFile(p)
        back = r.read_frame(0)
        np.testing.assert_allclose(back.host(), img.host(), atol=0.5 / 255)

    def test_timestamps(self, rng, tmp_path):
        p = tmp_path / "t.ser"
        w = SerWriter(p, 8, 8, SER_MONO, 16)
        t0 = iso_to_ticks("2024-01-15T20:30:00")
        for i, im in enumerate(frames(rng, 3, 1, 8, 8)):
            w.write_frame(im, timestamp_ticks=t0 + i * 10_000_000)
        w.close()
        r = SerFile(p)
        assert len(r.header.timestamps) == 3
        assert r.fps == pytest.approx(1.0, rel=1e-3)
        assert ticks_to_iso(r.header.timestamps[0]).startswith("2024-01-15T20:30:00")

    def test_region(self, rng, tmp_path):
        p = tmp_path / "r.ser"
        imgs = frames(rng, 2, 1, 24, 16)
        w = SerWriter(p, 16, 24, SER_MONO, 16)
        for im in imgs:
            w.write_frame(im)
        w.close()
        r = SerFile(p)
        reg = r.read_region(0, 1, 5, 15)
        np.testing.assert_allclose(reg, imgs[1].host()[0, 5:15], atol=0.5 / 65535)
