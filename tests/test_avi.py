"""AVI container tests (io/avi.py — avi_pipp writer + films.c import)."""

import os

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.io.avi import AviReader, AviWriter, export_avi


def test_avi_roundtrip_color(tmp_path):
    rng = np.random.default_rng(24)
    frames = [rng.uniform(0, 1, (3, 24, 34)).astype(np.float32)
              for _ in range(4)]
    p = str(tmp_path / "t.avi")
    w = AviWriter(p, 34, 24, fps=10.0, color=True)
    for f in frames:
        w.add_frame(SirilImage(data=f))
    w.close()
    r = AviReader(p)
    assert r.nframes == 4 and r.w == 34 and r.h == 24 and r.bpp == 24
    for k, f in enumerate(frames):
        back = r.read_frame(k).host()
        assert np.abs(back - f).max() <= 1.0 / 255.0 + 1e-6


def test_avi_roundtrip_mono(tmp_path):
    rng = np.random.default_rng(25)
    f = rng.uniform(0, 1, (1, 16, 18)).astype(np.float32)
    p = str(tmp_path / "m.avi")
    w = AviWriter(p, 18, 16, color=False)
    w.add_frame(SirilImage(data=f))
    w.close()
    r = AviReader(p)
    assert r.bpp == 8
    np.testing.assert_allclose(r.read_frame(0).host(), f,
                               atol=1.0 / 255.0 + 1e-6)


def test_convert_avi_to_sequence(tmp_path):
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.io.conversion import convert_to_sequence
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng(26)
    p = str(tmp_path / "film.avi")
    w = AviWriter(p, 32, 20, color=False)
    for _ in range(5):
        w.add_frame(SirilImage(data=rng.uniform(0, 1, (1, 20, 32))
                               .astype(np.float32)))
    w.close()
    seq = convert_to_sequence([p], "film_", str(tmp_path), output="ser")
    assert seq.number == 5
    img = seq.read_frame(2)
    assert img.width == 32 and img.height == 20


def test_export_avi(tmp_path):
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng(27)
    files = []
    for i in range(3):
        pth = str(tmp_path / f"ex_{i + 1:05d}.fit")
        write_fits(SirilImage(data=rng.uniform(0, 1, (1, 16, 16))
                              .astype(np.float32)), pth, bitdepth=16)
        files.append(pth)
    seq = Sequence.from_files(files, name="ex_")
    out = str(tmp_path / "out.avi")
    assert export_avi(seq, out) == 3
    assert AviReader(out).nframes == 3
