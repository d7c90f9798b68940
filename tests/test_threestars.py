"""1/2/3-star registration (3stars.c headless equivalent)."""

import numpy as np
import pytest

from siril_tpu.core.image import FLOAT_IMG, SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.io.fits_io import write_fits
from siril_tpu.registration.threestars import register_three_stars


def star_frame(h, w, stars, noise, rng):
    f = np.full((h, w), 0.05, np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for (x, y, a) in stars:
        f += a * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * 1.8 ** 2))
    return np.clip(f + rng.normal(0, noise, (h, w)), 0, 1).astype(np.float32)


def make_seq(tmp_path, rng, shifts, stars):
    files = []
    for i, (dx, dy) in enumerate(shifts):
        moved = [(x + dx, y + dy, a) for (x, y, a) in stars]
        img = SirilImage(data=star_frame(96, 128, moved, 0.002, rng)[None])
        p = tmp_path / f"t_{i:05d}.fit"
        write_fits(img, p, bitdepth=FLOAT_IMG)
        files.append(str(p))
    return Sequence.from_files(files, name="t_")


def test_one_star_shift(tmp_path, rng):
    stars = [(40.0, 50.0, 0.6)]
    shifts = [(0, 0), (3.4, -2.2), (-5.1, 4.0)]
    seq = make_seq(tmp_path, rng, shifts, stars)
    res = register_three_stars(seq, [(40, 50)])
    assert res.registered == 3
    reg = seq.reg(0)
    for i, (dx, dy) in enumerate(shifts):
        # H maps frame → ref: translation ≈ −shift
        assert abs(reg.H[i][0, 2] + dx) < 0.3, i
        assert abs(reg.H[i][1, 2] + dy) < 0.3, i


def test_three_star_similarity(tmp_path, rng):
    stars = [(30.0, 30.0, 0.6), (95.0, 40.0, 0.5), (60.0, 75.0, 0.55)]
    shifts = [(0, 0), (2.5, 1.5)]
    seq = make_seq(tmp_path, rng, shifts, stars)
    res = register_three_stars(seq, [(30, 30), (95, 40), (60, 75)])
    assert res.registered == 2
    H = seq.reg(0).H[1]
    assert abs(H[0, 2] + 2.5) < 0.4
    assert abs(H[1, 2] + 1.5) < 0.4
    np.testing.assert_allclose(H[:2, :2], np.eye(2), atol=0.02)


def test_lost_star_unselects(tmp_path, rng):
    stars = [(40.0, 50.0, 0.6)]
    seq = make_seq(tmp_path, rng, [(0, 0), (0, 0)], stars)
    # blank out the star in frame 2
    from siril_tpu.io.fits_io import read_fits

    img = read_fits(seq._file_list[1])
    d = img.host()
    d[:, 30:72, 20:62] = 0.05
    write_fits(SirilImage(data=d), seq._file_list[1], bitdepth=FLOAT_IMG)
    seq2 = Sequence.from_files(seq._file_list, name="t_")
    res = register_three_stars(seq2, [(40, 50)])
    assert res.failed == [1]
    assert not seq2.incl[1]


def test_register_3stars_command(tmp_path, rng):
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line

    stars = [(40.0, 50.0, 0.6), (90.0, 20.0, 0.5)]
    make_seq(tmp_path, rng, [(0, 0), (1.5, -1.0)], stars)
    ctx = Session(cwd=str(tmp_path))
    rc = process_command_line(
        ctx, "register t_ -3stars -star1=40,50 -star2=90,20")
    assert rc == 0
