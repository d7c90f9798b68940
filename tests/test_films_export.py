"""Film import (io/films.py ≙ src/io/films.c) and sequence export
(io/sequence_export.py ≙ src/io/sequence_export.c) round trips."""

import os

import numpy as np
import pytest

from siril_tpu.core.image import SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.io.fits_io import write_fits

cv2 = pytest.importorskip("cv2")


def _make_fits_seq(d, n=6, h=48, w=64):
    rng = np.random.default_rng(3)
    frames = []
    for i in range(n):
        f = (0.2 + 0.1 * i / n +
             rng.normal(0, 0.01, (h, w))).astype(np.float32)
        frames.append(np.clip(f, 0, 1))
        img = SirilImage(data=frames[-1][None])
        write_fits(img, os.path.join(d, f"light_{i:05d}.fit"), bitdepth=16)
    return frames


def test_mp4_export_and_film_reimport(tmp_path):
    d = str(tmp_path)
    frames = _make_fits_seq(d)
    seq = Sequence.scan("light_", d)

    from siril_tpu.io.sequence_export import (EXPORT_MP4, ExportArgs,
                                              export_sequence)

    n = export_sequence(seq, ExportArgs(output=EXPORT_MP4, basename="vid_",
                                        fps=10), directory=d)
    assert n == 6
    path = os.path.join(d, "vid.mp4")
    assert os.path.getsize(path) > 100

    # re-import through the film reader (films.c round trip)
    from siril_tpu.io.films import FilmReader, is_film

    assert is_film(path)
    fr = FilmReader(path)
    assert fr.nframes == 6
    assert (fr.w, fr.h) == (64, 48)
    img0 = fr.read_frame(0)
    # lossy codec: mean level preserved to ~2/255
    assert abs(float(img0.data.mean()) - float(frames[0].mean())) < 0.02
    # random access: frame 4 is brighter than frame 0
    img4 = fr.read_frame(4)
    assert float(img4.data.mean()) > float(img0.data.mean())
    fr.close()


def test_film_sequence_type(tmp_path):
    d = str(tmp_path)
    _make_fits_seq(d)
    seq = Sequence.scan("light_", d)
    from siril_tpu.io.sequence_export import (EXPORT_WEBM_VP9, ExportArgs,
                                              export_sequence)

    export_sequence(seq, ExportArgs(output=EXPORT_WEBM_VP9,
                                    basename="vid_", fps=10), directory=d)
    fseq = Sequence.from_film(os.path.join(d, "vid.webm"))
    assert fseq.number == 6
    assert fseq.seq_type == 3            # SEQ_AVI (film)
    img = fseq.read_frame(2)
    assert img.data.shape[-2:] == (48, 64)


def test_export_shifts_normalize_crop(tmp_path):
    """Reference semantics: integer reg shifts + additive-scaling
    normalization + crop (sequence_export.c:436-480)."""
    d = str(tmp_path)
    rng = np.random.default_rng(5)
    base = np.clip(0.3 + rng.normal(0, 0.02, (40, 60)), 0, 1)
    base = base.astype(np.float32)
    shifts = [(0, 0), (2, 1), (-1, 3)]
    for i, (sx, sy) in enumerate(shifts):
        f = np.roll(np.roll(base, sy, axis=0), sx, axis=1)
        write_fits(SirilImage(data=f[None]),
                   os.path.join(d, f"light_{i:05d}.fit"), bitdepth=16)
    seq = Sequence.scan("light_", d)
    seq.reference_image = 0
    reg = seq.reg(0)
    for i, (sx, sy) in enumerate(shifts):
        H = np.eye(3)
        H[0, 2], H[1, 2] = -sx, -sy     # undo the roll
        reg.H[i] = H
        reg.valid[i] = True

    from siril_tpu.io.fits_io import read_fits
    from siril_tpu.io.sequence_export import (EXPORT_FITS, ExportArgs,
                                              export_sequence)

    n = export_sequence(seq, ExportArgs(output=EXPORT_FITS, basename="out_",
                                        crop=(4, 4, 40, 30)), directory=d)
    assert n == 3
    outs = [read_fits(os.path.join(d, f"out_{k + 1:05d}.fit")).data
            for k in range(3)]
    assert outs[0].shape == (1, 30, 40)
    # after shift-compensation + crop, frames must align with frame 0
    for k in (1, 2):
        assert np.abs(outs[k] - outs[0]).mean() < 2e-3


def test_seqexport_command(tmp_path):
    d = str(tmp_path)
    _make_fits_seq(d)
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line

    ctx = Session(cwd=d)
    assert process_command_line(
        ctx, "seqexport light_ clip -format=mp4 -fps=12") == 0
    assert os.path.getsize(os.path.join(d, "clip.mp4")) > 100


def test_convert_expands_film(tmp_path):
    """convert picks up film containers and expands them into FITS
    frames (conversion.c film path)."""
    d = str(tmp_path)
    _make_fits_seq(d, n=5)
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line

    ctx = Session(cwd=d)
    assert process_command_line(ctx, "seqexport light_ vid -format=mp4") == 0
    # remove the FITS so convert only sees the film
    for i in range(5):
        os.remove(os.path.join(d, f"light_{i:05d}.fit"))
    assert process_command_line(ctx, "convert cfr") == 0
    from siril_tpu.io.fits_io import read_fits

    assert os.path.exists(os.path.join(d, "cfr_00001.fit"))
    img = read_fits(os.path.join(d, "cfr_00001.fit"))
    assert img.data.shape[-2:] == (48, 64)


def test_color_film_with_black_lead_in(tmp_path):
    """A color film whose first frames are black must still import as
    color (channel probe samples across the film)."""
    path = str(tmp_path / "fade.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for i in range(4):
        w.write(np.zeros((48, 64, 3), np.uint8))         # black lead-in
    for i in range(8):
        f = np.zeros((48, 64, 3), np.uint8)
        f[..., 2] = 200                                   # red (BGR)
        w.write(f)
    w.release()

    from siril_tpu.io.films import FilmReader

    fr = FilmReader(path)
    assert fr.nchans == 3
    img = fr.read_frame(8)
    assert img.data.shape[0] == 3
    assert img.data[0].mean() > 0.5 > img.data[2].mean()  # red, not blue
    fr.close()


def test_load_sequence_by_explicit_film_filename(tmp_path):
    """load_sequence('capture.mp4') resolves the film directly
    (previously only the bare basename worked)."""
    d = str(tmp_path)
    _make_fits_seq(d, n=4)
    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line

    ctx = Session(cwd=d)
    assert process_command_line(ctx, "seqexport light_ capture -format=mp4") == 0
    seq = ctx.load_sequence("capture.mp4")
    assert seq.number == 4
    seq2 = ctx.load_sequence("capture")
    assert seq2.number == 4
