"""Tests for seq-variant commands, undo, path parsing, live stacking."""

import os
import time

import numpy as np
import pytest

from siril_tpu.cli.context import Session
from siril_tpu.cli.parser import process_command_line
from siril_tpu.core.image import FLOAT_IMG, SirilImage
from siril_tpu.io.fits_io import read_fits, write_fits
from siril_tpu.utils.pathparse import parse_path


@pytest.fixture
def ctx(tmp_path):
    return Session(cwd=str(tmp_path))


def put(ctx, name, data, **kw):
    img = SirilImage(data=np.asarray(data, np.float32))
    for k, v in kw.items():
        setattr(img.keywords, k, v)
    write_fits(img, os.path.join(ctx.cwd, name), bitdepth=FLOAT_IMG)


def make_seq(ctx, rng, n=3, name="s_"):
    for i in range(n):
        put(ctx, f"{name}{i:05d}.fit", 0.2 + 0.1 * rng.random((1, 24, 24)))


class TestSeqVariants:
    def test_seqmtf(self, ctx, rng):
        make_seq(ctx, rng)
        assert process_command_line(ctx, "seqmtf s_ 0.0 0.25 1.0") == 0
        assert os.path.exists(os.path.join(ctx.cwd, "mtf_s_00000.fit"))

    def test_seqcrop(self, ctx, rng):
        make_seq(ctx, rng)
        assert process_command_line(ctx, "seqcrop s_ 2 2 10 10") == 0
        out = read_fits(os.path.join(ctx.cwd, "cropped_s_00000.fit"))
        assert out.shape == (1, 10, 10)

    def test_seqsubsky(self, ctx, rng):
        make_seq(ctx, rng)
        assert process_command_line(ctx, "seqsubsky s_ 1") == 0
        assert os.path.exists(os.path.join(ctx.cwd, "bkg_s_00000.fit"))

    def test_merge(self, ctx, rng):
        make_seq(ctx, rng, name="a_")
        make_seq(ctx, rng, name="b_")
        assert process_command_line(ctx, "merge a_ b_ m_") == 0
        assert ctx.seq.number == 6


class TestUndo:
    def test_undo_redo(self, ctx, rng):
        put(ctx, "a.fit", np.full((1, 8, 8), 0.5))
        process_command_line(ctx, "load a.fit")
        process_command_line(ctx, "fmul 0.5")
        assert ctx.image.host()[0, 0, 0] == pytest.approx(0.25)
        assert process_command_line(ctx, "undo") == 0
        assert ctx.image.host()[0, 0, 0] == pytest.approx(0.5)
        assert process_command_line(ctx, "redo") == 0
        assert ctx.image.host()[0, 0, 0] == pytest.approx(0.25)

    def test_undo_empty(self, ctx, rng):
        put(ctx, "a.fit", np.full((1, 4, 4), 0.5))
        process_command_line(ctx, "load a.fit")
        assert process_command_line(ctx, "undo") == 1


class TestPathParse:
    def test_substitution(self):
        img = SirilImage(data=np.zeros((1, 2, 2), np.float32))
        img.keywords.livetime = 3600.0
        img.keywords.object = "M 42"
        assert parse_path("result_$LIVETIME:%d$s", img) == "result_3600s"
        assert parse_path("$OBJECT$_x", img) == "M_42_x"

    def test_unknown_key(self):
        img = SirilImage(data=np.zeros((1, 2, 2), np.float32))
        assert "unknown" in parse_path("$NOPE$", img)

    def test_parse_command(self, ctx, rng):
        put(ctx, "a.fit", np.zeros((1, 4, 4)), livetime=120.0)
        process_command_line(ctx, "load a.fit")
        assert process_command_line(ctx, 'parse "r_$LIVETIME:%d$"') == 0


class TestLiveStack:
    def test_livestack_accumulates(self, ctx, rng):
        from siril_tpu.livestacking.livestack import LiveStackConfig, LiveStacker

        scene = (0.1 + 0.2 * rng.random((1, 32, 32))).astype(np.float32)
        ls = LiveStacker(ctx.cwd, LiveStackConfig(use_registration=True,
                                                  shift_only=True))
        for i in range(4):
            dx, dy = (0, 0) if i == 0 else (int(rng.integers(-2, 3)),
                                            int(rng.integers(-2, 3)))
            f = np.roll(np.roll(scene, dy, 1), dx, 2) + \
                rng.normal(0, 0.005, scene.shape).astype(np.float32)
            ls.process_frame(SirilImage(data=np.clip(f, 0, 1)))
        out = ls.result()
        assert out is not None
        assert out.keywords.stackcnt == 4
        interior = np.s_[0, 5:-5, 5:-5]
        err = np.abs(out.host()[interior] - scene[interior]).mean()
        assert err < 0.006

    def test_start_stop_commands(self, ctx, rng):
        assert process_command_line(ctx, "start_ls -shift") == 0
        assert process_command_line(ctx, "livestack") == 0
        assert process_command_line(ctx, "stop_ls") == 0
