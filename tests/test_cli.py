"""CLI + script engine tests: command parsing, the .ssf script path, and a
full mono preprocessing workflow script (the Mono_Preprocessing.ssf
shape: calibrate → register → stack)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from siril_tpu.cli.context import Session
from siril_tpu.cli.parser import execute_script, parse_line, process_command_line
from siril_tpu.core.image import FLOAT_IMG, SirilImage
from siril_tpu.io.fits_io import read_fits, write_fits


@pytest.fixture
def ctx(tmp_path):
    s = Session(cwd=str(tmp_path))
    return s


def put_image(ctx, name, data):
    p = os.path.join(ctx.cwd, name)
    write_fits(SirilImage(data=np.asarray(data, np.float32)), p,
               bitdepth=FLOAT_IMG)
    return p


class TestParser:
    def test_parse_quotes(self):
        assert parse_line('load "my file.fit"') == ["load", "my file.fit"]

    def test_comments(self):
        assert parse_line("# a comment") == []
        assert parse_line("") == []

    def test_unknown_command(self, ctx):
        assert process_command_line(ctx, "notacommand") == 1

    def test_missing_args(self, ctx):
        assert process_command_line(ctx, "load") == 1

    def test_requires_image(self, ctx):
        assert process_command_line(ctx, "neg") == 1


class TestBasicCommands:
    def test_load_save_roundtrip(self, ctx, rng):
        put_image(ctx, "a.fit", rng.random((1, 16, 16)))
        assert process_command_line(ctx, "load a.fit") == 0
        assert ctx.image is not None
        assert process_command_line(ctx, "save b") == 0
        assert os.path.exists(os.path.join(ctx.cwd, "b.fit"))

    def test_stat_bg(self, ctx, rng):
        put_image(ctx, "a.fit", rng.random((1, 32, 32)))
        process_command_line(ctx, "load a.fit")
        assert process_command_line(ctx, "stat") == 0
        assert process_command_line(ctx, "bg") == 0

    def test_geometry_chain(self, ctx, rng):
        put_image(ctx, "a.fit", rng.random((1, 20, 30)))
        process_command_line(ctx, "load a.fit")
        assert process_command_line(ctx, "crop 5 5 10 10") == 0
        assert ctx.image.shape == (1, 10, 10)
        assert process_command_line(ctx, "mirrorx") == 0
        assert process_command_line(ctx, "rotatePi") == 0
        assert process_command_line(ctx, "binxy 2") == 0
        assert ctx.image.shape == (1, 5, 5)

    def test_set_get(self, ctx):
        assert process_command_line(ctx, "set sf_sigma=2.5") == 0
        assert ctx.prefs.sf_sigma == 2.5
        assert process_command_line(ctx, "get sf_sigma") == 0
        assert process_command_line(ctx, "get bogus_key") == 1

    def test_requires_version(self, ctx):
        assert process_command_line(ctx, "requires 1.2.0") == 0
        assert process_command_line(ctx, "requires 9.9.9") == 1

    def test_pm_expression(self, ctx, rng):
        put_image(ctx, "a.fit", np.full((1, 8, 8), 0.25))
        process_command_line(ctx, "load a.fit")
        assert process_command_line(ctx, 'pm "$T * 2"') == 0
        np.testing.assert_allclose(ctx.image.host(), 0.5, atol=1e-6)

    def test_arith(self, ctx):
        put_image(ctx, "a.fit", np.full((1, 8, 8), 0.5))
        put_image(ctx, "b.fit", np.full((1, 8, 8), 0.2))
        process_command_line(ctx, "load a.fit")
        assert process_command_line(ctx, "isub b") == 0
        np.testing.assert_allclose(ctx.image.host(), 0.3, atol=1e-6)
        assert process_command_line(ctx, "fmul 2") == 0
        np.testing.assert_allclose(ctx.image.host(), 0.6, atol=1e-6)

    def test_stack_rejection_param_validation(self):
        """command.c:11909-11917: GESDT/percentile params must be in [0,1],
        with defaults 0.3/0.05 and 0.2/0.1."""
        from siril_tpu.cli.commands import CommandError, _stack_args_from_flags
        from siril_tpu.ops import rejection as rj

        sa = _stack_args_from_flags(["s", "rej", "g"], {})
        assert sa.rejection == rj.GESDT
        assert (sa.siglow, sa.sighigh) == (0.3, 0.05)
        sa = _stack_args_from_flags(["s", "rej", "p"], {})
        assert (sa.siglow, sa.sighigh) == (0.2, 0.1)
        with pytest.raises(CommandError):
            _stack_args_from_flags(["s", "rej", "g", "3", "3"], {})
        with pytest.raises(CommandError):
            _stack_args_from_flags(["s", "rej", "p", "2", "0.1"], {})
        sa = _stack_args_from_flags(["s", "rej", "w", "3", "3"], {})
        assert sa.rejection == rj.WINSORIZED and sa.siglow == 3.0

    def test_stretch_commands(self, ctx, rng):
        put_image(ctx, "a.fit", 0.01 + 0.02 * rng.random((1, 32, 32)))
        process_command_line(ctx, "load a.fit")
        assert process_command_line(ctx, "autostretch") == 0
        assert process_command_line(ctx, "ght -D=1.5 -B=0.5") == 0
        assert process_command_line(ctx, "asinh 50") == 0


class TestScriptWorkflow:
    def test_mono_preprocessing_script(self, ctx, rng):
        """Full workflow: synthetic lights+masters → script → stacked result."""
        h, w = 192, 192
        yy, xx = np.mgrid[0:h, 0:w]
        scene = (0.05 + 0.002 * rng.random((h, w))).astype(np.float32)
        for _ in range(30):
            x, y = rng.uniform(25, w - 25), rng.uniform(25, h - 25)
            a = rng.uniform(0.2, 0.6)
            scene += (a * np.exp(-(((xx - x) ** 2 + (yy - y) ** 2) / 5.0))
                      ).astype(np.float32)
        bias = np.full((h, w), 0.02, np.float32)
        shifts = [(0, 0), (3, 2), (-2, 4), (5, -3), (-4, -2)]
        os.makedirs(os.path.join(ctx.cwd, "lights"))
        for i, (dx, dy) in enumerate(shifts):
            f = np.roll(np.roll(scene, dy, 0), dx, 1) + bias + \
                rng.normal(0, 0.002, (h, w)).astype(np.float32)
            put_image(ctx, f"lights/frame_{i + 1:05d}.fit",
                      np.clip(f, 0, 1)[None])
        put_image(ctx, "bias_stacked.fit", bias[None])

        # shaped like the official Mono_Preprocessing.ssf (subdir per type)
        script = os.path.join(ctx.cwd, "mono.ssf")
        with open(script, "w") as f:
            f.write("""requires 1.2.0
cd lights
link light
calibrate light -bias=../bias_stacked
register pp_light
stack r_pp_light rej 3 3 -norm=addscale -out=../result
cd ..
close
""")
        rc = execute_script(ctx, script)
        assert rc == 0
        result = os.path.join(ctx.cwd, "result.fit")
        assert os.path.exists(result)
        out = read_fits(result).host()[0]
        interior = np.s_[15:-15, 15:-15]
        err = np.abs(out[interior] - scene[interior]).mean()
        assert err < 0.01, f"stacked result deviates: {err}"

    def test_script_aborts_on_error(self, ctx):
        script = os.path.join(ctx.cwd, "bad.ssf")
        with open(script, "w") as f:
            f.write("load nonexistent_file\nstat\n")
        assert execute_script(ctx, script) == 1
