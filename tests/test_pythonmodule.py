"""sirilpy-compatible interface tests."""

import os

import numpy as np
import pytest

from siril_tpu.cli.context import Session
from siril_tpu.core.image import FLOAT_IMG, SirilImage
from siril_tpu.io.fits_io import write_fits
from siril_tpu.pythonmodule import SirilError, SirilInterface


@pytest.fixture
def iface(tmp_path):
    s = SirilInterface(session=Session(cwd=str(tmp_path)))
    s.connect()
    return s


def put(iface, name, data):
    write_fits(SirilImage(data=np.asarray(data, np.float32)),
               os.path.join(iface.ctx.cwd, name), bitdepth=FLOAT_IMG)


class TestInterface:
    def test_cmd_and_pixeldata(self, iface, rng):
        put(iface, "a.fit", rng.random((1, 16, 16)))
        iface.cmd("load", "a.fit")
        d = iface.get_image_pixeldata()
        assert d.shape == (16, 16)
        iface.set_image_pixeldata(d * 0.5)
        np.testing.assert_allclose(iface.get_image_pixeldata(), d * 0.5)

    def test_stats(self, iface, rng):
        put(iface, "a.fit", 0.2 + 0.1 * rng.random((1, 32, 32)))
        iface.cmd("load", "a.fit")
        s = iface.get_image_stats()
        assert 0.2 < s.mean < 0.35
        assert s.total == 1024

    def test_shape_and_keywords(self, iface, rng):
        put(iface, "a.fit", rng.random((3, 8, 12)))
        iface.cmd("load", "a.fit")
        assert iface.get_image_shape() == (3, 8, 12)
        assert iface.get_image_keywords() is not None

    def test_error_without_image(self, iface):
        with pytest.raises(SirilError):
            iface.get_image_pixeldata()

    def test_wcs_roundtrip(self, iface, rng):
        import numpy as np

        from siril_tpu.ops.wcs import WCS

        put(iface, "a.fit", rng.random((1, 64, 64)))
        iface.cmd("load", "a.fit")
        iface.ctx.image.wcs = WCS(crpix=(32.5, 32.5), crval=(120.0, 30.0),
                                  cd=np.eye(2) * (2.0 / 3600), height=64)
        ra, dec = iface.pix2radec(31.5, 31.5)
        x, y = iface.radec2pix(ra, dec)
        assert x == pytest.approx(31.5, abs=1e-4)
        assert y == pytest.approx(31.5, abs=1e-4)

    def test_selection_and_mask(self, iface, rng):
        put(iface, "a.fit", rng.random((1, 8, 8)))
        iface.cmd("load", "a.fit")
        iface.set_selection(1, 2, 3, 4)
        assert iface.get_selection() == (1, 2, 3, 4)
        iface.set_image_mask(np.ones((8, 8), np.float32))
        assert iface.get_image_mask() is not None

    def test_pyscript_command(self, iface, rng):
        put(iface, "a.fit", np.full((1, 8, 8), 0.5))
        script = os.path.join(iface.ctx.cwd, "proc.py")
        with open(script, "w") as f:
            f.write(
                "siril.cmd('load', 'a.fit')\n"
                "d = siril.get_image_pixeldata()\n"
                "siril.set_image_pixeldata(d * 0.2)\n"
                "siril.cmd('save', 'out')\n")
        from siril_tpu.cli.parser import process_command_line

        assert process_command_line(iface.ctx, "pyscript proc.py") == 0
        from siril_tpu.io.fits_io import read_fits

        out = read_fits(os.path.join(iface.ctx.cwd, "out.fit"))
        np.testing.assert_allclose(out.host(), 0.1, atol=1e-6)
