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


def test_extended_interface(tmp_path):
    """sirilpy surface extensions: frames, bgsamples, polygons, plots,
    selection stats, header import, log buffer."""
    import os

    from siril_tpu.pythonmodule.connection import SirilInterface

    rng = np.random.default_rng(2)
    s = SirilInterface()
    s.connect(str(tmp_path))
    # create a small sequence on disk through the file helpers
    imgs = []
    for i in range(3):
        img = SirilImage(data=rng.uniform(0.1, 0.6, (1, 32, 32))
                         .astype(np.float32))
        s.save_image_file(img, f"py_{i + 1:05d}.fit", bitdepth=16)
        imgs.append(img)
    seq = s.create_new_seq("pyseq", [f"py_{i + 1:05d}.fit"
                                     for i in range(3)])
    assert s.get_seq_frame_count() == 3
    assert s.get_seq_frame_filename(0).endswith("py_00001.fit")
    assert s.get_seq_imgdata(1)["incl"]
    # frame pixel write-back
    newdata = np.full((32, 32), 0.25, np.float32)
    s.set_seq_frame_pixeldata(1, newdata)
    back = s.get_seq_frame_pixeldata(1)
    assert abs(float(back.mean()) - 0.25) < 1e-3

    s.cmd("load", "py_00001.fit")
    assert s.is_image_loaded()
    s.set_selection(4, 4, 16, 16)
    st = s.get_selection_stats(0)
    assert 0.05 < st.median < 0.7
    # header string import
    s.set_image_metadata_from_header_string("MYKEY = 7 / comment")
    assert s.get_image_keywords().extra["MYKEY"] == 7
    assert "MYKEY" in s.get_image_unknown_keys()
    # bg samples + polygons
    s.set_image_bgsamples([(4, 4), (20, 20)])
    assert len(s.get_image_bgsamples()) == 2
    s.clear_image_bgsamples()
    assert s.get_image_bgsamples() == []
    s.mask_add_polygon([(2, 2), (30, 2), (30, 30), (2, 30)])
    m = s.get_image_mask()
    assert m is not None and m[16, 16] == 1.0 and m[0, 0] == 0.0
    s.mask_subtract_polygon([(10, 10), (22, 10), (22, 22), (10, 22)])
    assert s.get_image_mask()[16, 16] == 0.0
    # plots
    assert s.xy_plot({"x": [1, 2, 3], "y": [2, 4, 9], "title": "t"})
    assert any(f.startswith("plot_") and f.endswith(".dat")
               for f in os.listdir(tmp_path))
    # log buffer
    s.log("hello-from-test")
    assert any("hello-from-test" in ln for ln in s.get_siril_log(10))
    # display-state holders round-trip
    s.set_siril_zoom(2.0)
    assert s.get_siril_panzoom()[2] == 2.0
    s.set_siril_stf_linked(False)
    assert not s.get_siril_stf_linked()
    # messageboxes auto-acknowledge headless
    assert s.confirm_messagebox("t", "m")
    # analyse from file
    info = s.analyse_image_from_file("py_00002.fit")
    assert info["shape"] == (1, 32, 32)


def test_pyscript_sibling_import_and_utf8(tmp_path):
    """pyscript scripts can import modules next to them and may contain
    non-ASCII source (UTF-8 read in the bootstrap)."""
    import os

    from siril_tpu.cli.context import Session
    from siril_tpu.cli.parser import process_command_line

    ctx = Session(cwd=str(tmp_path))
    with open(tmp_path / "helper.py", "w") as f:
        f.write("VALUE = 41\n")
    with open(tmp_path / "main.py", "w", encoding="utf-8") as f:
        f.write("# résumé: sibling import test — 2°\n"
                "import helper\n"
                "siril.log(f'value {helper.VALUE + 1}')\n")
    assert process_command_line(ctx, "pyscript main.py") == 0
