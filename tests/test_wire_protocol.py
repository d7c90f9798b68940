"""sirilpy wire protocol: an UNMODIFIED reference sirilpy client
(loaded from the read-only reference mount at test time, like the .ssf
scripts) connects to our socket server and exercises cmd /
get_image_pixeldata / set_image_pixeldata / stats / WCS — the round-1
VERDICT 'Done' criterion for the python bridge
(src/io/siril_pythonmodule.c / siril_pythonmodule.h:15).

Falls back to a raw-socket protocol test when the reference mount is
unavailable, so the suite stays self-contained.
"""

import os
import struct
import socket
import sys

import numpy as np
import pytest

from siril_tpu.cli.context import Session
from siril_tpu.core.image import SirilImage
from siril_tpu.pythonmodule.server import (
    CMD_GET_DIMENSIONS, CMD_GET_IS_IMAGE_LOADED, CMD_SEND_COMMAND,
    PythonCommandServer, STATUS_OK,
)

SIRILPY_DIR = "/root/reference/python_module"


def _mkimage(h=40, w=56):
    rng = np.random.default_rng(5)
    data = (0.2 + 0.5 * rng.random((3, h, w))).astype(np.float32)
    return SirilImage(data=data)


@pytest.fixture
def server(tmp_path):
    ctx = Session(cwd=str(tmp_path))
    ctx.set_image(_mkimage())
    srv = PythonCommandServer(ctx, socket_path=str(tmp_path / "sock"))
    srv.start()
    yield srv, ctx
    srv.stop()


def _raw_request(path, cmd, payload=b""):
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.connect(path)
    s.sendall(struct.pack("!Bi", cmd, len(payload)) + payload)
    hdr = b""
    while len(hdr) < 5:
        hdr += s.recv(5 - len(hdr))
    status, length = struct.unpack("!BI", hdr)
    data = b""
    while len(data) < length:
        data += s.recv(length - len(data))
    s.close()
    return status, data


def test_raw_protocol_roundtrip(server):
    srv, ctx = server
    status, data = _raw_request(srv.socket_path, CMD_GET_IS_IMAGE_LOADED)
    assert status == STATUS_OK
    assert struct.unpack("!i", data)[0] == 1
    status, data = _raw_request(srv.socket_path, CMD_GET_DIMENSIONS)
    assert status == STATUS_OK
    assert struct.unpack("!III", data) == (56, 40, 3)
    # a real command through the interpreter
    status, data = _raw_request(srv.socket_path, CMD_SEND_COMMAND, b"neg")
    assert status == STATUS_OK
    assert struct.unpack("!i", data)[0] == 0       # CMD_OK


def _sirilpy():
    if not os.path.isdir(SIRILPY_DIR):
        pytest.skip("reference sirilpy not available")
    if SIRILPY_DIR not in sys.path:
        sys.path.insert(0, SIRILPY_DIR)
    try:
        import sirilpy
    except Exception as e:
        pytest.skip(f"sirilpy import failed: {e}")
    return sirilpy


def test_unmodified_sirilpy_client(server, monkeypatch):
    """The reference client package connects and round-trips pixels."""
    srv, ctx = server
    sirilpy = _sirilpy()
    monkeypatch.setenv("MY_SOCKET", srv.socket_path)
    s = sirilpy.SirilInterface()
    s.connect()
    try:
        assert s.is_image_loaded()
        assert s.get_image_shape() == (3, 40, 56)

        # pixel fetch via SHM
        px = s.get_image_pixeldata()
        assert px.shape == (3, 40, 56)
        np.testing.assert_allclose(px, ctx.image.host(), atol=0)

        # run a command and observe the effect through the same client
        before = px[0, 0, 0]
        s.cmd("neg")
        px2 = s.get_image_pixeldata()
        np.testing.assert_allclose(px2[0, 0, 0], 1.0 - before, atol=1e-6)

        # pixel push via SHM
        new = np.full((3, 40, 56), 0.25, np.float32)
        s.set_image_pixeldata(new)
        np.testing.assert_allclose(ctx.image.host(), 0.25, atol=1e-6)

        # stats over the wire
        st = s.get_image_stats(0)
        assert st.median == pytest.approx(0.25, abs=1e-6)

        # working directory
        assert s.get_siril_wd() == os.path.abspath(ctx.cwd)

        # a failing command reports CommandError with a status code
        with pytest.raises(Exception):
            s.cmd("definitely_not_a_command")
    finally:
        s.disconnect()


def test_unmodified_sirilpy_region_and_selection(server, monkeypatch):
    srv, ctx = server
    sirilpy = _sirilpy()
    monkeypatch.setenv("MY_SOCKET", srv.socket_path)
    s = sirilpy.SirilInterface()
    s.connect()
    try:
        reg = s.get_image_pixeldata(shape=[4, 6, 10, 8])
        assert reg.shape == (3, 8, 10)
        np.testing.assert_allclose(reg, ctx.image.host()[:, 6:14, 4:14],
                                   atol=0)
        s.set_siril_selection(2, 3, 10, 12)
        assert tuple(s.get_siril_selection()) == (2, 3, 10, 12)
    finally:
        s.disconnect()


def test_unmodified_client_metadata_surface(server, monkeypatch):
    """Keywords / header / history / unknown keys / ICC / FFit core /
    config / log / bundle path / vport over the wire (opcodes 12-17,
    25, 31, 37, 85)."""
    srv, ctx = server
    sirilpy = _sirilpy()
    monkeypatch.setenv("MY_SOCKET", srv.socket_path)
    ctx.image.keywords.object = "M42"
    ctx.image.keywords.exposure = 120.0
    ctx.image.keywords.extra["MYKEY"] = 7
    ctx.image.log_history("test history line")
    s = sirilpy.SirilInterface()
    s.connect()
    try:
        kw = s.get_image_keywords()
        assert kw.object == "M42"
        assert kw.exposure == pytest.approx(120.0)

        hist = s.get_image_history()
        assert hist and "test history line" in hist[-1]

        keys = s.get_image_unknown_keys()
        assert "MYKEY" in keys

        icc = b"fake-icc-profile-bytes"
        s.set_image_iccprofile(icc)
        assert s.get_image_iccprofile() == icc

        fit = s.get_image(with_pixels=True)
        assert fit._naxes[0] == 56 and fit._naxes[1] == 40
        assert fit._data.shape == (3, 40, 56)
        assert fit.keywords.object == "M42"

        assert s.get_siril_config("core", "extension") is not None
        s.log("a log line")
        assert "a log line" in s.get_siril_log()
        assert isinstance(s._get_bundle_path(), str)
        assert s.get_siril_active_vport() is not None
    finally:
        s.disconnect()
    assert len(srv._shm) == 0, f"leaked segments: {list(srv._shm)}"


def test_unmodified_client_star_and_selection_surface(server, monkeypatch):
    """PSF stars, star-in-selection, stats-for-selection (opcodes 18,
    32, 33)."""
    srv, ctx = server
    sirilpy = _sirilpy()
    monkeypatch.setenv("MY_SOCKET", srv.socket_path)
    # plant a bright Gaussian star on a flat background
    h, w = 80, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    data = np.full((1, h, w), 0.1, np.float32)
    data[0] += 0.7 * np.exp(-(((xx - 48) ** 2 + (yy - 40) ** 2)
                              / (2 * 2.0 ** 2)))
    ctx.set_image(SirilImage(data=data))
    s = sirilpy.SirilInterface()
    s.connect()
    try:
        stars = s.get_image_stars(channel=0)
        assert stars and stars[0].fwhmx > 0
        assert stars[0].x0 == pytest.approx(48, abs=1.5)

        star = s.get_selection_star(shape=[36, 28, 24, 24], channel=0)
        assert star is not None and star.A > 0.2

        st = s.get_selection_stats(shape=[0, 0, 20, 20], channel=0)
        assert st.median == pytest.approx(0.1, abs=0.02)
    finally:
        s.disconnect()
    assert len(srv._shm) == 0


def test_unmodified_client_seq_surface(server, monkeypatch, tmp_path):
    """Sequence family: GET_SEQ (+imgdata/regdata/stats/disto),
    GET_SEQ_IMAGE, seq frame pixeldata get/set, frame filename/header,
    CREATE_NEW_SEQ (opcodes 19-24, 43, 50, 55, 63, 64)."""
    srv, ctx = server
    sirilpy = _sirilpy()
    monkeypatch.setenv("MY_SOCKET", srv.socket_path)
    from siril_tpu.io.fits_io import write_fits

    rng = np.random.default_rng(3)
    for i in range(4):
        img = SirilImage(data=rng.uniform(0.1, 0.5, (1, 16, 20))
                         .astype(np.float32))
        img.keywords.exposure = 10.0
        write_fits(img, str(tmp_path / f"sq_{i + 1:05d}.fit"),
                   bitdepth=-32)
    seq = ctx.load_sequence("sq_")
    reg = seq.reg(0)
    for k in range(4):
        reg.H[k] = np.eye(3)
        reg.valid[k] = True
        reg.quality[k] = 0.5 + 0.1 * k
    s = sirilpy.SirilInterface()
    s.connect()
    try:
        assert s.is_sequence_loaded()
        sq = s.get_seq()
        assert sq.number == 4 and sq.rx == 20 and sq.ry == 16
        assert sq.seqname.startswith("sq_")
        assert sq.imgparam[0].rx == 20
        assert sq.regparam[0][2].quality == pytest.approx(0.7)

        px = s.get_seq_frame_pixeldata(1)
        assert px.shape == (16, 20)

        fit = s.get_seq_frame(2, with_pixels=True)
        assert fit._data.shape == (16, 20)
        assert fit.keywords.exposure == pytest.approx(10.0)

        fn = s.get_seq_frame_filename(1)
        assert "sq_" in fn

        new = np.full((16, 20), 0.33, np.float32)
        s.set_seq_frame_pixeldata(0, new, prefix="pp_")
        assert (tmp_path / "pp_sq_00001.fit").exists()
        for i in range(1, 4):
            s.set_seq_frame_pixeldata(i, new, prefix="pp_")
        assert s.create_new_seq("pp_sq_")
    finally:
        s.disconnect()
    assert len(srv._shm) == 0


def test_unmodified_client_overlay_mask_bg_surface(server, monkeypatch):
    """BG samples, polygons, masks, plots, display state (opcodes 40,
    48-49, 57-61, 65, 73-83, 86-91)."""
    srv, ctx = server
    sirilpy = _sirilpy()
    monkeypatch.setenv("MY_SOCKET", srv.socket_path)
    s = sirilpy.SirilInterface()
    s.connect()
    try:
        with s.image_lock():
            s.set_image_bgsamples([(5.0, 6.0), (20.0, 22.0)])
        samples = s.get_image_bgsamples()
        assert len(samples) == 2
        assert samples[0].position == (5.0, 6.0)
        s.clear_image_bgsamples()
        assert s.get_image_bgsamples() is None

        poly = sirilpy.Polygon.from_rectangle((2, 3, 10, 8),
                                              color=0x11223344,
                                              legend="box")
        poly = s.overlay_add_polygon(poly)
        assert poly.polygon_id >= 1
        got = s.overlay_get_polygon(poly.polygon_id)
        assert got.legend == "box"
        assert len(s.overlay_get_polygons_list()) == 1
        s.overlay_delete_polygon(poly.polygon_id)
        assert s.overlay_get_polygons_list() is None or \
            len(s.overlay_get_polygons_list()) == 0

        mask = np.zeros((40, 56), np.float32)
        mask[10:20, 10:20] = 1.0
        with s.image_lock():
            s.set_image_mask(mask)
        got = s.get_image_mask()
        np.testing.assert_allclose(got, mask, atol=1e-6)
        s.set_image_mask_state(True)
        assert s.get_image_mask_state() is True
        s.mask_add_polygon(sirilpy.Polygon.from_rectangle((30, 30, 8, 6)))
        got2 = s.get_image_mask()
        assert got2[33, 33] > 0.5

        # plot submission (SIRIL_PLOT through shm)
        pd = sirilpy.PlotData(title="t")
        pd.add_series([1.0, 2.0, 3.0], [2.0, 4.0, 6.0], label="line")
        s.xy_plot(pd)

        # display state round-trips
        s.set_siril_slider_lohi(100, 50000)
        lo, hi, _mode = s.get_siril_slider_state()
        assert (lo, hi) == (100, 50000)
        s.set_siril_stf_linked(False)
        assert s.get_siril_stf_linked() is False
        s.set_siril_pan(3.0, 4.0)
        s.set_siril_zoom(2.0)
        assert s.get_siril_panzoom() == (3.0, 4.0, 2.0)
    finally:
        s.disconnect()
    assert len(srv._shm) == 0


def test_unmodified_client_file_surface(server, monkeypatch, tmp_path):
    """GET_IMAGE_FILE, SAVE_IMAGE_FILE, ANALYSE_IMAGE_FROM_FILE,
    SET_IMAGE_HEADER, messageboxes, undo surface (opcodes 36, 38-39,
    51-54, 56, 62, 67-72, 84, 86)."""
    srv, ctx = server
    sirilpy = _sirilpy()
    monkeypatch.setenv("MY_SOCKET", srv.socket_path)
    from siril_tpu.io.fits_io import write_fits

    disk = SirilImage(data=np.full((1, 12, 14), 0.4, np.float32))
    disk.keywords.object = "DISK"
    write_fits(disk, str(tmp_path / "ondisk.fit"), bitdepth=-32)
    s = sirilpy.SirilInterface()
    s.connect()
    try:
        fit = s.load_image_from_file(str(tmp_path / "ondisk.fit"))
        assert fit._naxes[:2] == (14, 12)
        assert fit._data.shape == (12, 14)
        assert fit.keywords.object == "DISK"
        assert fit.stats[0].median == pytest.approx(0.4, abs=1e-3)

        an = s.analyse_image_from_file(str(tmp_path / "ondisk.fit"))
        assert an.width == 14 and an.height == 12

        arr = np.full((10, 11), 0.2, np.float32)
        s.save_image_file(arr, header="OBJECT  = 'SAVED'",
                          filename=str(tmp_path / "saved.fit"))
        from siril_tpu.io.fits_io import read_fits

        back = read_fits(str(tmp_path / "saved.fit"))
        assert back.width == 11
        np.testing.assert_allclose(back.host()[0], 0.2, atol=1e-4)

        with s.image_lock():
            s.set_image_metadata_from_header_string(
                "TESTKEY =                   42")
        assert "TESTKEY" in s.get_image_unknown_keys()

        s.error_messagebox("an error")
        s.info_messagebox("some info")
        s.warning_messagebox("a warning")
        assert s.confirm_messagebox("t", "go ahead?", "OK") in (True,
                                                                False)

        s.undo_save_state("before neg")
        s.cmd("neg")
        s.undo()
        s.set_image_filename("renamed")
        assert s.get_image_filename() == "renamed"
        s.clear_undo_history()
    finally:
        s.disconnect()
    assert len(srv._shm) == 0


def test_pyscript_runs_wire_script(tmp_path):
    """`pyscript` spawns a subprocess that talks over $MY_SOCKET."""
    if not os.path.isdir(SIRILPY_DIR):
        pytest.skip("reference sirilpy not available")
    from siril_tpu.cli.parser import process_command_line
    from siril_tpu.io.fits_io import write_fits

    ctx = Session(cwd=str(tmp_path))
    ctx.set_image(_mkimage())
    script = tmp_path / "wire_script.py"
    script.write_text(f"""
import sys
sys.path.insert(0, {SIRILPY_DIR!r})
import numpy as np
import sirilpy
s = sirilpy.SirilInterface()
s.connect()
assert s.is_image_loaded()
px = s.get_image_pixeldata()
s.set_image_pixeldata((px * 0.5).astype(np.float32))
s.disconnect()
""")
    before = ctx.image.host().copy()
    process_command_line(ctx, "pyscript wire_script.py")
    np.testing.assert_allclose(ctx.image.host(), before * 0.5, atol=1e-6)


def test_client_releases_shm(server, tmp_path):
    """set/get_image_pixeldata must not leak server-side SHM segments
    (one image-sized /dev/shm block per call otherwise)."""
    import numpy as np

    from siril_tpu.core.image import SirilImage
    from siril_tpu.pythonmodule.client import SirilWireClient

    srv, ctx = server
    ctx.set_image(SirilImage(data=np.full((1, 8, 8), 0.25, np.float32)))
    cl = SirilWireClient(srv.socket_path)
    for _ in range(3):
        px = cl.get_image_pixeldata()
        cl.set_image_pixeldata(px * 0.5)
    cl.close()
    assert len(srv._shm) == 0, f"leaked segments: {list(srv._shm)}"
