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
