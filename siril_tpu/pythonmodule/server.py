"""sirilpy wire protocol server — socket + shared-memory pixel transfer.

Byte-compatible with the reference's Python bridge
(``src/io/siril_pythonmodule.c`` / ``.h:15+``): an **unmodified**
``sirilpy`` client (reference python_module/sirilpy/) connects to the
AF_UNIX socket named by ``$MY_SOCKET`` and speaks:

  request  = header ``!Bi`` (command u8, payload length i32) + payload
  response = header ``!BI`` (status u8, payload length u32) + payload
  status   = 0 OK, 1 NONE ("allowed failure"), 0xFF ERROR

Pixel data crosses in POSIX shared memory: the server creates a segment,
fills it (GET_PIXELDATA*) or lets the client fill it (REQUEST_SHM →
SET_PIXELDATA with a ``!IIIIQ256s`` descriptor), and replies with the
native-endian ``_SharedMemoryInfo`` struct {size_t size; int data_type,
width, height, channels; char shm_name[256]} the client ctypes-parses.
RELEASE_SHM unlinks.

The opcode semantics are delegated to the in-process
``pythonmodule.connection.SirilInterface`` (the same Session backend the
CLI uses), so every command the script runs lands in the same state.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
from multiprocessing import shared_memory
from typing import Dict, Optional

import numpy as np

# opcodes (siril_pythonmodule.h:15-110)
CMD_SEND_COMMAND = 1
CMD_LOG_MESSAGE = 2
CMD_UPDATE_PROGRESS = 3
CMD_GET_WORKING_DIRECTORY = 4
CMD_GET_FILENAME = 5
CMD_GET_DIMENSIONS = 6
CMD_GET_PIXELDATA = 7
CMD_GET_PIXELDATA_REGION = 8
CMD_RELEASE_SHM = 9
CMD_SET_PIXELDATA = 10
CMD_GET_IMAGE_STATS = 11
CMD_GET_KEYWORDS = 12
CMD_GET_FITS_HEADER = 14
CMD_GET_FITS_HISTORY = 15
CMD_GET_SEQ = 24
CMD_GET_CONFIG = 25
CMD_GET_USERCONFIG_DIR = 26
CMD_GET_IS_IMAGE_LOADED = 27
CMD_GET_IS_SEQUENCE_LOADED = 28
CMD_GET_SELECTION = 29
CMD_SET_SELECTION = 30
CMD_PIX2WCS = 34
CMD_WCS2PIX = 35
CMD_UNDO_SAVE_STATE = 36
CMD_CLAIM_THREAD = 41
CMD_RELEASE_THREAD = 42
CMD_SEQ_FRAME_SET_PIXELDATA = 43
CMD_REQUEST_SHM = 44
CMD_SET_SEQ_FRAME_INCL = 45
CMD_GET_USERDATA_DIR = 46
CMD_GET_SYSTEMDATA_DIR = 47
CMD_GET_SEQ_FRAME_FILENAME = 50
CMD_SET_IMAGE_FILENAME = 84
CMD_GET_SIRIL_LOG = 85
CMD_GET_IMAGE_MASK = 87
CMD_SET_IMAGE_MASK = 88
CMD_UNDO = 69
CMD_REDO = 70

STATUS_OK = 0
STATUS_NONE = 1
STATUS_ERROR = 0xFF

# CommandStatus codes (sirilpy enums: CMD_OK=0, CMD_GENERIC_ERROR=1<<7)
CMD_OK = 0
CMD_GENERIC_ERROR = 1 << 7

_SHM_INFO = struct.Struct("@Niiii256s")   # native _SharedMemoryInfo


def _pack_shm_info(size: int, data_type: int, width: int, height: int,
                   channels: int, name: str) -> bytes:
    return _SHM_INFO.pack(size, data_type, width, height, channels,
                          name.encode())


class PythonCommandServer:
    """AF_UNIX server accepting reference-sirilpy connections."""

    def __init__(self, session=None, socket_path: Optional[str] = None):
        from siril_tpu.pythonmodule.connection import SirilInterface

        self.iface = SirilInterface(session)
        self.socket_path = socket_path or os.path.join(
            os.environ.get("XDG_RUNTIME_DIR", "/tmp"),
            f"siril_tpu_{os.getpid()}.sock")
        self._srv: Optional[socket.socket] = None
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._shm: Dict[str, shared_memory.SharedMemory] = {}
        self._counter = 0

    # ------------------------------------------------------------------
    def start(self) -> str:
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)
        self._srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._srv.bind(self.socket_path)
        self._srv.listen(4)
        self._srv.settimeout(0.25)
        self._stop.clear()
        self._thread = threading.Thread(target=self._accept_loop,
                                        daemon=True)
        self._thread.start()
        return self.socket_path

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=3.0)
        if self._srv:
            self._srv.close()
            self._srv = None
        for shm in list(self._shm.values()):
            try:
                shm.close()
                shm.unlink()
            except Exception:
                pass
        self._shm.clear()
        try:
            os.unlink(self.socket_path)
        except OSError:
            pass

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    # ------------------------------------------------------------------
    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            t = threading.Thread(target=self._serve, args=(conn,),
                                 daemon=True)
            t.start()

    def _serve(self, conn: socket.socket):
        conn.settimeout(None)
        try:
            while not self._stop.is_set():
                hdr = self._recv_exact(conn, 5)
                if hdr is None:
                    return
                cmd, length = struct.unpack("!Bi", hdr)
                payload = b""
                if length > 0:
                    payload = self._recv_exact(conn, length)
                    if payload is None:
                        return
                try:
                    status, data = self._dispatch(cmd, payload)
                except Exception as e:  # handler fault → protocol error
                    status, data = STATUS_ERROR, str(e).encode()
                conn.sendall(struct.pack("!BI", status, len(data)) + data)
        finally:
            conn.close()

    @staticmethod
    def _recv_exact(conn, n: int) -> Optional[bytes]:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    # ------------------------------------------------------------------
    def _new_shm(self, size: int) -> shared_memory.SharedMemory:
        self._counter += 1
        name = f"siril_tpu_{os.getpid()}_{self._counter}"
        shm = shared_memory.SharedMemory(name=name, create=True, size=size)
        self._shm[name] = shm
        return shm

    def _release_shm(self, name: str) -> None:
        shm = self._shm.pop(name.lstrip("/"), None)
        if shm is not None:
            try:
                shm.close()
                shm.unlink()
            except Exception:
                pass

    # ------------------------------------------------------------------
    def _dispatch(self, cmd: int, payload: bytes):
        fn = self._HANDLERS.get(cmd)
        if fn is None:
            return STATUS_ERROR, b"not implemented"
        return fn(self, payload)

    # ---- handlers ----
    def _h_send_command(self, payload):
        try:
            self.iface.cmd(*payload.decode("utf-8").split())
            code = CMD_OK
        except Exception as e:
            from siril_tpu.utils.log import log_error

            log_error(f"python command failed: {e}")
            code = CMD_GENERIC_ERROR
        return STATUS_OK, struct.pack("!i", code)

    def _h_log(self, payload):
        # first byte is the LogColor
        msg = payload[1:].decode("utf-8", "replace").rstrip("\n")
        self.iface.log(msg)
        return STATUS_OK, b""

    def _h_progress(self, payload):
        return STATUS_OK, b""

    def _h_wd(self, payload):
        return STATUS_OK, os.path.abspath(self.iface.ctx.cwd).encode() + b"\0"

    def _h_filename(self, payload):
        name = self.iface.get_image_filename()
        if not name:
            return STATUS_NONE, b""
        return STATUS_OK, name.encode() + b"\0"

    def _h_dims(self, payload):
        if not self.iface.is_image_loaded():
            return STATUS_NONE, b""
        c, h, w = self.iface.get_image_shape()
        return STATUS_OK, struct.pack("!III", w, h, c)

    def _h_get_pixeldata(self, payload):
        if not self.iface.is_image_loaded():
            return STATUS_ERROR, b"no image loaded"
        img = self.iface.ctx.image
        data = img.host()
        region = None
        if len(payload) >= 2 + 16:
            x, y, w, h = struct.unpack("!IIII", payload[2:18])
            region = (x, y, w, h)
        preview = len(payload) >= 1 and payload[0:1] == b"\x01"
        if region:
            x, y, w, h = region
            data = data[:, y:y + h, x:x + w]
        c, h, w = data.shape
        if preview:
            arr = np.clip(data * 255.0, 0, 255).astype(np.uint8)
            dtype_code = 0
        else:
            arr = np.ascontiguousarray(data, np.float32)
            dtype_code = 1
        shm = self._new_shm(arr.nbytes)
        shm.buf[:arr.nbytes] = arr.tobytes()
        return STATUS_OK, _pack_shm_info(arr.nbytes, dtype_code, w, h, c,
                                         shm.name)

    def _h_release_shm(self, payload):
        # payload = native _SharedMemoryInfo; the name is the last 256 B
        if len(payload) >= 256:
            name = payload[-256:].split(b"\0")[0].decode("utf-8", "replace")
            self._release_shm(name)
        return STATUS_OK, b""

    def _h_request_shm(self, payload):
        (size,) = struct.unpack("!Q", payload)
        shm = self._new_shm(int(size))
        return STATUS_OK, _pack_shm_info(int(size), 1, 0, 0, 0, shm.name)

    def _h_set_pixeldata(self, payload):
        width, height, channels, dtype_code, size, name = struct.unpack(
            "!IIIIQ256s", payload)
        name = name.split(b"\0")[0].decode("utf-8", "replace").lstrip("/")
        shm = self._shm.get(name)
        opened_here = False
        if shm is None:
            shm = shared_memory.SharedMemory(name=name)
            opened_here = True
        try:
            dtype = np.float32 if dtype_code == 1 else np.uint16
            arr = np.frombuffer(bytes(shm.buf[:size]), dtype=dtype)
            arr = arr.reshape((channels, height, width) if channels > 1
                              else (height, width))
            if arr.ndim == 2:
                arr = arr[None]
            if dtype == np.uint16:
                arr = arr.astype(np.float32) / 65535.0
            self.iface.set_image_pixeldata(np.ascontiguousarray(arr))
        finally:
            if opened_here:
                shm.close()
        return STATUS_OK, b""

    def _h_stats(self, payload):
        (channel,) = struct.unpack("!I", payload)
        st = self.iface.get_image_stats(int(channel))
        return STATUS_OK, struct.pack(
            "!2q12d", int(st.total), int(st.ngoodpix), st.mean, st.median,
            st.sigma, st.avgdev, st.mad, st.sqrtbwmv,
            getattr(st, "location", 0.0), getattr(st, "scale", 0.0),
            st.min, st.max, getattr(st, "normvalue", 1.0),
            getattr(st, "bgnoise", 0.0))

    def _h_is_image(self, payload):
        return STATUS_OK, struct.pack(
            "!i", 1 if self.iface.is_image_loaded() else 0)

    def _h_is_seq(self, payload):
        return STATUS_OK, struct.pack(
            "!i", 1 if self.iface.is_sequence_loaded() else 0)

    def _h_get_selection(self, payload):
        sel = self.iface.get_selection()
        if not sel:
            return STATUS_NONE, b""
        x, y, w, h = sel
        return STATUS_OK, struct.pack("!IIII", int(x), int(y), int(w), int(h))

    def _h_set_selection(self, payload):
        x, y, w, h = struct.unpack("!IIII", payload)
        self.iface.set_selection(x, y, w, h)
        return STATUS_OK, b""

    def _h_pix2wcs(self, payload):
        x, y = struct.unpack("!2d", payload)
        if not self.iface.is_image_loaded():
            return STATUS_ERROR, b"no image loaded"
        if not self.iface.has_wcs():
            return STATUS_ERROR, b"image is not plate solved"
        ra, dec = self.iface.pix2radec(x, y)
        return STATUS_OK, struct.pack("!2d", ra, dec)

    def _h_wcs2pix(self, payload):
        ra, dec = struct.unpack("!2d", payload)
        if not self.iface.is_image_loaded():
            return STATUS_ERROR, b"no image loaded"
        if not self.iface.has_wcs():
            return STATUS_ERROR, b"image is not plate solved"
        x, y = self.iface.radec2pix(ra, dec)
        return STATUS_OK, struct.pack("!2d", x, y)

    def _h_undo_save(self, payload):
        self.iface.undo_save_state(payload.decode("utf-8", "replace")
                                   .rstrip("\0") or "python script")
        return STATUS_OK, b""

    def _h_claim(self, payload):
        # single-process engine: the processing thread is free unless a
        # job is running (processing_thread.c:527 semantics)
        return STATUS_OK, b""

    def _h_release(self, payload):
        return STATUS_OK, b""

    def _h_header(self, payload):
        hdr = self.iface.get_image_header()
        if not hdr:
            return STATUS_NONE, b""
        return STATUS_OK, hdr.encode() + b"\0"

    def _h_history(self, payload):
        hist = self.iface.get_image_history()
        if not hist:
            return STATUS_NONE, b""
        return STATUS_OK, ("\n".join(hist)).encode() + b"\0"

    def _h_userconfig_dir(self, payload):
        base = os.environ.get("XDG_CONFIG_HOME",
                              os.path.expanduser("~/.config"))
        return STATUS_OK, base.encode() + b"\0"

    def _h_userdata_dir(self, payload):
        base = os.environ.get("XDG_DATA_HOME",
                              os.path.expanduser("~/.local/share"))
        return STATUS_OK, base.encode() + b"\0"

    def _h_none(self, payload):
        return STATUS_NONE, b""

    def _h_set_seq_frame_incl(self, payload):
        frame, incl = struct.unpack("!Ii", payload[:8])
        self.iface.set_seq_frame_incl(int(frame), bool(incl))
        return STATUS_OK, b""

    def _h_undo(self, payload):
        self.iface.undo()
        return STATUS_OK, b""

    _HANDLERS = {
        CMD_SEND_COMMAND: _h_send_command,
        CMD_LOG_MESSAGE: _h_log,
        CMD_UPDATE_PROGRESS: _h_progress,
        CMD_GET_WORKING_DIRECTORY: _h_wd,
        CMD_GET_FILENAME: _h_filename,
        CMD_GET_DIMENSIONS: _h_dims,
        CMD_GET_PIXELDATA: _h_get_pixeldata,
        CMD_GET_PIXELDATA_REGION: _h_get_pixeldata,
        CMD_RELEASE_SHM: _h_release_shm,
        CMD_SET_PIXELDATA: _h_set_pixeldata,
        CMD_GET_IMAGE_STATS: _h_stats,
        CMD_GET_FITS_HEADER: _h_header,
        CMD_GET_FITS_HISTORY: _h_history,
        CMD_GET_CONFIG: _h_none,
        CMD_GET_USERCONFIG_DIR: _h_userconfig_dir,
        CMD_GET_IS_IMAGE_LOADED: _h_is_image,
        CMD_GET_IS_SEQUENCE_LOADED: _h_is_seq,
        CMD_GET_SELECTION: _h_get_selection,
        CMD_SET_SELECTION: _h_set_selection,
        CMD_PIX2WCS: _h_pix2wcs,
        CMD_WCS2PIX: _h_wcs2pix,
        CMD_UNDO_SAVE_STATE: _h_undo_save,
        CMD_CLAIM_THREAD: _h_claim,
        CMD_RELEASE_THREAD: _h_release,
        CMD_REQUEST_SHM: _h_request_shm,
        CMD_SET_SEQ_FRAME_INCL: _h_set_seq_frame_incl,
        CMD_GET_USERDATA_DIR: _h_userdata_dir,
        CMD_GET_SYSTEMDATA_DIR: _h_userdata_dir,
        CMD_GET_SIRIL_LOG: _h_none,
        CMD_UNDO: _h_undo,
    }


def run_python_script(script_path: str, session, args=None,
                      timeout: Optional[float] = None) -> int:
    """``pyscript`` command backend: start the wire server, spawn the
    script with $MY_SOCKET set (the reference's venv bootstrap is
    replaced by the current interpreter), wait for completion."""
    import subprocess
    import sys

    with PythonCommandServer(session) as srv:
        env = dict(os.environ)
        env["MY_SOCKET"] = srv.socket_path
        # bootstrap: run the user script with a ``siril`` wire client
        # pre-injected (scripts may also ``import sirilpy`` themselves —
        # the reference package reads the same $MY_SOCKET)
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        script_dir = os.path.dirname(os.path.abspath(script_path)) or "."
        boot = (
            "import sys; sys.path.insert(0, %r)\n"
            "sys.path.insert(0, %r)\n"   # script dir: sibling imports
            "from siril_tpu.pythonmodule.client import SirilWireClient\n"
            "siril = SirilWireClient()\n"
            "import builtins\n"
            "builtins.siril = siril\n"
            "sys.argv = [%r] + sys.argv[1:]\n"
            "exec(compile(open(%r, encoding='utf-8').read(), %r, 'exec'),"
            " {'siril': siril, '__name__': '__main__', '__file__': %r})\n"
            % (repo_root, script_dir, script_path, script_path, script_path,
               script_path)
        )
        proc = subprocess.run(
            [sys.executable, "-c", boot] + list(args or []),
            env=env, timeout=timeout)
        return proc.returncode
