"""Native (C++) I/O kernels, compiled on demand and loaded via ctypes.

The reference keeps its hot loops in C/C++ (cfitsio conversions, OpenMP
block assembly); this package is the equivalent: ``native/sirilio.cpp``
is built once with g++ -O3 -fopenmp into a cached .so.  Everything has a
numpy fallback, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "sirilio.cpp")


def _compile_so(src: str, prefix: str) -> Optional[ctypes.CDLL]:
    """Digest-keyed g++ build → CDLL.  Compiles to a temp path and
    os.replace()s into place so a timeout/kill mid-link can never pin a
    corrupt .so under the final name (the digest wouldn't change, so it
    would otherwise never be rebuilt)."""
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.expanduser("~/.cache/siril_tpu_native")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"{prefix}_{digest}.so")
    if not os.path.exists(so):
        tmp = os.path.join(cache, f".{prefix}_{digest}_{os.getpid()}.tmp")
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
               "-fPIC", src, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
            os.replace(tmp, so)
        except (subprocess.CalledProcessError, OSError,
                subprocess.TimeoutExpired):
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    try:
        return ctypes.CDLL(so)
    except OSError:
        return None


def _build_and_load() -> Optional[ctypes.CDLL]:
    lib = _compile_so(_SRC, "sirilio")
    if lib is None:
        return None
    # signatures
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.decode_i16_be.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_double, ctypes.c_double,
                                  ctypes.c_int]
    lib.decode_f32_be.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int]
    lib.decode_u16_le.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_double]
    lib.assemble_block_i16.argtypes = [
        ctypes.POINTER(u8p), f32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, i32p,
        ctypes.c_double, ctypes.c_double]
    lib.sirilio_version.restype = ctypes.c_int
    lib.sirilio_threads.restype = ctypes.c_int
    i64 = ctypes.c_int64
    i64p = ctypes.POINTER(i64)
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.rice_encode_tile.argtypes = [i64p, i64, ctypes.c_int, u8p, i64]
    lib.rice_encode_tile.restype = i64
    lib.rice_decode_tile.argtypes = [u8p, i64, i64, ctypes.c_int, i64p]
    lib.rice_encode_tiles_i16.argtypes = [i16p, i64, i64, u8p, i64, i64p,
                                          i64p]
    lib.rice_encode_tiles_i16.restype = i64
    lib.rice_decode_tiles_i16.argtypes = [u8p, i64p, i64p, i64, i64, i16p]
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.decode_ljpeg.argtypes = [u8p, i64, u16p, i64, i32p, i32p, i32p]
    lib.decode_ljpeg.restype = ctypes.c_int
    lib.decode_nikon.argtypes = [u8p, i64, ctypes.c_int32, ctypes.c_int32,
                                 ctypes.c_int32, u16p, ctypes.c_int32, u16p]
    lib.decode_nikon.restype = ctypes.c_int
    lib.stack_winsorized.argtypes = [f32p, i64, i64, f32p, f32p,
                                     ctypes.c_float, ctypes.c_float, f32p]
    lib.decode_panasonic.argtypes = [u8p, i64, ctypes.c_int32,
                                     ctypes.c_int32, ctypes.c_int32, u16p]
    lib.decode_panasonic.restype = ctypes.c_int
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("SIRIL_TPU_NO_NATIVE"):
            _LIB = None
        else:
            _LIB = _build_and_load()
    return _LIB


def available() -> bool:
    return get_lib() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_i16_be(raw: np.ndarray, w: int, h: int, bzero: float,
                  bscale: float, flip: bool) -> np.ndarray:
    """raw: contiguous uint8 view of big-endian i16 (h*w values)."""
    lib = get_lib()
    out = np.empty(h * w, np.float32)
    if lib is None:
        v = raw.view(">i2").astype(np.float32) * np.float32(bscale) + \
            np.float32(bzero)
        out = (v * np.float32(1 / 65535.0)).reshape(h, w)
        return out[::-1].copy() if flip else out
    lib.decode_i16_be(_u8ptr(raw), _f32ptr(out), w, h, bzero, bscale,
                      1 if flip else 0)
    return out.reshape(h, w)


def decode_f32_be(raw: np.ndarray, w: int, h: int, flip: bool) -> np.ndarray:
    lib = get_lib()
    out = np.empty(h * w, np.float32)
    if lib is None:
        v = raw.view(">f4").astype(np.float32).reshape(h, w)
        return v[::-1].copy() if flip else v
    lib.decode_f32_be(_u8ptr(raw), _f32ptr(out), w, h, 1 if flip else 0)
    return out.reshape(h, w)


def assemble_block_i16(raw_planes, dst: np.ndarray, w: int, h: int,
                       y0: int, y1: int, dx: np.ndarray, dy: np.ndarray,
                       bzero: float, bscale: float) -> bool:
    """Fill dst (N, (y1-y0)*w) from N raw big-endian-i16 planes with
    per-frame shifts.  Returns False if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    n = len(raw_planes)
    arr = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[_u8ptr(p) for p in raw_planes])
    lib.assemble_block_i16(
        arr, _f32ptr(dst), n, w, h, y0, y1,
        dx.astype(np.int32).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dy.astype(np.int32).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bzero, bscale)
    return True


def rice_encode_tiles_i16(data: np.ndarray):
    """Batch RICE-encode [ntiles, tile_pix] int16 rows (native, OpenMP).
    Returns (heap_bytes, offsets, lengths) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(data, np.int16)
    ntiles, tile_pix = d.shape
    cap = int(d.nbytes * 2 + ntiles * 64)
    heap = np.empty(cap, np.uint8)
    offsets = np.empty(ntiles, np.int64)
    lengths = np.empty(ntiles, np.int64)
    total = lib.rice_encode_tiles_i16(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ntiles, tile_pix,
        heap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if total < 0:
        return None
    return heap[:total].tobytes(), offsets, lengths


def rice_decode_tiles_i16(heap: bytes, offsets: np.ndarray,
                          lengths: np.ndarray, tile_pix: int):
    lib = get_lib()
    if lib is None:
        return None
    hb = np.frombuffer(heap, np.uint8)
    ntiles = len(offsets)
    out = np.empty((ntiles, tile_pix), np.int16)
    lib.rice_decode_tiles_i16(
        hb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.ascontiguousarray(offsets, np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        np.ascontiguousarray(lengths, np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        ntiles, tile_pix,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return out


def stack_winsorized(stack: np.ndarray, scale: np.ndarray,
                     offset: np.ndarray, siglow: float, sighigh: float):
    """Native OpenMP winsorized rejection + mean over an (N, P) f32
    stack — the CPU-baseline twin of the reference's hottest loop
    (mean_and_reject, median_and_mean.c:956).  Returns (P,) f32 or None
    when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    s = np.ascontiguousarray(stack, np.float32)
    n, p = s.shape
    out = np.empty(p, np.float32)
    lib.stack_winsorized(_f32ptr(s), n, p,
                         _f32ptr(np.ascontiguousarray(scale, np.float32)),
                         _f32ptr(np.ascontiguousarray(offset, np.float32)),
                         float(siglow), float(sighigh), _f32ptr(out))
    return out


def decode_nikon(data: bytes, width: int, height: int, tree: int,
                 vpred: np.ndarray, split: int):
    """Nikon-compressed NEF strip → (height, width) pre-curve uint16,
    or None when the native library is unavailable or decode fails."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(height * width, np.uint16)
    vp = np.ascontiguousarray(vpred, np.uint16)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    rc = lib.decode_nikon(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        width, height, tree, vp.ctypes.data_as(u16p), split,
        out.ctypes.data_as(u16p))
    if rc != 0:
        return None
    return out.reshape(height, width)


def decode_ljpeg(data: bytes):
    """Lossless-JPEG (SOF3) decode → (array[h, w·ncomp] u16, ncomp),
    or None when the native library is unavailable or decode fails."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    # upper bound from SOF3 header scan done in C; allocate generously by
    # parsing dims here (cheap): find FFC3
    i = data.find(b"\xff\xc3")
    if i < 0 or i + 8 > len(data):
        return None
    h = int.from_bytes(data[i + 5:i + 7], "big")
    w = int.from_bytes(data[i + 7:i + 9], "big")
    nc = data[i + 9]
    out = np.empty(h * w * nc, np.uint16)
    ow = ctypes.c_int32()
    oh = ctypes.c_int32()
    onc = ctypes.c_int32()
    rc = lib.decode_ljpeg(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), out.size,
        ctypes.byref(ow), ctypes.byref(oh), ctypes.byref(onc))
    if rc != 0:
        return None
    return out.reshape(oh.value, ow.value * onc.value), onc.value


# ---------------------------------------------------------------------------
# e2e CPU twin (benchmark-only; native/cpu_twin.cpp)
# ---------------------------------------------------------------------------

_TWIN_LIB = None
_TWIN_TRIED = False
_TWIN_SRC = os.path.join(os.path.dirname(_SRC), "cpu_twin.cpp")


def get_twin_lib() -> Optional[ctypes.CDLL]:
    """Build/load the native e2e CPU-twin library (scripts/
    measure_cpu_baseline.py only — not a runtime dependency)."""
    global _TWIN_LIB, _TWIN_TRIED
    if _TWIN_TRIED:
        return _TWIN_LIB
    _TWIN_TRIED = True
    lib = _compile_so(_TWIN_SRC, "cpu_twin")
    if lib is None:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.twin_decode_i16.argtypes = [ctypes.POINTER(ctypes.c_int16), f32p,
                                    i64]
    lib.twin_e2e.argtypes = [f32p, i64, i64, i64, f32p, f32p, f32p,
                             ctypes.c_float, ctypes.c_float, f32p,
                             ctypes.POINTER(ctypes.c_double)]
    lib.twin_e2e.restype = ctypes.c_int
    lib.twin_threads.restype = ctypes.c_int
    _TWIN_LIB = lib
    return lib


def twin_e2e(frames: np.ndarray, bias: np.ndarray, dark: np.ndarray,
             flat: np.ndarray, siglow: float = 3.0, sighigh: float = 3.0):
    """Run the native e2e twin chain over resident f32 frames
    [n, H, W] (MUTATED in place).  Returns (stacked [H, W], stage_s[6])
    or None if the twin library is unavailable."""
    lib = get_twin_lib()
    if lib is None:
        return None
    n, h, w = frames.shape
    frames = np.ascontiguousarray(frames, np.float32)
    out = np.empty(h * w, np.float32)
    stages = np.zeros(6, np.float64)
    lib.twin_e2e(_f32ptr(frames), n, h, w,
                 _f32ptr(np.ascontiguousarray(bias, np.float32)),
                 _f32ptr(np.ascontiguousarray(dark, np.float32)),
                 _f32ptr(np.ascontiguousarray(flat, np.float32)),
                 siglow, sighigh, _f32ptr(out),
                 stages.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out.reshape(h, w), stages


def decode_panasonic(data: bytes, width: int, height: int,
                     load_flags: int = 0x2008):
    """Panasonic RW2 v4 bitstream → u16 [h, w], or None when the native
    library is unavailable (io/rawfile.py falls back to the Python
    decoder)."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(height * width, np.uint16)
    rc = lib.decode_panasonic(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        width, height, load_flags,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    if rc != 0:
        return None
    return out.reshape(height, width)
