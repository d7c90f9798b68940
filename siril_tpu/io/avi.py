"""Uncompressed AVI container I/O — equivalents of the reference's
``src/io/avi_pipp/`` (PIPP-derived AVI writer used for sequence export)
and the ffms2 film import (``src/io/films.c``) for the uncompressed-DIB
case.  RIFF/AVI with '00db' frames (BGR24 bottom-up or 8-bit grey),
idx1 index for random access — no external codec dependencies.
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\0" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


class AviWriter:
    """Minimal uncompressed AVI writer (avi_pipp equivalent)."""

    def __init__(self, path: str, width: int, height: int,
                 fps: float = 25.0, color: bool = True):
        self.path = path
        self.w = width
        self.h = height
        self.fps = fps
        self.color = color
        self._frames: List[bytes] = []

    def add_frame(self, img: SirilImage) -> None:
        u8 = img.to_u8()
        if self.color:
            if u8.shape[0] == 1:
                u8 = np.repeat(u8, 3, axis=0)
            # BGR24 rows bottom-up, 4-byte aligned
            bgr = np.stack([u8[2], u8[1], u8[0]], axis=-1)[::-1]
            row = bgr.reshape(self.h, -1)
        else:
            row = u8[0][::-1]
        stride = (row.shape[1] + 3) & ~3
        if stride != row.shape[1]:
            padded = np.zeros((self.h, stride), np.uint8)
            padded[:, : row.shape[1]] = row
            row = padded
        self._frames.append(row.tobytes())

    def close(self) -> None:
        n = len(self._frames)
        bpp = 24 if self.color else 8
        frame_size = len(self._frames[0]) if self._frames else 0
        usec = int(1_000_000 / max(self.fps, 1e-3))
        avih = struct.pack("<14I", usec, frame_size * int(self.fps), 0,
                           0x10, n, 0, 1, frame_size, self.w, self.h,
                           0, 0, 0, 0)
        strh = (b"vids" + b"DIB " + struct.pack("<I", 0)
                + struct.pack("<IIIII", 0, 0, 0, 1, int(self.fps))
                + struct.pack("<IIIi", 0, n, frame_size, -1)
                + struct.pack("<I", 0) + struct.pack("<4H", 0, 0,
                                                     self.w, self.h))
        palette = b""
        if not self.color:
            palette = b"".join(struct.pack("<4B", i, i, i, 0)
                               for i in range(256))
        strf = struct.pack("<IiiHHIIiiII", 40, self.w, self.h, 1, bpp,
                           0, frame_size, 0, 0,
                           256 if not self.color else 0, 0) + palette
        strl = b"LIST" + struct.pack(
            "<I", 4 + len(_chunk(b"strh", strh)) + len(_chunk(b"strf", strf))
        ) + b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf)
        hdrl_payload = b"avih" + struct.pack("<I", len(avih)) + avih + strl
        hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_payload)) \
            + b"hdrl" + hdrl_payload

        movi_payload = b"movi"
        offsets = []
        for f in self._frames:
            offsets.append(len(movi_payload))
            movi_payload += _chunk(b"00db", f)
        movi = b"LIST" + struct.pack("<I", len(movi_payload)) + movi_payload

        idx = b""
        for off, f in zip(offsets, self._frames):
            idx += b"00db" + struct.pack("<III", 0x10, off, len(f))
        idx1 = _chunk(b"idx1", idx)

        riff_payload = b"AVI " + hdrl + movi + idx1
        with open(self.path, "wb") as fh:
            fh.write(b"RIFF" + struct.pack("<I", len(riff_payload))
                     + riff_payload)


class AviReader:
    """Random-access reader for uncompressed ('DIB '/raw) AVI files."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            data = f.read()
        if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
            raise ValueError("not an AVI file")
        self.w = self.h = 0
        self.bpp = 24
        self.nframes = 0
        self._frame_spans: List[Tuple[int, int]] = []
        pos = 12
        movi_start = None
        while pos + 8 <= len(data):
            fourcc = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if fourcc == b"LIST":
                list_type = data[pos + 8:pos + 12]
                if list_type == b"movi":
                    movi_start = pos + 8
                    # walk frames inside movi
                    p = pos + 12
                    end = pos + 8 + size
                    while p + 8 <= end:
                        cc = data[p:p + 4]
                        sz = struct.unpack("<I", data[p + 4:p + 8])[0]
                        if cc[2:4] in (b"db", b"dc"):
                            self._frame_spans.append((p + 8, sz))
                        p += 8 + sz + (sz & 1)
                    pos += 8 + size + (size & 1)
                else:
                    pos += 12          # descend into hdrl/strl
            elif fourcc == b"strf":
                (hsz, w, h, planes, bpp) = struct.unpack(
                    "<IiiHH", data[pos + 8:pos + 24])
                self.w, self.h, self.bpp = w, abs(h), bpp
                pos += 8 + size + (size & 1)
            else:
                pos += 8 + size + (size & 1)
        self.nframes = len(self._frame_spans)
        if self.nframes == 0 or self.w == 0:
            raise ValueError("no uncompressed frames found in AVI")
        self._data = data

    def read_frame(self, index: int) -> SirilImage:
        off, sz = self._frame_spans[index]
        raw = np.frombuffer(self._data[off:off + sz], np.uint8)
        if self.bpp == 24:
            stride = (self.w * 3 + 3) & ~3
            rows = raw[: stride * self.h].reshape(self.h, stride)
            bgr = rows[:, : self.w * 3].reshape(self.h, self.w, 3)
            rgb = bgr[::-1, :, ::-1]       # bottom-up BGR → top-down RGB
            data = np.moveaxis(rgb, -1, 0).astype(np.float32) / 255.0
        elif self.bpp == 8:
            stride = (self.w + 3) & ~3
            rows = raw[: stride * self.h].reshape(self.h, stride)
            data = rows[::-1, : self.w][None].astype(np.float32) / 255.0
        else:
            raise ValueError(f"unsupported AVI bit depth {self.bpp}")
        img = SirilImage(data=np.ascontiguousarray(data))
        img.keywords.filename = os.path.basename(self.path)
        return img


def export_avi(seq, path: str, fps: float = 25.0) -> int:
    """Export a sequence as an uncompressed AVI (the reference's AVI
    export, avi_pipp)."""
    first = seq.read_frame(int(seq.selected_indices()[0]))
    color = first.nchans == 3
    wr = AviWriter(path, first.width, first.height, fps, color)
    n = 0
    for i in seq.selected_indices():
        wr.add_frame(seq.read_frame(int(i)))
        n += 1
    wr.close()
    return n
