"""Film (video) import — equivalent of ``src/io/films.c`` (ffmpeg demuxing).

The reference opens any ffmpeg-supported container/codec and serves frames
as 8-bit fits (``film_open_file`` / ``film_read_frame``,
``src/io/films.c:97,215``); the supported-extension list is
``src/io/films.c:40-47`` (avi, mpg, mpeg, mov, mp4, webm).

TPU-first design: we decode through OpenCV's ffmpeg backend on the host
(decode is inherently a host/CPU job), normalize to float32 [0,1] CHW once,
and hand frames to the streaming engine, which overlaps decode with device
compute.  Uncompressed AVI keeps the dedicated random-access reader in
``io/avi.py`` (no codec needed, exact byte spans); everything else goes
through this module.
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import numpy as np

from siril_tpu.core.image import SirilImage

# src/io/films.c:40-47 supported_film[]
FILM_EXTENSIONS = (".avi", ".mpg", ".mpeg", ".mov", ".mp4", ".webm")


def is_film(path: str) -> bool:
    """check_for_film_extensions (films.c:59)."""
    return os.path.splitext(path)[1].lower() in FILM_EXTENSIONS


def _cv2():
    try:
        import cv2

        return cv2
    except ImportError:
        raise RuntimeError(
            "film import requires OpenCV with ffmpeg support "
            "(reference builds with HAVE_FFMPEG)")


class FilmReader:
    """Sequential+seekable film reader (film_struct, films.h:21-33).

    Frames are returned as SirilImage float32 [C,H,W]; color films come
    back RGB (the reference also converts to its planar RGB layout,
    films.c:260-280).
    """

    def __init__(self, path: str):
        cv2 = _cv2()
        self.path = path
        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise ValueError(f"cannot open film {path}")
        self.w = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.h = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.fps = float(self._cap.get(cv2.CAP_PROP_FPS)) or 25.0
        self.nframes = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self._pos = 0
        self._lock = threading.Lock()
        # probe several frames for channel count (mono films decode as 3
        # identical planes; keep them mono like the reference's
        # get_film_layer logic).  One frame is not enough: a color film
        # fading in from black would be locked to mono
        ok, f0 = self._cap.read()
        if not ok:
            raise ValueError(f"cannot decode first frame of {path}")
        self._pos = 1
        gray = self._is_gray(f0)
        if self.nframes <= 0:
            # some containers don't index; count by walking once
            n = self._pos
            while self._cap.grab():
                n += 1
            self.nframes = n
        if gray and self.nframes > 1:
            # sample across the film, not just the start
            for k in (self.nframes // 4, self.nframes // 2,
                      (3 * self.nframes) // 4):
                self._seek(max(k, 1))
                ok, f = self._cap.read()
                if ok and not self._is_gray(f):
                    gray = False
                    break
        self.nchans = 1 if gray else 3
        self._seek(0)

    @staticmethod
    def _is_gray(bgr: np.ndarray) -> bool:
        if bgr.ndim == 2:
            return True
        return bool(np.array_equal(bgr[..., 0], bgr[..., 1]) and
                    np.array_equal(bgr[..., 1], bgr[..., 2]))

    def _seek(self, index: int) -> None:
        cv2 = _cv2()
        self._cap.set(cv2.CAP_PROP_POS_FRAMES, index)
        self._pos = index

    def read_frame(self, index: int) -> SirilImage:
        """film_read_frame (films.c:215) — random access with a
        sequential fast path (the engine reads in order)."""
        with self._lock:
            if index != self._pos:
                self._seek(index)
            ok, frame = self._cap.read()
            self._pos = index + 1
        if not ok:
            raise ValueError(f"cannot decode frame {index} of {self.path}")
        return self._to_image(frame)

    def _to_image(self, bgr: np.ndarray) -> SirilImage:
        if bgr.ndim == 2:
            data = bgr.astype(np.float32)[None] / 255.0
        elif self.nchans == 1:
            data = bgr[..., 0].astype(np.float32)[None] / 255.0
        else:
            # BGR → RGB planar (films.c:260-280 fills pdata[R/G/B])
            data = bgr[..., ::-1].transpose(2, 0, 1).astype(np.float32) / 255.0
        img = SirilImage(data=np.ascontiguousarray(data))
        img.orig_bitdepth = 8
        img.keywords.filename = os.path.basename(self.path)
        return img

    def close(self) -> None:
        if self._cap is not None:
            self._cap.release()
            self._cap = None


def film_display_name(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]
