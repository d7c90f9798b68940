"""MP4 / WebM video export — equivalent of ``src/io/mp4_output.c``.

The reference encodes H.264/H.265/VP9 through libav* with CRF-based quality
(``mp4_output.c:49-51`` quality→CRF tables, ``mp4_create`` at
``mp4_output.h:32``).  Here encoding goes through OpenCV's ffmpeg backend;
codec availability depends on the build, so we probe a preference list per
format and fall back (mp4: avc1 → mp4v; webm: VP90 → VP80).  Dimensions are
rounded down to even values like the reference (x264 requirement,
``mp4_output.c`` keeps w/h mod 2 == 0).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

# export_format values mirroring sequence_export.c EXPORT_MP4/MP4_H265/WEBM
MP4 = "mp4"
MP4_H265 = "mp4-h265"
WEBM_VP9 = "webm"

_FOURCC_PREF = {
    MP4: ("avc1", "mp4v"),
    MP4_H265: ("hvc1", "hev1", "mp4v"),
    WEBM_VP9: ("VP90", "VP80"),
}


class Mp4Writer:
    """mp4_struct equivalent (mp4_output.h:10) via cv2.VideoWriter."""

    def __init__(self, filename: str, width: int, height: int,
                 fps: int = 25, nb_layers: int = 1, quality: int = 3,
                 fmt: str = MP4):
        import cv2

        if fps <= 0:
            fps = 25
        # even-dimension requirement (mp4_output.c pads to mod-2)
        self.dst_w = width - (width % 2)
        self.dst_h = height - (height % 2)
        self.nb_layers = nb_layers
        self.fmt = fmt
        self.filename = filename
        self._writer = None
        for fourcc in _FOURCC_PREF[fmt]:
            w = cv2.VideoWriter(filename, cv2.VideoWriter_fourcc(*fourcc),
                                float(fps), (self.dst_w, self.dst_h))
            if w.isOpened():
                self._writer = w
                self.fourcc = fourcc
                break
            w.release()
        if self._writer is None:
            raise RuntimeError(f"no usable encoder for {fmt}")
        # quality 1..5 → best-effort backend hint (the reference maps to
        # CRF, mp4_output.c:49-51; OpenCV only exposes a 0-100 knob and
        # many builds ignore it)
        try:
            self._writer.set(cv2.VIDEOWRITER_PROP_QUALITY,
                             float(20 * max(1, min(5, quality))))
        except Exception:
            pass
        self.nframes = 0

    def add_frame(self, img) -> None:
        """mp4_add_frame (mp4_output.c): float [C,H,W] → 8-bit frame."""
        data = np.asarray(img.data if hasattr(img, "data") else img)
        u8 = np.clip(data * 255.0 + 0.5, 0, 255).astype(np.uint8)
        if u8.shape[0] == 1:
            bgr = np.repeat(u8[0][..., None], 3, axis=2)
        else:
            bgr = u8[:3].transpose(1, 2, 0)[..., ::-1]   # RGB→BGR
        bgr = np.ascontiguousarray(bgr[: self.dst_h, : self.dst_w])
        self._writer.write(bgr)
        self.nframes += 1

    def close(self, aborted: bool = False) -> int:
        """mp4_close — finalize container; on abort remove the file."""
        if self._writer is not None:
            self._writer.release()
            self._writer = None
        if aborted and os.path.exists(self.filename):
            os.unlink(self.filename)
        return self.nframes
