"""SirilInterface — in-process sirilpy equivalent
(python_module/sirilpy/connection.py:42; key accessors:
get_image_pixeldata:1572, set_image_pixeldata:2049, seq-frame variants,
stats/regdata/header/star accessors, WCS pix2radec/radec2pix, undo).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from siril_tpu.cli.context import CommandError, Session
from siril_tpu.cli.parser import execute_command
from siril_tpu.core.image import SirilImage


class SirilError(Exception):
    pass


@dataclass
class ImageStats:
    total: int
    ngoodpix: int
    mean: float
    median: float
    sigma: float
    avgdev: float
    mad: float
    sqrtbwmv: float
    min: float
    max: float
    normvalue: float
    bgnoise: float


class SirilInterface:
    """Drive the framework from Python scripts (sirilpy-compatible)."""

    def __init__(self, session: Optional[Session] = None):
        self._ctx = session
        self.connected = False

    # ---- lifecycle (connection.py connect/disconnect) ----
    def connect(self, workdir: str = ".") -> bool:
        if self._ctx is None:
            self._ctx = Session(cwd=os.path.abspath(workdir))
        self.connected = True
        return True

    def disconnect(self) -> None:
        self.connected = False

    def is_image_loaded(self) -> bool:
        return self._ctx is not None and self._ctx.image is not None

    def is_sequence_loaded(self) -> bool:
        return self._ctx is not None and self._ctx.seq is not None

    @property
    def ctx(self) -> Session:
        if self._ctx is None:
            raise SirilError("not connected (call connect())")
        return self._ctx

    # ---- commands ----
    def cmd(self, *args) -> None:
        """Run any Siril command (sirilpy cmd())."""
        words = [str(a) for a in args]
        rc = execute_command(self.ctx, words)
        if rc != 0:
            raise CommandError(f"command failed: {' '.join(words)}")

    # ---- pixel data ----
    def get_image_pixeldata(self, channel: Optional[int] = None
                            ) -> np.ndarray:
        """(H, W) or (C, H, W) float32 array of the loaded image."""
        img = self._require_image()
        data = img.host()
        if channel is not None:
            return data[channel].copy()
        return data.copy() if data.shape[0] > 1 else data[0].copy()

    def set_image_pixeldata(self, data: np.ndarray) -> None:
        from siril_tpu.core.image import ensure_chw

        img = self._require_image()
        self.ctx.set_image(img.copy(data=ensure_chw(np.asarray(data))))

    def get_seq_frame_pixeldata(self, frame: int,
                                channel: Optional[int] = None) -> np.ndarray:
        seq = self._require_seq()
        data = seq.read_frame(frame).host()
        if channel is not None:
            return data[channel]
        return data if data.shape[0] > 1 else data[0]

    # ---- image metadata ----
    def get_image_shape(self) -> Tuple[int, int, int]:
        img = self._require_image()
        return (img.nchans, img.height, img.width)

    def get_image_filename(self) -> str:
        return self.ctx.image_name

    def get_image_keywords(self):
        return self._require_image().keywords

    def get_image_header(self) -> Optional[str]:
        return self._require_image().header_text

    def get_image_history(self) -> List[str]:
        return list(self._require_image().history)

    def get_image_stats(self, channel: int = 0) -> ImageStats:
        from siril_tpu.ops.statistics import STATS_MAIN, compute_stats_np

        img = self._require_image()
        s = compute_stats_np(img.host()[channel], STATS_MAIN)
        return ImageStats(total=int(s.total), ngoodpix=int(s.ngoodpix),
                          mean=s.mean, median=s.median, sigma=s.sigma,
                          avgdev=s.avgdev, mad=s.mad, sqrtbwmv=s.sqrtbwmv,
                          min=s.min, max=s.max, normvalue=s.normvalue,
                          bgnoise=s.bgnoise)

    # ---- sequence accessors ----
    def get_seq(self):
        return self._require_seq()

    def get_seq_frame_count(self) -> int:
        return self._require_seq().number

    def get_seq_regdata(self, frame: int, channel: int = 0) -> dict:
        seq = self._require_seq()
        reg = seq.reg(channel)
        return {"fwhm": float(reg.fwhm[frame]),
                "weighted_fwhm": float(reg.weighted_fwhm[frame]),
                "roundness": float(reg.roundness[frame]),
                "quality": float(reg.quality[frame]),
                "background_lvl": float(reg.background_lvl[frame]),
                "number_of_stars": int(reg.number_of_stars[frame]),
                "H": reg.H[frame].tolist()}

    def get_seq_stats(self, frame: int, channel: int = 0):
        return self._require_seq().get_frame_stats(channel, frame)

    def set_seq_frame_incl(self, frame: int, incl: bool) -> None:
        seq = self._require_seq()
        seq.incl[frame] = incl
        seq.needs_saving = True

    # ---- stars / psf ----
    def get_stars(self):
        """Stars from the last findstar run (or detect now)."""
        stars = getattr(self.ctx, "stars", None)
        if not stars:
            from siril_tpu.registration.starfinder import detect_stars

            img = self._require_image()
            layer = 1 if img.nchans == 3 else 0
            stars = detect_stars(img.host()[layer])
            self.ctx.stars = stars
        return stars

    # ---- WCS ----
    def has_wcs(self) -> bool:
        img = self._require_image()
        return img.wcs is not None

    def pix2radec(self, x: float, y: float) -> Tuple[float, float]:
        img = self._require_image()
        if img.wcs is None:
            raise SirilError("image is not plate-solved")
        ra, dec = img.wcs.pix2world(np.array([x]), np.array([y]))
        return float(ra[0]), float(dec[0])

    def radec2pix(self, ra: float, dec: float) -> Tuple[float, float]:
        img = self._require_image()
        if img.wcs is None:
            raise SirilError("image is not plate-solved")
        x, y = img.wcs.world2pix(np.array([ra]), np.array([dec]))
        return float(x[0]), float(y[0])

    # ---- masks / selection ----
    def get_image_mask(self) -> Optional[np.ndarray]:
        img = self._require_image()
        return None if img.mask is None else np.array(img.mask)

    def set_image_mask(self, mask: Optional[np.ndarray]) -> None:
        img = self._require_image()
        img.mask = None if mask is None else np.asarray(mask, np.float32)
        img.mask_active = mask is not None

    def get_selection(self):
        return self.ctx.selection

    def set_selection(self, x: int, y: int, w: int, h: int) -> None:
        self.ctx.selection = (x, y, w, h)

    # ---- undo ----
    def undo_save_state(self, description: str = "python script") -> None:
        from siril_tpu.core.undo import UndoStack

        if self.ctx.undo_stack is None:
            self.ctx.undo_stack = UndoStack()
        self.ctx.undo_stack.save_state(self._require_image(), description)

    def undo(self) -> None:
        self.cmd("undo")

    # ---- misc ----
    def log(self, message: str) -> None:
        from siril_tpu.utils.log import log_message

        log_message(message)

    def get_siril_version(self) -> str:
        from siril_tpu.cli.commands import VERSION

        return VERSION

    def image_lock(self):
        """Context manager kept for sirilpy compatibility (in-process:
        the command engine serializes operations already)."""
        import contextlib

        return contextlib.nullcontext()

    # ---- internals ----
    def _require_image(self) -> SirilImage:
        img = self.ctx.image
        if img is None:
            raise SirilError("no image loaded")
        return img

    def _require_seq(self):
        seq = self.ctx.seq
        if seq is None:
            raise SirilError("no sequence loaded")
        return seq
