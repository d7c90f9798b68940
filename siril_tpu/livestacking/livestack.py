"""Live stacking (EAA) — equivalent of ``src/livestacking/`` (878 LoC):
watch a directory for incoming frames → per-frame calibrate → debayer →
register (global star or shift) → running-sum 32-bit stack, with rolling
noise/stats display (livestacking.c:85 thread).

Headless architecture: a watcher thread polls the directory (GFileMonitor
equivalent), a worker consumes the queue — one frame at a time like the
reference's processing thread — and the accumulated result is exposed /
periodically written to ``live_stack_result.fit``.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from siril_tpu.core.image import FLOAT_IMG, SirilImage
from siril_tpu.utils.log import log_error, log_message


@dataclass
class LiveStackConfig:
    calibrate: bool = False
    bias: Optional[SirilImage] = None
    dark: Optional[SirilImage] = None
    flat: Optional[SirilImage] = None
    debayer: bool = False
    use_registration: bool = True       # star registration; else shift
    shift_only: bool = True
    out_name: str = "live_stack_result.fit"
    poll_s: float = 1.0


class LiveStacker:
    def __init__(self, directory: str,
                 config: Optional[LiveStackConfig] = None):
        self.dir = os.path.abspath(directory)
        self.cfg = config or LiveStackConfig()
        self.q: "queue.Queue" = queue.Queue()
        self.acc: Optional[np.ndarray] = None
        self.count = 0
        self.failed = 0
        self.ref_stars = None
        self.ref_layer = None
        self._seen = set()
        self._stop = threading.Event()
        self._watcher: Optional[threading.Thread] = None
        self._worker: Optional[threading.Thread] = None
        self._calib_state = None
        self._lock = threading.Lock()

    # ------------------------------------------------------------------
    def start(self) -> None:
        """start_ls: scan existing files are ignored; only new arrivals."""
        for f in self._list_frames():
            self._seen.add(f)
        self._stop.clear()
        self._watcher = threading.Thread(target=self._watch, daemon=True)
        self._worker = threading.Thread(target=self._work, daemon=True)
        self._watcher.start()
        self._worker.start()
        log_message(f"Live stacking started, watching {self.dir}")

    def stop(self) -> None:
        self._stop.set()
        if self._watcher:
            self._watcher.join(timeout=5)
        self.q.put(None)
        if self._worker:
            self._worker.join(timeout=30)
        log_message(f"Live stacking stopped ({self.count} frames stacked, "
                    f"{self.failed} failed)")

    def _list_frames(self):
        out = []
        for ext in ("*.fit", "*.fits", "*.fts"):
            out.extend(glob.glob(os.path.join(self.dir, ext)))
        return [f for f in out
                if not os.path.basename(f).startswith("live_stack")]

    def _watch(self) -> None:
        while not self._stop.is_set():
            for f in self._list_frames():
                if f not in self._seen:
                    self._seen.add(f)
                    self.q.put(f)
            time.sleep(self.cfg.poll_s)

    # ------------------------------------------------------------------
    def _work(self) -> None:
        while True:
            item = self.q.get()
            if item is None or self._stop.is_set():
                return
            try:
                self.process_file(item)
            except Exception as e:
                self.failed += 1
                log_error(f"livestack: {os.path.basename(item)} failed: {e}")

    def process_file(self, path: str) -> None:
        from siril_tpu.io.conversion import load_any

        img = load_any(path)
        self.process_frame(img, os.path.basename(path))

    def process_frame(self, img: SirilImage, name: str = "") -> None:
        from siril_tpu.ops.calibration import CalibArgs, calibrate_image, prepare_calibration

        cfg = self.cfg
        if cfg.calibrate and (cfg.bias or cfg.dark or cfg.flat):
            if self._calib_state is None:
                ca = CalibArgs(bias=cfg.bias, dark=cfg.dark, flat=cfg.flat,
                               use_cosmetic=cfg.dark is not None,
                               is_cfa=img.is_cfa())
                self._calib_args = ca
                self._calib_state = prepare_calibration(ca, img)
            img = calibrate_image(img, self._calib_args,
                                  _state=self._calib_state)
        if cfg.debayer and img.is_cfa():
            from siril_tpu.ops.demosaic import debayer_image

            img = debayer_image(img)
        data = img.host()

        with self._lock:
            if self.acc is None:
                self.acc = data.astype(np.float64)
                self.count = 1
                if cfg.use_registration:
                    self._init_reference(data)
                log_message(f"livestack: reference frame set ({name})")
                return

        aligned = self._align(data)
        if aligned is None:
            self.failed += 1
            log_error(f"livestack: {name} could not be aligned, skipped")
            return
        with self._lock:
            self.acc += aligned
            self.count += 1
        if self.count % 5 == 0 or self.count < 5:
            self._report()
            self.save_result()

    def _init_reference(self, data: np.ndarray) -> None:
        from siril_tpu.registration.starfinder import detect_stars

        self.ref_layer = min(1, data.shape[0] - 1)
        if not self.cfg.shift_only:
            self.ref_stars = detect_stars(data[self.ref_layer])
        self._ref_plane = data[self.ref_layer]

    def _align(self, data: np.ndarray) -> Optional[np.ndarray]:
        cfg = self.cfg
        if not cfg.use_registration:
            return data
        if cfg.shift_only:
            from siril_tpu.registration.shift import phase_correlate

            d = phase_correlate(self._ref_plane, data[self.ref_layer][None])[0]
            dx, dy = int(round(d[0])), int(round(d[1]))
            out = np.zeros_like(data)
            h, w = data.shape[1:]
            sy0, sy1 = max(dy, 0), min(h + dy, h)
            sx0, sx1 = max(dx, 0), min(w + dx, w)
            if sy1 <= sy0 or sx1 <= sx0:
                return None
            out[:, sy0:sy1, sx0:sx1] = data[:, sy0 - dy:sy1 - dy,
                                            sx0 - dx:sx1 - dx]
            return out
        from siril_tpu.ops.interp import warp_homography
        from siril_tpu.registration.matching import match_stars
        from siril_tpu.registration.starfinder import detect_stars

        stars = detect_stars(data[self.ref_layer])
        m = match_stars(self.ref_stars, stars)
        if m is None:
            return None
        return warp_homography(data, m.H, data.shape[1:], clamp=True)

    # ------------------------------------------------------------------
    def result(self) -> Optional[SirilImage]:
        with self._lock:
            if self.acc is None:
                return None
            img = SirilImage(
                data=np.clip(self.acc / max(self.count, 1), 0, 1)
                .astype(np.float32))
        img.keywords.stackcnt = self.count
        img.log_history(f"Live stack of {self.count} frames")
        return img

    def save_result(self) -> None:
        from siril_tpu.io.fits_io import write_fits

        img = self.result()
        if img is not None:
            write_fits(img, os.path.join(self.dir, self.cfg.out_name),
                       bitdepth=FLOAT_IMG)

    def _report(self) -> None:
        from siril_tpu.ops.statistics import STATS_BASIC, compute_stats_np

        img = self.result()
        if img is None:
            return
        st = compute_stats_np(img.host()[0], STATS_BASIC)
        log_message(f"livestack: {self.count} frames, bg {st.median:.5f}, "
                    f"noise {st.bgnoise:.2e}")
