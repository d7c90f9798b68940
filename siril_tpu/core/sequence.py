"""Sequence model — TPU-native equivalent of ``struct sequ`` + ``io/sequence.c``.

Reference: ``src/core/siril.h:458-517`` (sequence struct), sequence types
enum (``siril.h:351-357``): REGULAR file-list, SER, FITSEQ (multi-HDU FITS
cube), AVI.  We support REGULAR, SER, FITSEQ; film import is gated.

Design differences (TPU-first):
- Per-frame metadata is columnar (numpy arrays over the frame axis) rather
  than per-frame structs: registration homographies are a single (L, N, 3, 3)
  array, statistics a (L, N, k) array.  This makes them directly shippable
  to the device for batched warps / normalization.
- Frame access returns float32 (C, H, W) host arrays; the streaming engine
  overlaps reads with device compute (see engine.py).
"""

from __future__ import annotations

import glob
import os
import re
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence as Seq, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage

# sequence types (siril.h:351-357)
SEQ_REGULAR = 0
SEQ_SER = 1
SEQ_FITSEQ = 2
SEQ_AVI = 3          # film (any ffmpeg container, io/films.py)
SEQ_INTERNAL = 4

# statistic column order for the (L, N, 14) stats cache — matches the
# M-card field order in .seq v7 (io/seqfile.c:825)
STAT_COLS = ("total", "ngoodpix", "mean", "median", "sigma", "avgdev", "mad",
             "sqrtbwmv", "location", "scale", "min", "max", "normvalue",
             "bgnoise")
REG_COLS = ("fwhm", "weighted_fwhm", "roundness", "quality",
            "background_lvl", "number_of_stars")


@dataclass
class RegData:
    """Columnar registration data for one layer (regdata, siril.h:433-444)."""

    n: int
    fwhm: np.ndarray = None
    weighted_fwhm: np.ndarray = None
    roundness: np.ndarray = None
    quality: np.ndarray = None
    background_lvl: np.ndarray = None
    number_of_stars: np.ndarray = None
    H: np.ndarray = None                 # (N, 3, 3) float64 homographies
    valid: np.ndarray = None             # bool: regdata exists for frame

    def __post_init__(self):
        n = self.n
        if self.fwhm is None:
            self.fwhm = np.zeros(n)
            self.weighted_fwhm = np.zeros(n)
            self.roundness = np.zeros(n)
            self.quality = np.full(n, -1.0)
            self.background_lvl = np.zeros(n)
            self.number_of_stars = np.zeros(n, dtype=np.int32)
            self.H = np.tile(np.eye(3), (n, 1, 1))
            self.valid = np.zeros(n, dtype=bool)


class Sequence:
    """A sequence of frames with registration/statistics sidecar state."""

    def __init__(self, name: str, seq_type: int = SEQ_REGULAR,
                 directory: str = "."):
        self.name = name                       # base name without .seq
        self.seq_type = seq_type
        self.directory = directory
        self.beg = 0
        self.fixed_len = 5                     # zero-padding of file indices
        self.number = 0                        # total frames
        self.reference_image = -1
        self.nb_layers = -1
        self.rx = 0
        self.ry = 0
        self.bitpix = 0
        self.is_variable = False
        self.fz = False
        self.needs_saving = False
        # per-image columnar data (imgdata, siril.h:398-405)
        self.filenum: np.ndarray = np.zeros(0, dtype=np.int64)
        self.incl: np.ndarray = np.zeros(0, dtype=bool)
        self.date_obs: List[Optional[str]] = []
        self.airmass: np.ndarray = np.zeros(0)
        self.imgsize: Optional[np.ndarray] = None   # (N,2) if variable
        # per-layer
        self.regparam: Dict[int, RegData] = {}
        self.stats: Dict[int, np.ndarray] = {}      # layer → (N, 14) float64, NaN=absent
        # backing store
        self._ser = None
        self._fitseq_readers: Dict[int, object] = {}
        self._reader_lock = threading.Lock()
        self._file_list: List[str] = []

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @staticmethod
    def from_files(files: Seq[str], name: str = "sequence",
                   directory: Optional[str] = None) -> "Sequence":
        """Build a REGULAR sequence from an explicit FITS file list."""
        files = sorted(os.fspath(f) for f in files)
        if not files:
            raise ValueError("empty file list")
        d = directory or os.path.dirname(files[0]) or "."
        seq = Sequence(name, SEQ_REGULAR, d)
        seq._file_list = [os.path.abspath(f) for f in files]
        seq.number = len(files)
        nums = []
        for i, f in enumerate(files):
            m = re.search(r"(\d+)(?=\.[^.]+$)", os.path.basename(f))
            nums.append(int(m.group(1)) if m else i)
        seq.filenum = np.asarray(nums, dtype=np.int64)
        seq.incl = np.ones(len(files), dtype=bool)
        seq.date_obs = [None] * len(files)
        seq.airmass = np.zeros(len(files))
        seq._probe_geometry()
        return seq

    @staticmethod
    def from_ser(path: str) -> "Sequence":
        from siril_tpu.io.ser import SerFile

        ser = SerFile(path)
        name = os.path.splitext(os.path.basename(path))[0]
        seq = Sequence(name, SEQ_SER, os.path.dirname(path) or ".")
        seq._ser = ser
        seq.number = ser.frame_count
        seq.rx, seq.ry = ser.width, ser.height
        seq.nb_layers = ser.nchans
        seq.bitpix = 16 if ser.header.bytes_per_sample == 2 else 8
        seq.filenum = np.arange(seq.number, dtype=np.int64)
        seq.incl = np.ones(seq.number, dtype=bool)
        seq.date_obs = [None] * seq.number
        seq.airmass = np.zeros(seq.number)
        return seq

    @staticmethod
    def from_fitseq(path: str) -> "Sequence":
        """Multi-HDU FITS cube sequence (io/fits_sequence.c)."""
        from siril_tpu.io.fits_io import scan_hdus

        hdus = [h for h in scan_hdus(path)
                if len(h.naxes) >= 2 and all(n > 0 for n in h.naxes)]
        if not hdus:
            raise ValueError(f"{path}: no image HDUs")
        name = os.path.splitext(os.path.basename(path))[0]
        seq = Sequence(name, SEQ_FITSEQ, os.path.dirname(path) or ".")
        seq._fitseq_path = os.path.abspath(path)
        seq.number = len(hdus)
        c, hgt, wid = hdus[0].shape_chw
        seq.rx, seq.ry = wid, hgt
        seq.nb_layers = c
        seq.bitpix = hdus[0].bitpix
        seq.filenum = np.arange(seq.number, dtype=np.int64)
        seq.incl = np.ones(seq.number, dtype=bool)
        seq.date_obs = [None] * seq.number
        seq.airmass = np.zeros(seq.number)
        return seq

    @staticmethod
    def from_film(path: str) -> "Sequence":
        """Film sequence (SEQ_AVI, io/films.c film_struct) — any
        ffmpeg-decodable container."""
        from siril_tpu.io.films import FilmReader

        fr = FilmReader(path)
        name = os.path.splitext(os.path.basename(path))[0]
        seq = Sequence(name, SEQ_AVI, os.path.dirname(path) or ".")
        seq._film = fr
        seq.number = fr.nframes
        seq.rx, seq.ry = fr.w, fr.h
        seq.nb_layers = fr.nchans
        seq.bitpix = 8
        seq.filenum = np.arange(seq.number, dtype=np.int64)
        seq.incl = np.ones(seq.number, dtype=bool)
        seq.date_obs = [None] * seq.number
        seq.airmass = np.zeros(seq.number)
        return seq

    @staticmethod
    def scan(basename: str, directory: str = ".") -> "Sequence":
        """Discover files ``basename%05d.ext`` like check_seq
        (io/sequence.c:169)."""
        exts = ("fit", "fits", "fts", "fit.fz", "fits.fz")
        files = []
        for ext in exts:
            files.extend(glob.glob(os.path.join(directory, f"{basename}*.{ext}")))
        pat = re.compile(re.escape(basename) + r"(\d+)\.(fit|fits|fts)(\.fz)?$")
        matched = [f for f in files if pat.search(os.path.basename(f))]
        if not matched:
            raise FileNotFoundError(
                f"no files matching {basename}NNNNN.fit in {directory}")
        seq = Sequence.from_files(matched, name=basename, directory=directory)
        m0 = pat.search(os.path.basename(seq._file_list[0]))
        seq.fixed_len = len(m0.group(1))
        seq.beg = int(seq.filenum.min())
        return seq

    def _probe_geometry(self) -> None:
        from siril_tpu.io.fits_io import scan_hdus

        sizes = []
        for f in self._file_list[: min(len(self._file_list), 2)]:
            hdus = [h for h in scan_hdus(f) if len(h.naxes) >= 2]
            if hdus:
                c, hgt, wid = hdus[0].shape_chw
                sizes.append((c, hgt, wid))
                self.bitpix = hdus[0].bitpix
        if sizes:
            c, hgt, wid = sizes[0]
            self.nb_layers, self.ry, self.rx = c, hgt, wid

    # ------------------------------------------------------------------
    # frame access (io/sequence.c:912 seq_read_frame + :1282 region read)
    # ------------------------------------------------------------------
    def frame_path(self, index: int) -> Optional[str]:
        if self.seq_type == SEQ_REGULAR:
            return self._file_list[index]
        return None

    def read_frame(self, index: int) -> SirilImage:
        if self.seq_type == SEQ_REGULAR:
            from siril_tpu.io.fits_io import read_fits

            img = read_fits(self._file_list[index])
        elif self.seq_type == SEQ_SER:
            img = self._ser.read_frame(index)
        elif self.seq_type == SEQ_FITSEQ:
            from siril_tpu.io.fits_io import read_fits

            img = read_fits(self._fitseq_path, hdu_index=index)
        elif self.seq_type == SEQ_AVI:
            img = self._film.read_frame(index)
        else:
            raise ValueError(f"unsupported sequence type {self.seq_type}")
        if self.nb_layers < 0:
            self.nb_layers = img.nchans
            self.rx, self.ry = img.width, img.height
        return img

    def read_frame_metadata(self, index: int):
        """Keywords only, no pixel read (seq_read_frame_metadata,
        io/sequence.c:1052)."""
        if self.seq_type == SEQ_REGULAR:
            from siril_tpu.io.fits_io import header_to_keywords, scan_hdus

            hdus = [h for h in scan_hdus(self._file_list[index])
                    if len(h.naxes) >= 2]
            if hdus:
                return header_to_keywords(hdus[0].header)
        elif self.seq_type == SEQ_SER:
            from siril_tpu.io.ser import ticks_to_iso

            h = self._ser.header
            kw = SirilImage.from_u16(np.zeros((1, 1), np.uint16)).keywords
            kw.instrume = h.instrument
            kw.telescop = h.telescope
            if h.timestamps and index < len(h.timestamps):
                kw.date_obs = ticks_to_iso(h.timestamps[index])
            return kw
        elif self.seq_type == SEQ_FITSEQ:
            from siril_tpu.io.fits_io import header_to_keywords, scan_hdus

            hdus = [h for h in scan_hdus(self._fitseq_path)
                    if len(h.naxes) >= 2]
            if index < len(hdus):
                return header_to_keywords(hdus[index].header)
        from siril_tpu.core.image import Keywords

        return Keywords()

    def open_reader(self, index: int):
        """Cached random-access reader for frame `index` (REGULAR/FITSEQ)."""
        with self._reader_lock:
            r = self._fitseq_readers.get(index)
            if r is None:
                from siril_tpu.io.fits_io import FitsReader

                if self.seq_type == SEQ_REGULAR:
                    r = FitsReader(self._file_list[index])
                elif self.seq_type == SEQ_FITSEQ:
                    r = FitsReader(self._fitseq_path, hdu_index=index)
                else:
                    raise ValueError("open_reader: unsupported type")
                self._fitseq_readers[index] = r
            return r

    def read_region(self, chan: int, index: int, y0: int, y1: int) -> np.ndarray:
        """Rows [y0,y1) of channel `chan` of frame `index` — the
        seq_opened_read_region equivalent feeding blocked stacking."""
        if self.seq_type == SEQ_SER:
            return self._ser.read_region(chan, index, y0, y1)
        return self.open_reader(index).read_region(chan, y0, y1)

    def close_readers(self) -> None:
        with self._reader_lock:
            for r in self._fitseq_readers.values():
                r.close()
            self._fitseq_readers.clear()

    # ------------------------------------------------------------------
    # selection / reference
    # ------------------------------------------------------------------
    @property
    def selnum(self) -> int:
        return int(self.incl.sum())

    def selected_indices(self) -> np.ndarray:
        return np.nonzero(self.incl)[0]

    def set_reference(self, index: int) -> None:
        self.reference_image = index
        self.needs_saving = True

    def get_reference(self) -> int:
        """Reference frame or fallback = first included (sequence.c policy)."""
        if 0 <= self.reference_image < self.number and self.incl[self.reference_image]:
            return self.reference_image
        sel = self.selected_indices()
        return int(sel[0]) if len(sel) else 0

    # ------------------------------------------------------------------
    # regdata / stats accessors
    # ------------------------------------------------------------------
    def reg(self, layer: int) -> RegData:
        if layer not in self.regparam:
            self.regparam[layer] = RegData(self.number)
        return self.regparam[layer]

    def has_reg(self, layer: int) -> bool:
        return layer in self.regparam and bool(self.regparam[layer].valid.any())

    def layer_stats(self, layer: int) -> np.ndarray:
        if layer not in self.stats:
            self.stats[layer] = np.full((self.number, len(STAT_COLS)), np.nan)
        return self.stats[layer]

    def set_frame_stats(self, layer: int, index: int, st) -> None:
        """Cache an ImStats for (layer, frame) in the columnar store."""
        arr = self.layer_stats(layer)
        arr[index] = [getattr(st, c) for c in STAT_COLS]
        self.needs_saving = True

    def get_frame_stats(self, layer: int, index: int):
        if layer not in self.stats:
            return None
        row = self.stats[layer][index]
        if np.isnan(row[2:]).all():
            return None
        from siril_tpu.ops.statistics import ImStats

        return ImStats(**{c: row[i] for i, c in enumerate(STAT_COLS)})

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------
    def seqfile_path(self) -> str:
        return os.path.join(self.directory, self.name + ".seq")

    def save(self) -> None:
        from siril_tpu.io.seqfile import write_seqfile

        write_seqfile(self)
        self.needs_saving = False
