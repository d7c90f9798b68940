"""Format conversion — equivalent of ``src/io/conversion.c`` (1,576 LoC).

``convert``: any supported input (FITS, SER frames, TIFF/PNG/JPEG/BMP/PNM
via PIL, raw NEF/CR2 gated) → a FITS / SER / FITSEQ sequence with
normalized names ``name_00001.fit``.
``link``: FITS inputs are symlinked instead of rewritten
(FITS_symlink.c optimization).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence as Seq

import numpy as np

from siril_tpu.core.image import SirilImage, ensure_chw
from siril_tpu.core.sequence import Sequence
from siril_tpu.utils.log import log_error, log_message

FITS_EXT = (".fit", ".fits", ".fts")
PIL_EXT = (".tif", ".tiff", ".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".pgm",
           ".pnm", ".webp", ".avif")


def load_any(path: str) -> SirilImage:
    """Read any supported single image file → SirilImage."""
    ext = os.path.splitext(path)[1].lower()
    if ext in FITS_EXT or path.lower().endswith((".fit.fz", ".fits.fz")):
        from siril_tpu.io.fits_io import read_fits

        return read_fits(path)
    if ext == ".dng":
        # DSLR raw: DNG parsed natively (io/dng.py; reference raw path is
        # libraw, image_formats_libraries.c)
        from siril_tpu.io.dng import read_dng

        return read_dng(path)
    if ext == ".cr2":
        from siril_tpu.io.rawfile import read_cr2

        return read_cr2(path)
    if ext == ".nef":
        from siril_tpu.io.rawfile import read_nef

        return read_nef(path)
    if ext == ".arw":
        from siril_tpu.io.rawfile import read_arw

        return read_arw(path)
    if ext == ".raf":
        from siril_tpu.io.rawfile import read_raf

        return read_raf(path)
    if ext == ".rw2":
        from siril_tpu.io.rawfile import read_rw2

        return read_rw2(path)
    if ext == ".cr3":
        from siril_tpu.io.rawfile import read_cr3

        return read_cr3(path)   # gated: raises with a clear message
    if ext == ".pef":
        from siril_tpu.io.rawfile import read_pef

        return read_pef(path)
    if ext == ".orf":
        from siril_tpu.io.rawfile import read_orf

        return read_orf(path)
    if ext in (".heic", ".heif"):
        from siril_tpu.io.rawfile import read_heif

        return read_heif(path)
    if ext in PIL_EXT:
        from PIL import Image

        im = Image.open(path)
        arr = np.asarray(im)
        if arr.dtype == np.uint8:
            data = arr.astype(np.float32) / 255.0
        elif arr.dtype == np.uint16:
            data = arr.astype(np.float32) / 65535.0
        else:
            data = arr.astype(np.float32)
        if data.ndim == 3 and data.shape[2] == 4:
            data = data[:, :, :3]
        img = SirilImage(data=ensure_chw(data))
        img.keywords.filename = os.path.basename(path)
        return img
    if ext == ".ser":
        from siril_tpu.io.ser import SerFile

        return SerFile(path).read_frame(0)
    if ext == ".xisf":
        from siril_tpu.io.xisf import read_xisf

        return read_xisf(path)
    if ext == ".pic":
        from siril_tpu.io.internal_formats import read_pic

        return read_pic(path)
    raise ValueError(f"unsupported input format: {path}")


def convert_to_sequence(inputs: Seq[str], dest_name: str,
                        directory: str = ".",
                        output: str = "fits",          # fits | ser | fitseq
                        symlink: bool = False,
                        start: int = 1,
                        debayer: bool = False) -> Sequence:
    """`convert` / `link` commands (conversion.c convert worker)."""
    inputs = sorted(inputs)
    if not inputs:
        raise ValueError("no input files")
    os.makedirs(directory, exist_ok=True)
    # reference naming rule (conversion.c:1396): append '_' unless the
    # basename already ends with '_', '-' or a digit → light → light_00001
    if dest_name and dest_name[-1] not in "_-0123456789":
        dest_name = dest_name + "_"

    # expand SER/AVI/film containers into frames
    expanded: List = []
    film_readers = {}
    for p in inputs:
        if p.lower().endswith(".ser") and output != "ser":
            from siril_tpu.io.ser import SerFile

            sf = SerFile(p)
            for i in range(sf.frame_count):
                expanded.append((p, i))
        elif p.lower().endswith(".avi"):
            from siril_tpu.io.avi import AviReader

            try:
                ar = AviReader(p)
                nf = ar.nframes
            except ValueError:
                # compressed AVI: fall through to the ffmpeg film reader
                from siril_tpu.io.films import FilmReader

                film_readers[p] = FilmReader(p)
                nf = film_readers[p].nframes
            for i in range(nf):
                expanded.append((p, i))
        else:
            from siril_tpu.io.films import is_film

            if is_film(p):
                from siril_tpu.io.films import FilmReader

                film_readers[p] = FilmReader(p)
                for i in range(film_readers[p].nframes):
                    expanded.append((p, i))
            else:
                expanded.append((p, None))

    if output == "ser":
        from siril_tpu.io.ser import SER_MONO, SER_RGB, SerWriter

        first = _read_item(expanded[0], debayer, film_readers)
        cid = SER_RGB if first.nchans == 3 else SER_MONO
        out_path = os.path.join(directory, dest_name + ".ser")
        w = SerWriter(out_path, first.width, first.height, cid, 16)
        for item in expanded:
            w.write_frame(_read_item(item, debayer, film_readers))
        w.close()
        log_message(f"Converted {len(expanded)} frames to {out_path}")
        return Sequence.from_ser(out_path)

    if output == "fitseq":
        from siril_tpu.io.fits_io import FitseqWriter

        out_path = os.path.join(directory, dest_name + ".fit")
        first = _read_item(expanded[0], debayer, film_readers)
        from siril_tpu.core.image import FLOAT_IMG, USHORT_IMG

        w = FitseqWriter(out_path, bitdepth=first.orig_bitdepth)
        for item in expanded:
            w.append(_read_item(item, debayer, film_readers))
        w.close()
        log_message(f"Converted {len(expanded)} frames to FITS cube "
                    f"{dest_name}.fit")
        return Sequence.from_fitseq(out_path)

    files = []
    for k, item in enumerate(expanded):
        num = start + k
        out = os.path.join(directory, f"{dest_name}{num:05d}.fit")
        src, sub = item
        if symlink and sub is None and \
                os.path.splitext(src)[1].lower() in FITS_EXT:
            if os.path.lexists(out):
                os.unlink(out)
            os.symlink(os.path.abspath(src), out)
        else:
            from siril_tpu.io.fits_io import write_fits

            img = _read_item(item, debayer, film_readers)
            write_fits(img, out)
        files.append(out)
    log_message(f"Converted {len(files)} files to sequence {dest_name}")
    seq = Sequence.from_files(files, name=dest_name, directory=directory)
    seq.beg = start
    seq.save()                 # reference writes the .seq on conversion
    return seq


def _read_item(item, debayer: bool, film_readers=None) -> SirilImage:
    src, sub = item
    if sub is not None:
        if film_readers and src in film_readers:
            img = film_readers[src].read_frame(sub)
        elif src.lower().endswith(".avi"):
            from siril_tpu.io.avi import AviReader

            img = AviReader(src).read_frame(sub)
        else:
            from siril_tpu.io.ser import SerFile

            img = SerFile(src).read_frame(sub)
    else:
        img = load_any(src)
    if debayer and img.is_cfa():
        from siril_tpu.ops.demosaic import debayer_image

        img = debayer_image(img)
    return img
