"""Sequence export engine — equivalent of ``src/io/sequence_export.c``.

Headless surface for the reference's "Export sequence" dialog: write the
selected frames of a sequence to FITS files / FITS cube / SER / TIFF / AVI
/ MP4 / WebM, optionally applying registration shifts, additive-scaling
normalization, a crop area, and (video only) a resample size
(``export_sequence`` worker, ``sequence_export.c:76``).

Reference semantics kept:
- registration must be shift-only; shifts are integer-rounded relative to
  the reference frame (``sequence_export.c:436-444``);
- normalization uses the stacking ADDITIVE_SCALING coefficients, skipping
  null pixels (``sequence_export.c:470-480``);
- video dimensions are rounded to even (x264 requirement).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.utils.log import log_error, log_message

EXPORT_FITS = "fits"
EXPORT_FITSEQ = "fitseq"
EXPORT_SER = "ser"
EXPORT_TIFF = "tiff"
EXPORT_AVI = "avi"
EXPORT_MP4 = "mp4"
EXPORT_MP4_H265 = "mp4-h265"
EXPORT_WEBM_VP9 = "webm"

_VIDEO = (EXPORT_AVI, EXPORT_MP4, EXPORT_MP4_H265, EXPORT_WEBM_VP9)


@dataclass
class ExportArgs:
    """exportseq_args (sequence_export.c:46-60)."""

    output: str = EXPORT_FITS
    basename: str = "export_"
    normalize: bool = False
    crop: Optional[Tuple[int, int, int, int]] = None   # x, y, w, h
    resample: Optional[Tuple[int, int]] = None         # dest w, h (video)
    fps: int = 25
    quality: int = 3                                   # 1..5
    bitdepth: int = 16


def _shift_only(H: np.ndarray) -> bool:
    """test_regdata_is_valid_and_shift: rotation/scale ≈ identity AND no
    projective terms (a perspective warp is not a shift even when its
    affine block is near-identity)."""
    return bool(np.allclose(H[:, :2, :2], np.eye(2), atol=1e-3) and
                np.allclose(H[:, 2, :2], 0.0, atol=1e-7))


def export_sequence(seq: Sequence, args: ExportArgs,
                    directory: str = ".") -> int:
    """Run the export; returns the number of frames written."""
    idx = seq.selected_indices()
    if len(idx) == 0:
        raise ValueError("no frames selected for export")
    os.makedirs(directory, exist_ok=True)

    # registration: shift-only translations relative to the ref frame
    reglayer = next(iter(seq.regparam), -1)
    shifts = None
    if reglayer != -1 and seq.regparam[reglayer].valid.any():
        reg = seq.regparam[reglayer]
        if not _shift_only(reg.H[idx]):
            raise ValueError(
                "Export has detected registration data with more than "
                "simple shifts, this is not supported")
        ref = seq.reference_image if seq.reference_image >= 0 else int(idx[0])
        dref = reg.H[ref, :2, 2]
        shifts = np.rint(reg.H[idx, :2, 2] - dref[None]).astype(int)

    coeffs = None
    if args.normalize:
        from siril_tpu.ops.normalization import (ADDITIVE_SCALING,
                                                 compute_normalization)

        coeffs = compute_normalization(seq, idx, ADDITIVE_SCALING)

    first = seq.read_frame(int(idx[0]))
    H, W = first.height, first.width
    crop = args.crop
    if crop:
        cx, cy, cw, ch = crop
        if not (0 <= cx < W and 0 <= cy < H):
            raise ValueError(f"crop origin ({cx},{cy}) outside "
                             f"{W}x{H} image")
        cw, ch = min(cw, W - cx), min(ch, H - cy)
        if cw <= 0 or ch <= 0:
            raise ValueError("crop rectangle is empty")
        crop = (cx, cy, cw, ch)
    out_w = crop[2] if crop else W
    out_h = crop[3] if crop else H
    if args.output in _VIDEO and args.resample:
        out_w, out_h = args.resample

    writer = _open_writer(seq, args, directory, out_w, out_h,
                          first.nchans)
    n = 0
    try:
        for k, i in enumerate(idx):
            img = seq.read_frame(int(i))
            data = img.data
            if shifts is not None:
                sx, sy = int(shifts[k, 0]), int(shifts[k, 1])
                if sx or sy:
                    out = np.zeros_like(data)
                    h, w = data.shape[-2:]
                    ys0, ys1 = max(0, sy), min(h, h + sy)
                    xs0, xs1 = max(0, sx), min(w, w + sx)
                    out[:, ys0:ys1, xs0:xs1] = \
                        data[:, ys0 - sy:ys1 - sy, xs0 - sx:xs1 - sx]
                    data = out
            if coeffs is not None:
                sc = coeffs.scale[:, k][:, None, None].astype(np.float32)
                off = coeffs.offset[:, k][:, None, None].astype(np.float32)
                data = np.where(data > 0, data * sc - off, data)
            if crop:
                cx, cy, cw, ch = crop
                data = data[:, cy:cy + ch, cx:cx + cw]
            if args.output in _VIDEO and args.resample and \
                    data.shape[-2:] != (out_h, out_w):
                data = _resize(data, out_w, out_h)
            out_img = SirilImage(data=np.ascontiguousarray(
                np.clip(data, 0.0, 1.0).astype(np.float32)))
            out_img.keywords = img.keywords
            _write_frame(writer, args, out_img, n, directory)
            n += 1
    finally:
        _close_writer(writer, args)
    log_message(f"Exported {n} frames to {args.output}")
    return n


def _resize(data: np.ndarray, w: int, h: int) -> np.ndarray:
    from siril_tpu.ops.geometry import resample

    tmp = SirilImage(data=np.ascontiguousarray(data.astype(np.float32)))
    return resample(tmp, w, h).data


def _open_writer(seq, args: ExportArgs, directory, w, h, nchans):
    base = os.path.join(directory, args.basename.rstrip("_"))
    if args.output == EXPORT_FITSEQ:
        from siril_tpu.core.image import FLOAT_IMG, USHORT_IMG
        from siril_tpu.io.fits_io import FitseqWriter

        return FitseqWriter(base + ".fit",
                            bitdepth=-32 if args.bitdepth == 32 else 16)
    if args.output == EXPORT_SER:
        from siril_tpu.io.ser import SER_MONO, SER_RGB, SerWriter

        return SerWriter(base + ".ser", w, h,
                         SER_RGB if nchans == 3 else SER_MONO, 16)
    if args.output == EXPORT_AVI:
        from siril_tpu.io.avi import AviWriter

        return AviWriter(base + ".avi", w, h, float(args.fps), nchans == 3)
    if args.output in (EXPORT_MP4, EXPORT_MP4_H265, EXPORT_WEBM_VP9):
        from siril_tpu.io.mp4_output import Mp4Writer

        ext = ".webm" if args.output == EXPORT_WEBM_VP9 else ".mp4"
        return Mp4Writer(base + ext, w, h, fps=args.fps,
                         nb_layers=nchans, quality=args.quality,
                         fmt=args.output)
    return None     # per-file formats (fits/tiff)


def _write_frame(writer, args: ExportArgs, img: SirilImage, k: int,
                 directory: str) -> None:
    if args.output == EXPORT_FITS:
        from siril_tpu.io.fits_io import write_fits

        path = os.path.join(directory, f"{args.basename}{k + 1:05d}.fit")
        write_fits(img, path, bitdepth=-32 if args.bitdepth == 32 else 16)
    elif args.output == EXPORT_TIFF:
        from PIL import Image

        path = os.path.join(directory, f"{args.basename}{k + 1:05d}.tif")
        arr = np.clip(img.data * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
        pim = Image.fromarray(arr[0] if arr.shape[0] == 1
                              else arr.transpose(1, 2, 0))
        pim.save(path)
    elif args.output == EXPORT_FITSEQ:
        writer.append(img)
    elif args.output == EXPORT_SER:
        writer.write_frame(img)
    elif args.output == EXPORT_AVI:
        writer.add_frame(img)
    else:
        writer.add_frame(img)


def _close_writer(writer, args: ExportArgs) -> None:
    if writer is not None:
        writer.close()
