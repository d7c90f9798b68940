"""Command surface — equivalent of ``src/core/command.c`` +
``command_list.h`` (~220 commands; full family list SURVEY.md §2.8).

Each command keeps the reference's name, argument order and ``-key=value``
flag conventions so existing `.ssf` scripts run unchanged.  Commands are
registered with precondition flags mirroring ``REQ_CMD_*``
(command_list.h): SINGLE_IMAGE, SEQUENCE, FOR_RGB, FOR_MONO, FOR_CFA.
"""

from __future__ import annotations

import glob as globmod
import json
import os
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from siril_tpu.cli.context import CommandError, Session
from siril_tpu.core.image import BYTE_IMG, FLOAT_IMG, USHORT_IMG, SirilImage
from siril_tpu.utils.log import log_error, log_message, log_warning

VERSION = "1.5.0"

# precondition flags (command_list.h REQ_CMD_*)
REQ_NONE = 0
REQ_SINGLE_IMAGE = 1
REQ_SEQUENCE = 2
REQ_FOR_RGB = 4
REQ_FOR_MONO = 8
REQ_FOR_CFA = 16


class Command:
    def __init__(self, name, fn, usage, req=REQ_NONE, min_args=0,
                 max_args=64, scriptable=True):
        self.name = name
        self.fn = fn
        self.usage = usage
        self.req = req
        self.min_args = min_args
        self.max_args = max_args
        self.scriptable = scriptable


COMMANDS: Dict[str, Command] = {}


def command(name, usage="", req=REQ_NONE, min_args=0, max_args=64,
            aliases=()):
    def deco(fn):
        cmd = Command(name, fn, usage, req, min_args, max_args)
        COMMANDS[name.lower()] = cmd
        for a in aliases:
            COMMANDS[a.lower()] = cmd
        return fn

    return deco


def parse_flags(args: List[str]):
    """Split ['-key=value', '-flag', 'pos'] → (positional, {key: value})."""
    pos, flags = [], {}
    for a in args:
        # flags start with '-' + letter OR digit (-2pass, -32b, -16b);
        # negative numbers and sexagesimal coordinates like -05:24:00
        # stay positional
        if a.startswith("-") and len(a) > 1 and a[1].isalnum() \
                and not _is_number(a) and ":" not in a.split("=")[0]:
            if "=" in a:
                k, v = a[1:].split("=", 1)
                flags[k.lower()] = v
            else:
                flags[a[1:].lower()] = True
        else:
            pos.append(a)
    return pos, flags


def _is_number(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _f(v, default=None):
    return float(v) if v is not None and v is not True else default


# ===========================================================================
# I/O & session
# ===========================================================================


@command("load", "load filename", min_args=1)
def cmd_load(ctx: Session, args):
    from siril_tpu.io.conversion import load_any

    name = args[0]
    p = ctx.path(name)
    if not os.path.exists(p):
        for ext in (ctx.ext, ".fit", ".fits", ".fts", ".tif", ".png"):
            if os.path.exists(p + ext):
                p = p + ext
                break
        else:
            raise CommandError(f"file not found: {name}")
    img = load_any(p)
    ctx.set_image(img, os.path.basename(p))
    log_message(f"Reading FITS: '{os.path.basename(p)}', "
                f"{img.nchans} layer(s), {img.width}x{img.height}")


@command("save", "save filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_save(ctx: Session, args):
    from siril_tpu.io.fits_io import write_fits

    pos, flags = parse_flags(args)
    name = pos[0]
    if "$" in name:
        # $KEY:fmt$ header substitution in save paths (io/path_parse.c)
        from siril_tpu.utils.pathparse import parse_path

        name = parse_path(name, ctx.require_image())
    p = ctx.path(name)
    os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
    if not os.path.splitext(p)[1]:
        p += ctx.ext
    bd = USHORT_IMG if ctx.force_16bit else ctx.image.orig_bitdepth
    comp = getattr(ctx.prefs, "comp_enabled", False) and \
        getattr(ctx.prefs, "comp_method", "rice") or None
    write_fits(ctx.image, p, bitdepth=bd, compression=comp)
    log_message(f"Saving FITS: '{os.path.basename(p)}'"
                + (f" (compressed: {comp})" if comp else ""))


def _save_pil(ctx, args, fmt, mode="u8"):
    from PIL import Image

    pos, flags = parse_flags(args)
    p = ctx.path(pos[0])
    if not os.path.splitext(p)[1]:
        p += "." + fmt
    img = ctx.require_image()
    if mode == "u16" and fmt in ("tif", "tiff", "png"):
        arr = img.to_u16()
        a = np.moveaxis(arr, 0, 2).squeeze()
    else:
        arr = img.to_u8()
        a = np.moveaxis(arr, 0, 2).squeeze()
    pim = Image.fromarray(a)
    if fmt in ("jpg", "jpeg"):
        pim.save(p, quality=int(_f(flags.get("quality"), 90) or 90))
    elif fmt in ("tif", "tiff") and "deflate" in flags:
        pim.save(p, compression="tiff_deflate")
    else:
        pim.save(p)
    log_message(f"Saving image: '{os.path.basename(p)}'")


@command("savejpg", "savejpg filename [quality]", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_savejpg(ctx, args):
    _save_pil(ctx, args, "jpg")


@command("savepng", "savepng filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_savepng(ctx, args):
    _save_pil(ctx, args, "png", mode="u16")


@command("savetif", "savetif filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_savetif(ctx, args):
    _save_pil(ctx, args, "tif", mode="u16")


@command("savetif8", "savetif8 filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_savetif8(ctx, args):
    _save_pil(ctx, args, "tif", mode="u8")


@command("savetif32", "savetif32 filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_savetif32(ctx, args):
    from PIL import Image

    p = ctx.path(args[0])
    if not os.path.splitext(p)[1]:
        p += ".tif"
    a = np.moveaxis(ctx.require_image().host(), 0, 2).squeeze()
    Image.fromarray(a, mode="F" if a.ndim == 2 else None).save(p)


@command("savebmp", "savebmp filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_savebmp(ctx, args):
    _save_pil(ctx, args, "bmp")


@command("savepnm", "savepnm filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_savepnm(ctx, args):
    _save_pil(ctx, args, "ppm")


@command("close", "close")
def cmd_close(ctx, args):
    ctx.image = None
    ctx.image_name = ""


@command("new", "new width height nb_chan", min_args=3)
def cmd_new(ctx, args):
    w, h, c = int(args[0]), int(args[1]), int(args[2])
    ctx.set_image(SirilImage(data=np.zeros((c, h, w), np.float32)), "new")


@command("cd", "cd directory", min_args=1)
def cmd_cd(ctx, args):
    p = ctx.path(args[0])
    if not os.path.isdir(p):
        raise CommandError(f"no such directory: {args[0]}")
    ctx.cwd = os.path.abspath(p)
    log_message(f"Setting CWD to '{ctx.cwd}'")


@command("pwd", "pwd")
def cmd_pwd(ctx, args):
    log_message(ctx.cwd)


@command("ls", "ls", aliases=("dir",))
def cmd_ls(ctx, args):
    for f in sorted(os.listdir(ctx.cwd)):
        log_message(f)


@command("setext", "setext extension", min_args=1)
def cmd_setext(ctx, args):
    e = args[0].lower().lstrip(".")
    if e not in ("fit", "fits", "fts"):
        raise CommandError("extension must be fit/fits/fts")
    ctx.ext = "." + e
    ctx.prefs.ext = ctx.ext


@command("set16bits", "set16bits")
def cmd_set16(ctx, args):
    ctx.force_16bit = True
    ctx.prefs.force_16bit = True


@command("set32bits", "set32bits")
def cmd_set32(ctx, args):
    ctx.force_16bit = False
    ctx.prefs.force_16bit = False


@command("set", "set key=value | set -import=file", min_args=1)
def cmd_set(ctx, args):
    a = args[0]
    if a.startswith("-import="):
        from siril_tpu.core.settings import Preferences

        ctx.prefs = Preferences.load_ini(ctx.path(a.split("=", 1)[1]))
        return
    if "=" not in a:
        raise CommandError("usage: set key=value")
    k, v = a.split("=", 1)
    try:
        ctx.prefs.set(k, v)
    except KeyError as e:
        raise CommandError(str(e))


@command("get", "get key | get -a", min_args=1)
def cmd_get(ctx, args):
    if args[0] in ("-a", "-A"):
        for k, v in ctx.prefs.list_all().items():
            log_message(f"{k} = {v}")
        return
    try:
        log_message(f"{args[0]} = {ctx.prefs.get(args[0])}")
    except KeyError as e:
        raise CommandError(str(e))


@command("setmem", "setmem ratio", min_args=1)
def cmd_setmem(ctx, args):
    ctx.prefs.memory_ratio = float(args[0])


@command("setcpu", "setcpu number", min_args=1)
def cmd_setcpu(ctx, args):
    ctx.prefs.cpu_threads = int(args[0])


@command("capabilities", "capabilities")
def cmd_capabilities(ctx, args):
    import jax

    log_message(f"siril_tpu {VERSION} (Siril-compatible command surface)")
    log_message(f"JAX backend: {jax.default_backend()}, "
                f"{len(jax.devices())} device(s)")
    from siril_tpu import native

    log_message("Formats: FITS (r/w, RICE/GZIP tile compression), "
                "SER (r/w), FITSEQ (r/w), XISF (r/w), AVI (r/w), PIC (r), "
                "DNG (r), TIFF/PNG/JPEG/BMP/PNM/WebP/AVIF via PIL")
    try:
        import cv2  # noqa: F401

        log_message("Film: import AVI/MPG/MPEG/MOV/MP4/WebM (ffmpeg); "
                    "export MP4/WebM (seqexport)")
    except ImportError:
        log_message("Film: AVI only (OpenCV-ffmpeg unavailable)")
    log_message(f"Native I/O kernels: "
                f"{'available' if native.available() else 'python fallback'}")
    log_message(f"Commands: {len({c.name for c in COMMANDS.values()})}")


@command("requires", "requires version", min_args=1)
def cmd_requires(ctx, args):
    def vtup(s):
        return tuple(int(x) for x in s.split("-")[0].split(".")[:3])

    try:
        need = vtup(args[0])
    except ValueError:
        raise CommandError(f"invalid version: {args[0]}")
    if need > vtup(VERSION):
        raise CommandError(
            f"script requires version {args[0]}, this is {VERSION}")


@command("exit", "exit")
def cmd_exit(ctx, args):
    ctx.stop_requested = True


@command("dumpheader", "dumpheader", req=REQ_SINGLE_IMAGE)
def cmd_dumpheader(ctx, args):
    img = ctx.require_image()
    if img.header_text:
        for line in img.header_text.splitlines():
            log_message(line)
    else:
        log_message("no FITS header")


@command("jsonmetadata", "jsonmetadata FITS_file", min_args=1)
def cmd_jsonmetadata(ctx, args):
    from siril_tpu.io.fits_io import read_fits
    from siril_tpu.ops.statistics import STATS_MAIN, compute_stats_image

    pos, flags = parse_flags(args)
    img = read_fits(ctx.path(pos[0]))
    meta = {"width": img.width, "height": img.height, "channels": img.nchans}
    if "nostats" not in flags:
        sts = compute_stats_image(img, options=STATS_MAIN)
        meta["statistics"] = [vars(s) for s in sts]
    out = json.dumps(meta)
    if "out" in flags and flags["out"] is not True:
        with open(ctx.path(flags["out"]), "w") as f:
            f.write(out)
    log_message(out)


@command("stat", "stat [main] [-cfa]", req=REQ_SINGLE_IMAGE)
def cmd_stat(ctx, args):
    from siril_tpu.ops.statistics import (STATS_BASIC, STATS_MAIN,
                                          compute_stats_image,
                                          compute_stats_np)

    pos, flags = parse_flags(args)
    args = pos
    if "cfa" in flags and ctx.image.nchans == 1:
        # per-CFA-subchannel stats (statistics.c CFA option)
        d = ctx.require_image().host()[0]
        names = ("CFA0", "CFA1", "CFA2", "CFA3")
        for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            st = compute_stats_np(d[dy::2, dx::2], STATS_BASIC)
            log_message(f"{names[k]}: mean: {st.mean:.6f}, median: "
                        f"{st.median:.6f}, sigma: {st.sigma:.6f}, "
                        f"bgnoise: {st.bgnoise:.6f}")
        return
    opt = STATS_MAIN if (args and args[0] == "main") else STATS_BASIC
    for c, s in enumerate(compute_stats_image(ctx.image, options=opt)):
        log_message(
            f"B{c}: mean: {s.mean:.6f}, median: {s.median:.6f}, "
            f"sigma: {s.sigma:.6f}, bgnoise: {s.bgnoise:.6f}, "
            f"min: {s.min:.6f}, max: {s.max:.6f}"
            + (f", mad: {s.mad:.6f}, avgdev: {s.avgdev:.6f}"
               if opt == STATS_MAIN else ""))


@command("bg", "bg", req=REQ_SINGLE_IMAGE)
def cmd_bg(ctx, args):
    from siril_tpu.ops.statistics import STATS_BASIC, compute_stats_image

    for c, s in enumerate(compute_stats_image(ctx.image, options=STATS_BASIC)):
        log_message(f"Background value (channel: #{c}): {s.median:.6f}")


@command("bgnoise", "bgnoise", req=REQ_SINGLE_IMAGE)
def cmd_bgnoise(ctx, args):
    from siril_tpu.ops.statistics import STATS_BASIC, compute_stats_image

    for c, s in enumerate(compute_stats_image(ctx.image, options=STATS_BASIC)):
        log_message(f"Background noise value (channel: #{c}): "
                    f"{s.bgnoise * 65535:.3f} ({s.bgnoise:.3e})")


@command("entropy", "entropy", req=REQ_SINGLE_IMAGE)
def cmd_entropy(ctx, args):
    img = ctx.require_image()
    for c in range(img.nchans):
        h, _ = np.histogram(img.host()[c], bins=256, range=(0, 1))
        p = h / max(h.sum(), 1)
        p = p[p > 0]
        e = float(-(p * np.log2(p)).sum())
        log_message(f"Entropy (channel #{c}): {e:.3f}")


@command("boxselect", "boxselect [-clear] [x y w h]")
def cmd_boxselect(ctx, args):
    pos, flags = parse_flags(args)
    if "clear" in flags:
        ctx.selection = None
        return
    args = pos
    if len(args) >= 4:
        ctx.selection = tuple(int(float(a)) for a in args[:4])
        log_message(f"Selection: {ctx.selection}")
    elif ctx.selection:
        log_message(f"Selection: {ctx.selection}")
    else:
        log_message("no selection")


@command("update_key", "update_key [-delete] [-modify] [-comment] key [value]",
         req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_update_key(ctx, args):
    img = ctx.require_image()
    pos, flags = parse_flags(args)
    args = pos
    if "delete" in flags or len(args) == 1:
        img.keywords.extra.pop(args[0].upper(), None)
        return
    if "comment" in flags:
        img.history.append(f"COMMENT {' '.join(args)}")
        return
    if len(args) == 1:
        img.keywords.extra.pop(args[0].upper(), None)
    else:
        v = args[1]
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        img.keywords.extra[args[0].upper()] = v


# ===========================================================================
# conversion & sequence management
# ===========================================================================


@command("convert", "convert basename [-debayer] [-start=index] [-out=] [-fitseq|-ser]",
         min_args=1)
def cmd_convert(ctx, args):
    from siril_tpu.io.conversion import FITS_EXT, PIL_EXT, convert_to_sequence

    pos, flags = parse_flags(args)
    dest = pos[0]
    out_dir = ctx.path(flags.get("out", ".")) if isinstance(
        flags.get("out"), str) else ctx.cwd
    from siril_tpu.io.films import FILM_EXTENSIONS

    exts = FITS_EXT + PIL_EXT + (".ser", ".dng", ".cr2", ".nef", ".arw",
                                 ".raf", ".heic", ".heif") + FILM_EXTENSIONS
    outpat = __import__("re").compile(__import__("re").escape(dest) + r"\d+\.")
    files = [f for f in globmod.glob(os.path.join(ctx.cwd, "*"))
             if os.path.splitext(f)[1].lower() in exts
             and not outpat.match(os.path.basename(f))]
    if not files:
        raise CommandError("no convertible files found")
    output = "ser" if "ser" in flags else (
        "fitseq" if "fitseq" in flags else "fits")
    seq = convert_to_sequence(files, dest, out_dir, output=output,
                              symlink=False,
                              start=int(_f(flags.get("start"), 1) or 1),
                              debayer="debayer" in flags)
    ctx.seq = seq


@command("link", "link basename [-start=] [-out=]", min_args=1)
def cmd_link(ctx, args):
    from siril_tpu.io.conversion import FITS_EXT, convert_to_sequence

    pos, flags = parse_flags(args)
    dest = pos[0]
    outpat = __import__("re").compile(__import__("re").escape(dest) + r"\d+\.")
    files = [f for f in globmod.glob(os.path.join(ctx.cwd, "*"))
             if os.path.splitext(f)[1].lower() in FITS_EXT
             and not outpat.match(os.path.basename(f))]
    if not files:
        raise CommandError("no FITS files found")
    ctx.seq = convert_to_sequence(
        files, dest, ctx.cwd, symlink=True,
        start=int(_f(flags.get("start"), 1) or 1))


@command("select", "select sequencename from to", min_args=3)
def cmd_select(ctx, args):
    seq = ctx.load_sequence(args[0])
    a, b = int(args[1]), int(args[2])
    seq.incl[a:b + 1] = True
    seq.needs_saving = True
    seq.save()


@command("unselect", "unselect sequencename from to", min_args=3)
def cmd_unselect(ctx, args):
    seq = ctx.load_sequence(args[0])
    a, b = int(args[1]), int(args[2])
    seq.incl[a:b + 1] = False
    seq.save()


@command("setref", "setref sequencename image_number", min_args=2)
def cmd_setref(ctx, args):
    seq = ctx.load_sequence(args[0])
    seq.set_reference(int(args[1]) - 1)
    seq.save()


@command("getref", "getref sequencename", min_args=1)
def cmd_getref(ctx, args):
    seq = ctx.load_sequence(args[0])
    log_message(f"reference image of sequence: {seq.get_reference() + 1}")


@command("seqstat", "seqstat sequencename output [option]", min_args=2)
def cmd_seqstat(ctx, args):
    from siril_tpu.ops.statistics import STATS_MAIN, compute_stats_np

    seq = ctx.load_sequence(args[0])
    rows = ["image\tchan\tmean\tmedian\tsigma\tbgnoise\tmin\tmax\tmad"]
    for i in seq.selected_indices():
        img = seq.read_frame(int(i))
        for c in range(img.nchans):
            s = compute_stats_np(img.host()[c], STATS_MAIN)
            rows.append(f"{i + 1}\t{c}\t{s.mean:.6f}\t{s.median:.6f}\t"
                        f"{s.sigma:.6f}\t{s.bgnoise:.6f}\t{s.min:.6f}\t"
                        f"{s.max:.6f}\t{s.mad:.6f}")
    with open(ctx.path(args[1]), "w") as f:
        f.write("\n".join(rows) + "\n")
    log_message(f"Statistics saved to {args[1]}")


@command("seqheader", "seqheader sequencename keyword", min_args=2)
def cmd_seqheader(ctx, args):
    seq = ctx.load_sequence(args[0])
    keys = [k.upper() for k in args[1:]]
    for i in seq.selected_indices():
        kw = seq.read_frame_metadata(int(i))
        vals = []
        for k in keys:
            v = kw.extra.get(k)
            if v is None:
                from siril_tpu.io.fits_io import _KEYMAP

                attr = _KEYMAP.get(k)
                v = getattr(kw, attr, "") if attr else ""
            vals.append(str(v))
        log_message(f"{i + 1}\t" + "\t".join(vals))


@command("seqclean", "seqclean sequencename [-reg] [-stat] [-sel]", min_args=1)
def cmd_seqclean(ctx, args):
    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    clean_all = not flags
    if clean_all or "reg" in flags:
        seq.regparam.clear()
    if clean_all or "stat" in flags:
        seq.stats.clear()
    if clean_all or "sel" in flags:
        seq.incl[:] = True
    seq.save()


# ===========================================================================
# calibration
# ===========================================================================


def _load_master(ctx, name):
    from siril_tpu.io.conversion import load_any

    if name in ("", None):
        return None
    p = ctx.path(name)
    if not os.path.exists(p):
        for ext in (ctx.ext, ".fit", ".fits", ".fts"):
            if os.path.exists(p + ext):
                p = p + ext
                break
        else:
            raise CommandError(f"master not found: {name}")
    return load_any(p)


def _calib_args_from_flags(ctx, flags, ref_img=None):
    from siril_tpu.ops.calibration import CalibArgs, evaluate_offset_level

    ca = CalibArgs()
    b = flags.get("bias")
    if isinstance(b, str):
        if b.startswith("="):
            if ref_img is None:
                raise CommandError("synthetic bias needs a loaded image")
            ca.bias_level = evaluate_offset_level(b, ref_img)
        else:
            ca.bias = _load_master(ctx, b)
    if isinstance(flags.get("dark"), str):
        ca.dark = _load_master(ctx, flags["dark"])
    if isinstance(flags.get("flat"), str):
        ca.flat = _load_master(ctx, flags["flat"])
    ca.use_dark_optim = "opt" in flags
    ca.use_exposure = flags.get("opt") == "exp"
    if "cc" in flags:
        v = flags.get("cc")
        if v == "dark" or v is True:
            ca.use_cosmetic = True
    else:
        ca.use_cosmetic = False
    ca.is_cfa = "cfa" in flags
    ca.debayer = "debayer" in flags
    ca.equalize_cfa = "equalize_cfa" in flags or ca.is_cfa
    if isinstance(flags.get("prefix"), str):
        ca.prefix = flags["prefix"]
    return ca


@command("calibrate", "calibrate sequencename [-bias=] [-dark=] [-flat=] [-cc=dark] [-cfa] [-debayer] [-opt] [-prefix=]",
         min_args=1)
def cmd_calibrate(ctx, args):
    from siril_tpu.ops.calibration import calibrate_sequence

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    ref = seq.read_frame(int(seq.selected_indices()[0]))
    ca = _calib_args_from_flags(ctx, flags, ref)
    res = calibrate_sequence(seq, ca)
    ctx.seq = res.new_seq or seq
    log_message(f"Calibration: {res.processed} images processed")


@command("calibrate_single", "calibrate_single imagename [flags]",
         min_args=1)
def cmd_calibrate_single(ctx, args):
    from siril_tpu.io.conversion import load_any
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.calibration import calibrate_image

    pos, flags = parse_flags(args)
    p = ctx.path(pos[0])
    img = load_any(p)
    ca = _calib_args_from_flags(ctx, flags, img)
    out = calibrate_image(img, ca)
    prefix = ca.prefix or "pp_"
    d, b = os.path.split(p)
    outp = os.path.join(d, prefix + b)
    write_fits(out, outp)
    log_message(f"Saved calibrated image {prefix + b}")


@command("find_hot", "find_hot filename cold_sigma hot_sigma",
         req=REQ_SINGLE_IMAGE, min_args=3)
def cmd_find_hot(ctx, args):
    from siril_tpu.ops.cosmetic import detect_deviant_from_dark

    img = ctx.require_image()
    cold, hot = detect_deviant_from_dark(img.host()[0], float(args[1]),
                                         float(args[2]))
    lst = ctx.path(args[0] + ".lst" if not args[0].endswith(".lst") else args[0])
    with open(lst, "w") as f:
        ys, xs = np.nonzero(hot)
        for y, x in zip(ys, xs):
            f.write(f"P {x} {img.height - 1 - y} H\n")
        ys, xs = np.nonzero(cold)
        for y, x in zip(ys, xs):
            f.write(f"P {x} {img.height - 1 - y} C\n")
    log_message(f"{int(hot.sum())} hot and {int(cold.sum())} cold pixels "
                f"written to {os.path.basename(lst)}")


@command("find_cosme", "find_cosme cold_sigma hot_sigma",
         req=REQ_SINGLE_IMAGE, min_args=2, aliases=("find_cosme_cfa",))
def cmd_find_cosme(ctx, args):
    from siril_tpu.ops.cosmetic import auto_detect_and_correct

    img = ctx.require_image()
    cold_sig, hot_sig = float(args[0]), float(args[1])
    out = img.host().copy()
    tot_c = tot_h = 0
    for c in range(img.nchans):
        res, cold, hot = auto_detect_and_correct(
            out[c], sig_hot=hot_sig, sig_cold=cold_sig,
            is_cfa=img.is_cfa())
        out[c] = np.asarray(res)
        tot_c += int(cold.sum())
        tot_h += int(hot.sum())
    ctx.set_image(img.copy(data=out))
    log_message(f"{tot_c} cold and {tot_h} hot pixels corrected")


@command("cosme", "cosme filename", req=REQ_SINGLE_IMAGE, min_args=1,
         aliases=("cosme_cfa",))
def cmd_cosme(ctx, args):
    from siril_tpu.ops.cosmetic import apply_cosme_file

    img = ctx.require_image()
    p = ctx.path(args[0] if args[0].endswith(".lst") else args[0] + ".lst")
    if not os.path.exists(p):
        raise CommandError(f"file not found: {args[0]}")
    entries = []
    with open(p) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "P" and len(t) >= 3:
                # file y is bottom-up (Siril convention)
                entries.append(("P", int(float(t[1])),
                                img.height - 1 - int(float(t[2]))))
            elif t[0] == "L" and len(t) >= 2:
                entries.append(("L", img.height - 1 - int(float(t[1]))))
            elif t[0] == "C" and len(t) >= 2:
                entries.append(("C", int(float(t[1]))))
    out = apply_cosme_file(img, entries, is_cfa="cfa" in COMMANDS)
    ctx.set_image(img.copy(data=np.asarray(out)))
    log_message(f"Applied {len(entries)} cosmetic corrections")


@command("grey_flat", "grey_flat", req=REQ_SINGLE_IMAGE)
def cmd_grey_flat(ctx, args):
    from siril_tpu.ops.calibration import equalize_cfa_flat

    img = ctx.require_image()
    ctx.set_image(img.copy(data=equalize_cfa_flat(img.host())))


# ===========================================================================
# CFA
# ===========================================================================


@command("split_cfa", "split_cfa", req=REQ_SINGLE_IMAGE | REQ_FOR_CFA)
def cmd_split_cfa(ctx, args):
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.extraction import split_cfa

    img = ctx.require_image()
    subs = split_cfa(img)
    base = os.path.splitext(ctx.image_name or "image")[0]
    for i, s in enumerate(subs):
        write_fits(s, ctx.path(f"CFA{i}_{base}{ctx.ext}"))
    log_message(f"Extracted 4 CFA channels from {base}")


@command("extract_ha", "extract_Ha [-upscale]", req=REQ_SINGLE_IMAGE,
         aliases=("extract_haoiii_ha",))
def cmd_extract_ha(ctx, args):
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.extraction import extract_ha

    pos, flags = parse_flags(args)
    img = ctx.require_image()
    out = extract_ha(img, upscale="upscale" in flags)
    base = os.path.splitext(ctx.image_name or "image")[0]
    write_fits(out, ctx.path(f"Ha_{base}{ctx.ext}"))
    ctx.set_image(out, f"Ha_{base}")


@command("extract_green", "extract_Green", req=REQ_SINGLE_IMAGE)
def cmd_extract_green(ctx, args):
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.extraction import extract_green

    img = ctx.require_image()
    out = extract_green(img)
    base = os.path.splitext(ctx.image_name or "image")[0]
    write_fits(out, ctx.path(f"Green_{base}{ctx.ext}"))
    ctx.set_image(out, f"Green_{base}")


@command("extract_haoiii", "extract_HaOIII [-resample=ha|oiii]",
         req=REQ_SINGLE_IMAGE)
def cmd_extract_haoiii(ctx, args):
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.extraction import extract_ha_oiii

    pos, flags = parse_flags(args)
    img = ctx.require_image()
    ha, oiii = extract_ha_oiii(img, resample=str(flags.get("resample", "oiii")))
    base = os.path.splitext(ctx.image_name or "image")[0]
    write_fits(ha, ctx.path(f"Ha_{base}{ctx.ext}"))
    write_fits(oiii, ctx.path(f"OIII_{base}{ctx.ext}"))
    log_message("Extracted Ha and OIII layers")


@command("merge_cfa", "merge_cfa f0 f1 f2 f3 pattern", min_args=5)
def cmd_merge_cfa(ctx, args):
    from siril_tpu.io.conversion import load_any
    from siril_tpu.ops.extraction import merge_cfa

    imgs = [load_any(ctx.path(a)) for a in args[:4]]
    out = merge_cfa(imgs, args[4])
    ctx.set_image(out, "merged_cfa")


# ===========================================================================
# registration & stacking
# ===========================================================================


@command("setfindstar", "setfindstar [reset] [-radius=] [-sigma=] [-roundness=] [-focal=] [-pixelsize=] [-convergence=] [-gaussian|-moffat] [-minbeta=] [-minA=] [-maxA=] [-maxR=] [-relax=on|off]")
def cmd_setfindstar(ctx, args):
    pos, flags = parse_flags(args)
    p = ctx.prefs
    if pos and pos[0] == "reset":
        from siril_tpu.core.settings import Preferences

        d = Preferences()
        for f in ("sf_radius", "sf_sigma", "sf_roundness", "sf_convergence",
                  "sf_relax", "sf_profile", "sf_min_beta", "sf_min_a",
                  "sf_max_a", "sf_max_r"):
            setattr(p, f, getattr(d, f, getattr(p, f, None)))
    if "radius" in flags:
        p.sf_radius = int(float(flags["radius"]))
    if "sigma" in flags:
        p.sf_sigma = float(flags["sigma"])
    if "roundness" in flags:
        p.sf_roundness = float(flags["roundness"])
    if "convergence" in flags:
        p.sf_convergence = int(float(flags["convergence"]))
    if "relax" in flags:
        p.sf_relax = str(flags["relax"]).lower() in ("on", "1", "true")
    if "gaussian" in flags:
        p.sf_profile = 0
    if "moffat" in flags:
        p.sf_profile = 1
    if "minbeta" in flags:
        p.sf_min_beta = float(flags["minbeta"])
    if "mina" in flags:
        p.sf_min_a = float(flags["mina"])
    if "maxa" in flags:
        p.sf_max_a = float(flags["maxa"])
    if "maxr" in flags:
        p.sf_max_r = float(flags["maxr"])
    if "focal" in flags:
        p.focal_length = float(flags["focal"])
    if "pixelsize" in flags:
        p.pixel_size = float(flags["pixelsize"])
    log_message(f"starfinder: radius={p.sf_radius} sigma={p.sf_sigma} "
                f"roundness={p.sf_roundness}")


def _sf_params(ctx):
    from siril_tpu.registration.starfinder import StarFinderParams

    p = ctx.prefs
    return StarFinderParams(
        radius=p.sf_radius, sigma=p.sf_sigma, roundness=p.sf_roundness,
        convergence=getattr(p, "sf_convergence", 1),
        relax_checks=getattr(p, "sf_relax", False),
        profile=getattr(p, "sf_profile", 0),
        min_beta=getattr(p, "sf_min_beta", 1.5),
        min_A=getattr(p, "sf_min_a", 0.0),
        max_A=getattr(p, "sf_max_a", 0.0),
        max_r=getattr(p, "sf_max_r", 1.0))


@command("findstar", "findstar [-out=]", req=REQ_SINGLE_IMAGE)
def cmd_findstar(ctx, args):
    from siril_tpu.registration.starfinder import detect_stars, save_star_list_csv

    pos, flags = parse_flags(args)
    img = ctx.require_image()
    layer = 1 if img.nchans == 3 else 0
    stars = detect_stars(img.host()[layer], _sf_params(ctx))
    ctx.stars = stars
    log_message(f"Found {len(stars)} stars in image, channel #{layer}")
    if isinstance(flags.get("out"), str):
        save_star_list_csv(stars, ctx.path(flags["out"]))


@command("clearstar", "clearstar")
def cmd_clearstar(ctx, args):
    ctx.stars = []


@command("register", "register sequencename [-2pass] [-noout] [-transf=] [-layer=] [-prefix=] [-minpairs=] [-maxstars=] [-interp=] [-noclamp]",
         min_args=1)
def cmd_register(ctx, args):
    from siril_tpu.ops.interp import INTERP_NAMES
    from siril_tpu.registration.global_reg import RegArgs, register_sequence
    from siril_tpu.registration.matching import (
        AFFINE_TRANSFORMATION,
        HOMOGRAPHY_TRANSFORMATION,
        SHIFT_TRANSFORMATION,
        SIMILARITY_TRANSFORMATION,
    )

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])

    if "3stars" in flags:
        # headless 1/2/3-star registration (3stars.c):
        # -star1=x,y [-star2=x,y] [-star3=x,y] [-boxsize=n]
        from siril_tpu.registration.threestars import register_three_stars

        picked = []
        for key in ("star1", "star2", "star3"):
            v = flags.get(key)
            if isinstance(v, str) and "," in v:
                x, y = v.split(",", 1)
                picked.append((float(x), float(y)))
        if not picked:
            raise CommandError("register -3stars needs -star1=x,y "
                               "(and optionally -star2/-star3)")
        layer = int(float(flags.get("layer", 0) or 0))
        box = int(float(flags.get("boxsize", 30) or 30))
        try:
            register_three_stars(seq, picked, layer=layer, box=box)
        except ValueError as e:
            raise CommandError(str(e))
        return

    ra = RegArgs(starfinder=_sf_params(ctx))
    ra.two_pass = "2pass" in flags
    ra.output = "noout" not in flags and not ra.two_pass
    tmap = {"shift": SHIFT_TRANSFORMATION, "similarity": SIMILARITY_TRANSFORMATION,
            "affine": AFFINE_TRANSFORMATION, "homography": HOMOGRAPHY_TRANSFORMATION}
    if isinstance(flags.get("transf"), str):
        ra.ttype = tmap.get(flags["transf"].lower(), ra.ttype)
    if "layer" in flags:
        ra.reglayer = int(float(flags["layer"]))
    if isinstance(flags.get("prefix"), str):
        ra.prefix = flags["prefix"]
    if "minpairs" in flags:
        ra.min_pairs = int(float(flags["minpairs"]))
    if "maxstars" in flags:
        ra.max_stars = int(float(flags["maxstars"]))
    if isinstance(flags.get("interp"), str):
        ra.interpolation = INTERP_NAMES.get(flags["interp"].lower(),
                                            ra.interpolation)
    if "noclamp" in flags:
        ra.clamp = False
    if "scale" in flags:
        ra.scale = float(flags["scale"])
    if isinstance(flags.get("extref"), str):
        ra.extref = ctx.path(flags["extref"])
    ra.save_starlists = "nostarlist" not in flags
    if "selected" in flags:
        pass        # frames outside the selection are already excluded
    disto_file = ""
    if isinstance(flags.get("disto"), str):
        disto_file = ctx.path(flags["disto"])
        if not os.path.splitext(disto_file)[1]:
            disto_file += ctx.ext
    if "drizzle" in flags:
        # register -drizzle (Bayer drizzle workflow): compute transforms,
        # then drizzle every frame onto the output grid
        ra.output = False
        register_sequence(seq, ra)
        _drizzle_out_sequence(ctx, seq, ra.reglayer, ra.prefix or "r_",
                              flags)
        log_message(f"Registration complete: {int(seq.incl.sum())} images")
        return
    if disto_file:
        # register -disto=: transforms first, then warp with the SIP
        # master composed into the sampling pass
        from siril_tpu.registration.global_reg import (
            ApplyRegArgs,
            apply_reg_sequence,
        )

        ra.output = False
        register_sequence(seq, ra)
        aa2 = ApplyRegArgs(reglayer=ra.reglayer, prefix=ra.prefix,
                           interpolation=ra.interpolation, clamp=ra.clamp,
                           scale=ra.scale, disto_file=disto_file)
        res2 = apply_reg_sequence(seq, aa2)
        ctx.seq = res2.new_seq or seq
        log_message(f"Registration complete: {res2.processed} images")
        return
    res = register_sequence(seq, ra)
    if res.new_seq is not None:
        ctx.seq = res.new_seq
    else:
        ctx.seq = seq
    log_message(f"Registration complete: {res.processed} images")


def _drizzle_out_sequence(ctx, seq, reglayer, prefix, flags):
    """Per-frame drizzle output sequence (applyreg.c drizzle path,
    initialize_drizzle_params:1111); shared by `seqapplyreg -drizzle`
    and `register -drizzle`.  -flat= provides the drizzle weight plane."""
    from siril_tpu.core.sequence import Sequence as _Seq
    from siril_tpu.io.conversion import load_any
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.drizzle import (
        KERNEL_NAMES,
        DrizzleArgs,
        DrizzleAccumulator,
    )

    da = DrizzleArgs(scale=_f(flags.get("scale"), 2.0) or 2.0,
                     pixfrac=_f(flags.get("pixfrac"), 1.0) or 1.0)
    if isinstance(flags.get("kernel"), str):
        da.kernel = KERNEL_NAMES.get(flags["kernel"].lower(), da.kernel)
    wplane = None
    if isinstance(flags.get("flat"), str):
        fp = ctx.path(flags["flat"])
        if not os.path.splitext(fp)[1]:
            fp += ctx.ext
        wplane = load_any(fp).host()[0]
    reg = seq.reg(reglayer)
    first = seq.read_frame(int(seq.selected_indices()[0]))
    da.use_bayer = first.is_cfa()
    C = 3 if (da.use_bayer and first.is_cfa()) else first.nchans
    out_shape = (C, int(seq.ry * da.scale), int(seq.rx * da.scale))
    outs = []
    for i in seq.selected_indices():
        if not reg.valid[i]:
            continue
        acc = DrizzleAccumulator(out_shape, da)
        acc.add_frame(seq.read_frame(int(i)), reg.H[int(i)],
                      weight_plane=wplane)
        out_img, _ = acc.finalize(want_weight=False)
        pth = ctx.path(f"{prefix}{seq.name}{int(seq.filenum[i]):05d}.fit")
        write_fits(out_img, pth, bitdepth=FLOAT_IMG)
        outs.append(pth)
    new_seq = _Seq.from_files(outs, name=f"{prefix}{seq.name}")
    new_seq.save()
    ctx.seq = new_seq
    log_message(f"drizzle: {len(outs)} frames at x{da.scale}")
    return new_seq


@command("seqapplyreg", "seqapplyreg sequencename [-framing=] [-interp=] [-prefix=] [-layer=] [-scale=] [-noclamp]",
         min_args=1)
def cmd_seqapplyreg(ctx, args):
    from siril_tpu.ops.interp import INTERP_NAMES
    from siril_tpu.registration.global_reg import (
        FRAMING_NAMES,
        ApplyRegArgs,
        apply_reg_sequence,
    )

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    aa = ApplyRegArgs()
    if isinstance(flags.get("framing"), str):
        aa.framing = FRAMING_NAMES.get(flags["framing"].lower(), aa.framing)
    if isinstance(flags.get("interp"), str):
        aa.interpolation = INTERP_NAMES.get(flags["interp"].lower(),
                                            aa.interpolation)
    if isinstance(flags.get("prefix"), str):
        aa.prefix = flags["prefix"]
    if "layer" in flags:
        aa.reglayer = int(float(flags["layer"]))
    if "scale" in flags:
        aa.scale = float(flags["scale"])
    if "noclamp" in flags:
        aa.clamp = False
    if isinstance(flags.get("disto"), str):
        aa.disto_file = ctx.path(flags["disto"])
        if not os.path.splitext(aa.disto_file)[1]:
            aa.disto_file += ctx.ext
    # frame filtering (-filter-fwhm= etc., sequence_filtering.c)
    from siril_tpu.core.filtering import apply_filters, parse_filter_flag

    fspecs = []
    for k, v in flags.items():
        if k.startswith("filter-"):
            spec = parse_filter_flag(k, v)
            if spec is not None:
                fspecs.append(spec)
    if fspecs:
        kept = apply_filters(seq, fspecs, aa.reglayer)
        mask = np.zeros(seq.number, bool)
        mask[np.asarray(kept, int)] = True
        seq.incl[:] = seq.incl & mask
        log_message(f"seqapplyreg filter: {int(seq.incl.sum())} of "
                    f"{seq.number} frames kept")
    if "drizzle" in flags:
        _drizzle_out_sequence(ctx, seq, aa.reglayer, aa.prefix or "r_",
                              flags)
        return
    # astrometric path (applyreg.c:1188-1213): if the sequence has no
    # registration data but frames are plate-solved, derive the
    # homographies from the per-frame WCS solutions (mosaics)
    if not seq.has_reg(aa.reglayer) or not seq.reg(aa.reglayer).valid.any():
        from siril_tpu.registration.astrometric import register_astrometric

        if register_astrometric(seq, aa.reglayer) == 0:
            raise CommandError("no registration data and no WCS solutions "
                               "in this sequence")
    res = apply_reg_sequence(seq, aa)
    ctx.seq = res.new_seq or seq
    log_message(f"Applied registration to {res.processed} images")


def _stack_args_from_flags(pos, flags):
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.normalization import NORM_NAMES
    from siril_tpu.ops.stacking import (
        NBSTACK_WEIGHT,
        NBSTARS_WEIGHT,
        NOISE_WEIGHT,
        WFWHM_WEIGHT,
        StackArgs,
    )

    sa = StackArgs()
    method = pos[1] if len(pos) > 1 else "rej"
    sa.method = {"sum": "sum", "min": "min", "max": "max", "med": "med",
                 "median": "med", "rej": "rej", "mean": "rej"}.get(method, "rej")
    # stack seqname rej [type] sigma_low sigma_high
    rest = pos[2:]
    if sa.method == "rej":
        sa.rejection = rj.WINSORIZED
        if rest and not _is_number(rest[0]):
            sa.rejection = rj.REJECTION_NAMES.get(rest[0].lower(),
                                                  rj.WINSORIZED)
            rest = rest[1:]
        if sa.rejection == rj.GESDT:
            sa.siglow, sa.sighigh = 0.3, 0.05
        elif sa.rejection == rj.PERCENTILE:
            sa.siglow, sa.sighigh = 0.2, 0.1
        if len(rest) >= 2:
            sa.siglow = float(rest[0])
            sa.sighigh = float(rest[1])
        if sa.siglow < 0 or sa.sighigh < 0:
            raise CommandError("The average stacking with rejection requires "
                               "two extra arguments: sigma low and high")
        # command.c:11909-11917: GESDT takes (max outlier fraction,
        # significance), PERCENTILE takes quantile bounds — both in [0,1]
        if sa.rejection == rj.GESDT and (sa.siglow > 1 or sa.sighigh > 1):
            raise CommandError("Extra parameters of GESDT rejection "
                               "algorithm must be between 0 and 1, default "
                               "is 0.3 and 0.05")
        if sa.rejection == rj.PERCENTILE and (sa.siglow > 1 or sa.sighigh > 1):
            raise CommandError("Extra parameters of percentile rejection "
                               "algorithm must be between 0 and 1, default "
                               "is 0.2 and 0.1")
    if isinstance(flags.get("norm"), str):
        sa.normalize = NORM_NAMES.get(flags["norm"].lower(), 0)
    sa.lite_norm = "fastnorm" in flags
    sa.force_norm = "force_norm" in flags
    sa.equalize_rgb = "rgb_equal" in flags
    if "weight_from_noise" in flags:
        sa.weighting = NOISE_WEIGHT
    elif "weight_from_wfwhm" in flags:
        sa.weighting = WFWHM_WEIGHT
    elif "weight_from_nbstars" in flags:
        sa.weighting = NBSTARS_WEIGHT
    elif "weight_from_nbstack" in flags:
        sa.weighting = NBSTACK_WEIGHT
    sa.overlap_norm = "overlap_norm" in flags
    if "feather" in flags and flags["feather"] is not True:
        sa.feather_dist = int(float(flags["feather"]))
    sa.create_rejmaps = "rejmap" in flags or "rejmaps" in flags
    sa.merge_rejmaps = flags.get("rejmap") == "merged"
    sa.output_norm = "output_norm" in flags
    sa.use_32bit = "16b" not in flags
    sa.maximize = "maximize" in flags
    return sa


def _apply_mem_budget(ctx, sa):
    """setmem → device block budget (the reference's memory-ratio model,
    OS_utils.c get_max_memory_in_MB driving block heights)."""
    ratio = getattr(ctx.prefs, "memory_ratio", 0.9) or 0.9
    sa.block_mb = max(int(2048 * min(ratio, 4.0)), 128)


@command("stack", "stack seqfilename {sum|min|max|med|rej} [type] [sigma_low sigma_high] [-norm=] [-weight_from_…] [-out=]",
         min_args=1)
def cmd_stack(ctx, args):
    from siril_tpu.core.image import FLOAT_IMG, USHORT_IMG
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.stacking import stack_sequence

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    if "drizzle" in flags:
        from siril_tpu.ops.drizzle import KERNEL_NAMES, DrizzleArgs, drizzle_sequence

        da = DrizzleArgs(scale=_f(flags.get("scale"), 2.0) or 2.0,
                         pixfrac=_f(flags.get("pixfrac"), 1.0) or 1.0)
        if isinstance(flags.get("kernel"), str):
            da.kernel = KERNEL_NAMES.get(flags["kernel"].lower(), da.kernel)
        first = seq.read_frame(int(seq.selected_indices()[0]))
        da.use_bayer = first.is_cfa()
        out_img, wmap = drizzle_sequence(seq, da)
        name = flags.get("out") if isinstance(flags.get("out"), str) else \
            seq.name + "stacked"
        p = ctx.path(name)
        if not os.path.splitext(p)[1]:
            p += ctx.ext
        from siril_tpu.io.fits_io import write_fits as _wf

        _wf(out_img, p, bitdepth=FLOAT_IMG)
        ctx.set_image(out_img, os.path.basename(p))
        log_message(f"Drizzle-stacked {seq.selnum} frames → "
                    f"{os.path.basename(p)}")
        return
    sa = _stack_args_from_flags(pos, flags)
    _apply_mem_budget(ctx, sa)
    if "upscale" in flags:
        # legacy x2 up-scale-before-stack (upscaling.c): materialize a
        # temporary 2x sequence with doubled registration shifts
        from siril_tpu.ops.geometry import resample

        def up2(im):
            return resample(im, im.width * 2, im.height * 2)

        res_up = _seq_apply(ctx, pos[0], "upscaled_", "upscale x2", up2)
        up_seq = res_up.new_seq
        if up_seq is not None and seq.has_reg(sa.reglayer):
            reg_src = seq.reg(sa.reglayer)
            reg_dst = up_seq.reg(sa.reglayer)
            sel = [int(i) for i in seq.selected_indices()]
            for k, i in enumerate(sel[: up_seq.number]):
                Hm = reg_src.H[i].copy()
                Hm[0, 2] *= 2.0
                Hm[1, 2] *= 2.0
                reg_dst.H[k] = Hm
                reg_dst.valid[k] = reg_src.valid[i]
            up_seq.save()
            seq = ctx.seq = up_seq
    indices = None
    fspecs = []
    from siril_tpu.core.filtering import apply_filters, parse_filter_flag

    for k, v in flags.items():
        if k.startswith("filter-"):
            spec = parse_filter_flag(k, v)
            if spec is not None:
                fspecs.append(spec)
    if fspecs:
        indices = apply_filters(seq, fspecs, sa.reglayer)
        log_message(f"Stacking filter: {len(indices)} of {seq.number} "
                    "frames kept")
    res = stack_sequence(seq, sa, indices=indices)
    out_name = flags.get("out") if isinstance(flags.get("out"), str) else \
        seq.name + "stacked"
    p = ctx.path(out_name)
    if not os.path.splitext(p)[1]:
        p += ctx.ext
    bd = USHORT_IMG if not sa.use_32bit else FLOAT_IMG
    write_fits(res.image, p, bitdepth=bd)
    ctx.set_image(res.image, os.path.basename(p))
    log_message(f"Stacked {seq.selnum} images, rejected "
                f"{res.total_rejected[0]}/{res.total_rejected[1]} px "
                f"(low/high) in {res.elapsed_s:.2f}s → {os.path.basename(p)}")
    if sa.create_rejmaps and res.rejmap_low is not None:
        write_fits(res.rejmap_low, ctx.path("rejmap_low" + ctx.ext))
        if res.rejmap_high is not None:
            write_fits(res.rejmap_high, ctx.path("rejmap_high" + ctx.ext))


@command("stackall", "stackall [method …]", min_args=0)
def cmd_stackall(ctx, args):
    seqs = globmod.glob(os.path.join(ctx.cwd, "*.seq"))
    for s in seqs:
        name = os.path.splitext(os.path.basename(s))[0]
        cmd_stack(ctx, [name] + list(args))


# ===========================================================================
# geometry
# ===========================================================================


@command("crop", "crop [x y width height]", req=REQ_SINGLE_IMAGE)
def cmd_crop(ctx, args):
    from siril_tpu.ops.geometry import crop

    img = ctx.require_image()
    if len(args) >= 4:
        x, y, w, h = (int(float(a)) for a in args[:4])
    elif ctx.selection:
        x, y, w, h = ctx.selection
    else:
        raise CommandError("crop needs coordinates or a selection")
    ctx.set_image(crop(img, x, y, w, h))


@command("resample", "resample factor | -width= | -height=", req=REQ_SINGLE_IMAGE,
         min_args=1)
def cmd_resample(ctx, args):
    from siril_tpu.ops.geometry import resample
    from siril_tpu.ops.interp import INTERP_NAMES

    pos, flags = parse_flags(args)
    img = ctx.require_image()
    if pos:
        f = float(pos[0])
        w, h = int(img.width * f), int(img.height * f)
    elif "width" in flags:
        w = int(float(flags["width"]))
        h = int(round(img.height * w / img.width))
    elif "height" in flags:
        h = int(float(flags["height"]))
        w = int(round(img.width * h / img.height))
    else:
        raise CommandError("resample needs a factor or -width=/-height=")
    method = INTERP_NAMES.get(str(flags.get("interp", "la")).lower(), 3)
    ctx.set_image(resample(img, w, h, method, clamp="noclamp" not in flags))


@command("rotate", "rotate degree [-nocrop] [-interp=]", req=REQ_SINGLE_IMAGE,
         min_args=1)
def cmd_rotate(ctx, args):
    from siril_tpu.ops.geometry import rotate
    from siril_tpu.ops.interp import INTERP_NAMES

    pos, flags = parse_flags(args)
    img = ctx.require_image()
    method = INTERP_NAMES.get(str(flags.get("interp", "la")).lower(), 3)
    ctx.set_image(rotate(img, float(pos[0]), method,
                         crop_to_fit="nocrop" not in flags,
                         clamp="noclamp" not in flags))


@command("rotatepi", "rotatePi", req=REQ_SINGLE_IMAGE)
def cmd_rotatepi(ctx, args):
    from siril_tpu.ops.geometry import rotate

    ctx.set_image(rotate(ctx.require_image(), 180.0))


@command("mirrorx", "mirrorx [-bottomup]", req=REQ_SINGLE_IMAGE)
def cmd_mirrorx(ctx, args):
    from siril_tpu.ops.geometry import mirrorx

    ctx.set_image(mirrorx(ctx.require_image()))


@command("mirrorx_single", "mirrorx_single imagename", min_args=1)
def cmd_mirrorx_single(ctx, args):
    """Flip a FITS file in place without disturbing the loaded image
    (command.c process_mirrorx_single)."""
    from siril_tpu.io.conversion import load_any
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.geometry import mirrorx

    pos, _ = parse_flags(args)
    p = ctx.path(pos[0])
    if not os.path.splitext(p)[1]:
        p += ctx.ext
    img = load_any(p)
    write_fits(mirrorx(img), p, bitdepth=img.orig_bitdepth)
    log_message(f"mirrorx: {os.path.basename(p)}")


@command("mirrory", "mirrory", req=REQ_SINGLE_IMAGE)
def cmd_mirrory(ctx, args):
    from siril_tpu.ops.geometry import mirrory

    ctx.set_image(mirrory(ctx.require_image()))


@command("binxy", "binxy coefficient [-sum]", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_binxy(ctx, args):
    from siril_tpu.ops.geometry import binxy

    pos, flags = parse_flags(args)
    ctx.set_image(binxy(ctx.require_image(), int(float(pos[0])),
                        mean="sum" not in flags))


# ===========================================================================
# stretches & enhancement
# ===========================================================================


@command("autostretch", "autostretch [-linked] [shadowsclip [targetbg]]",
         req=REQ_SINGLE_IMAGE)
def cmd_autostretch(ctx, args):
    from siril_tpu.ops.stretch import autostretch

    pos, flags = parse_flags(args)
    shadows = float(pos[0]) if pos else -2.80
    target = float(pos[1]) if len(pos) > 1 else 0.25
    ctx.set_image(autostretch(ctx.require_image(), shadows, target,
                              linked="linked" in flags))


@command("mtf", "mtf low mid high [channels]", req=REQ_SINGLE_IMAGE, min_args=3)
def cmd_mtf(ctx, args):
    from siril_tpu.ops.stretch import MTFParams, apply_mtf

    p = MTFParams(shadows=float(args[0]), midtones=float(args[1]),
                  highlights=float(args[2]))
    ctx.set_image(apply_mtf(ctx.require_image(), p))


@command("invmtf", "invmtf low mid high", req=REQ_SINGLE_IMAGE, min_args=3)
def cmd_invmtf(ctx, args):
    import jax.numpy as jnp

    from siril_tpu.ops.stretch import MTFParams, mtf_pseudoinverse

    img = ctx.require_image()
    p = MTFParams(shadows=float(args[0]), midtones=float(args[1]),
                  highlights=float(args[2]))
    out = jnp.clip(mtf_pseudoinverse(img.device(), p), 0.0, 1.0)
    ctx.set_image(img.copy(data=np.asarray(out)))


@command("asinh", "asinh [-human] stretch [offset]", req=REQ_SINGLE_IMAGE,
         min_args=1)
def cmd_asinh(ctx, args):
    from siril_tpu.ops.stretch import asinh_stretch

    pos, flags = parse_flags(args)
    beta = float(pos[0])
    offset = float(pos[1]) if len(pos) > 1 else 0.0
    ctx.set_image(asinh_stretch(ctx.require_image(), beta, offset,
                                human_luminance="human" in flags))


def _ght_cmd(ctx, args, stretchtype):
    from siril_tpu.ops.stretch import GHTParams, apply_ght

    pos, flags = parse_flags(args)
    p = GHTParams(stretchtype=stretchtype)
    p.D = _f(flags.get("d"), None)
    p.B = _f(flags.get("b"), 0.0) or 0.0
    p.LP = _f(flags.get("lp"), 0.0) or 0.0
    p.SP = _f(flags.get("sp"), 0.0) or 0.0
    p.HP = _f(flags.get("hp"), 1.0) or 1.0
    p.BP = _f(flags.get("bp"), 0.0) or 0.0
    # positional form: D B LP SP HP
    if p.D is None:
        if not pos:
            raise CommandError("ght needs -D= or positional D")
        vals = [float(x) for x in pos]
        p.D = vals[0]
        if len(vals) > 1:
            p.B = vals[1]
        if len(vals) > 2:
            p.LP = vals[2]
        if len(vals) > 3:
            p.SP = vals[3]
        if len(vals) > 4:
            p.HP = vals[4]
    if "human" in flags:
        p.payne_colourstretchmodel = 1
    elif "even" in flags:
        p.payne_colourstretchmodel = 2
    elif "sat" in flags:
        p.payne_colourstretchmodel = 3
    elif "independent" in flags:
        from siril_tpu.ops.stretch import COL_INDEP

        p.payne_colourstretchmodel = COL_INDEP
    ctx.set_image(apply_ght(ctx.require_image(), p))


@command("ght", "ght -D= [-B=] [-LP=] [-SP=] [-HP=] [-human|-even|-sat]",
         req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_ght(ctx, args):
    from siril_tpu.ops.stretch import STRETCH_PAYNE_NORMAL

    _ght_cmd(ctx, args, STRETCH_PAYNE_NORMAL)


@command("invght", "invght -D= …", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_invght(ctx, args):
    from siril_tpu.ops.stretch import STRETCH_PAYNE_INVERSE

    _ght_cmd(ctx, args, STRETCH_PAYNE_INVERSE)


@command("modasinh", "modasinh -D= …", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_modasinh(ctx, args):
    from siril_tpu.ops.stretch import STRETCH_ASINH

    _ght_cmd(ctx, args, STRETCH_ASINH)


@command("invmodasinh", "invmodasinh -D= …", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_invmodasinh(ctx, args):
    from siril_tpu.ops.stretch import STRETCH_INVASINH

    _ght_cmd(ctx, args, STRETCH_INVASINH)


@command("linstretch", "linstretch -BP=", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_linstretch(ctx, args):
    from siril_tpu.ops.stretch import linstretch

    pos, flags = parse_flags(args)
    bp = _f(flags.get("bp"), None)
    if bp is None and pos:
        bp = float(pos[0])
    ctx.set_image(linstretch(ctx.require_image(), bp or 0.0))


@command("autoghs", "autoghs [-linked] shadowsclip stretchamount [-b=] [-hp=] [-lp=]",
         req=REQ_SINGLE_IMAGE, min_args=2)
def cmd_autoghs(ctx, args):
    from siril_tpu.ops.statistics import STATS_BASIC, STATS_MAD, compute_stats_np
    from siril_tpu.ops.stretch import GHTParams, apply_ght

    pos, flags = parse_flags(args)
    shadows_clip = float(pos[0])
    amount = float(pos[1])
    img = ctx.require_image()
    data = img.host()
    medians = []
    mads = []
    for c in range(img.nchans):
        s = compute_stats_np(data[c], STATS_BASIC | STATS_MAD)
        medians.append(s.median)
        mads.append(s.mad)
    m = float(np.mean(medians))
    mad = float(np.mean(mads)) * 1.4826
    sp = m + shadows_clip * mad
    p = GHTParams(D=amount, B=_f(flags.get("b"), 13.0) or 13.0,
                  SP=max(sp, 0.0),
                  LP=_f(flags.get("lp"), 0.0) or 0.0,
                  HP=_f(flags.get("hp"), 0.7) or 0.7)
    ctx.set_image(apply_ght(img, p))


@command("ddp", "ddp level coef sigma", req=REQ_SINGLE_IMAGE, min_args=3)
def cmd_ddp(ctx, args):
    from siril_tpu.ops.filters import ddp

    ctx.set_image(ddp(ctx.require_image(), float(args[0]), float(args[1]),
                      float(args[2])))


@command("neg", "neg", req=REQ_SINGLE_IMAGE)
def cmd_neg(ctx, args):
    from siril_tpu.ops.colors import negative

    ctx.set_image(negative(ctx.require_image()))


@command("thresh", "thresh lo hi", req=REQ_SINGLE_IMAGE, min_args=2)
def cmd_thresh(ctx, args):
    from siril_tpu.ops.filters import thresh

    ctx.set_image(thresh(ctx.require_image(), float(args[0]) / 65535.0,
                         float(args[1]) / 65535.0))


@command("threshlo", "threshlo level", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_threshlo(ctx, args):
    from siril_tpu.ops.filters import threshlo

    ctx.set_image(threshlo(ctx.require_image(), float(args[0]) / 65535.0))


@command("threshhi", "threshhi level", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_threshhi(ctx, args):
    from siril_tpu.ops.filters import threshhi

    ctx.set_image(threshhi(ctx.require_image(), float(args[0]) / 65535.0))


@command("nozero", "nozero level", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_nozero(ctx, args):
    from siril_tpu.ops.filters import nozero

    ctx.set_image(nozero(ctx.require_image(), float(args[0]) / 65535.0))


@command("fill", "fill value [x y w h]", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_fill(ctx, args):
    from siril_tpu.ops.filters import fill

    area = tuple(int(float(a)) for a in args[1:5]) if len(args) >= 5 else None
    ctx.set_image(fill(ctx.require_image(), float(args[0]) / 65535.0, area))


# ===========================================================================
# filters
# ===========================================================================


@command("gauss", "gauss sigma", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_gauss(ctx, args):
    from siril_tpu.ops.filters import gauss

    ctx.set_image(gauss(ctx.require_image(), float(args[0])))


@command("unsharp", "unsharp sigma multi", req=REQ_SINGLE_IMAGE, min_args=2)
def cmd_unsharp(ctx, args):
    from siril_tpu.ops.filters import unsharp

    ctx.set_image(unsharp(ctx.require_image(), float(args[0]), float(args[1])))


@command("fmedian", "fmedian ksize modulation", req=REQ_SINGLE_IMAGE, min_args=2)
def cmd_fmedian(ctx, args):
    from siril_tpu.ops.filters import median_filter

    ctx.set_image(median_filter(ctx.require_image(), int(float(args[0])),
                                float(args[1])))


@command("clahe", "clahe cliplimit tileSize", req=REQ_SINGLE_IMAGE, min_args=2)
def cmd_clahe(ctx, args):
    from siril_tpu.ops.filters import clahe

    ctx.set_image(clahe(ctx.require_image(), float(args[0]),
                        int(float(args[1]))))


@command("epf", "epf [-guided] [-d=] [-si=] [-ss=] [-mod=]", req=REQ_SINGLE_IMAGE)
def cmd_epf(ctx, args):
    from siril_tpu.ops.filters import bilateral, guided_filter

    pos, flags = parse_flags(args)
    img = ctx.require_image()
    mod = _f(flags.get("mod"), 1.0) or 1.0
    if "guided" in flags:
        ctx.set_image(guided_filter(img, radius=int(_f(flags.get("d"), 8) or 8),
                                    eps=(_f(flags.get("si"), 0.1) or 0.1) ** 2,
                                    mod=mod))
    else:
        ctx.set_image(bilateral(img, d=_f(flags.get("d"), 5) or 5,
                                sigma_col=_f(flags.get("si"), 0.1) or 0.1,
                                sigma_spatial=_f(flags.get("ss"), 3.0) or 3.0,
                                mod=mod))


@command("fixbanding", "fixbanding amount sigma [-vertical]",
         req=REQ_SINGLE_IMAGE, min_args=2)
def cmd_fixbanding(ctx, args):
    from siril_tpu.ops.filters import fix_banding

    pos, flags = parse_flags(args)
    ctx.set_image(fix_banding(ctx.require_image(), sigma=float(pos[1]),
                              amount=float(pos[0]),
                              vertical="vertical" in flags))


@command("rmgreen", "rmgreen [type] [-nopreserve]", req=REQ_SINGLE_IMAGE | REQ_FOR_RGB)
def cmd_rmgreen(ctx, args):
    from siril_tpu.ops.colors import scnr

    pos, flags = parse_flags(args)
    t = "avgneutral" if not pos or pos[0] == "0" else "maxneutral"
    ctx.set_image(scnr(ctx.require_image(), t,
                       preserve_lightness="nopreserve" not in flags))


@command("satu", "satu amount [background_factor [hue_range_index]]",
         req=REQ_SINGLE_IMAGE | REQ_FOR_RGB, min_args=1)
def cmd_satu(ctx, args):
    from siril_tpu.ops.colors import saturation

    amount = float(args[0])
    bkg = float(args[1]) if len(args) > 1 else 1.0
    # hue range index 0-6 (6 = all hues, the default)
    ranges = [(330, 30), (30, 90), (90, 150), (150, 210), (210, 270),
              (270, 330), (0, 360)]
    hr = ranges[int(float(args[2]))] if len(args) > 2 else ranges[6]
    ctx.set_image(saturation(ctx.require_image(), amount, bkg, hr[0], hr[1]))


@command("unpurple", "unpurple [-blue=] [-strength=]",
         req=REQ_SINGLE_IMAGE | REQ_FOR_RGB)
def cmd_unpurple(ctx, args):
    from siril_tpu.ops.filters import unpurple

    pos, flags = parse_flags(args)
    ctx.set_image(unpurple(ctx.require_image(),
                           blue_threshold=_f(flags.get("blue"), 0.2) or 0.2,
                           strength=_f(flags.get("strength"), 1.0) or 1.0))


@command("rgradient", "rgradient xc yc dR dalpha", req=REQ_SINGLE_IMAGE,
         min_args=4)
def cmd_rgradient(ctx, args):
    from siril_tpu.ops.filters import rgradient

    ctx.set_image(rgradient(ctx.require_image(), float(args[0]),
                            float(args[1]), float(args[2]), float(args[3])))


@command("denoise", "denoise [-mod=m] [-vst | -da3d | -sos=n [-rho=r]] [-indep] [-mask]",
         req=REQ_SINGLE_IMAGE)
def cmd_denoise(ctx, args):
    """NL-Bayes denoiser (filters/nlbayes, `denoise` command flags
    command_list.h:46).  -da3d runs the dual-domain refinement
    (ops/da3d.py, filters/da3d/DA3D.cpp); -mod blends with the
    original."""
    from siril_tpu.ops.nlbayes import nlbayes_denoise

    pos, flags = parse_flags(args)
    sos = int(_f(flags.get("sos"), 0) or 0)
    rho = _f(flags.get("rho"), 0.3) or 0.3
    img = ctx.require_image()
    out = nlbayes_denoise(img, use_vst="vst" in flags,
                          sos_iters=sos, sos_rho=rho)
    if "da3d" in flags:
        from siril_tpu.ops.da3d import da3d_image
        from siril_tpu.ops.statistics import bgnoise_np

        noisy = img.host()
        sigma = float(np.mean([bgnoise_np(noisy[c])
                               for c in range(img.nchans)]))
        refined = da3d_image(noisy, out.host(), sigma)
        out = out.copy(data=np.clip(refined, 0.0, 1.0))
        out.log_history("DA3D refinement")
    mod = _f(flags.get("mod"), 1.0) or 1.0
    if mod < 1.0:
        blend = (mod * out.host() + (1.0 - mod) * img.host())
        out = img.copy(data=blend.astype(np.float32))
        out.log_history(f"denoise mod={mod}")
    ctx.set_image(out)


@command("wavelet", "wavelet nbr_layers type", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_wavelet(ctx, args):
    from siril_tpu.ops.wavelets import WAVELET_BSPLINE, WAVELET_LINEAR, wavelet_transform

    img = ctx.require_image()
    n = int(float(args[0]))
    ktype = WAVELET_LINEAR if (len(args) > 1 and args[1] == "1") \
        else WAVELET_BSPLINE
    ctx.wavelet_planes = wavelet_transform(img, n, ktype)
    ctx.wavelet_img = img
    log_message(f"Computed {n} wavelet layers")


@command("wrecons", "wrecons c1 c2 …", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_wrecons(ctx, args):
    from siril_tpu.ops.wavelets import wavelet_reconstruct

    if ctx.wavelet_planes is None:
        raise CommandError("run `wavelet` first")
    coeffs = [float(a) for a in args]
    ctx.set_image(wavelet_reconstruct(ctx.wavelet_img, ctx.wavelet_planes,
                                      coeffs))


@command("fftd", "fftd modulus phase", req=REQ_SINGLE_IMAGE, min_args=2)
def cmd_fftd(ctx, args):
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.filters import fftd

    mod, phase = fftd(ctx.require_image())
    write_fits(mod, ctx.path(args[0] + ctx.ext), bitdepth=FLOAT_IMG)
    write_fits(phase, ctx.path(args[1] + ctx.ext), bitdepth=FLOAT_IMG)
    # keep FFTNORM metadata in the session for a later ffti
    ctx.pm_images["__fft_mod"] = mod
    ctx.pm_images["__fft_phase"] = phase


@command("ffti", "ffti modulus phase", req=REQ_NONE, min_args=2)
def cmd_ffti(ctx, args):
    from siril_tpu.io.fits_io import read_fits
    from siril_tpu.ops.filters import ffti

    mod = ctx.pm_images.get("__fft_mod")
    phase = ctx.pm_images.get("__fft_phase")
    if mod is None:
        mod = read_fits(ctx.path(args[0] + ctx.ext))
        phase = read_fits(ctx.path(args[1] + ctx.ext))
    ctx.set_image(ffti(mod, phase))


@command("linear_match", "linear_match reference low high",
         req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_linear_match(ctx, args):
    from siril_tpu.io.conversion import load_any
    from siril_tpu.ops.filters import linear_match

    ref = load_any(ctx.path(args[0]) if os.path.exists(ctx.path(args[0]))
                   else ctx.path(args[0] + ctx.ext))
    lo = float(args[1]) if len(args) > 1 else 1e-7
    hi = float(args[2]) if len(args) > 2 else 0.92
    ctx.set_image(linear_match(ctx.require_image(), ref, lo, hi))


@command("ccm", "ccm m00 m01 m02 m10 m11 m12 m20 m21 m22 [gamma]",
         req=REQ_SINGLE_IMAGE | REQ_FOR_RGB, min_args=9)
def cmd_ccm(ctx, args):
    from siril_tpu.ops.colors import apply_ccm

    m = [float(a) for a in args[:9]]
    gamma = float(args[9]) if len(args) > 9 else 1.0
    ctx.set_image(apply_ccm(ctx.require_image(), m, gamma))


# ---- deconvolution ----


def _get_psf(ctx, flags):
    from siril_tpu.ops.deconvolution import (
        PSF_AIRY,
        PSF_DISC,
        PSF_GAUSSIAN,
        PSF_MOFFAT,
        make_psf,
        psf_from_stars,
    )

    ks = int(_f(flags.get("ks"), 31) or 31)
    if "psfstars" in flags or "stars" in flags:
        return psf_from_stars(ctx.require_image(), size=min(ks, 31))
    kind = PSF_GAUSSIAN
    if "moffat" in flags:
        kind = PSF_MOFFAT
    elif "disc" in flags:
        kind = PSF_DISC
    elif "airy" in flags:
        kind = PSF_AIRY
    return make_psf(kind, size=ks, fwhm=_f(flags.get("fwhm"), 5.0) or 5.0,
                    beta=_f(flags.get("beta"), 2.2) or 2.2,
                    ratio=_f(flags.get("ratio"), 1.0) or 1.0,
                    angle_deg=_f(flags.get("angle"), 0.0) or 0.0,
                    diameter=_f(flags.get("dia"), 5.0) or 5.0)


@command("makepsf",
         "makepsf {clear|load f|save [f]|blind [-l0] [-si] [-multiscale] "
         "[-lambda=] [-comp=] [-ks=] [-savepsf=]|stars [-sym] [-ks=] "
         "[-savepsf=]|manual …}", min_args=1)
def cmd_makepsf(ctx, args):
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.deconvolution import psf_from_stars

    pos, flags = parse_flags(args)
    mode = pos[0]
    if mode == "clear":
        ctx.psf = None
        log_message("PSF cleared")
        return
    if mode == "load":
        from siril_tpu.io.conversion import load_any

        a = np.asarray(load_any(ctx.path(pos[1])).host()[0], np.float64)
        ctx.psf = (a / a.sum() if a.sum() > 0 else a).astype(np.float32)
        log_message("PSF loaded")
        return
    if mode == "save":
        psf = getattr(ctx, "psf", None)
        if psf is None:
            raise CommandError("no PSF to save")
        name = pos[1] if len(pos) > 1 else "psf"
        write_fits(SirilImage(data=psf[None] / psf.max()),
                   ctx.path(name), bitdepth=FLOAT_IMG)
        return
    if mode == "blind":
        # command_list.h:120 — blind estimation: -si selects the
        # spectral-irregularity engine (gf_estimate.cpp), -l0 (default)
        # the l0-descent engine (estimate_kernel.hpp)
        from siril_tpu.ops.blind_deconv import estimate_kernel_blind

        psf = estimate_kernel_blind(
            ctx.require_image().host(),
            ks=int(_f(flags.get("ks"), 15) or 15),
            method="si" if "si" in flags else "l0",
            multiscale="multiscale" in flags,
            lam=_f(flags.get("lambda"), 1e-3) or 1e-3,
            comp=_f(flags.get("comp"), None))
    elif mode == "stars":
        psf = psf_from_stars(ctx.require_image())
    else:
        psf = _get_psf(ctx, flags)
    ctx.psf = psf
    if isinstance(flags.get("savepsf"), str):
        write_fits(SirilImage(data=psf[None] / psf.max()),
                   ctx.path(flags["savepsf"]), bitdepth=FLOAT_IMG)
    log_message(f"PSF generated ({psf.shape[0]}x{psf.shape[1]})")


def _psf_for_deconv(ctx, flags):
    if isinstance(flags.get("loadpsf"), str):
        # -loadpsf=file: PSF from a FITS image (command.c rl flags)
        from siril_tpu.io.conversion import load_any

        arr = load_any(ctx.path(flags["loadpsf"])).host()[0]
        a = np.asarray(arr, np.float64)
        ssum = a.sum()
        return (a / ssum if ssum > 0 else a).astype(np.float32)
    psf = getattr(ctx, "psf", None)
    if psf is None or flags:
        psf = _get_psf(ctx, flags)
    return psf


@command("rl", "rl [-iters=] [-alpha=] [psf flags]", req=REQ_SINGLE_IMAGE)
def cmd_rl(ctx, args):
    from siril_tpu.ops.deconvolution import richardson_lucy

    pos, flags = parse_flags(args)
    psf = _psf_for_deconv(ctx, flags)
    ctx.set_image(richardson_lucy(
        ctx.require_image(), psf,
        iterations=int(_f(flags.get("iters"), 20) or 20),
        tv_alpha=_f(flags.get("alpha"), 0.0) or 0.0,
        step=_f(flags.get("gdstep"), 0.0005) or 0.0005,
        multiplicative="mul" in flags or "gdstep" not in flags,
        stop_delta=_f(flags.get("stop"), 0.0) or 0.0))


@command("wiener", "wiener [-alpha=] [psf flags]", req=REQ_SINGLE_IMAGE)
def cmd_wiener(ctx, args):
    from siril_tpu.ops.deconvolution import wiener

    pos, flags = parse_flags(args)
    psf = _psf_for_deconv(ctx, flags)
    ctx.set_image(wiener(ctx.require_image(), psf,
                         alpha=1.0 / (_f(flags.get("alpha"), 500.0) or 500.0)))


@command("sb", "sb [-iters=] [-lambda=] [psf flags]", req=REQ_SINGLE_IMAGE)
def cmd_sb(ctx, args):
    from siril_tpu.ops.deconvolution import split_bregman_tv

    pos, flags = parse_flags(args)
    psf = _psf_for_deconv(ctx, flags)
    ctx.set_image(split_bregman_tv(
        ctx.require_image(), psf,
        lam=_f(flags.get("lambda"), 3000.0) or 3000.0,
        iterations=int(_f(flags.get("iters"), 10) or 10)))


@command("synthstar", "synthstar", req=REQ_SINGLE_IMAGE,
         aliases=("unclipstars",))
def cmd_synthstar(ctx, args):
    from siril_tpu.ops.synthstar import resynthesize_stars

    ctx.set_image(resynthesize_stars(ctx.require_image()))


# ===========================================================================
# arithmetic & pixel math
# ===========================================================================


def _load_operand(ctx, name):
    from siril_tpu.io.conversion import load_any

    p = ctx.path(name)
    if not os.path.exists(p):
        p = p + ctx.ext
    return load_any(p)


@command("iadd", "iadd filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_iadd(ctx, args):
    from siril_tpu.ops.arithmetic import OPER_ADD, imoper

    img = ctx.require_image()
    b = _load_operand(ctx, args[0])
    out = imoper(img.host(), b.host(), OPER_ADD, clip16=ctx.force_16bit)
    ctx.set_image(img.copy(data=np.asarray(out)))


@command("isub", "isub filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_isub(ctx, args):
    from siril_tpu.ops.arithmetic import OPER_SUB, imoper

    img = ctx.require_image()
    b = _load_operand(ctx, args[0])
    out = imoper(img.host(), b.host(), OPER_SUB, clip16=ctx.force_16bit)
    ctx.set_image(img.copy(data=np.asarray(out)))


@command("imul", "imul filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_imul(ctx, args):
    from siril_tpu.ops.arithmetic import OPER_MUL, imoper

    img = ctx.require_image()
    b = _load_operand(ctx, args[0])
    ctx.set_image(img.copy(data=np.asarray(
        imoper(img.host(), b.host(), OPER_MUL, clip16=ctx.force_16bit))))


@command("idiv", "idiv filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_idiv(ctx, args):
    from siril_tpu.ops.arithmetic import OPER_DIV, imoper

    img = ctx.require_image()
    b = _load_operand(ctx, args[0])
    ctx.set_image(img.copy(data=np.asarray(
        imoper(img.host(), b.host(), OPER_DIV, clip16=ctx.force_16bit))))


@command("fadd", "fadd scalar", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_fadd(ctx, args):
    from siril_tpu.ops.arithmetic import OPER_ADD, soper

    img = ctx.require_image()
    ctx.set_image(img.copy(data=np.asarray(
        soper(img.host(), float(args[0]) / 65535.0, OPER_ADD))))


@command("fsub", "fsub scalar", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_fsub(ctx, args):
    from siril_tpu.ops.arithmetic import OPER_SUB, soper

    img = ctx.require_image()
    ctx.set_image(img.copy(data=np.asarray(
        soper(img.host(), float(args[0]) / 65535.0, OPER_SUB))))


@command("fmul", "fmul scalar", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_fmul(ctx, args):
    from siril_tpu.ops.arithmetic import OPER_MUL, soper

    img = ctx.require_image()
    ctx.set_image(img.copy(data=np.asarray(
        soper(img.host(), float(args[0]), OPER_MUL))))


@command("fdiv", "fdiv filename scalar", req=REQ_SINGLE_IMAGE, min_args=2)
def cmd_fdiv(ctx, args):
    from siril_tpu.ops.arithmetic import fdiv

    img = ctx.require_image()
    b = _load_operand(ctx, args[0])
    ctx.set_image(img.copy(data=np.asarray(
        fdiv(img.host(), b.host(), float(args[1])))))


@command("offset", "offset value", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_offset(ctx, args):
    from siril_tpu.ops.arithmetic import OPER_ADD, soper

    img = ctx.require_image()
    ctx.set_image(img.copy(data=np.asarray(
        soper(img.host(), float(args[0]) / 65535.0, OPER_ADD, clip16=True))))


@command("addmax", "addmax filename", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_addmax(ctx, args):
    from siril_tpu.ops.arithmetic import addmax

    img = ctx.require_image()
    b = _load_operand(ctx, args[0])
    ctx.set_image(img.copy(data=np.asarray(addmax(img.host(), b.host()))))


@command("pm", "pm \"expression\" [-rescale]", min_args=1)
def cmd_pm(ctx, args):
    import re as remod

    from siril_tpu.ops.pixelmath import pixel_math

    pos, flags = parse_flags(args)
    expr = pos[0].strip('"')
    # $name$ variables reference loaded images by filename
    names = set(remod.findall(r"\$([A-Za-z0-9_]+)\$", expr))
    images = {}
    for n in names:
        images[n] = _load_operand(ctx, n)
        expr = expr.replace(f"${n}$", n)
    if not images and ctx.image is not None:
        images["T"] = ctx.image
        expr = expr.replace("$T", "T")
    out = pixel_math(expr, images, rescale="rescale" in flags)
    ctx.set_image(out, "pm_result")


# ===========================================================================
# masks
# ===========================================================================


def _mask_postprocess(img, flags):
    """Shared mask_from_* option handling: -invert, -feather=,
    -autostretch, -bitdepth= (command_list.h mask family flags)."""
    from siril_tpu.ops.masks import (
        mask_autostretch,
        mask_feather,
        mask_invert,
    )

    if "autostretch" in flags:
        img.mask = mask_autostretch(img.mask)
    if "invert" in flags:
        img.mask = mask_invert(img.mask)
    if "feather" in flags and flags["feather"] is not True:
        img.mask = mask_feather(img.mask, int(float(flags["feather"])))
    bd = flags.get("bitdepth")
    if isinstance(bd, str):
        q = {"8": 255.0, "16": 65535.0}.get(bd)
        if q:
            img.mask = (np.round(img.mask * q) / q).astype(np.float32)
    img.mask_active = True


@command("mask_from_channel", "mask_from_channel channel [-invert] [-feather=] [-autostretch] [-bitdepth=]",
         req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_mask_from_channel(ctx, args):
    from siril_tpu.ops.masks import mask_from_channel

    pos, flags = parse_flags(args)
    img = ctx.require_image()
    img.mask = mask_from_channel(img, int(float(pos[0])))
    _mask_postprocess(img, flags)


@command("mask_from_lum", "mask_from_lum [-rw=] [-gw=] [-bw=] [-invert] [-feather=] [-autostretch] [-bitdepth=]",
         req=REQ_SINGLE_IMAGE)
def cmd_mask_from_lum(ctx, args):
    from siril_tpu.ops.masks import mask_from_lum

    pos, flags = parse_flags(args)
    img = ctx.require_image()
    weights = None
    if any(k in flags for k in ("rw", "gw", "bw")):
        weights = (_f(flags.get("rw"), 0.2126) or 0.2126,
                   _f(flags.get("gw"), 0.7152) or 0.7152,
                   _f(flags.get("bw"), 0.0722) or 0.0722)
    img.mask = mask_from_lum(img, weights=weights) if weights         else mask_from_lum(img)
    _mask_postprocess(img, flags)


@command("mask_from_stars", "mask_from_stars [-invert] [-feather=] [-bitdepth=]",
         req=REQ_SINGLE_IMAGE)
def cmd_mask_from_stars(ctx, args):
    from siril_tpu.ops.masks import mask_from_stars

    pos, flags = parse_flags(args)
    img = ctx.require_image()
    img.mask = mask_from_stars(img)
    _mask_postprocess(img, flags)


@command("mask_invert", "mask_invert", req=REQ_SINGLE_IMAGE)
def cmd_mask_invert(ctx, args):
    from siril_tpu.ops.masks import mask_invert

    img = ctx.require_image()
    if img.mask is None:
        raise CommandError("no mask defined")
    img.mask = mask_invert(img.mask)


@command("mask_blur", "mask_blur sigma", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_mask_blur(ctx, args):
    from siril_tpu.ops.masks import mask_blur

    img = ctx.require_image()
    if img.mask is None:
        raise CommandError("no mask defined")
    img.mask = mask_blur(img.mask, float(args[0]))


@command("mask_threshold", "mask_threshold lo [hi]", req=REQ_SINGLE_IMAGE,
         min_args=1)
def cmd_mask_threshold(ctx, args):
    from siril_tpu.ops.masks import mask_threshold

    img = ctx.require_image()
    if img.mask is None:
        raise CommandError("no mask defined")
    hi = float(args[1]) if len(args) > 1 else 1.0
    img.mask = mask_threshold(img.mask, float(args[0]), hi)


@command("clear_mask", "clear_mask", req=REQ_SINGLE_IMAGE)
def cmd_clear_mask(ctx, args):
    img = ctx.require_image()
    img.mask = None
    img.mask_active = False


# ===========================================================================
# background & color
# ===========================================================================


@command("subsky", "subsky {-rbf | degree} [-samples=] [-tolerance=] [-smooth=]",
         req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_subsky(ctx, args):
    from siril_tpu.ops.background import BKG_POLY, BKG_RBF, extract_background

    pos, flags = parse_flags(args)
    if "rbf" in flags:
        method, degree = BKG_RBF, 0
    else:
        method, degree = BKG_POLY, int(float(pos[0])) if pos else 4
    from siril_tpu.ops.background import DIVIDE, SUBTRACT

    corr = DIVIDE if str(flags.get("mode", "")).lower() == "divide"         or "divide" in flags else SUBTRACT
    ctx.set_image(extract_background(
        ctx.require_image(), method, degree,
        smoothing=_f(flags.get("smooth"),
                     _f(flags.get("smoothness"), 0.5)) or 0.5,
        nb_samples=int(_f(flags.get("samples"), 20) or 20),
        tolerance=_f(flags.get("tolerance"), 1.0) or 1.0,
        correction=corr, dither="dither" in flags))


@command("split", "split r g b [-hsl|-hsv|-lab]", req=REQ_SINGLE_IMAGE | REQ_FOR_RGB,
         min_args=3)
def cmd_split(ctx, args):
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.colors import split_channels

    pos, flags = parse_flags(args)
    space = "rgb"
    for s in ("hsl", "hsv", "lab"):
        if s in flags:
            space = s
    chans = split_channels(ctx.require_image(), space)
    for name, im in zip(pos[:3], chans):
        write_fits(im, ctx.path(name + ctx.ext))
    log_message(f"Split into {space} channels")


@command("rgbcomp", "rgbcomp r g b [-align] [-out=]", min_args=3)
def cmd_rgbcomp(ctx, args):
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.colors import rgb_compose

    pos, flags = parse_flags(args)
    if isinstance(flags.get("lum"), str) and len(pos) >= 3:
        lum = _load_operand(ctx, flags["lum"])
    else:
        lum = None
    r = _load_operand(ctx, pos[0])
    g = _load_operand(ctx, pos[1])
    b = _load_operand(ctx, pos[2])
    out = rgb_compose(r, g, b, lum=lum)
    if "align" in flags:
        from siril_tpu.ops.colors import align_rgb_channels

        out = align_rgb_channels(out)
    name = flags.get("out") if isinstance(flags.get("out"), str) else "composed"
    write_fits(out, ctx.path(name + ctx.ext))
    ctx.set_image(out, name)


# ===========================================================================
# misc
# ===========================================================================


@command("visu", "visu low high", req=REQ_SINGLE_IMAGE)
def cmd_visu(ctx, args):
    pass        # display-only in the reference; no-op headless


@command("histo", "histo channel", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_histo(ctx, args):
    img = ctx.require_image()
    c = int(float(args[0]))
    h, _ = np.histogram(img.host()[c], bins=256, range=(0, 1))
    path = ctx.path(f"histo_{c}.dat")
    np.savetxt(path, h, fmt="%d")
    log_message(f"Histogram saved to {os.path.basename(path)}")


def get_command(name: str) -> Optional[Command]:
    return COMMANDS.get(name.lower())


# ===========================================================================
# astrometry & photometry commands
# ===========================================================================


def _get_catalog(ctx, flags):
    from siril_tpu.astrometry.catalog import Catalog, default_catalog_path

    path = flags.get("catalog") if isinstance(flags.get("catalog"), str) \
        else default_catalog_path()
    # remote TAP catalogues by name (-catalog=tycho2/nomad/gaiadr3/apass/
    # simbad/… — remote_catalogues.c); requires online mode or recorded
    # fixtures ($SIRIL_TPU_CAT_FIXTURES)
    if isinstance(path, str):
        from siril_tpu.astrometry.remote import TAP_CATALOGUES

        if path.lower() in TAP_CATALOGUES:
            from siril_tpu.astrometry.remote import RemoteCatalogue

            return RemoteCatalogue(path.lower())
    if path is None:
        raise CommandError(
            "no local catalogue available (set -catalog=file.npz/csv/.cat, "
            "a remote name like -catalog=gaiadr3 with `online`, or "
            "SIRIL_TPU_CATALOG)")
    p = ctx.path(path) if not os.path.isabs(path) else path
    if p.lower().endswith(".cat"):
        # reference-format binary HEALPix-indexed Gaia catalogue; the
        # cat_type byte at offset 50 picks astrometric vs photometric
        # (healpix_cat.h:11-21)
        from siril_tpu.astrometry.gaia_local import (
            CAT_XPCTS, CAT_XPSAMP, GaiaLocalCatalogue, GaiaXPLocalCatalogue)

        with open(p, "rb") as f:
            hdr = f.read(51)
        if len(hdr) > 50 and hdr[50] in (CAT_XPSAMP, CAT_XPCTS):
            return GaiaXPLocalCatalogue(p)
        return GaiaLocalCatalogue(p)
    if p.lower().endswith((".dat", ".bin")) or "tycho" in p.lower() \
            or "nomad" in os.path.basename(p).lower():
        # KStars HTM binary (Tycho-2 / NOMAD)
        from siril_tpu.astrometry.kstars_local import KStarsCatalogue

        try:
            return KStarsCatalogue(p)
        except ValueError:
            pass
    return Catalog.load(p)


@command("platesolve", "platesolve [ra dec] [-focal=] [-pixelsize=] [-catalog=] [-limitmag=] [-order=]",
         req=REQ_SINGLE_IMAGE)
def cmd_platesolve(ctx, args):
    from siril_tpu.astrometry.solver import SolveArgs, solve_image
    from siril_tpu.ops.wcs import parse_dec, parse_ra

    pos, flags = parse_flags(args)
    sa = SolveArgs()
    if len(pos) >= 2:
        sa.ra = parse_ra(pos[0])
        sa.dec = parse_dec(pos[1])
    if "focal" in flags:
        sa.focal_mm = float(flags["focal"])
    if "pixelsize" in flags:
        sa.pixel_size_um = float(flags["pixelsize"])
    if "limitmag" in flags:
        sa.mag_limit = float(flags["limitmag"])
    if "order" in flags:
        sa.sip_order = int(float(flags["order"]))
    if "radius" in flags:
        sa.radius_deg = float(flags["radius"])
    if "downscale" in flags:
        sa.downsample = True
    if "noflip" in flags:
        sa.flip_tolerant = False
    img0 = ctx.require_image()
    if img0.wcs is not None and "force" not in flags:
        log_message("image is already plate solved (use -force)")
        return
    cat = _get_catalog(ctx, flags)
    res = solve_image(img0, cat, sa)
    if res is None:
        raise CommandError("plate solve failed")
    from siril_tpu.ops.wcs import format_dec, format_ra

    ra_c, dec_c = res.wcs.pix2world(
        np.array([ctx.image.width / 2.0]), np.array([ctx.image.height / 2.0]))
    log_message(f"Image center: RA {format_ra(float(ra_c[0]))}, "
                f"Dec {format_dec(float(dec_c[0]))}")


@command("conesearch", "conesearch [limit_mag] [-catalog=]", req=REQ_SINGLE_IMAGE)
def cmd_conesearch(ctx, args):
    pos, flags = parse_flags(args)
    img = ctx.require_image()
    if img.wcs is None:
        raise CommandError("image is not plate solved")
    mag = float(pos[0]) if pos else 13.0
    cat = _get_catalog(ctx, flags)
    w = img.wcs
    ra_c, dec_c = w.pix2world(np.array([img.width / 2.0]),
                              np.array([img.height / 2.0]))
    fov = w.pixel_scale_arcsec * max(img.width, img.height) / 3600.0
    cone = cat.cone_search(float(ra_c[0]), float(dec_c[0]), fov / 1.5, mag)
    xs, ys = w.world2pix(cone.ra, cone.dec)
    inside = [k for k in range(len(cone))
              if 0 <= xs[k] < img.width and 0 <= ys[k] < img.height]
    log_message(f"{len(inside)} catalogue objects in the field "
                f"(of {len(cone)} in cone)")
    out = flags.get("out")
    if isinstance(out, str):
        with open(ctx.path(out), "w") as f:
            f.write("ra,dec,mag,x,y\n")
            for k in inside:
                f.write(f"{cone.ra[k]:.6f},{cone.dec[k]:.6f},"
                        f"{cone.mag[k]:.3f},{xs[k]:.2f},{ys[k]:.2f}\n")
        log_message(f"catalogue written to {out}")


@command("pcc", "pcc [-limitmag=] [-catalog=]", req=REQ_SINGLE_IMAGE | REQ_FOR_RGB)
def cmd_pcc(ctx, args):
    from siril_tpu.astrometry.pcc import photometric_color_calibration

    pos, flags = parse_flags(args)
    cat = _get_catalog(ctx, flags)
    out = photometric_color_calibration(
        ctx.require_image(), cat,
        mag_limit=_f(flags.get("limitmag"), 13.0) or 13.0)
    if out is None:
        raise CommandError("PCC failed")
    ctx.set_image(out)


@command("bgneutralize", "bgneutralize", req=REQ_SINGLE_IMAGE | REQ_FOR_RGB)
def cmd_bgneutralize(ctx, args):
    from siril_tpu.astrometry.pcc import background_neutralization

    ctx.set_image(background_neutralization(ctx.require_image()))


@command("setphot", "setphot [-inner=] [-outer=] [-aperture=] [-force_radius=] [-gain=] [-min_val=] [-max_val=]")
def cmd_setphot(ctx, args):
    pos, flags = parse_flags(args)
    p = ctx.prefs
    if "inner" in flags:
        p.phot_inner = float(flags["inner"])
    if "outer" in flags:
        p.phot_outer = float(flags["outer"])
    if "aperture" in flags:
        p.phot_aperture = float(flags["aperture"])
    if "force_radius" in flags:
        p.phot_force_radius = str(flags["force_radius"]).lower() in ("1", "yes", "true")
    if "gain" in flags:
        p.phot_gain = float(flags["gain"])
    log_message(f"photometry: inner={p.phot_inner} outer={p.phot_outer} "
                f"aperture={p.phot_aperture} gain={p.phot_gain}")


def _phot_cfg(ctx):
    from siril_tpu.ops.photometry import PhotConfig

    p = ctx.prefs
    return PhotConfig(gain=p.phot_gain, inner=p.phot_inner,
                      outer=p.phot_outer, aperture=p.phot_aperture,
                      force_radius=p.phot_force_radius)


@command("psf", "psf x y [channel]", req=REQ_SINGLE_IMAGE, min_args=2)
def cmd_psf(ctx, args):
    from siril_tpu.ops.photometry import measure_star
    from siril_tpu.registration.psf import fit_psf_batch, fwhm_from_s

    img = ctx.require_image()
    x0, y0 = float(args[0]), float(args[1])
    chan = int(float(args[2])) if len(args) > 2 else (1 if img.nchans == 3 else 0)
    lay = img.host()[min(chan, img.nchans - 1)]
    box = 30
    bx = int(np.clip(x0 - box // 2, 0, max(img.width - box, 0)))
    by = int(np.clip(y0 - box // 2, 0, max(img.height - box, 0)))
    patch = lay[by:by + box, bx:bx + box]
    fit = fit_psf_batch(patch[None].astype(np.float32))
    fx = float(fwhm_from_s(fit["sx"], fit["beta"])[0])
    fy = float(fwhm_from_s(fit["sy"], fit["beta"])[0])
    sx0 = bx + float(fit["x0"][0])
    sy0 = by + float(fit["y0"][0])
    phot = measure_star(lay, sx0, sy0, fx, _phot_cfg(ctx),
                        img.keywords.cvf or None)
    log_message(f"PSF: x0={sx0:.2f} y0={sy0:.2f} FWHMx={fx:.2f} "
                f"FWHMy={fy:.2f} A={float(fit['A'][0]):.5f} "
                f"B={float(fit['B'][0]):.5f}")
    if phot.valid:
        log_message(f"Photometry: mag={phot.mag + ctx.magnitude_offset:.3f} "
                    f"±{phot.s_mag:.3f} SNR={phot.snr:.1f}dB")
    else:
        log_message(f"Photometry invalid: {phot.error}")


@command("setmag", "setmag magnitude", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_setmag(ctx, args):
    ctx.magnitude_offset = float(args[0])
    log_message(f"magnitude offset set to {ctx.magnitude_offset}")


@command("unsetmag", "unsetmag")
def cmd_unsetmag(ctx, args):
    ctx.magnitude_offset = 0.0


@command("light_curve", "light_curve sequencename channel [-ninastars=file] [-out=] [-aavso] x y x y …",
         min_args=2)
def cmd_light_curve(ctx, args):
    from siril_tpu.ops.photometry import light_curve

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    chan = int(float(pos[1]))
    coords = [(float(pos[i]), float(pos[i + 1]))
              for i in range(2, len(pos) - 1, 2)]
    if isinstance(flags.get("ninastars"), str):
        # NINA exoplanet CSV star list (comparison_stars.c format):
        # Target/Comparison rows with Ra,Dec — resolved via the WCS of
        # the sequence reference frame
        import csv as _csv

        ref = seq.read_frame(seq.get_reference())
        if ref.wcs is None:
            raise CommandError("-ninastars needs a plate-solved reference "
                               "frame")
        tgt, comps = None, []
        with open(ctx.path(flags["ninastars"])) as f:
            for row in _csv.DictReader(f):
                ra = float(row["Ra"])
                dec = float(row["Dec"])
                x, y = ref.wcs.world2pix(np.array([ra]), np.array([dec]))
                pt = (float(x[0]), float(y[0]))
                if row.get("Type", "").lower() == "target":
                    tgt = pt
                else:
                    comps.append(pt)
        if tgt is None or not comps:
            raise CommandError("ninastars file has no target/comparisons")
        coords = [tgt] + comps
    if len(coords) < 2:
        raise CommandError("light_curve needs a target and at least one "
                           "comparison star")
    out = flags.get("out") if isinstance(flags.get("out"), str) \
        else "light_curve.dat"
    rows = light_curve(seq, coords[0], coords[1:], layer=chan,
                       cfg=_phot_cfg(ctx), out_path=ctx.path(out))
    log_message(f"Light curve: {len(rows)} points written to {out}")
    if "aavso" in flags:
        from siril_tpu.ops.photometry import save_aavso_extended

        aout = os.path.splitext(ctx.path(out))[0] + "_aavso.csv"
        n = save_aavso_extended(
            rows, aout,
            starid=str(flags.get("starid", "object")),
            obscode=str(flags.get("obscode", "XXX")),
            filt=str(flags.get("filter", "V")),
            chart=str(flags.get("chart", "na")))
        log_message(f"AAVSO extended report: {n} rows → "
                    f"{os.path.basename(aout)}")


@command("seqpsf", "seqpsf sequencename channel x y", min_args=4)
def cmd_seqpsf(ctx, args):
    from siril_tpu.ops.photometry import seq_photometry

    seq = ctx.load_sequence(args[0])
    chan = int(float(args[1]))
    results = seq_photometry(seq, float(args[2]), float(args[3]),
                             layer=chan, cfg=_phot_cfg(ctx))
    ok = sum(1 for _, r in results if r is not None and r["phot"].valid)
    for idx, r in results:
        if r is not None and r["phot"].valid:
            log_message(f"{idx + 1}: x={r['x']:.2f} y={r['y']:.2f} "
                        f"fwhm={r['fwhm']:.2f} mag={r['phot'].mag:.3f}")
    log_message(f"seqpsf: {ok}/{len(results)} frames measured")


# ===========================================================================
# planetary (MPP) commands
# ===========================================================================


def _mpp_args_from_flags(flags):
    """MPP flag surface (command_list.h:140,168): the reference's
    -half-box/-ap-step map to ap_size/overlap; percent flags to the
    best-N selections; engine/debayer/shift-smooth accepted."""
    from siril_tpu.planetary.mpp import MPPArgs

    a = MPPArgs()
    if "apsize" in flags:
        a.ap_size = int(float(flags["apsize"]))
    if "half-box" in flags:
        a.ap_size = 2 * int(float(flags["half-box"]))
    if "overlap" in flags:
        a.ap_overlap = float(flags["overlap"])
    if "ap-step" in flags:
        step = int(float(flags["ap-step"]))
        a.ap_overlap = max(0.0, 1.0 - step / max(a.ap_size, 1))
    if "bestpct" in flags:
        a.stack_best_pct = float(flags["bestpct"])
    if "stack-percent" in flags:
        a.stack_best_pct = float(flags["stack-percent"])
    if "register-percent" in flags:
        a.stack_best_pct = float(flags["register-percent"])
    if "refpct" in flags:
        a.global_best_pct = float(flags["refpct"])
    if "ref-percent" in flags:
        a.global_best_pct = float(flags["ref-percent"])
    if "stack-frames" in flags:
        a.max_frames = int(float(flags["stack-frames"]))
    if "min-structure" in flags:
        a.structure_threshold = float(flags["min-structure"])
    if "scale" in flags:
        a.scale = float(flags["scale"])
    if "layer" in flags:
        a.layer = int(float(flags["layer"]))
    return a


def _mpp_sidecar_path(ctx, seq):
    return os.path.join(seq.directory, seq.name + ".mpp")


@command("mpp", "mpp sequencename [-apsize=] [-overlap=] [-bestpct=] [-scale=] [-out=]",
         min_args=1)
def cmd_mpp(ctx, args):
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.planetary.mpp import mpp_full

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    a = _mpp_args_from_flags(flags)
    out = mpp_full(seq, a, sidecar=_mpp_sidecar_path(ctx, seq))
    name = flags.get("out") if isinstance(flags.get("out"), str) else \
        seq.name + "_mpp"
    p = ctx.path(name)
    if not os.path.splitext(p)[1]:
        p += ctx.ext
    write_fits(out, p, bitdepth=FLOAT_IMG)
    ctx.set_image(out, os.path.basename(p))


@command("register_mpp", "register_mpp sequencename [flags]", min_args=1)
def cmd_register_mpp(ctx, args):
    from siril_tpu.planetary.mpp import mpp_analyze, mpp_compute_shifts

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    a = _mpp_args_from_flags(flags)
    state = mpp_analyze(seq, a)
    state = mpp_compute_shifts(seq, state, a)
    state.save(_mpp_sidecar_path(ctx, seq))
    log_message(f"MPP registration saved to {seq.name}.mpp")


@command("stack_mpp", "stack_mpp sequencename [-bestpct=] [-out=]", min_args=1)
def cmd_stack_mpp(ctx, args):
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.planetary.mpp import MPPState, mpp_stack

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    sc = _mpp_sidecar_path(ctx, seq)
    if not os.path.exists(sc):
        raise CommandError(f"no .mpp sidecar for {seq.name} "
                           "(run register_mpp first)")
    state = MPPState.load(sc)
    a = _mpp_args_from_flags(flags)
    a.ap_size = state.args.ap_size if state.args else a.ap_size
    out = mpp_stack(seq, state, a)
    name = flags.get("out") if isinstance(flags.get("out"), str) else \
        seq.name + "_mpp"
    p = ctx.path(name)
    if not os.path.splitext(p)[1]:
        p += ctx.ext
    write_fits(out, p, bitdepth=FLOAT_IMG)
    ctx.set_image(out, os.path.basename(p))


@command("seqquality", "seqquality sequencename [layer]", min_args=1)
def cmd_seqquality(ctx, args):
    from siril_tpu.planetary.quality import rank_sequence_quality

    seq = ctx.load_sequence(args[0])
    layer = int(float(args[1])) if len(args) > 1 else 0
    rank_sequence_quality(seq, layer)
    seq.save()
    reg = seq.reg(layer)
    order = np.argsort(-reg.quality)[:5]
    log_message("Best frames: " +
                ", ".join(f"{i + 1} ({reg.quality[i]:.3f})" for i in order))


# ===========================================================================
# sequence variants of image commands (seqmtf, seqsubsky, …)
# ===========================================================================


def _seq_apply(ctx, seqname, prefix, desc, fn, output_bitdepth=None):
    """Generic per-frame application of a single-image op over a sequence
    (the reference's generic_seq_args pattern for filter seq-variants)."""
    from siril_tpu.core.engine import SeqArgs, run_sequence

    seq = ctx.load_sequence(seqname)

    def image(c, idx, img):
        return fn(img)

    res = run_sequence(SeqArgs(seq=seq, description=desc, prefix=prefix,
                               image=image,
                               output_bitdepth=output_bitdepth))
    ctx.seq = res.new_seq or seq
    log_message(f"{desc}: {res.processed} images processed")
    return res


@command("seqmtf", "seqmtf sequencename low mid high [-prefix=]", min_args=4)
def cmd_seqmtf(ctx, args):
    from siril_tpu.ops.stretch import MTFParams, apply_mtf

    pos, flags = parse_flags(args)
    p = MTFParams(shadows=float(pos[1]), midtones=float(pos[2]),
                  highlights=float(pos[3]))
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "mtf_"
    _seq_apply(ctx, pos[0], prefix, "seqmtf", lambda im: apply_mtf(im, p))


@command("seqsubsky", "seqsubsky sequencename {-rbf|degree} [-prefix=]",
         min_args=2)
def cmd_seqsubsky(ctx, args):
    from siril_tpu.ops.background import BKG_POLY, BKG_RBF, extract_background

    pos, flags = parse_flags(args)
    if "rbf" in flags:
        method, degree = BKG_RBF, 0
    else:
        method, degree = BKG_POLY, int(float(pos[1]))
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "bkg_"
    _seq_apply(ctx, pos[0], prefix, "seqsubsky",
               lambda im: extract_background(
                   im, method, degree,
                   smoothing=_f(flags.get("smooth"), 0.5) or 0.5,
                   nb_samples=int(_f(flags.get("samples"), 20) or 20),
                   tolerance=_f(flags.get("tolerance"), 1.0) or 1.0))


@command("seqcrop", "seqcrop sequencename x y width height [-prefix=]",
         min_args=5)
def cmd_seqcrop(ctx, args):
    from siril_tpu.ops.geometry import crop

    pos, flags = parse_flags(args)
    x, y, w, h = (int(float(a)) for a in pos[1:5])
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "cropped_"
    _seq_apply(ctx, pos[0], prefix, "seqcrop",
               lambda im: crop(im, x, y, w, h))


@command("seqresample", "seqresample sequencename factor [-prefix=]", min_args=2)
def cmd_seqresample(ctx, args):
    from siril_tpu.ops.geometry import resample

    pos, flags = parse_flags(args)
    f = float(pos[1])
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "scaled_"

    def fn(im):
        return resample(im, int(im.width * f), int(im.height * f))

    _seq_apply(ctx, pos[0], prefix, "seqresample", fn)


@command("seqfixbanding", "seqfixbanding sequencename amount sigma [-prefix=] [-vertical]",
         min_args=3)
def cmd_seqfixbanding(ctx, args):
    from siril_tpu.ops.filters import fix_banding

    pos, flags = parse_flags(args)
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "unband_"
    _seq_apply(ctx, pos[0], prefix, "seqfixbanding",
               lambda im: fix_banding(im, sigma=float(pos[2]),
                                      amount=float(pos[1]),
                                      vertical="vertical" in flags))


@command("seqfind_cosme", "seqfind_cosme sequencename cold hot [-prefix=]",
         min_args=3, aliases=("seqfind_cosme_cfa", "seqcosme", "seqcosme_cfa"))
def cmd_seqfind_cosme(ctx, args):
    from siril_tpu.ops.cosmetic import auto_detect_and_correct

    pos, flags = parse_flags(args)
    cold_sig, hot_sig = float(pos[1]), float(pos[2])
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "cc_"

    def fn(im):
        out = im.host().copy()
        for c in range(im.nchans):
            res, _, _ = auto_detect_and_correct(out[c], sig_hot=hot_sig,
                                                sig_cold=cold_sig,
                                                is_cfa=im.is_cfa())
            out[c] = np.asarray(res)
        return im.copy(data=out)

    _seq_apply(ctx, pos[0], prefix, "seqfind_cosme", fn)


@command("seqsplit_cfa", "seqsplit_cfa sequencename [-prefix=]", min_args=1)
def cmd_seqsplit_cfa(ctx, args):
    from siril_tpu.core.engine import SeqArgs, run_sequence
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.extraction import split_cfa

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "CFA_"
    count = [0]

    def image(c, idx, img):
        subs = split_cfa(img)
        num = int(seq.filenum[idx])
        for i, s in enumerate(subs):
            write_fits(s, os.path.join(
                seq.directory,
                f"{prefix}{i}_{seq.name}{num:0{seq.fixed_len}d}.fit"))
        count[0] += 1
        return None

    run_sequence(SeqArgs(seq=seq, description="seqsplit_cfa", image=image,
                         output=False))
    log_message(f"split_cfa: {count[0]} frames split")


@command("seqextract_ha", "seqextract_Ha sequencename [-prefix=]", min_args=1)
def cmd_seqextract_ha(ctx, args):
    from siril_tpu.ops.extraction import extract_ha

    pos, flags = parse_flags(args)
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "Ha_"

    def op(im):
        out = extract_ha(im)
        if "upscale" in flags:
            from siril_tpu.ops.geometry import resample

            out = resample(out, out.width * 2, out.height * 2)
        return out

    _seq_apply(ctx, pos[0], prefix, "seqextract_Ha", op)


@command("seqextract_green", "seqextract_Green sequencename [-prefix=]",
         min_args=1)
def cmd_seqextract_green(ctx, args):
    from siril_tpu.ops.extraction import extract_green

    pos, flags = parse_flags(args)
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "Green_"
    _seq_apply(ctx, pos[0], prefix, "seqextract_Green", extract_green)


@command("seqextract_haoiii", "seqextract_HaOIII sequencename [-resample={ha|oiii}]",
         min_args=1)
def cmd_seqextract_haoiii(ctx, args):
    from siril_tpu.core.engine import SeqArgs, run_sequence
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.extraction import extract_ha_oiii

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    resample = str(flags.get("resample", "oiii")).lower()

    def image(c, idx, img):
        ha, oiii = extract_ha_oiii(img, resample=resample)
        num = int(seq.filenum[idx])
        write_fits(ha, os.path.join(
            seq.directory, f"Ha_{seq.name}{num:0{seq.fixed_len}d}.fit"))
        write_fits(oiii, os.path.join(
            seq.directory, f"OIII_{seq.name}{num:0{seq.fixed_len}d}.fit"))
        return None

    run_sequence(SeqArgs(seq=seq, description="seqextract_HaOIII",
                         image=image, output=False))


@command("seqrl", "seqrl sequencename [-iters=] [psf flags]", min_args=1)
def cmd_seqrl(ctx, args):
    from siril_tpu.ops.deconvolution import richardson_lucy

    pos, flags = parse_flags(args)
    psf = _psf_for_deconv(ctx, flags)
    iters = int(_f(flags.get("iters"), 20) or 20)
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "rl_"
    _seq_apply(ctx, pos[0], prefix, "seqrl",
               lambda im: richardson_lucy(im, psf, iterations=iters))


@command("seqwiener", "seqwiener sequencename [-alpha=] [psf flags]", min_args=1)
def cmd_seqwiener(ctx, args):
    from siril_tpu.ops.deconvolution import wiener

    pos, flags = parse_flags(args)
    psf = _psf_for_deconv(ctx, flags)
    alpha = 1.0 / (_f(flags.get("alpha"), 500.0) or 500.0)
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "wiener_"
    _seq_apply(ctx, pos[0], prefix, "seqwiener",
               lambda im: wiener(im, psf, alpha=alpha))


@command("seqsb", "seqsb sequencename [-iters=] [psf flags]", min_args=1)
def cmd_seqsb(ctx, args):
    from siril_tpu.ops.deconvolution import split_bregman_tv

    pos, flags = parse_flags(args)
    psf = _psf_for_deconv(ctx, flags)
    iters = int(_f(flags.get("iters"), 10) or 10)
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "sb_"
    _seq_apply(ctx, pos[0], prefix, "seqsb",
               lambda im: split_bregman_tv(im, psf, iterations=iters))


@command("seqdenoise", "seqdenoise sequencename [-vst | -sos=n [-rho=r]]",
         min_args=1)
def cmd_seqdenoise(ctx, args):
    from siril_tpu.ops.nlbayes import nlbayes_denoise

    pos, flags = parse_flags(args)
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "dn_"
    sos = int(_f(flags.get("sos"), 0) or 0)
    rho = _f(flags.get("rho"), 0.3) or 0.3
    _seq_apply(ctx, pos[0], prefix, "seqdenoise",
               lambda im: nlbayes_denoise(im, use_vst="vst" in flags,
                                          sos_iters=sos, sos_rho=rho))


@command("seqatrous", "seqatrous sequencename nbr_layers [-prefix=]",
         min_args=1)
def cmd_seqatrous(ctx, args):
    from siril_tpu.ops.wavelets import wavelet_denoise

    pos, flags = parse_flags(args)
    n = int(float(pos[1])) if len(pos) > 1 else 4
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "atrous_"
    _seq_apply(ctx, pos[0], prefix, "seqatrous",
               lambda im: wavelet_denoise(im, nb_layers=n,
                                          use_vst="anscombe" in flags))


@command("seqghs", "seqghs sequencename -D= [...]", min_args=2,
         aliases=("seqght",))
def cmd_seqghs(ctx, args):
    from siril_tpu.ops.stretch import GHTParams, STRETCH_PAYNE_NORMAL, apply_ght

    pos, flags = parse_flags(args)
    p = GHTParams(stretchtype=STRETCH_PAYNE_NORMAL,
                  D=_f(flags.get("d"), 1.0) or 1.0,
                  B=_f(flags.get("b"), 0.0) or 0.0,
                  LP=_f(flags.get("lp"), 0.0) or 0.0,
                  SP=_f(flags.get("sp"), 0.0) or 0.0,
                  HP=_f(flags.get("hp"), 1.0) or 1.0)
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) else "ghs_"
    _seq_apply(ctx, pos[0], prefix, "seqghs", lambda im: apply_ght(im, p))


@command("seqstarnet", "seqstarnet sequencename", min_args=1)
def cmd_seqstarnet(ctx, args):
    raise CommandError("starnet integration requires the external StarNet "
                       "binary (not available in this environment)")


@command("merge", "merge seq1 seq2 ... newseq", min_args=3)
def cmd_merge(ctx, args):
    from siril_tpu.io.conversion import convert_to_sequence

    *seq_names, dest = args
    files = []
    for sn in seq_names:
        seq = ctx.load_sequence(sn)
        files.extend(f for f in seq._file_list if f)
    if not files:
        raise CommandError("no frames found in input sequences")
    ctx.seq = convert_to_sequence(files, dest, ctx.cwd, symlink=False)
    log_message(f"Merged {len(files)} frames into {dest}")


# ===========================================================================
# live stacking + undo + path-parse commands
# ===========================================================================


@command("start_ls", "start_ls [-dark=] [-flat=] [-debayer] [-shift]")
def cmd_start_ls(ctx, args):
    from siril_tpu.livestacking.livestack import LiveStackConfig, LiveStacker

    pos, flags = parse_flags(args)
    cfg = LiveStackConfig()
    if isinstance(flags.get("dark"), str):
        cfg.dark = _load_master(ctx, flags["dark"])
        cfg.calibrate = True
    if isinstance(flags.get("flat"), str):
        cfg.flat = _load_master(ctx, flags["flat"])
        cfg.calibrate = True
    cfg.debayer = "debayer" in flags
    cfg.shift_only = "shift" in flags or True
    ctx.livestacker = LiveStacker(ctx.cwd, cfg)
    ctx.livestacker.start()


@command("livestack", "livestack filename", min_args=0)
def cmd_livestack(ctx, args):
    ls = getattr(ctx, "livestacker", None)
    if ls is None:
        raise CommandError("live stacking not started (start_ls)")
    if args:
        ls.process_file(ctx.path(args[0]))
    log_message(f"live stack: {ls.count} frames accumulated")


@command("stop_ls", "stop_ls")
def cmd_stop_ls(ctx, args):
    ls = getattr(ctx, "livestacker", None)
    if ls is None:
        raise CommandError("live stacking not started")
    ls.stop()
    ls.save_result()
    ctx.livestacker = None


@command("undo", "undo", req=REQ_SINGLE_IMAGE)
def cmd_undo(ctx, args):
    us = getattr(ctx, "undo_stack", None)
    if us is None or not us.can_undo:
        raise CommandError("nothing to undo")
    img = us.undo(ctx.image)
    if img is not None:
        ctx.image = img


@command("redo", "redo", req=REQ_SINGLE_IMAGE)
def cmd_redo(ctx, args):
    us = getattr(ctx, "undo_stack", None)
    if us is None or not us.can_redo:
        raise CommandError("nothing to redo")
    img = us.redo(ctx.image)
    if img is not None:
        ctx.image = img


@command("parse", "parse path_template", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_parse(ctx, args):
    from siril_tpu.utils.pathparse import parse_path

    out = parse_path(args[0], ctx.require_image())
    log_message(out)


@command("online", "online")
def cmd_online(ctx, args):
    ctx.prefs.online = True
    log_message("online mode: remote catalogues enabled "
                "(TAP cone search, SIMBAD object lookup)")


@command("offline", "offline")
def cmd_offline(ctx, args):
    ctx.prefs.online = False
    log_message("offline mode (local catalogues only)")


@command("pyscript", "pyscript script.py [args…]", min_args=1)
def cmd_pyscript(ctx, args):
    """Run a Python script over the sirilpy wire protocol: a socket
    server is started ($MY_SOCKET) and the script runs in a subprocess,
    exactly like the reference (io/siril_pythonmodule.c venv spawn —
    here the current interpreter).  Scripts importing ``sirilpy``
    connect over the socket; scripts may also use the in-process
    ``siril_tpu.pythonmodule.SirilInterface`` directly."""
    from siril_tpu.pythonmodule.server import run_python_script

    path = ctx.path(args[0])
    if not os.path.exists(path):
        raise CommandError(f"script not found: {args[0]}")
    rc = run_python_script(path, ctx, args=list(args[1:]))
    if rc != 0:
        raise CommandError(f"python script failed (exit code {rc})")


@command("spcc", "spcc [-limitmag=] [-monosensor=|-oscsensor=] [-rfilter=] [-gfilter=] [-bfilter=] [-oscfilter=] [-narrowband [-rwl= -gwl= -bwl= -rbw= -gbw= -bbw=]] [-atmos [-obsheight=] [-pressure=|-slp=]] [-whiteref=] [-bgtol=]",
         req=REQ_SINGLE_IMAGE | REQ_FOR_RGB)
def cmd_spcc(ctx, args):
    from siril_tpu.astrometry.spcc import (
        ResponseLibrary,
        atmospheric_transmission,
        narrowband_filters,
        spcc,
    )

    pos, flags = parse_flags(args)
    cat = _get_catalog(ctx, flags)
    lib = ResponseLibrary()
    sensor = str(flags.get("monosensor") or flags.get("oscsensor")
                 or flags.get("sensor") or "generic_qe")
    filters = (str(flags.get("rfilter", "R")),
               str(flags.get("gfilter", "G")),
               str(flags.get("bfilter", "B")))
    if isinstance(flags.get("oscfilter"), str):
        filters = (flags["oscfilter"],) * 3
    extra_resp = None
    if "narrowband" in flags:
        extra_resp = narrowband_filters(
            rwl=_f(flags.get("rwl"), 656.28) or 656.28,
            gwl=_f(flags.get("gwl"), 500.7) or 500.7,
            bwl=_f(flags.get("bwl"), 500.7) or 500.7,
            rbw=_f(flags.get("rbw"), 3.0) or 3.0,
            gbw=_f(flags.get("gbw"), 3.0) or 3.0,
            bbw=_f(flags.get("bbw"), 3.0) or 3.0)
    atmos = None
    if "atmos" in flags:
        atmos = atmospheric_transmission(
            obsheight_m=_f(flags.get("obsheight"), 0.0) or 0.0,
            pressure_mbar=_f(flags.get("pressure"),
                             _f(flags.get("slp"), None)))
    out = spcc(ctx.require_image(), cat, sensor=sensor, filters=filters,
               library=lib,
               mag_limit=_f(flags.get("limitmag"), 13.0) or 13.0,
               extra_responses=extra_resp, atmosphere=atmos)
    if out is None:
        raise CommandError("SPCC failed")
    ctx.set_image(out)


@command("spcc_list", "spcc_list {sensors|filters}")
def cmd_spcc_list(ctx, args):
    from siril_tpu.astrometry.spcc import ResponseLibrary

    lib = ResponseLibrary()
    for name in lib.names():
        log_message(name)


@command("findcompstars", "findcompstars x y [-dvmag=] [-dbv=] [-out=] [-catalog=]",
         req=REQ_SINGLE_IMAGE, min_args=2)
def cmd_findcompstars(ctx, args):
    from siril_tpu.astrometry.compstars import (
        CompStarArgs,
        export_compstars_list,
        export_nina_csv,
        find_comp_stars,
    )

    pos, flags = parse_flags(args)
    cat = _get_catalog(ctx, flags)
    ca = CompStarArgs()
    if "emag" in flags:
        ca.max_emag = float(flags["emag"])
    if "narrow" in flags:
        ca.narrow_fov = True
    if "wide" in flags:
        ca.narrow_fov = False
    if "dvmag" in flags:
        ca.delta_vmag = float(flags["dvmag"])
    if "dbv" in flags:
        ca.delta_bv = float(flags["dbv"])
    try:
        target, comps = find_comp_stars(
            ctx.require_image(), cat, (float(pos[0]), float(pos[1])), ca)
    except ValueError as e:
        raise CommandError(str(e))
    out = flags.get("out") if isinstance(flags.get("out"), str) else "compstars"
    export_compstars_list(target, comps, ctx.path(out + ".lst"))
    export_nina_csv(target, comps, ctx.path(out + ".csv"))
    log_message(f"wrote {out}.lst and {out}.csv")


@command("show", "show [name | ra dec]", req=REQ_SINGLE_IMAGE)
def cmd_show(ctx, args):
    from siril_tpu.astrometry.annotations import annotate_image, find_object

    img = ctx.require_image()
    if args:
        a = find_object(args[0])
        if a is None:
            raise CommandError(f"object '{args[0]}' not found in local "
                               "catalogues")
        if img.wcs is not None:
            x, y = img.wcs.world2pix(np.array([a.ra]), np.array([a.dec]))
            log_message(f"{a.name}: RA={a.ra:.4f} Dec={a.dec:.4f} "
                        f"→ pixel ({float(x[0]):.1f}, {float(y[0]):.1f})")
        else:
            log_message(f"{a.name}: RA={a.ra:.4f} Dec={a.dec:.4f}")
        return
    try:
        anns = annotate_image(img)
    except ValueError as e:
        raise CommandError(str(e))
    for a in anns:
        log_message(f"{a.name} at ({a.x:.1f}, {a.y:.1f})")
    log_message(f"{len(anns)} annotation(s) in field")


@command("catsearch", "catsearch name", min_args=1)
def cmd_catsearch(ctx, args):
    from siril_tpu.astrometry.annotations import find_object
    from siril_tpu.ops.wcs import format_dec, format_ra

    name = " ".join(args)
    a = find_object(name)
    if a is not None:
        log_message(f"{a.name}: RA {format_ra(a.ra)}, "
                    f"Dec {format_dec(a.dec)}")
        return
    # not in local annotation catalogues: SIMBAD by-name lookup
    # (search_objects.c) when online / fixtures present
    from siril_tpu.astrometry.remote import TransportError, search_object

    try:
        hit = search_object(name)
    except TransportError as e:
        raise CommandError(f"object '{name}' not found locally and remote "
                           f"lookup unavailable ({e})")
    if hit is None:
        raise CommandError(f"object '{name}' not found")
    ra, dec, resolved = hit
    log_message(f"{resolved}: RA {format_ra(ra)}, Dec {format_dec(dec)}")


# ===========================================================================
# ICC / inspector / profile / xtrans commands
# ===========================================================================


@command("icc_assign", "icc_assign profile", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_icc_assign(ctx, args):
    from siril_tpu.ops.icc import assign_profile

    spec = args[0]
    if spec.lower().endswith((".icc", ".icm")):
        spec = ctx.path(spec)
    try:
        ctx.set_image(assign_profile(ctx.require_image(), spec))
    except ValueError as e:
        raise CommandError(str(e))


@command("icc_convert_to", "icc_convert_to profile", req=REQ_SINGLE_IMAGE,
         min_args=1)
def cmd_icc_convert(ctx, args):
    from siril_tpu.ops.icc import convert_to_profile

    spec = args[0]
    if spec.lower().endswith((".icc", ".icm")):
        spec = ctx.path(spec)
    try:
        ctx.set_image(convert_to_profile(ctx.require_image(), spec))
    except ValueError as e:
        raise CommandError(str(e))


@command("icc_remove", "icc_remove", req=REQ_SINGLE_IMAGE)
def cmd_icc_remove(ctx, args):
    from siril_tpu.ops.icc import remove_profile

    ctx.set_image(remove_profile(ctx.require_image()))


@command("tilt", "tilt", req=REQ_SINGLE_IMAGE, aliases=("seqtilt",))
def cmd_tilt(ctx, args):
    from siril_tpu.ops.inspector import sensor_tilt

    try:
        sensor_tilt(ctx.require_image())
    except ValueError as e:
        raise CommandError(str(e))


@command("inspector", "inspector", req=REQ_SINGLE_IMAGE)
def cmd_inspector(ctx, args):
    from siril_tpu.ops.inspector import aberration_inspector

    ctx.set_image(aberration_inspector(ctx.require_image()))


@command("fix_xtrans", "fix_xtrans", req=REQ_SINGLE_IMAGE)
def cmd_fix_xtrans(ctx, args):
    from siril_tpu.ops.inspector import fix_xtrans_af

    ctx.set_image(fix_xtrans_af(ctx.require_image()))


@command("profile", "profile -from=x,y -to=x,y [-layer=] [-filename=]",
         req=REQ_SINGLE_IMAGE, min_args=2)
def cmd_profile(ctx, args):
    from siril_tpu.ops.inspector import intensity_profile, save_profile_plot

    pos, flags = parse_flags(args)
    try:
        p0 = tuple(float(v) for v in str(flags["from"]).split(","))
        p1 = tuple(float(v) for v in str(flags["to"]).split(","))
    except (KeyError, ValueError):
        raise CommandError("usage: profile -from=x,y -to=x,y")
    layer = int(_f(flags.get("layer"), -1) or -1)
    prof = intensity_profile(
        ctx.require_image(), p0, p1,
        layer=None if layer < 0 else layer,
        width=int(_f(flags.get("width"), 1) or 1),
        spacing=_f(flags.get("spacing"), 1.0) or 1.0,
        arcsec="arcsec" in flags)
    base = flags.get("filename") if isinstance(flags.get("filename"), str) \
        else "profile"
    title = flags.get("title") if isinstance(flags.get("title"), str) \
        else "Intensity profile"
    png = None if "savedat" in flags else ctx.path(base + ".png")
    save_profile_plot(prof, ctx.path(base + ".dat"), png, title=title)
    log_message(f"profile saved to {base}.dat"
                + ("" if "savedat" in flags else f" / {base}.png"))


# part 2 of the command table (registers into COMMANDS on import)
from siril_tpu.cli import commands2  # noqa: E402,F401  isort:skip
