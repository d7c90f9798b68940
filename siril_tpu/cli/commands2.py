"""Command surface, part 2 — completes the reference's ~220-command table
(``src/core/command_list.h``): session/help commands, mask commands,
remaining seq-variants, streak detection, sky-coordinate crop, HEALPix/HTM
developer commands, and the à-trous denoise front-end.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from siril_tpu.cli.commands import (
    COMMANDS,
    REQ_FOR_RGB,
    REQ_NONE,
    REQ_SEQUENCE,
    REQ_SINGLE_IMAGE,
    _f,
    _seq_apply,
    command,
    parse_flags,
)
from siril_tpu.cli.context import CommandError, Session
from siril_tpu.core.image import FLOAT_IMG, SirilImage
from siril_tpu.utils.log import log_error, log_message, log_warning

# ===========================================================================
# session / console
# ===========================================================================


@command("help", "help [command]")
def cmd_help(ctx, args):
    if args:
        c = COMMANDS.get(args[0].lower())
        if c is None:
            raise CommandError(f"unknown command: {args[0]}")
        log_message(f"Usage: {c.usage or c.name}")
    else:
        names = sorted({c.name for c in COMMANDS.values()})
        log_message(f"{len(names)} commands: " + " ".join(names))


@command("clear", "clear")
def cmd_clear(ctx, args):
    # clears the GUI console in the reference — headless no-op
    pass


@command("log", "log text")
def cmd_log(ctx, args):
    log_message(" ".join(args))


@command("cdg", "cdg", req=REQ_SINGLE_IMAGE)
def cmd_cdg(ctx, args):
    """Center of gravity (command.c process_cdg): pixels above 15.7% of
    max with 4 neighbours above the same threshold, ≥50 required."""
    img = ctx.require_image()
    lay = img.host()[0] if img.nchans == 1 else img.host().mean(axis=0)
    thr = 0.157 * float(lay.max())
    m = lay > thr
    core = m[1:-1, 1:-1] & m[:-2, 1:-1] & m[2:, 1:-1] & m[1:-1, :-2] \
        & m[1:-1, 2:]
    ys, xs = np.nonzero(core)
    if ys.size < 50:
        raise CommandError("not enough significant pixels to compute the "
                           "center of gravity")
    w = lay[1:-1, 1:-1][core]
    cx = float(np.sum((xs + 1) * w) / np.sum(w))
    cy = float(np.sum((ys + 1) * w) / np.sum(w))
    log_message(f"Center of gravity: ({cx:.2f}, {cy:.2f})")
    return cx, cy


@command("limit", "limit {-clip|-posrescale|-rescale}",
         req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_limit(ctx, args):
    img = ctx.require_image()
    pos, flags = parse_flags(args)
    d = img.host().astype(np.float32)
    if "clip" in flags:
        d = np.clip(d, 0.0, 1.0)
    elif "posrescale" in flags:
        d = np.where(d < 0.0, 0.0, d)
        mx = float(d.max())
        if mx > 1.0:
            d = d / mx
    elif "rescale" in flags:
        mn = float(d.min())
        if mn < 0.0:
            d = d - mn
        mx = float(d.max())
        if mx > 1.0:
            d = d / mx
    else:
        raise CommandError("limit: one of -clip, -posrescale, -rescale "
                           "required")
    out = img.copy(data=d)
    out.log_history("limit")
    ctx.set_image(out)


@command("ffill", "ffill value [x y width height]", req=REQ_SINGLE_IMAGE,
         min_args=1)
def cmd_ffill(ctx, args):
    """Symmetric fill (command.c process_ffill): fills the region and its
    point-symmetric counterpart about the image center."""
    from siril_tpu.ops.filters import fill

    img = ctx.require_image()
    v = float(args[0]) / 65535.0
    if len(args) >= 5:
        x, y, w, h = (int(float(a)) for a in args[1:5])
    elif ctx.selection:
        x, y, w, h = ctx.selection
    else:
        x, y, w, h = 0, 0, img.width, img.height
    out = fill(img, v, (x, y, w, h))
    sx = img.width - x - w
    sy = img.height - y - h
    out = fill(out, v, (max(sx, 0), max(sy, 0), w, h))
    ctx.set_image(out)


@command("load_seq", "load_seq sequencename", min_args=1)
def cmd_load_seq(ctx, args):
    seq = ctx.load_sequence(args[0])
    log_message(f"Sequence loaded: {seq.name} ({seq.number} images)")


@command("setcompress", "setcompress 0/1 [-type=] [q]", min_args=1)
def cmd_setcompress(ctx, args):
    pos, flags = parse_flags(args)
    on = pos[0] not in ("0", "false", "no")
    ctx.prefs.comp_enabled = on
    if on:
        ctx.prefs.comp_method = str(flags.get("type", "rice")).lower()
        if len(pos) > 1:
            ctx.prefs.comp_quant = float(pos[1])
        log_message(f"FITS compression enabled: {ctx.prefs.comp_method}")
    else:
        log_message("FITS compression disabled")


@command("reloadscripts", "reloadscripts")
def cmd_reloadscripts(ctx, args):
    """Sync + list the script repository (io/siril_git.c
    auto_update_gitscripts); a no-op unless use_scripts_repository is
    enabled (network-gated like remote catalogues)."""
    from siril_tpu.utils.scriptrepo import (
        SCRIPT_REPOSITORY_URL,
        list_scripts,
        repo_path,
        sync_repository,
    )

    if not getattr(ctx.prefs, "use_scripts_repository", False):
        log_message("scripts reloaded")
        return
    url = os.environ.get("SIRIL_TPU_SCRIPT_REPO", SCRIPT_REPOSITORY_URL)
    path = os.environ.get("SIRIL_TPU_SCRIPT_REPO_DIR", repo_path())
    if sync_repository(url, path):
        scripts = list_scripts(path)
        log_message(f"scripts reloaded: {len(scripts)} repository "
                    "scripts available")
    else:
        log_message("scripts reloaded (repository sync failed)")


@command("convertraw", "convertraw basename [-debayer] [-fitseq] [-ser] [-start=] [-out=]",
         min_args=1)
def cmd_convertraw(ctx, args):
    # same engine as `convert`, restricted to DSLR RAW inputs in the
    # reference (io/conversion.c); our converter handles any input format
    return COMMANDS["convert"].fn(ctx, args)


@command("savejxl", "savejxl filename [-quality=] [-effort=]",
         req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_savejxl(ctx, args):
    from PIL import Image as PILImage

    pos, flags = parse_flags(args)
    img = ctx.require_image()
    arr = img.to_u8()
    pim = PILImage.fromarray(arr if arr.ndim == 2
                             else np.moveaxis(arr, 0, -1))
    p = ctx.path(pos[0])
    if not p.lower().endswith(".jxl"):
        p += ".jxl"
    try:
        pim.save(p, quality=int(_f(flags.get("quality"), 90) or 90))
    except (KeyError, OSError, ValueError):
        raise CommandError("JPEG-XL encoder not available in this build")
    log_message(f"Saving JXL: '{os.path.basename(p)}'")


# ===========================================================================
# masks (command_list.h:123-133)
# ===========================================================================


def _require_mask(ctx) -> np.ndarray:
    img = ctx.require_image()
    if img.mask is None:
        raise CommandError("no mask is set (use mask_from_* first)")
    return img.mask


@command("mask_autostretch", "mask_autostretch", req=REQ_SINGLE_IMAGE)
def cmd_mask_autostretch(ctx, args):
    from siril_tpu.ops.masks import mask_autostretch

    ctx.require_image().mask = mask_autostretch(_require_mask(ctx))
    log_message("mask autostretched")


@command("mask_bitpix", "mask_bitpix depth", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_mask_bitpix(ctx, args):
    # the reference stores masks as u8/u16/f32; compute here is f32, so
    # this quantizes the mask to the requested depth's resolution
    m = _require_mask(ctx)
    depth = args[0]
    if depth in ("8", "byte"):
        m = np.round(m * 255.0) / 255.0
    elif depth in ("16", "ushort"):
        m = np.round(m * 65535.0) / 65535.0
    elif depth not in ("32", "float"):
        raise CommandError("mask_bitpix: depth must be 8, 16 or 32")
    ctx.require_image().mask = m.astype(np.float32)
    log_message(f"mask bit depth set to {depth}")


@command("mask_feather", "mask_feather -dist= [-mode=]",
         req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_mask_feather(ctx, args):
    from siril_tpu.ops.masks import mask_feather

    pos, flags = parse_flags(args)
    dist = int(_f(flags.get("dist"), 0) or (float(pos[0]) if pos else 0))
    if dist <= 0:
        raise CommandError("mask_feather: -dist= required")
    ctx.require_image().mask = mask_feather(_require_mask(ctx), dist)
    log_message(f"mask feathered over {dist} px")


@command("mask_fmul", "mask_fmul factor", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_mask_fmul(ctx, args):
    from siril_tpu.ops.masks import mask_fmul

    ctx.require_image().mask = mask_fmul(_require_mask(ctx), float(args[0]))


@command("mask_from_color", "mask_from_color -cr= -cg= -cb= -tol= [-invert]",
         req=REQ_SINGLE_IMAGE | REQ_FOR_RGB, min_args=4)
def cmd_mask_from_color(ctx, args):
    from siril_tpu.ops.masks import mask_from_color, mask_invert

    pos, flags = parse_flags(args)
    try:
        color = (float(flags["cr"]), float(flags["cg"]), float(flags["cb"]))
        tol = float(flags["tol"])
    except (KeyError, ValueError):
        raise CommandError("usage: mask_from_color -cr= -cg= -cb= -tol=")
    img = ctx.require_image()
    m = mask_from_color(img, color, tol)
    if "invert" in flags:
        m = mask_invert(m)
    img.mask = m
    log_message("mask created from color")


# ===========================================================================
# remaining seq-variants
# ===========================================================================


@command("seqccm", "seqccm sequencename m00 … m22 [gamma] [-prefix=]",
         min_args=10)
def cmd_seqccm(ctx, args):
    from siril_tpu.ops.colors import apply_ccm

    pos, flags = parse_flags(args)
    m = [float(a) for a in pos[1:10]]
    gamma = float(pos[10]) if len(pos) > 10 else 1.0
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) \
        else "ccm_"
    _seq_apply(ctx, pos[0], prefix, "seqccm",
               lambda im: apply_ccm(im, m, gamma))


def _parse_ght_params(args, stretchtype):
    from siril_tpu.ops.stretch import GHTParams

    pos, flags = parse_flags(args)
    p = GHTParams(stretchtype=stretchtype)
    p.D = _f(flags.get("d"), None)
    p.B = _f(flags.get("b"), 0.0) or 0.0
    p.LP = _f(flags.get("lp"), 0.0) or 0.0
    p.SP = _f(flags.get("sp"), 0.0) or 0.0
    p.HP = _f(flags.get("hp"), 1.0) or 1.0
    p.BP = _f(flags.get("bp"), 0.0) or 0.0
    rest = pos[1:]
    if p.D is None:
        if not rest:
            raise CommandError("needs -D= or positional D")
        vals = [float(x) for x in rest]
        p.D = vals[0]
        for attr, v in zip(("B", "LP", "SP", "HP"), vals[1:]):
            setattr(p, attr, v)
    if "human" in flags:
        p.payne_colourstretchmodel = 1
    elif "even" in flags:
        p.payne_colourstretchmodel = 2
    elif "sat" in flags:
        p.payne_colourstretchmodel = 3
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) \
        else None
    return pos[0], p, prefix


def _seq_ght(ctx, args, stretchtype, desc, default_prefix):
    from siril_tpu.ops.stretch import apply_ght

    seqname, p, prefix = _parse_ght_params(args, stretchtype)
    _seq_apply(ctx, seqname, prefix or default_prefix, desc,
               lambda im: apply_ght(im, p))


@command("seqinvght", "seqinvght sequencename -D= …", min_args=2)
def cmd_seqinvght(ctx, args):
    from siril_tpu.ops.stretch import STRETCH_PAYNE_INVERSE

    _seq_ght(ctx, args, STRETCH_PAYNE_INVERSE, "seqinvght", "invght_")


@command("seqmodasinh", "seqmodasinh sequencename -D= …", min_args=2)
def cmd_seqmodasinh(ctx, args):
    from siril_tpu.ops.stretch import STRETCH_ASINH

    _seq_ght(ctx, args, STRETCH_ASINH, "seqmodasinh", "modasinh_")


@command("seqinvmodasinh", "seqinvmodasinh sequencename -D= …", min_args=2)
def cmd_seqinvmodasinh(ctx, args):
    from siril_tpu.ops.stretch import STRETCH_INVASINH

    _seq_ght(ctx, args, STRETCH_INVASINH, "seqinvmodasinh", "invmodasinh_")


@command("seqlinstretch", "seqlinstretch sequencename -BP= [-prefix=]",
         min_args=2)
def cmd_seqlinstretch(ctx, args):
    from siril_tpu.ops.stretch import linstretch

    pos, flags = parse_flags(args)
    bp = _f(flags.get("bp"), None)
    if bp is None and len(pos) > 1:
        bp = float(pos[1])
    prefix = flags.get("prefix") if isinstance(flags.get("prefix"), str) \
        else "linstretch_"
    _seq_apply(ctx, pos[0], prefix, "seqlinstretch",
               lambda im: linstretch(im, bp or 0.0))


@command("seqmerge_cfa", "seqmerge_cfa seq0 seq1 seq2 seq3 pattern [-prefixout=]",
         min_args=5)
def cmd_seqmerge_cfa(ctx, args):
    from siril_tpu.core.sequence import Sequence
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.extraction import merge_cfa

    pos, flags = parse_flags(args)
    seqs = [ctx.load_sequence(p) for p in pos[:4]]
    pattern = pos[4]
    n = min(s.number for s in seqs)
    prefix = flags.get("prefixout") if isinstance(flags.get("prefixout"),
                                                  str) else "mCFA_"
    outfiles = []
    for i in range(n):
        imgs = [s.read_frame(i) for s in seqs]
        out = merge_cfa(imgs, pattern)
        p = ctx.path(f"{prefix}{i + 1:05d}{ctx.ext}")
        write_fits(out, p, bitdepth=FLOAT_IMG)
        outfiles.append(p)
    ctx.seq = Sequence.from_files(outfiles, name=prefix.rstrip("_"))
    ctx.seq.save()
    log_message(f"seqmerge_cfa: {n} frames merged")


@command("seqprofile", "seqprofile sequencename -from=x,y -to=x,y [-layer=]",
         min_args=3)
def cmd_seqprofile(ctx, args):
    from siril_tpu.ops.inspector import intensity_profile, save_profile_plot

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    try:
        p0 = tuple(float(v) for v in str(flags["from"]).split(","))
        p1 = tuple(float(v) for v in str(flags["to"]).split(","))
    except (KeyError, ValueError):
        raise CommandError("usage: seqprofile seq -from=x,y -to=x,y")
    for i in range(seq.number):
        if not seq.incl[i]:
            continue
        prof = intensity_profile(seq.read_frame(i), p0, p1)
        base = ctx.path(f"{seq.name}_profile_{i + 1:05d}")
        save_profile_plot(prof, base + ".dat", base + ".png")
    log_message("seqprofile: profiles saved")


@command("seqsetmag", "seqsetmag magnitude", req=REQ_SEQUENCE, min_args=1)
def cmd_seqsetmag(ctx, args):
    ctx.magnitude_offset = float(args[0])
    log_message(f"magnitude offset set to {ctx.magnitude_offset}")


@command("sequnsetmag", "sequnsetmag", req=REQ_SEQUENCE)
def cmd_sequnsetmag(ctx, args):
    ctx.magnitude_offset = 0.0


@command("sequpdate_key", "sequpdate_key sequencename key value", min_args=2)
def cmd_sequpdate_key(ctx, args):
    from siril_tpu.io.fits_io import read_fits, write_fits

    seq = ctx.load_sequence(args[0])
    key = args[1].upper()
    val = args[2] if len(args) > 2 else None
    if val is not None:
        for conv in (int, float):
            try:
                val = conv(val)
                break
            except ValueError:
                pass
    n = 0
    for i in range(seq.number):
        p = seq.frame_path(i)
        if p is None:
            continue
        img = read_fits(p)
        if val is None:
            img.keywords.extra.pop(key, None)
        else:
            img.keywords.extra[key] = val
        write_fits(img, p, bitdepth=img.orig_bitdepth)
        n += 1
    log_message(f"sequpdate_key: {n} headers updated")


@command("seqfindstar", "seqfindstar sequencename [-layer=] [-maxstars=]",
         min_args=1)
def cmd_seqfindstar(ctx, args):
    from siril_tpu.cli.commands import _sf_params
    from siril_tpu.registration.starfinder import detect_stars, save_star_list_csv

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    layer = int(_f(flags.get("layer"), 0) or 0)
    for i in range(seq.number):
        if not seq.incl[i]:
            continue
        img = seq.read_frame(i)
        lay = img.host()[min(layer, img.nchans - 1)]
        stars = detect_stars(lay, _sf_params(ctx))
        save_star_list_csv(stars, ctx.path(f"{seq.name}_{i + 1:05d}.lst"))
        reg = seq.reg(layer)
        reg.number_of_stars[i] = len(stars)
        log_message(f"frame {i + 1}: {len(stars)} stars")
    seq.save()


@command("seqplatesolve", "seqplatesolve sequencename [ra dec] [-focal=] [-pixelsize=] [-catalog=] [-limitmag=] [-order=]",
         min_args=1)
def cmd_seqplatesolve(ctx, args):
    from siril_tpu.astrometry.solver import SolveArgs, solve_image
    from siril_tpu.cli.commands import _get_catalog
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.wcs import parse_dec, parse_ra

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    sa = SolveArgs()
    if len(pos) >= 3:
        sa.ra = parse_ra(pos[1])
        sa.dec = parse_dec(pos[2])
    if "focal" in flags:
        sa.focal_mm = float(flags["focal"])
    if "pixelsize" in flags:
        sa.pixel_size_um = float(flags["pixelsize"])
    if "limitmag" in flags:
        sa.mag_limit = float(flags["limitmag"])
    if "order" in flags:
        sa.sip_order = int(float(flags["order"]))
    cat = _get_catalog(ctx, flags)
    solved = 0
    for i in range(seq.number):
        if not seq.incl[i]:
            continue
        p = seq.frame_path(i)
        img = seq.read_frame(i)
        res = solve_image(img, cat, sa)
        if res is None:
            log_warning(f"frame {i + 1}: plate solve failed")
            continue
        img.wcs = res.wcs
        if p is not None:
            write_fits(img, p, bitdepth=img.orig_bitdepth)
        solved += 1
        # the solved frame seeds the next one (astrometry_solver.c seq
        # path caches the catalogue and previous solution)
        sa.ra, sa.dec = (float(v[0]) for v in res.wcs.pix2world(
            np.array([img.width / 2.0]), np.array([img.height / 2.0])))
    log_message(f"seqplatesolve: {solved}/{seq.number} frames solved")


# ===========================================================================
# à-trous denoise front-end (atrous / extract)
# ===========================================================================


@command("atrous", "atrous nbr_layers type [-denoise] [-anscombe] [-bishrink|-threshold] [-soft|-hard] [-k=]",
         req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_atrous(ctx, args):
    from siril_tpu.ops.wavelets import (
        WAVELET_BSPLINE,
        WAVELET_LINEAR,
        wavelet_denoise,
    )

    pos, flags = parse_flags(args)
    n = int(float(pos[0]))
    ktype = WAVELET_LINEAR if (len(pos) > 1 and pos[1] == "1") \
        else WAVELET_BSPLINE
    mode = "bishrink"
    if "threshold" in flags or "soft" in flags:
        mode = "soft"
    if "hard" in flags:
        mode = "hard"
    thresholds = None
    if "k" in flags:
        k = float(flags["k"])
        thresholds = [k] * n
    out = wavelet_denoise(ctx.require_image(), n, thresholds, mode,
                          use_vst="anscombe" in flags, ktype=ktype)
    ctx.set_image(out)


@command("extract", "extract NbPlans", req=REQ_SINGLE_IMAGE, min_args=1)
def cmd_extract(ctx, args):
    """Save each wavelet detail plane as layer_NN.fit (command.c
    process_extract)."""
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops.wavelets import WAVELET_BSPLINE, wavelet_transform

    img = ctx.require_image()
    n = int(float(args[0]))
    planes = wavelet_transform(img, n, WAVELET_BSPLINE)
    for i, p in enumerate(planes[:-1]):
        out = img.copy(data=np.asarray(p, np.float32))
        write_fits(out, ctx.path(f"layer_{i:02d}{ctx.ext}"),
                   bitdepth=FLOAT_IMG)
    log_message(f"extract: {n} wavelet planes saved (layer_00..layer_{n - 1:02d})")


# ===========================================================================
# star suppression, catalogue magnitude offset
# ===========================================================================


@command("ssr", "ssr [factor]", req=REQ_SINGLE_IMAGE)
def cmd_ssr(ctx, args):
    """Star suppression/replacement (command.c process_ssr): replace star
    pixels by median − factor·bgnoise (default 0.1)."""
    from siril_tpu.cli.commands import _sf_params
    from siril_tpu.ops.statistics import STATS_BASIC, compute_stats_np
    from siril_tpu.registration.starfinder import detect_stars

    img = ctx.require_image()
    factor = float(args[0]) if args else 0.1
    data = img.host().astype(np.float32).copy()
    h, w = data.shape[-2:]
    yy, xx = np.mgrid[0:h, 0:w]
    for c in range(img.nchans):
        lay = data[c]
        stars = detect_stars(lay, _sf_params(ctx))
        st = compute_stats_np(lay, STATS_BASIC)
        repl = st.median - factor * st.bgnoise
        mask = np.zeros((h, w), bool)
        for s in stars:
            r = max(2.0 * s.fwhmx, 4.0)
            m = (xx - s.x0) ** 2 + (yy - s.y0) ** 2 <= r * r
            mask |= m
        lay[mask] = repl
        log_message(f"channel {c}: {len(stars)} stars replaced")
    out = img.copy(data=data)
    out.log_history(f"ssr factor={factor}")
    ctx.set_image(out)


@command("catmag", "catmag [reftemp] [dtemp]", req=REQ_SINGLE_IMAGE)
def cmd_catmag(ctx, args):
    """Compute the absolute magnitude offset from the local catalogue
    (command.c process_catmag_mono): match detected stars to catalogue
    stars and set offset = median(cat_mag − instr_mag)."""
    from siril_tpu.cli.commands import _get_catalog, _phot_cfg, _sf_params
    from siril_tpu.ops.photometry import measure_star
    from siril_tpu.registration.psf import fwhm_from_s
    from siril_tpu.registration.starfinder import detect_stars

    img = ctx.require_image()
    if img.wcs is None:
        raise CommandError("image is not plate solved")
    cat = _get_catalog(ctx, {})
    w = img.wcs
    ra_c, dec_c = w.pix2world(np.array([img.width / 2.0]),
                              np.array([img.height / 2.0]))
    fov = w.pixel_scale_arcsec * max(img.width, img.height) / 3600.0
    cone = cat.cone_search(float(ra_c[0]), float(dec_c[0]), fov / 1.5, 15.0)
    cx, cy = w.world2pix(cone.ra, cone.dec)
    chan = 1 if img.nchans == 3 else 0
    lay = img.host()[chan]
    stars = detect_stars(lay, _sf_params(ctx))
    offs = []
    for s in stars:
        d2 = (cx - s.x0) ** 2 + (cy - s.y0) ** 2
        k = int(np.argmin(d2))
        if d2[k] > 4.0 ** 2:
            continue
        phot = measure_star(lay, s.x0, s.y0, s.fwhmx, _phot_cfg(ctx),
                            img.keywords.cvf or None)
        if phot.valid and np.isfinite(cone.mag[k]):
            offs.append(float(cone.mag[k]) - phot.mag)
    if len(offs) < 3:
        raise CommandError("catmag: not enough matched stars")
    ctx.magnitude_offset = float(np.median(offs))
    log_message(f"Absolute magnitude offset: {ctx.magnitude_offset:.3f} "
                f"({len(offs)} stars)")


# ===========================================================================
# streak detection
# ===========================================================================


@command("detect_streaks", "detect_streaks [-out=csv_file] [length]",
         req=REQ_SINGLE_IMAGE)
def cmd_detect_streaks(ctx, args):
    from siril_tpu.ops.streaks import StreakConf, detect_streaks

    pos, flags = parse_flags(args)
    conf = StreakConf()
    if pos:
        conf.initial_length = int(float(pos[0]))
    img = ctx.require_image()
    tracks = detect_streaks(img.host(), conf)
    if not tracks:
        log_message("No streak detected")
        return []
    for t in tracks:
        log_message(f"Streak: ({t.start[0]:.0f},{t.start[1]:.0f}) → "
                    f"({t.end[0]:.0f},{t.end[1]:.0f}) "
                    f"length={t.length:.0f}px angle={t.angle_deg:.1f}°")
    out = flags.get("out")
    if isinstance(out, str):
        with open(ctx.path(out), "w") as f:
            f.write("x1,y1,x2,y2,length,angle\n")
            for t in tracks:
                f.write(f"{t.start[0]:.1f},{t.start[1]:.1f},"
                        f"{t.end[0]:.1f},{t.end[1]:.1f},"
                        f"{t.length:.1f},{t.angle_deg:.2f}\n")
        log_message(f"streaks written to {out}")
    return tracks


# ===========================================================================
# astrometry extras: disto, eqcrop, gps, healpix, trixel
# ===========================================================================


@command("disto", "disto [clear]", req=REQ_SINGLE_IMAGE)
def cmd_disto(ctx, args):
    img = ctx.require_image()
    if args and args[0] == "clear":
        log_message("distortion display disabled")
        return
    w = img.wcs
    if w is None:
        raise CommandError("image is not plate solved")
    sip = getattr(w, "sip_a", None)
    if sip is None:
        log_message("No distortion terms in the WCS solution")
        return
    # evaluate the SIP polynomial displacement on a coarse grid
    xs = np.linspace(0, img.width - 1, 9)
    ys = np.linspace(0, img.height - 1, 9)
    gx, gy = np.meshgrid(xs, ys)
    from siril_tpu.ops.wcs import _sip_eval

    du = _sip_eval(w.sip_a, gx - w.crpix[0], gy - w.crpix[1])
    dv = _sip_eval(w.sip_b, gx - w.crpix[0], gy - w.crpix[1])
    amp = np.hypot(du, dv)
    log_message(f"Distortion field: max {amp.max():.2f} px, "
                f"mean {amp.mean():.2f} px (SIP order "
                f"{w.sip_a.shape[0] - 1})")


@command("eqcrop", "eqcrop ra1 dec1 ra2 dec2 [-marginpx=|-marginasec=] [-minsize=]",
         req=REQ_SINGLE_IMAGE, min_args=4)
def cmd_eqcrop(ctx, args):
    """Crop to a sky-coordinate rectangle (command.c process_eqcrop,
    geometry.c eqcrop helpers)."""
    from siril_tpu.ops.geometry import crop
    from siril_tpu.ops.wcs import parse_dec, parse_ra

    img = ctx.require_image()
    if img.wcs is None:
        raise CommandError("image is not plate solved")
    pos, flags = parse_flags(args)
    ra1, dec1 = parse_ra(pos[0]), parse_dec(pos[1])
    ra2, dec2 = parse_ra(pos[2]), parse_dec(pos[3])
    xs, ys = img.wcs.world2pix(np.array([ra1, ra2]), np.array([dec1, dec2]))
    margin = int(_f(flags.get("marginpx"), 0) or 0)
    if "marginasec" in flags:
        margin = int(round(float(flags["marginasec"])
                           / img.wcs.pixel_scale_arcsec))
    x0 = int(np.floor(min(xs))) - margin
    x1 = int(np.ceil(max(xs))) + margin
    y0 = int(np.floor(min(ys))) - margin
    y1 = int(np.ceil(max(ys))) + margin
    minsize = int(_f(flags.get("minsize"), 32) or 32)
    x0 = max(0, x0)
    y0 = max(0, y0)
    x1 = min(img.width, x1)
    y1 = min(img.height, y1)
    if x1 - x0 < minsize or y1 - y0 < minsize:
        raise CommandError("eqcrop: target region too small or outside "
                           "the image")
    out = crop(img, x0, y0, x1 - x0, y1 - y0)
    ctx.set_image(out)
    log_message(f"eqcrop: {x1 - x0}x{y1 - y0} at ({x0},{y0})")


@command("gps", "gps [{-ro | -header | line_number}]", req=REQ_SINGLE_IMAGE)
def cmd_gps(ctx, args):
    """QHY GPSBOX metadata (io/gps_parser.c). The binary GPS record lives
    in the first image rows of supported cameras; report header-resident
    GPS keywords when present, else absence."""
    img = ctx.require_image()
    kw = img.keywords.extra
    gps_keys = {k: v for k, v in kw.items()
                if k.startswith("GPS") or k in ("LATITUDE", "LONGITUD",
                                                "SITELAT", "SITELONG")}
    if gps_keys:
        for k, v in sorted(gps_keys.items()):
            log_message(f"{k} = {v}")
    else:
        log_message("No GPS data found in this image")


@command("healpix", "healpix", req=REQ_SINGLE_IMAGE)
def cmd_healpix(ctx, args):
    from siril_tpu.astrometry.healpix import (
        image_footprint_pixels,
        nest_parent,
    )

    img = ctx.require_image()
    if img.wcs is None:
        raise CommandError("image is not plate solved")
    pix8 = image_footprint_pixels(img.wcs, img.width, img.height, 256)
    parents = nest_parent(pix8, 8, 1)
    log_message(f"HEALPix NESTED coverage: {len(np.unique(parents))} "
                f"level-1 pixel(s), {len(pix8)} level-8 pixel(s)")
    for p1 in np.unique(parents):
        kids = pix8[parents == p1]
        log_message(f"  level1 {int(p1)}: level8 "
                    + ", ".join(str(int(k)) for k in kids[:32])
                    + (" …" if len(kids) > 32 else ""))
    return pix8


@command("trixel", "trixel [-p]", req=REQ_NONE)
def cmd_trixel(ctx, args):
    from siril_tpu.astrometry.healpix import image_footprint_trixels

    pos, flags = parse_flags(args)
    if "p" in flags:
        # dump all level-3 trixel ids with their star counts
        from siril_tpu.cli.commands import _get_catalog
        from siril_tpu.astrometry.healpix import radec_to_htm

        cat = _get_catalog(ctx, {})
        ids = radec_to_htm(cat.ra, cat.dec, 3)
        with open(ctx.path("trixels.csv"), "w") as f:
            f.write("trixel,ra,dec,mag\n")
            for i in np.argsort(ids):
                f.write(f"{int(ids[i])},{cat.ra[i]:.6f},{cat.dec[i]:.6f},"
                        f"{cat.mag[i]:.3f}\n")
        log_message(f"trixels.csv written ({len(ids)} stars)")
        return
    img = ctx.require_image()
    if img.wcs is None:
        raise CommandError("image is not plate solved")
    trix = image_footprint_trixels(img.wcs, img.width, img.height, 3)
    log_message(f"{len(trix)} level-3 trixels visible: "
                + " ".join(str(int(t)) for t in trix))
    return trix


@command("seqgps", "seqgps sequencename", min_args=1)
def cmd_seqgps(ctx, args):
    seq = ctx.load_sequence(args[0])
    found = 0
    for i in range(seq.number):
        img = seq.read_frame_metadata(i)
        kw = img.keywords.extra if img is not None else {}
        if any(k.startswith("GPS") for k in kw):
            found += 1
    log_message(f"seqgps: GPS data in {found}/{seq.number} frames")


# ===========================================================================
# fused HBM-resident pipeline (TPU-native extension, siril_tpu/pipeline.py)
# ===========================================================================


@command("fusedstack",
         "fusedstack sequencename [rejection] [sig_low sig_high] [-norm=] "
         "[-bias=] [-dark=] [-flat=] [-transf=] [-out=]",
         min_args=1)
def cmd_fusedstack(ctx, args):
    """TPU-native fused calibrate+register+stack: the whole sequence stays
    resident in device HBM across stages — no intermediate pp_/r_
    sequences, one upload and one result fetch.  Extension command (not in
    the reference, which materializes every stage: SURVEY.md §5
    checkpoint/resume)."""
    from siril_tpu.io.conversion import load_any
    from siril_tpu.io.fits_io import write_fits
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops.calibration import CalibArgs
    from siril_tpu.ops.normalization import ADDITIVE_SCALING, NORM_NAMES
    from siril_tpu.ops.stacking import StackArgs
    from siril_tpu.pipeline import FusedArgs, fused_preprocess_stack
    from siril_tpu.registration.matching import (
        HOMOGRAPHY_TRANSFORMATION,
        SHIFT_TRANSFORMATION,
    )
    from siril_tpu.cli.commands import _is_number, _sf_params

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    sa = StackArgs(method="rej")
    rest = pos[1:]
    if rest and not _is_number(rest[0]):
        sa.rejection = rj.REJECTION_NAMES.get(rest[0].lower(), rj.WINSORIZED)
        rest = rest[1:]
    if len(rest) >= 2:
        sa.siglow, sa.sighigh = float(rest[0]), float(rest[1])
    sa.normalize = NORM_NAMES.get(str(flags.get("norm", "addscale")).lower(),
                                  ADDITIVE_SCALING)
    calib = None
    if any(k in flags for k in ("bias", "dark", "flat")):
        calib = CalibArgs()
        if isinstance(flags.get("bias"), str):
            calib.bias = load_any(ctx.path(flags["bias"]))
        if isinstance(flags.get("dark"), str):
            calib.dark = load_any(ctx.path(flags["dark"]))
        if isinstance(flags.get("flat"), str):
            calib.flat = load_any(ctx.path(flags["flat"]))
    fa = FusedArgs(calib=calib, stack=sa, starfinder=_sf_params(ctx),
                   register="noreg" not in flags)
    if flags.get("transf") == "homography":
        fa.ttype = HOMOGRAPHY_TRANSFORMATION
    try:
        res = fused_preprocess_stack(seq, fa)
    except MemoryError as e:
        raise CommandError(str(e))
    name = flags.get("out") if isinstance(flags.get("out"), str) \
        else seq.name + "fused"
    p = ctx.path(name)
    if not os.path.splitext(p)[1]:
        p += ctx.ext
    write_fits(res.image, p, bitdepth=-32)
    ctx.set_image(res.image, os.path.basename(p))
    log_message(f"fusedstack: saved {os.path.basename(p)} "
                f"({res.elapsed_s:.2f}s)")


# ===========================================================================
# sequence export (headless surface of the reference "Export sequence"
# dialog, io/sequence_export.c; video via OpenCV-ffmpeg)
# ===========================================================================

@command("seqexport",
         "seqexport sequencename basename [-format=fits|fitseq|ser|tiff|"
         "avi|mp4|mp4-h265|webm] [-fps=] [-quality=] [-normalize] "
         "[-crop=x,y,w,h] [-resize=WxH] [-32b]",
         min_args=2)
def cmd_seqexport(ctx, args):
    from siril_tpu.io.sequence_export import ExportArgs, export_sequence

    pos, flags = parse_flags(args)
    seq = ctx.load_sequence(pos[0])
    ea = ExportArgs(basename=pos[1] if pos[1].endswith("_") else pos[1] + "_",
                    output=str(flags.get("format", "fits")).lower(),
                    normalize="normalize" in flags,
                    fps=int(_f(flags.get("fps"), 25) or 25),
                    quality=int(_f(flags.get("quality"), 3) or 3),
                    bitdepth=32 if "32b" in flags else 16)
    if isinstance(flags.get("crop"), str):
        ea.crop = tuple(int(v) for v in flags["crop"].split(","))
    if isinstance(flags.get("resize"), str):
        w, h = flags["resize"].lower().split("x")
        ea.resample = (int(w), int(h))
    n = export_sequence(seq, ea, directory=ctx.cwd)
    log_message(f"seqexport: wrote {n} frames as {ea.output}")


@command("precompile",
         "precompile nb_frames [-width=] [-height=] [-channels=] "
         "[-rej=type[,type...]] [-sig=lo,hi] [-pipeline] "
         "[-persp[=D,D...]]",
         min_args=1)
def cmd_precompile(ctx, args):
    """AOT-compile the stacking kernel set for a given sequence shape into
    the persistent compilation cache — the FFTW-wisdom analog
    (settings.h:310-316).  After one run, cold-process stack/fusedstack
    commands on that shape start hot."""
    from siril_tpu.ops import rejection as rj
    from siril_tpu.utils.jaxcache import enable_compilation_cache
    from siril_tpu.utils.precompile import (
        precompile_perspective_kernels,
        precompile_pipeline_kernels,
        precompile_stack_kernels,
    )

    pos, flags = parse_flags(args)
    n = int(pos[0])
    width = int(_f(flags.get("width"), 4096))
    height = int(_f(flags.get("height"), 4096))
    channels = int(_f(flags.get("channels"), 1))
    siglow, sighigh = 3.0, 3.0
    if isinstance(flags.get("sig"), str):
        siglow, sighigh = (float(v) for v in flags["sig"].split(","))
    rejs = None
    if isinstance(flags.get("rej"), str):
        try:
            rejs = [rj.REJECTION_NAMES[r.strip().lower()]
                    for r in flags["rej"].split(",")]
        except KeyError as e:
            raise CommandError(f"unknown rejection type {e}")
    path = enable_compilation_cache()
    log_message(f"precompile: cache at {path}")
    t0 = __import__("time").perf_counter()
    done = precompile_stack_kernels(n, width, height, channels, rejs,
                                    siglow=siglow, sighigh=sighigh,
                                    log=log_message)
    if "pipeline" in flags:
        done += precompile_pipeline_kernels(n, width, height, channels,
                                            log=log_message)
    if "persp" in flags:
        dbuckets = (2, 4)
        if isinstance(flags.get("persp"), str):
            try:
                dbuckets = tuple(int(v) for v in flags["persp"].split(","))
            except ValueError:
                raise CommandError("-persp= expects D values from 2,4,8,16")
            # D is bucketed at runtime (perspective_split_from_Hs) — a
            # kernel compiled for any other D can never be hit
            if not dbuckets or not set(dbuckets) <= {2, 4, 8, 16}:
                raise CommandError("-persp= expects D values from 2,4,8,16")
        done += precompile_perspective_kernels(n, width, height, channels,
                                               dbuckets=dbuckets,
                                               log=log_message)
    log_message(f"precompile: {len(done)} kernels in "
                f"{__import__('time').perf_counter() - t0:.1f}s")
