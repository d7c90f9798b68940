"""Global star-alignment registration — equivalent of
``src/registration/global.c`` (register_star_alignment:653,
register_multi_step_global:907) and ``applyreg.c`` (seqapplyreg).

Per frame: star detection + batched PSF fit (device) → triangle match +
RANSAC H vs the reference frame (host, overlapped with the next frame's
device work by the engine's prefetch) → regdata quality metrics
(FWHM_stats, star_finder.c:770; weighted_fwhm formula global.c:1135-1137)
→ optional immediate warp into a new ``r_`` sequence.

2-pass: pass 1 stores transforms + picks the best reference (highest
star count / lowest weighted fwhm among frames with ≥ half the max star
count, global.c:1085); pass 2 is apply_reg_sequence with framing.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from siril_tpu.core.sequence import Sequence
from siril_tpu.ops.interp import INTERP_LANCZOS4, warp_homography
from siril_tpu.registration.matching import (
    HOMOGRAPHY_TRANSFORMATION,
    SHIFT_TRANSFORMATION,
    match_stars,
)
from siril_tpu.registration.psf import PSFStar
from siril_tpu.registration.starfinder import StarFinderParams, detect_stars
from siril_tpu.utils.log import log_error, log_message

# framing policies (registration.h:55-60)
FRAMING_CURRENT = 0
FRAMING_MAX = 1
FRAMING_MIN = 2
FRAMING_COG = 3

FRAMING_NAMES = {"current": FRAMING_CURRENT, "max": FRAMING_MAX,
                 "min": FRAMING_MIN, "cog": FRAMING_COG}


@dataclass
class RegArgs:
    reglayer: int = 0
    ttype: int = HOMOGRAPHY_TRANSFORMATION
    two_pass: bool = False
    output: bool = True                 # warp & write r_ sequence
    prefix: str = "r_"
    interpolation: int = INTERP_LANCZOS4
    clamp: bool = True
    framing: int = FRAMING_CURRENT
    min_pairs: int = 10
    max_stars: int = 2000
    starfinder: StarFinderParams = field(default_factory=StarFinderParams)
    follow_star: bool = False
    scale: float = 1.0                  # output upscale (register -scale=)
    extref: str = ""                    # external reference image path
    save_starlists: bool = False        # write per-frame .lst star lists


def _frame_metrics(stars: List[PSFStar]):
    """FWHM_stats: mean fwhm/background over non-saturated stars."""
    good = [s for s in stars if not s.has_saturated] or stars
    if not good:
        return 0.0, 0.0, 0.0
    fx = float(np.mean([s.fwhmx for s in good]))
    fy = float(np.mean([s.fwhmy for s in good]))
    b = float(np.mean([s.B for s in good]))
    rnd = fy / fx if fx > 0 else 0.0
    return fx, rnd, b


def register_sequence(seq: Sequence, args: Optional[RegArgs] = None):
    """`register` command (global star alignment)."""
    from siril_tpu.core.engine import SeqArgs, run_sequence

    args = args or RegArgs()
    layer = min(args.reglayer, max(seq.nb_layers - 1, 0)) \
        if seq.nb_layers > 0 else 0
    ref_idx = seq.get_reference()
    if args.extref:
        # external reference image (register -extref=, command.c)
        from siril_tpu.io.conversion import load_any

        ref_img = load_any(args.extref)
    else:
        ref_img = seq.read_frame(ref_idx)
    if seq.nb_layers < 0:
        seq.nb_layers = ref_img.nchans
    layer = min(args.reglayer, ref_img.nchans - 1)
    ref_stars = detect_stars(ref_img.host()[layer], args.starfinder,
                             max_stars=args.max_stars)
    if len(ref_stars) < args.min_pairs:
        raise RuntimeError(
            f"not enough stars on reference frame ({len(ref_stars)})")
    log_message(f"Reference frame {ref_idx}: {len(ref_stars)} stars")
    nb_ref = len(ref_stars)
    reg = seq.reg(layer)

    if args.two_pass or not args.output:
        # no warped output needed: chunk-batched detection path — the
        # batched star finder does ~4 device calls per chunk instead of
        # 3 per frame (tunnel round-trips dominate per-frame detection)
        return _register_batched(seq, args, layer, ref_idx, ref_stars)

    def image(ctx, idx, img):
        stars = detect_stars(img.host()[layer], args.starfinder,
                             max_stars=args.max_stars)
        fwhm, rnd, bg = _frame_metrics(stars)
        reg.fwhm[idx] = fwhm
        reg.roundness[idx] = rnd
        reg.background_lvl[idx] = bg
        reg.number_of_stars[idx] = len(stars)
        reg.weighted_fwhm[idx] = (2.0 * fwhm * (nb_ref - len(stars)) / nb_ref
                                  + fwhm) if nb_ref else fwhm
        if args.save_starlists:
            from siril_tpu.registration.starfinder import save_star_list_csv

            save_star_list_csv(stars, os.path.join(
                seq.directory, f"{seq.name}{idx + 1:05d}.lst"))
        if idx == ref_idx and not args.extref:
            reg.H[idx] = np.eye(3)
            reg.valid[idx] = True
            if args.output and not args.two_pass and args.scale != 1.0:
                S = np.diag([args.scale, args.scale, 1.0])
                out_shape = (int(seq.ry * args.scale),
                             int(seq.rx * args.scale))
                return img.copy(data=warp_homography(
                    img.host(), S, out_shape, args.interpolation,
                    args.clamp))
            return img if args.output and not args.two_pass else None
        m = match_stars(ref_stars, stars, ttype=args.ttype,
                        min_pairs=min(args.min_pairs, 4))
        if m is None or m.inliers < min(args.min_pairs, 4):
            log_error(f"frame {idx}: matching failed "
                      f"({0 if m is None else m.inliers} pairs)")
            seq.incl[idx] = False
            return None
        reg.H[idx] = m.H
        reg.valid[idx] = True
        if args.two_pass or not args.output:
            return None
        H = m.H
        out_shape = (seq.ry, seq.rx)
        if args.scale != 1.0:
            H = np.diag([args.scale, args.scale, 1.0]) @ H
            out_shape = (int(seq.ry * args.scale),
                         int(seq.rx * args.scale))
        warped = warp_homography(img.host(), H, out_shape,
                                 args.interpolation, args.clamp)
        out = img.copy(data=warped)
        out.log_history("Registration with global star alignment")
        return out

    sargs = SeqArgs(seq=seq, description="Global star registration",
                    prefix=args.prefix, image=image,
                    output=args.output and not args.two_pass)
    res = run_sequence(sargs)
    if args.two_pass:
        _pick_best_reference(seq, layer)
    seq.save()
    if res.new_seq is not None:
        # aligned output: identity transforms, metrics copied
        nreg = res.new_seq.reg(layer)
        sel = [i for i in seq.selected_indices()]
        for k, idx in enumerate(sel[: res.new_seq.number]):
            nreg.fwhm[k] = reg.fwhm[idx]
            nreg.weighted_fwhm[k] = reg.weighted_fwhm[idx]
            nreg.roundness[k] = reg.roundness[idx]
            nreg.background_lvl[k] = reg.background_lvl[idx]
            nreg.number_of_stars[k] = reg.number_of_stars[idx]
            nreg.valid[k] = True
        res.new_seq.reference_image = 0
        res.new_seq.save()
    return res


def _pick_best_reference(seq: Sequence, layer: int) -> None:
    """2-pass best-ref scoring (global.c:1085): among frames with at
    least half the max star count, minimize 2·fwhm·(max−n)/max + fwhm."""
    reg = seq.reg(layer)
    valid = reg.valid & seq.incl
    if not valid.any():
        return
    maxstars = int(reg.number_of_stars[valid].max())
    scores = np.full(seq.number, np.inf)
    for i in np.nonzero(valid)[0]:
        n = reg.number_of_stars[i]
        if maxstars and n >= maxstars / 2:
            scores[i] = 2.0 * reg.fwhm[i] * (maxstars - n) / maxstars + reg.fwhm[i]
    best = int(np.argmin(scores))
    if np.isfinite(scores[best]):
        old_ref = seq.get_reference()
        if best != old_ref:
            # rebase transforms on the new reference:
            # H_i^new = H_ref_new⁻¹ · H_i  (all map frame→old ref)
            Hn = reg.H[best].copy()
            Hn_inv = np.linalg.inv(Hn)
            for i in np.nonzero(reg.valid)[0]:
                reg.H[i] = Hn_inv @ reg.H[i]
        seq.reference_image = best
        log_message(f"2-pass registration: best reference is frame {best}")


# ---------------------------------------------------------------------------
# seqapplyreg (applyreg.c)
# ---------------------------------------------------------------------------


@dataclass
class ApplyRegArgs:
    reglayer: int = 0
    prefix: str = "r_"
    interpolation: int = INTERP_LANCZOS4
    clamp: bool = True
    framing: int = FRAMING_CURRENT
    scale: float = 1.0
    disto_file: str = ""            # master SIP distortion file (-disto=)


def compute_framing(seq: Sequence, layer: int, framing: int,
                    scale: float = 1.0):
    """Output geometry + per-frame H adjustment (applyreg.c framing
    max/min/cog computation:  transform image corners by each H)."""
    reg = seq.reg(layer)
    W, H_ = seq.rx, seq.ry
    corners = np.array([[0, 0], [W, 0], [0, H_], [W, H_]], float)
    sel = [i for i in seq.selected_indices() if reg.valid[i]]
    boxes = []
    for i in sel:
        Hm = reg.H[i]
        ph = np.c_[corners, np.ones(4)]
        q = ph @ Hm.T
        q = q[:, :2] / q[:, 2:3]
        boxes.append((q[:, 0].min(), q[:, 1].min(), q[:, 0].max(), q[:, 1].max()))
    boxes = np.array(boxes) if boxes else np.array([[0, 0, W, H_]])
    if framing == FRAMING_MAX:
        x0, y0 = boxes[:, 0].min(), boxes[:, 1].min()
        x1, y1 = boxes[:, 2].max(), boxes[:, 3].max()
    elif framing == FRAMING_MIN:
        x0, y0 = boxes[:, 0].max(), boxes[:, 1].max()
        x1, y1 = boxes[:, 2].min(), boxes[:, 3].min()
        if x1 <= x0 or y1 <= y0:
            x0, y0, x1, y1 = 0, 0, W, H_
    elif framing == FRAMING_COG:
        cogx = boxes[:, [0, 2]].mean()
        cogy = boxes[:, [1, 3]].mean()
        x0, y0 = cogx - W / 2, cogy - H_ / 2
        x1, y1 = x0 + W, y0 + H_
    else:
        x0, y0, x1, y1 = 0, 0, W, H_
    out_w = max(int(round((x1 - x0) * scale)), 1)
    out_h = max(int(round((y1 - y0) * scale)), 1)
    # translation+scale to the output frame
    T = np.array([[scale, 0, -x0 * scale],
                  [0, scale, -y0 * scale],
                  [0, 0, 1.0]])
    return out_w, out_h, T


def apply_reg_sequence(seq: Sequence, args: Optional[ApplyRegArgs] = None):
    """`seqapplyreg`: warp all selected frames by stored H matrices."""
    from siril_tpu.core.engine import SeqArgs, run_sequence

    args = args or ApplyRegArgs()
    layer = args.reglayer
    if layer not in seq.regparam or not seq.regparam[layer].valid.any():
        raise RuntimeError("sequence has no registration data")
    reg = seq.reg(layer)
    out_w, out_h, T = compute_framing(seq, layer, args.framing, args.scale)
    log_message(f"Applying registration: output {out_w}x{out_h}")

    sip = None
    if args.disto_file:
        # master SIP distortion (register/seqapplyreg -disto=file,
        # registration/distorsion.c): undistortion composed into the
        # warp's sampling coordinates
        from siril_tpu.io.conversion import load_any

        master = load_any(args.disto_file)
        w = master.wcs
        if w is None or w.sip_a is None:
            raise RuntimeError(
                f"-disto master has no SIP solution: {args.disto_file}")
        # undistortion samples at s with s + A(s) = x: use the stored
        # inverse terms (AP/BP) when present, else the first-order
        # inverse −A/−B (distortions are a few px)
        if w.sip_ap is not None and w.sip_bp is not None:
            sip = (w.sip_ap, w.sip_bp,
                   np.array([w.crpix[0] - 1.0, w.crpix[1] - 1.0]), False)
        else:
            # no inverse terms: Newton-invert the forward polynomial
            sip = (w.sip_a, w.sip_b,
                   np.array([w.crpix[0] - 1.0, w.crpix[1] - 1.0]), True)
        log_message(f"Applying SIP distortion (order "
                    f"{w.sip_a.shape[0] - 1}) from master")

    def image(ctx, idx, img):
        if not reg.valid[idx]:
            return None
        Hm = T @ reg.H[idx]
        if sip is not None:
            from siril_tpu.ops.interp import warp_homography_sip

            warped = warp_homography_sip(img.host(), Hm, sip[0], sip[1],
                                         sip[2], (out_h, out_w),
                                         args.interpolation, args.clamp,
                                         invert=sip[3])
        else:
            warped = warp_homography(img.host(), Hm, (out_h, out_w),
                                     args.interpolation, args.clamp)
        out = img.copy(data=warped)
        out.log_history("Applied existing registration")
        return out

    res = run_sequence(SeqArgs(seq=seq, description="Apply registration",
                               prefix=args.prefix, image=image))
    if res.new_seq is not None:
        nreg = res.new_seq.reg(layer)
        sel = [i for i in seq.selected_indices() if reg.valid[i]]
        for k, idx in enumerate(sel[: res.new_seq.number]):
            nreg.fwhm[k] = reg.fwhm[idx]
            nreg.weighted_fwhm[k] = reg.weighted_fwhm[idx]
            nreg.roundness[k] = reg.roundness[idx]
            nreg.number_of_stars[k] = reg.number_of_stars[idx]
            nreg.valid[k] = True
        res.new_seq.save()
    return res


def _register_batched(seq: Sequence, args: RegArgs, layer: int,
                      ref_idx: int, ref_stars) -> "SeqResult":
    """Transform-only registration (2-pass pass 1 / -noout): frames read
    in chunks, stars detected for a whole chunk in a handful of device
    calls (detect_stars_batch), matching on host."""
    import concurrent.futures as cf

    import jax

    from siril_tpu.core.engine import SeqResult
    from siril_tpu.registration.starfinder import detect_stars_batch

    indices = [int(i) for i in seq.selected_indices()]
    reg = seq.reg(layer)
    nb_ref = len(ref_stars)
    chunk_size = 16
    pool = cf.ThreadPoolExecutor(max_workers=2)

    # u16 fast path + ONE fused decode+stats+candidates program per
    # chunk (the pipeline's _chunk_program): the staged path previously
    # converted every frame to f32 on the (single-core) host and
    # uploaded twice the bytes — at 200x24 Mpix that conversion alone
    # dominated the register wall time
    first = seq.read_frame(indices[0])
    L, H, W = first.nchans, first.height, first.width
    from siril_tpu.pipeline import _chunk_program, _raw_reader

    raw_read = _raw_reader(seq, indices, L, H, W)

    res = SeqResult()
    chunks = [indices[i:i + chunk_size]
              for i in range(0, len(indices), chunk_size)]
    starts = list(range(0, len(indices), chunk_size))
    nxt = pool.submit(raw_read, 0, len(chunks[0]))
    for ci, idxs in enumerate(chunks):
        raw = nxt.result()
        if ci + 1 < len(chunks):
            nxt = pool.submit(raw_read, starts[ci + 1],
                              len(chunks[ci + 1]))
        prog = _chunk_program(raw.dtype == np.int16, None, True, H, W,
                              args.starfinder, args.max_stars, layer)
        out = prog(jax.device_put(raw))
        stars_all = detect_stars_batch(
            [out[0][:, layer]], args.starfinder,
            max_stars=args.max_stars, precomputed=tuple(out[1:]))
        if args.save_starlists:
            from siril_tpu.registration.starfinder import save_star_list_csv

            for idx, stars in zip(idxs, stars_all):
                save_star_list_csv(stars, os.path.join(
                    seq.directory, f"{seq.name}{idx + 1:05d}.lst"))
        for idx, stars in zip(idxs, stars_all):
            fwhm, rnd, bg = _frame_metrics(stars)
            reg.fwhm[idx] = fwhm
            reg.roundness[idx] = rnd
            reg.background_lvl[idx] = bg
            reg.number_of_stars[idx] = len(stars)
            reg.weighted_fwhm[idx] = (
                2.0 * fwhm * (nb_ref - len(stars)) / nb_ref + fwhm
                if nb_ref else fwhm)
            if idx == ref_idx and not args.extref:
                reg.H[idx] = np.eye(3)
                reg.valid[idx] = True
                res.processed += 1
                continue
            m = match_stars(ref_stars, stars, ttype=args.ttype,
                            min_pairs=min(args.min_pairs, 4))
            if m is None or m.inliers < min(args.min_pairs, 4):
                log_error(f"frame {idx}: matching failed "
                          f"({0 if m is None else m.inliers} pairs)")
                seq.incl[idx] = False
                continue
            reg.H[idx] = m.H
            reg.valid[idx] = True
            res.processed += 1
    pool.shutdown(wait=False)
    if args.two_pass:
        _pick_best_reference(seq, layer)
    seq.save()
    log_message(f"Registration (transform-only): {res.processed} frames")
    return res
