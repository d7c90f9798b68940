"""Stacking orchestrator — equivalent of ``src/stacking/stacking.c`` (main_stack:76)
and the blocked mean/median engine of ``median_and_mean.c``.

TPU-native architecture (not the reference's thread-per-block model):
- A *block planner* sizes row blocks from a device-memory budget
  (stack_get_max_number_of_rows equivalent, median_and_mean.c:1234-1259).
- For each (channel, row-block): host threads read the block rows from all
  N frames (the seq_opened_read_region path) into a pinned (N, rows·W)
  buffer while the device processes the previous block (double-buffered
  producer/consumer — the reference's OpenMP block loop becomes an
  I/O-compute pipeline).
- The device runs ONE fused jit per block: normalization coefficients
  applied elementwise, then the vectorized rejection kernel
  (ops/rejection.py), then mean + rejection maps.
- Integer translation registration is applied during block assembly
  (median_and_mean.c:1613-1637 applies shift-only H inline).

Multi-chip: blocks are data-parallel with all N frame values for a pixel
resident on one chip (SURVEY §2.9: pixels sharded, frames streamed) — see
parallel/sharding.py for the meshed variant.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from siril_tpu.core.image import FLOAT_IMG, Keywords, SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.ops import rejection as rj
from siril_tpu.ops.normalization import (
    ADDITIVE,
    ADDITIVE_SCALING,
    MULTIPLICATIVE,
    MULTIPLICATIVE_SCALING,
    NO_NORM,
    NormCoeffs,
    compute_normalization,
)

# weighting types (stacking.h:48-52)
NO_WEIGHT = 0
NBSTARS_WEIGHT = 1
WFWHM_WEIGHT = 2
NOISE_WEIGHT = 3
NBSTACK_WEIGHT = 4


@dataclass
class StackArgs:
    method: str = "rej"                 # sum | min | max | med | mean | rej
    rejection: int = rj.WINSORIZED
    siglow: float = 3.0
    sighigh: float = 3.0
    normalize: int = NO_NORM
    lite_norm: bool = False
    force_norm: bool = False
    equalize_rgb: bool = False
    weighting: int = NO_WEIGHT
    create_rejmaps: bool = False
    merge_rejmaps: bool = False
    output_norm: bool = False
    use_32bit: bool = True
    reglayer: int = 0
    block_mb: int = 2048                # device budget per block (MB)
    feather_dist: int = 0
    overlap_norm: bool = False          # mosaic pairwise-overlap solve
    maximize: bool = False              # expand canvas to max framing


@dataclass
class StackResult:
    image: SirilImage
    rejmap_low: Optional[SirilImage] = None
    rejmap_high: Optional[SirilImage] = None
    total_rejected: Tuple[int, int] = (0, 0)
    elapsed_s: float = 0.0


# ---------------------------------------------------------------------------
# planner
# ---------------------------------------------------------------------------


def plan_blocks(height: int, width: int, n_frames: int,
                budget_mb: int) -> int:
    """Rows per block such that N·rows·W·4B (plus sort scratch ≈3×) fits
    the budget (stack_get_max_number_of_rows equivalent)."""
    bytes_per_row = n_frames * width * 4 * 4      # stack + sorted + scratch
    rows = max(int(budget_mb * 1024 * 1024 / max(bytes_per_row, 1)), 8)
    return min(rows, height)


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------


def _norm_apply(stack, scale, offset, mul, mode: int):
    import jax.numpy as jnp

    if mode == NO_NORM:
        return stack
    if mode in (ADDITIVE, ADDITIVE_SCALING):
        out = stack * scale[:, None] - offset[:, None]
        return jnp.where(stack != 0.0, out, 0.0)
    return stack * scale[:, None] * mul[:, None]


import functools


@functools.lru_cache(maxsize=64)
def make_block_kernel(rtype: int, mode: int, siglow: float, sighigh: float,
                      n_full: int, max_outliers: int, with_weights: bool,
                      want_maps: bool = True):
    """Build the fused normalize+reject+mean jit for one stack config.

    Memoized: a fresh ``jax.jit`` per stack call would re-load the
    executable onto the device every run — through the axon tunnel that
    is a multi-second cost, dwarfing the 80 ms kernel itself.

    When ``want_maps`` is False, per-pixel rejection counts are reduced to
    two scalars ON DEVICE — device→host transfers through the tunnel cost
    ~0.6s each, so shipping full count maps tripled the bench time.

    On TPU, every rejection mode dispatches to the fused Pallas kernel
    (pallas/reject_stack.py): one HBM read of the raw stack,
    decode+normalize+sort+clip+mean in VMEM.  The jnp formulation stays
    as the fallback for non-TPU backends, parity-tested in
    tests/test_pallas_reject.py.
    """
    import jax
    import jax.numpy as jnp

    use_pallas = False
    if not os.environ.get("SIRIL_TPU_NO_PALLAS"):
        from siril_tpu.pallas.reject_stack import pallas_available

        use_pallas = pallas_available(rtype, mode) and (
            jax.default_backend() == "tpu"
            or bool(os.environ.get("SIRIL_TPU_FORCE_PALLAS")))

    if use_pallas:
        from siril_tpu.pallas.reject_stack import pallas_reject_mean

        @jax.jit
        def kernel(stack, scale, offset, mul, weights, critical):
            mean, rl, rh = pallas_reject_mean(
                stack, scale, offset, mul,
                weights if with_weights else None, critical,
                rtype=rtype, mode=mode, siglow=siglow, sighigh=sighigh,
                with_weights=with_weights, n_full=n_full,
                max_outliers=max_outliers)
            if want_maps:
                return mean, rl, rh
            return mean, rl.sum(), rh.sum()

        return kernel

    @jax.jit
    def kernel(stack, scale, offset, mul, weights, critical):
        if stack.dtype == jnp.int16:
            # device-side u16 decode: raw FITS i16 (BZERO 32768) → [0,1].
            # Halves the host→device traffic vs shipping f32.
            stack = (stack.astype(jnp.float32) + 32768.0) * (1.0 / 65535.0)
        normed = _norm_apply(stack, scale, offset, mul, mode)
        mean, rl, rh = rj.rejection_mean(
            normed, rtype, siglow, sighigh,
            weights=weights if with_weights else None,
            critical=critical, n_full=n_full, max_outliers=max_outliers,
            with_weights=with_weights)
        if want_maps:
            return mean, rl, rh
        return mean, rl.sum(), rh.sum()

    return kernel


# ---------------------------------------------------------------------------
# seam feathering (stacking/blending.c)
# ---------------------------------------------------------------------------


def compute_feather_masks(seq: Sequence, indices: np.ndarray,
                          feather_dist: int, reglayer: int):
    """Per-frame distance-ramp blending masks from the coverage edges
    (blending.c: smoothstep ramp r³(6r²−15r+10) over feather_dist px of
    distance to the nearest zero/missing pixel).  Returns a list of
    (H, W) float16 masks in frame-selection order."""
    from scipy.ndimage import distance_transform_edt

    shifts = _frame_shifts(seq, indices, reglayer)
    masks = []
    for k, idx in enumerate(indices):
        img = seq.read_frame(int(idx)).host()
        cov = np.any(img > 0.0, axis=0)
        if shifts is not None:
            cov = _shift_into(cov.astype(np.float32)[None],
                              int(shifts[0][k]), int(shifts[1][k]))[0] > 0.5
        dist = distance_transform_edt(cov)
        r = np.clip(dist / float(feather_dist), 0.0, 1.0)
        ramp = r * r * r * (6.0 * r * r - 15.0 * r + 10.0)
        masks.append(ramp.astype(np.float16))
    return masks


# ---------------------------------------------------------------------------
# weights (median_and_mean.c:1111-1230)
# ---------------------------------------------------------------------------


def compute_weights(seq: Sequence, indices: np.ndarray, args: StackArgs,
                    coeffs: NormCoeffs) -> Optional[np.ndarray]:
    """(L, N) per-frame weights, normalized to mean 1 per layer."""
    n = len(indices)
    L = seq.nb_layers
    w = np.ones((L, n))
    if args.weighting == NO_WEIGHT:
        return None
    if args.weighting == NOISE_WEIGHT:
        for layer in range(L):
            for k, idx in enumerate(indices):
                st = seq.get_frame_stats(layer, int(idx))
                bg = st.bgnoise if st and st.bgnoise else None
                if bg is None:
                    from siril_tpu.ops.statistics import STATS_BASIC, compute_stats_np
                    img = seq.read_frame(int(idx))
                    s = compute_stats_np(img.host()[layer], STATS_BASIC)
                    seq.set_frame_stats(layer, int(idx), s)
                    bg = s.bgnoise
                sc = coeffs.scale[layer, k]
                w[layer, k] = 1.0 / max(sc * sc * bg * bg, 1e-30)
            w[layer] /= w[layer].mean()
    elif args.weighting == WFWHM_WEIGHT:
        reg = seq.reg(args.reglayer)
        wf = reg.weighted_fwhm[indices]
        pos = wf[wf > 0]
        if pos.size == 0:
            return None
        fmin, fmax = pos.min(), wf.max()
        invdenom = 1.0 / (1.0 / (fmin * fmin) - 1.0 / (fmax * fmax))
        invmax2 = 1.0 / (fmax * fmax)
        base = np.where(wf > 0, (1.0 / np.maximum(wf, 1e-9) ** 2 - invmax2) * invdenom, 0.0)
        base /= max(base.mean(), 1e-30)
        w[:] = base[None, :]
    elif args.weighting == NBSTARS_WEIGHT:
        reg = seq.reg(args.reglayer)
        ns = reg.number_of_stars[indices].astype(float)
        smin, smax = ns.min(), ns.max()
        if smax == smin:
            base = np.ones(n)
        else:
            base = ((ns - smin) / (smax - smin)) ** 2
        base /= max(base.mean(), 1e-30)
        w[:] = base[None, :]
    elif args.weighting == NBSTACK_WEIGHT:
        cnt = np.ones(n)
        for k, idx in enumerate(indices):
            img_kw = _frame_keywords(seq, int(idx))
            if img_kw is not None and img_kw.stackcnt:
                cnt[k] = img_kw.stackcnt
        cnt /= cnt.mean()
        w[:] = cnt[None, :]
    return w


def _frame_keywords(seq: Sequence, idx: int) -> Optional[Keywords]:
    try:
        return seq.read_frame_metadata(idx)
    except Exception:
        return None


# ---------------------------------------------------------------------------
# shift-only registration during block assembly
# ---------------------------------------------------------------------------


def _frame_shifts(seq: Sequence, indices: np.ndarray, layer: int):
    """Integer (dx, dy) per frame from translation-only H, or None."""
    if layer not in seq.regparam or not seq.regparam[layer].valid.any():
        return None
    H = seq.regparam[layer].H[indices]
    if np.allclose(H, np.eye(3)[None], atol=1e-12):
        return None
    # only use when all H are pure translations
    A = H[:, :2, :2]
    if not np.allclose(A, np.eye(2)[None], atol=1e-9):
        return None
    dx = np.rint(H[:, 0, 2]).astype(int)
    dy = np.rint(H[:, 1, 2]).astype(int)
    if not (dx.any() or dy.any()):
        return None
    return dx, dy


def _read_block(seq: Sequence, chan: int, frame_idx: int, y0: int, y1: int,
                shift: Optional[Tuple[int, int]], width: int) -> np.ndarray:
    """Read registered rows [y0,y1): reg(x,y) = frame(x−dx, y−dy); outside
    the frame is zero (median_and_mean.c:1626-1633 black fill)."""
    h = y1 - y0
    if shift is None:
        return seq.read_region(chan, frame_idx, y0, y1)
    dx, dy = shift
    out = np.zeros((h, width), np.float32)
    sy0, sy1 = y0 - dy, y1 - dy
    cy0 = max(sy0, 0)
    cy1 = min(sy1, seq.ry)
    if cy1 <= cy0:
        return out
    rows = seq.read_region(chan, frame_idx, cy0, cy1)
    x0 = max(dx, 0)
    x1 = min(width + dx, width)
    if x1 <= x0:
        return out
    out[cy0 - sy0: cy1 - sy0, x0:x1] = rows[:, x0 - dx: x1 - dx]
    return out


# ---------------------------------------------------------------------------
# main entry (main_stack equivalent)
# ---------------------------------------------------------------------------


def stack_sequence(seq: Sequence, args: StackArgs,
                   indices: Optional[np.ndarray] = None) -> StackResult:
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    if indices is None:
        indices = seq.selected_indices()
    indices = np.asarray(indices)
    n = len(indices)
    if n == 0:
        raise ValueError("no frames selected for stacking")
    if seq.nb_layers < 0 or seq.ry == 0:
        img0 = seq.read_frame(int(indices[0]))
        if seq.ry == 0:
            seq.ry, seq.rx = img0.height, img0.width
    L, H, W = seq.nb_layers, seq.ry, seq.rx

    if args.method in ("sum", "min", "max"):
        return _stack_accumulate(seq, args, indices, t0)

    res = _resident_stack(seq, args, indices, t0)
    if res is not None:
        return res

    # normalization (mean/rej only — main_stack:76 order)
    do_norm = args.method in ("rej", "mean") and args.normalize != NO_NORM
    if do_norm and args.overlap_norm:
        from siril_tpu.ops.normalization import compute_overlap_normalization

        coeffs = compute_overlap_normalization(
            seq, indices, args.normalize, lite=args.lite_norm,
            reglayer=args.reglayer)
    else:
        coeffs = compute_normalization(
            seq, indices, args.normalize if do_norm else NO_NORM,
            lite=args.lite_norm, force=args.force_norm,
            equalize_rgb=args.equalize_rgb, reglayer=args.reglayer)

    weights = None
    if args.method in ("rej", "mean") and args.weighting != NO_WEIGHT:
        weights = compute_weights(seq, indices, args, coeffs)

    # seam feathering (stacking/blending.c): per-frame distance-ramp
    # masks from the coverage edges, multiplied into the pixel weights
    feather_masks = None
    if args.method in ("rej", "mean") and args.feather_dist > 0:
        feather_masks = compute_feather_masks(seq, indices,
                                              int(args.feather_dist),
                                              args.reglayer)

    rtype = args.rejection if args.method == "rej" else rj.NO_REJEC
    if args.method == "med":
        rtype = -1                       # median marker

    critical = np.zeros(1, np.float32)
    max_outliers = 0
    if rtype == rj.GESDT:
        max_outliers = int(np.floor(n * args.siglow))
        critical = rj.gesdt_critical_values(n, args.sighigh, max_outliers)

    with_w = weights is not None or feather_masks is not None
    kernel = None
    if rtype != -1:
        kernel = make_block_kernel(
            rtype, args.normalize if do_norm else NO_NORM,
            float(args.siglow), float(args.sighigh), n, max_outliers,
            with_w, want_maps=args.create_rejmaps)

    result = np.zeros((L, H, W), np.float32)
    rmap_lo = np.zeros((L, H, W), np.uint16) if args.create_rejmaps else None
    rmap_hi = (np.zeros((L, H, W), np.uint16)
               if args.create_rejmaps and not args.merge_rejmaps else None)
    tot_rej = [0, 0]

    rows_per_block = plan_blocks(H, W, n, args.block_mb)
    blocks = [(c, y, min(y + rows_per_block, H))
              for c in range(L) for y in range(0, H, rows_per_block)]
    shifts = _frame_shifts(seq, indices, args.reglayer)

    pool = cf.ThreadPoolExecutor(max_workers=8)

    def assemble(block):
        c, y0, y1 = block
        h = y1 - y0
        # pad every block to the planned height so the device kernel
        # compiles for ONE shape (zero rows reject to zero and are sliced
        # off after compute)
        buf = np.zeros((n, rows_per_block * W), np.float32)

        def one(k):
            sh = (shifts[0][k], shifts[1][k]) if shifts is not None else None
            buf[k, : h * W] = _read_block(
                seq, c, int(indices[k]), y0, y1, sh, W).reshape(-1)
        list(pool.map(one, range(n)))
        return buf

    # double-buffered: prefetch next block while device computes current;
    # device→host copies are started async and collected at the end so
    # they overlap with later blocks' compute (tunnel D2H is slow)
    from siril_tpu.core.processing import check_cancelled

    pending = []
    next_fut = pool.submit(assemble, blocks[0])
    for bi, block in enumerate(blocks):
        check_cancelled("stacking")    # processing.h:260 between blocks
        c, y0, y1 = block
        buf = next_fut.result()
        if bi + 1 < len(blocks):
            next_fut = pool.submit(assemble, blocks[bi + 1])
        stack_dev = jnp.asarray(buf)
        if rtype == -1:
            mean = rj.median_stack(stack_dev)
            rl = rh = jnp.zeros((), jnp.int32)
        else:
            if with_w:
                wbuf = (np.broadcast_to(weights[c][:, None], buf.shape)
                        .astype(np.float32).copy()
                        if weights is not None
                        else np.ones(buf.shape, np.float32))
                if feather_masks is not None:
                    h_blk = y1 - y0
                    for k in range(n):
                        fm = feather_masks[k][y0:y1].astype(np.float32)
                        wbuf[k, :h_blk * W] *= fm.reshape(-1)
                w_dev = jnp.asarray(wbuf)
            else:
                w_dev = jnp.zeros((1, 1), jnp.float32)
            mean, rl, rh = kernel(
                stack_dev,
                jnp.asarray(coeffs.scale[c], jnp.float32),
                jnp.asarray(coeffs.offset[c], jnp.float32),
                jnp.asarray(coeffs.mul[c], jnp.float32),
                w_dev, jnp.asarray(critical))
        try:
            mean.copy_to_host_async()
        except AttributeError:
            pass
        pending.append((block, mean, rl, rh))

    for (c, y0, y1), mean, rl, rh in pending:
        npix = (y1 - y0) * W
        result[c, y0:y1] = np.asarray(mean)[:npix].reshape(y1 - y0, W)
        if args.create_rejmaps and rtype != -1:
            rla = np.asarray(rl)[:npix].reshape(y1 - y0, W)
            rha = np.asarray(rh)[:npix].reshape(y1 - y0, W)
            if args.merge_rejmaps:
                rmap_lo[c, y0:y1] = (rla + rha).astype(np.uint16)
            else:
                rmap_lo[c, y0:y1] = rla.astype(np.uint16)
                rmap_hi[c, y0:y1] = rha.astype(np.uint16)
            tot_rej[0] += int(rla.sum())
            tot_rej[1] += int(rha.sum())
        else:
            tot_rej[0] += int(np.asarray(rl))
            tot_rej[1] += int(np.asarray(rh))

    pool.shutdown(wait=False)
    seq.close_readers()

    if args.output_norm:
        result = norm_to_0_1_range(result)
    elif args.use_32bit:
        result = np.clip(result, 0.0, 1.0)

    img = _finalize_metadata(seq, indices, result)
    out = StackResult(image=img, total_rejected=(tot_rej[0], tot_rej[1]),
                      elapsed_s=time.perf_counter() - t0)
    if args.create_rejmaps:
        out.rejmap_low = SirilImage(
            data=rmap_lo.astype(np.float32) / 65535.0)
        if rmap_hi is not None:
            out.rejmap_high = SirilImage(data=rmap_hi.astype(np.float32) / 65535.0)
    return out


def norm_to_0_1_range(a: np.ndarray) -> np.ndarray:
    """(median_and_mean.c:557-580): rescale nonzero values to [0,1]."""
    nz = a[a != 0.0]
    if nz.size == 0:
        return a
    mini, maxi = float(nz.min()), float(nz.max())
    if maxi <= mini:
        return a
    return np.where(a == 0.0, 0.0, (a - mini) / (maxi - mini)).astype(np.float32)


def _stack_accumulate(seq: Sequence, args: StackArgs, indices: np.ndarray,
                      t0: float) -> StackResult:
    """sum / min / max stacks (sum.c, stackminmax.c) with shift-only reg;
    ``maximize`` expands the canvas to the union of shifted footprints
    (compute_max_framing, stacking.h:207)."""
    L, H, W = seq.nb_layers, seq.ry, seq.rx
    shifts = _frame_shifts(seq, indices, args.reglayer)
    ox = oy = 0
    if args.maximize and shifts is not None:
        dxs, dys = shifts
        x0 = min(0, int(dxs.min()))
        y0 = min(0, int(dys.min()))
        x1 = max(W, W + int(dxs.max()))
        y1 = max(H, H + int(dys.max()))
        W, H = x1 - x0, y1 - y0
        ox, oy = -x0, -y0
    if args.method == "sum":
        acc = np.zeros((L, H, W), np.float64)
    elif args.method == "min":
        acc = np.full((L, H, W), np.inf, np.float32)
    else:
        acc = np.full((L, H, W), -np.inf, np.float32)
    for k, idx in enumerate(indices):
        img = seq.read_frame(int(idx)).host()
        if shifts is not None:
            dx, dy = int(shifts[0][k]) + ox, int(shifts[1][k]) + oy
            img = _shift_into(img, dx, dy, H, W)
        elif (H, W) != img.shape[1:]:
            img = _shift_into(img, ox, oy, H, W)
        if args.method == "sum":
            acc += img
        elif args.method == "min":
            acc = np.minimum(acc, img)
        else:
            acc = np.maximum(acc, img)
    if args.method == "sum":
        m = acc.max()
        result = (acc / m if m > 0 else acc).astype(np.float32)
    else:
        result = np.where(np.isfinite(acc), acc, 0.0).astype(np.float32)
    out_img = _finalize_metadata(seq, indices, result)
    return StackResult(image=out_img, elapsed_s=time.perf_counter() - t0)


def _shift_into(img: np.ndarray, dx: int, dy: int,
                out_h: int = None, out_w: int = None) -> np.ndarray:
    c, h, w = img.shape
    oh = out_h if out_h is not None else h
    ow = out_w if out_w is not None else w
    out = np.zeros((c, oh, ow), img.dtype)
    sy0, sy1 = max(dy, 0), min(h + dy, oh)
    sx0, sx1 = max(dx, 0), min(w + dx, ow)
    if sy1 > sy0 and sx1 > sx0:
        out[:, sy0:sy1, sx0:sx1] = img[:, sy0 - dy:sy1 - dy, sx0 - dx:sx1 - dx]
    return out


def _finalize_metadata(seq: Sequence, indices: np.ndarray,
                       result: np.ndarray) -> SirilImage:
    """Metadata/date accumulation (stacking.c compute_date_time_keywords):
    livetime = Σ exposure, stackcnt = N, date_obs = earliest."""
    img = SirilImage(data=result, orig_bitdepth=FLOAT_IMG)
    try:
        img.keywords = seq.read_frame_metadata(int(indices[0])).copy()
    except Exception:
        pass
    live = 0.0
    dates = []
    for idx in indices:
        try:
            kw = seq.read_frame_metadata(int(idx))
            live += kw.exposure or 0.0
            if kw.date_obs:
                dates.append(kw.date_obs)
        except Exception:
            pass
    img.keywords.livetime = live
    img.keywords.stackcnt = len(indices)
    if dates:
        img.keywords.date_obs = min(dates)
    img.log_history(f"Stacking with {len(indices)} images")
    return img


# ---------------------------------------------------------------------------
# HBM-resident stacking (single-upload fast path)
# ---------------------------------------------------------------------------

def _resident_budget_bytes() -> int:
    """Raw u16 bytes the resident path may hold — derived from the
    device's actual HBM and the ``setmem`` ratio (utils/devmem.py), not
    a constant.  Env override SIRIL_TPU_RESIDENT_BUDGET for tests."""
    env = os.environ.get("SIRIL_TPU_RESIDENT_BUDGET")
    if env:
        return int(env)
    from siril_tpu.utils.devmem import device_hbm_bytes, resident_stack_budget

    if device_hbm_bytes() is None:
        # CPU backend: cap at 4 GiB so huge-stack tests still exercise
        # the streaming fallback
        return min(resident_stack_budget(), 4 << 30)
    return resident_stack_budget()


def _resident_stack(seq: Sequence, args: StackArgs,
                    indices: np.ndarray, t0: float):
    """Single-upload stack: raw u16 frames go host→HBM ONCE (half the
    bytes of f32), decode + per-frame estimators + rejection all run on
    device, ONE device→host fetch returns the result.

    Through the axon tunnel (~45 MB/s real bandwidth) the streaming path
    is wire-bound: 50×1Mpix f32 = 200 MB ≈ 4.4 s of transfer alone.  This
    path moves 100 MB once and fetches 4 MB — the kernels themselves cost
    ~80 ms.  Returns None when not applicable (shifted frames, non-u16
    inputs, or stacks larger than the HBM budget) — the row-block
    streaming path handles those.
    """
    import jax
    import jax.numpy as jnp

    from siril_tpu.core.sequence import SEQ_FITSEQ, SEQ_REGULAR

    if seq.seq_type not in (SEQ_REGULAR, SEQ_FITSEQ):
        return None
    if args.method not in ("rej", "mean", "med"):
        return None
    if args.create_rejmaps or args.feather_dist or args.overlap_norm:
        return None
    n = len(indices)
    L, H, W = seq.nb_layers, seq.ry, seq.rx
    if _frame_shifts(seq, indices, args.reglayer) is not None:
        return None
    try:
        readers = [seq.open_reader(int(i)) for i in indices]
    except (ValueError, OSError):
        return None
    is_u16 = all(r.hdu.bitpix == 16 and r.hdu.bzero == 32768.0
                 and r.hdu.bscale == 1.0 for r in readers)
    is_f32 = all(r.hdu.bitpix == -32 and r.hdu.bscale == 1.0
                 and not r.hdu.bzero for r in readers)
    # f32 sources (drizzled/processed sequences) ride the same path:
    # uploads are cheap (~1.7 GB/s) — it is the block-streaming disk
    # passes and per-block fetches that were costing minutes
    if not (is_u16 or is_f32):
        return None
    for r in readers:
        if r.nchans != L or r.height != H or r.width != W:
            return None
    px_bytes = 2 if is_u16 else 4
    if n * L * H * W * px_bytes > _resident_budget_bytes():
        return None

    # host: gather native-endian raw [n, L, H·W] (top-down)
    raw = np.empty((n, L, H * W), np.int16 if is_u16 else np.float32)
    pool = cf.ThreadPoolExecutor(max_workers=8)

    def one(k):
        r = readers[k]
        mm = r._mm
        a = mm[:, ::-1, :] if r.bottom_up else mm
        dt = "<i2" if is_u16 else "<f4"
        raw[k] = np.ascontiguousarray(a).astype(dt).reshape(L, H * W)

    from siril_tpu.utils.trace import stage

    with stage("stack.read_raw"):
        list(pool.map(one, range(n)))
    pool.shutdown(wait=False)
    with stage("stack.upload"):
        dev = jax.device_put(raw)             # the single big upload

    do_norm = args.normalize != NO_NORM
    if do_norm:
        _resident_fill_stats(seq, indices, dev, args.lite_norm,
                             force=args.force_norm)
    coeffs = compute_normalization(
        seq, indices, args.normalize if do_norm else NO_NORM,
        lite=args.lite_norm, force=False,
        equalize_rgb=args.equalize_rgb, reglayer=args.reglayer)
    weights = None
    if args.weighting != NO_WEIGHT:
        weights = compute_weights(seq, indices, args, coeffs)

    rtype = args.rejection if args.method == "rej" else rj.NO_REJEC
    if args.method == "med":
        rtype = -1
    critical = np.zeros(1, np.float32)
    max_outliers = 0
    if rtype == rj.GESDT:
        max_outliers = int(np.floor(n * args.siglow))
        critical = rj.gesdt_critical_values(n, args.sighigh, max_outliers)

    means = []
    rl_tot = jnp.zeros((), jnp.float32)
    rh_tot = jnp.zeros((), jnp.float32)
    for c in range(L):
        x16 = dev[:, c]
        if rtype == -1:
            xf = x16 if x16.dtype == jnp.float32 else \
                (x16.astype(jnp.float32) + 32768.0) * (1.0 / 65535.0)
            mean = rj.median_stack(xf)
            rl = rh = jnp.zeros((), jnp.int32)
        else:
            kernel = make_block_kernel(
                rtype, args.normalize if do_norm else NO_NORM,
                float(args.siglow), float(args.sighigh), n, max_outliers,
                weights is not None, want_maps=False)
            w_dev = (jnp.asarray(np.broadcast_to(
                weights[c][:, None], (n, H * W)).copy())
                if weights is not None else jnp.zeros((1, 1), jnp.float32))
            mean, rl, rh = kernel(
                x16,
                jnp.asarray(coeffs.scale[c], jnp.float32),
                jnp.asarray(coeffs.offset[c], jnp.float32),
                jnp.asarray(coeffs.mul[c], jnp.float32),
                w_dev, jnp.asarray(critical))
        means.append(mean)
        rl_tot = rl_tot + rl.astype(jnp.float32)
        rh_tot = rh_tot + rh.astype(jnp.float32)

    # ONE device→host fetch for everything
    packed = jnp.concatenate(
        [jnp.stack(means).ravel(), rl_tot[None], rh_tot[None]])
    with stage("stack.kernel+fetch"):
        from siril_tpu.utils.fetch import fetch_np

        host = fetch_np(packed)
    result = host[:L * H * W].reshape(L, H, W).astype(np.float32)
    tot_rej = (int(host[-2]), int(host[-1]))
    seq.close_readers()

    if args.output_norm:
        result = norm_to_0_1_range(result)
    elif args.use_32bit:
        result = np.clip(result, 0.0, 1.0)
    img = _finalize_metadata(seq, indices, result)
    return StackResult(image=img, total_rejected=tot_rej,
                       elapsed_s=time.perf_counter() - t0)


@functools.lru_cache(maxsize=4)
def _resident_est_fn(lite: bool):
    import jax
    import jax.numpy as jnp

    from siril_tpu.ops.statistics import norm_estimators_hist_jax

    @jax.jit
    def run(x16):
        xf = x16 if x16.dtype == jnp.float32 else \
            (x16.astype(jnp.float32) + 32768.0) * (1.0 / 65535.0)
        est = norm_estimators_hist_jax(xf, lite=lite)
        return jnp.stack([est["median"], est["mad"],
                          est["location"], est["scale"]])

    return run


def _resident_fill_stats(seq: Sequence, indices: np.ndarray, dev,
                         lite: bool, force: bool = False) -> None:
    """Compute missing per-frame estimators from the device-resident
    stack and cache them in the sequence stats store."""
    import jax.numpy as jnp

    from siril_tpu.ops.statistics import ImStats

    L = seq.nb_layers
    need_layers = []
    for layer in range(L):
        for idx in indices:
            st = None if force else seq.get_frame_stats(layer, int(idx))
            ok = st is not None and (
                (lite and st.median and st.mad) or
                (not lite and st.location and st.scale))
            if not ok:
                need_layers.append(layer)
                break
    if not need_layers:
        return
    run = _resident_est_fn(bool(lite))
    outs = [run(dev[:, layer]) for layer in need_layers]
    host = np.asarray(jnp.stack(outs))        # [Lneed, 4, N] one fetch
    for li, layer in enumerate(need_layers):
        med, mad, loc, sca = host[li]
        for k, idx in enumerate(indices):
            st = seq.get_frame_stats(layer, int(idx)) or ImStats()
            st.median = float(med[k])
            st.mad = float(mad[k])
            if not lite:
                st.location = float(loc[k])
                st.scale = float(sca[k])
            st.total = st.total or seq.rx * seq.ry
            st.ngoodpix = st.ngoodpix or st.total
            seq.set_frame_stats(layer, int(idx), st)
    try:
        seq.save()
    except Exception:
        pass
