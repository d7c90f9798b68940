"""Translation-only registration methods — equivalent of
``src/registration/shift_methods.c`` (DFT phase correlation:60, fwhm
shift:529), ``kombat/`` template matching, and ``comet.c`` linear-velocity
registration.

DFT method: FFT phase correlation on a (square) selection; the correlation
peak gives the integer shift, refined to sub-pixel with a parabola fit
(the MPP engine refinement, mpp.h:70-77).  Runs as one batched XLA FFT —
many frames correlate against the reference in a single device call.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from siril_tpu.core.sequence import Sequence
from siril_tpu.utils.log import log_message


from functools import lru_cache


@lru_cache(maxsize=8)
def _phasecorr_peak_fn(H: int, W: int):
    """Phase correlation reduced ON DEVICE to the peak position and its
    4-neighborhood values — the full (N, H, W) correlation surfaces
    never cross the (slow) device→host wire; only 7 scalars/frame do."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(r, f):
        R = jnp.fft.rfft2(r)
        F = jnp.fft.rfft2(f)
        cross = R[None] * jnp.conj(F)
        cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
        corr = jnp.fft.irfft2(cross, s=(H, W))
        flat = corr.reshape(corr.shape[0], -1)
        am = jnp.argmax(flat, axis=1)
        py = (am // W).astype(jnp.int32)
        px = (am % W).astype(jnp.int32)
        idx = jnp.arange(corr.shape[0])

        def at(dy, dx):
            return corr[idx, (py + dy) % H, (px + dx) % W]

        # ONE packed (N, 7) output: a chunked sweep fetches one buffer
        # per chunk (or collects them all, utils/devfetch.py) instead of
        # 7 round trips; int peaks are exact in f32 for any real H, W
        return jnp.stack(
            [py.astype(jnp.float32), px.astype(jnp.float32),
             at(0, 0), at(-1, 0), at(1, 0), at(0, -1), at(0, 1)], axis=-1)

    return run


def phase_correlate_device(ref_dev, frames_dev):
    """Packed (N, 7) phase-correlation peaks as a DEVICE array — no
    fetch; decode with ``decode_phasecorr_peaks``."""
    H, W = (int(d) for d in ref_dev.shape[-2:])
    return _phasecorr_peak_fn(H, W)(ref_dev, frames_dev)


def decode_phasecorr_peaks(packed: np.ndarray, H: int, W: int,
                           subpixel: bool = True) -> np.ndarray:
    """(N, 7) packed peaks → (N, 2) of (dx, dy), vectorized."""
    p = np.asarray(packed, np.float64)
    dy, dx = p[:, 0].copy(), p[:, 1].copy()
    if subpixel:
        dy += _parabola(p[:, 3], p[:, 2], p[:, 4])
        dx += _parabola(p[:, 5], p[:, 2], p[:, 6])
    dy = np.where(dy > H / 2, dy - H, dy)
    dx = np.where(dx > W / 2, dx - W, dx)
    return np.stack([dx, dy], axis=-1)


def phase_correlate(ref: np.ndarray, frames: np.ndarray,
                    subpixel: bool = True):
    """Phase correlation of (N, H, W) frames vs (H, W) ref.

    Returns (N, 2) of (dx, dy) = the translation of the frame→ref
    transform (regdata convention: reg(x) = frame(x − dx)).  For frame
    content displaced by +d relative to ref this returns −d.
    """
    import jax.numpy as jnp

    H, W = ref.shape
    packed = phase_correlate_device(jnp.asarray(ref, jnp.float32),
                                    jnp.asarray(frames, jnp.float32))
    return decode_phasecorr_peaks(np.asarray(packed), H, W, subpixel)


def _parabola(cm, c0, cp):
    """Vectorized sub-pixel parabola refinement."""
    denom = cm - 2.0 * c0 + cp
    with np.errstate(divide="ignore", invalid="ignore"):
        off = np.clip(0.5 * (cm - cp) / denom, -1.0, 1.0)
    return np.where(np.abs(denom) < 1e-12, 0.0, off)


@dataclass
class ShiftRegArgs:
    reglayer: int = 0
    selection: Optional[Tuple[int, int, int, int]] = None   # x,y,w,h square
    subpixel: bool = True
    batch: int = 16


def register_shift_dft(seq: Sequence, args: Optional[ShiftRegArgs] = None):
    """DFT phase-correlation registration over a sequence (planetary
    full-disk).  Stores translation-only H in regdata."""
    args = args or ShiftRegArgs()
    layer = args.reglayer
    ref_idx = seq.get_reference()
    ref_img = seq.read_frame(ref_idx).host()
    layer = min(layer, ref_img.shape[0] - 1)
    sel = args.selection
    if sel is None:
        # largest centered power-of-two square (reference requires square
        # selection; we default to a centered crop)
        side = 1 << int(np.floor(np.log2(min(seq.ry, seq.rx))))
        x0 = (seq.rx - side) // 2
        y0 = (seq.ry - side) // 2
        sel = (x0, y0, side, side)
    x0, y0, w, h = sel
    ref_c = ref_img[layer, y0:y0 + h, x0:x0 + w]
    reg = seq.reg(layer)
    indices = seq.selected_indices()
    for start in range(0, len(indices), args.batch):
        chunk = indices[start:start + args.batch]
        frames = np.stack([
            seq.read_frame(int(i)).host()[layer, y0:y0 + h, x0:x0 + w]
            for i in chunk])
        shifts = phase_correlate(ref_c, frames, args.subpixel)
        for k, idx in enumerate(chunk):
            dx, dy = shifts[k]
            Hm = np.eye(3)
            # phase_correlate returns displacement of ref relative to
            # frame: frame(x) ≈ ref(x − d) → reg(x) = frame(x − d)
            Hm[0, 2] = dx
            Hm[1, 2] = dy
            reg.H[int(idx)] = Hm
            reg.valid[int(idx)] = True
    reg.H[ref_idx] = np.eye(3)
    seq.save()
    log_message(f"DFT shift registration done ({len(indices)} frames)")
    return reg


def register_comet(seq: Sequence, pos1: Tuple[float, float], t1: str,
                   pos2: Tuple[float, float], t2: str, reglayer: int = 0):
    """Comet registration (comet.c): linear velocity px/hr between two
    picked positions; per-frame shift from DATE-OBS."""
    import datetime

    def parse(ts):
        return datetime.datetime.fromisoformat(ts.replace("Z", "+00:00"))

    dt_hours = (parse(t2) - parse(t1)).total_seconds() / 3600.0
    if dt_hours == 0:
        raise ValueError("comet registration needs two different times")
    vx = (pos2[0] - pos1[0]) / dt_hours
    vy = (pos2[1] - pos1[1]) / dt_hours
    reg = seq.reg(reglayer)
    t0 = None
    for i in seq.selected_indices():
        kw = seq.read_frame_metadata(int(i))
        if not kw.date_obs:
            continue
        t = parse(kw.date_obs)
        if t0 is None:
            t0 = t
        hours = (t - t0).total_seconds() / 3600.0
        Hm = np.eye(3)
        Hm[0, 2] = -vx * hours
        Hm[1, 2] = -vy * hours
        reg.H[int(i)] = Hm
        reg.valid[int(i)] = True
    seq.save()
    log_message(f"Comet registration: velocity ({vx:.3f}, {vy:.3f}) px/hr")
    return reg


@lru_cache(maxsize=8)
def _template_fn(th: int, tw: int, H: int, W: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(t, f):
        tm = t - t.mean()
        # correlation via FFT (zero-padded)
        F = jnp.fft.rfft2(f, s=(H + th, W + tw))
        T = jnp.fft.rfft2(tm[::-1, ::-1], s=(H + th, W + tw))
        corr = jnp.fft.irfft2(F * T[None], s=(H + th, W + tw))
        return corr[:, th - 1:th - 1 + H - th + 1, tw - 1:tw - 1 + W - tw + 1]

    return run


def template_match(ref_patch: np.ndarray, frames: np.ndarray):
    """KOMBAT-style normalized cross-correlation template match via FFT.
    Returns (N, 2) positions of the best match (x, y) per frame."""
    import jax.numpy as jnp

    th, tw = ref_patch.shape
    N, H, W = frames.shape
    run = _template_fn(th, tw, H, W)
    corr = np.asarray(run(jnp.asarray(ref_patch, jnp.float32),
                          jnp.asarray(frames, jnp.float32)))
    out = np.zeros((N, 2))
    for i in range(N):
        py, px = np.unravel_index(np.argmax(corr[i]), corr[i].shape)
        out[i] = (px, py)
    return out
