"""Planetary frame quality — equivalent of ``src/algos/quality.c``
(QualityEstimate:39: 3×3 smooth → |∇|² on subsampled data, averaged over
subsample factors) and the barycentre finder (:313) for full-disk framing.

TPU-native: quality of ALL frames of a SER video is one batched device
pass — (N, H, W) → (N,) scores.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np

QSUBSAMPLE_MIN = 2
QSUBSAMPLE_MAX = 3


def quality_core(frames):
    """Pure (un-jitted) quality estimator, (N, H, W) → (N,) — composable
    into fused programs (the MPP shift stage scores AP patches inside
    its one-per-chunk program)."""
    import jax.numpy as jnp

    def one_scale(x, sub):
        xs = x[:, ::sub, ::sub]
        # 3×3 box smooth (the reference's _smooth_image_16)
        p = jnp.pad(xs, ((0, 0), (1, 1), (1, 1)), mode="edge")
        sm = sum(p[:, 1 + dy:p.shape[1] - 1 + dy,
                   1 + dx:p.shape[2] - 1 + dx]
                 for dy in (-1, 0, 1) for dx in (-1, 0, 1)) / 9.0
        gx = sm[:, :, 1:] - sm[:, :, :-1]
        gy = sm[:, 1:, :] - sm[:, :-1, :]
        g2 = (gx[:, :-1, :] ** 2).sum(axis=(1, 2)) + \
            (gy[:, :, :-1] ** 2).sum(axis=(1, 2))
        n = xs.shape[1] * xs.shape[2]
        return g2 / n

    q = sum(one_scale(frames, s)
            for s in range(QSUBSAMPLE_MIN, QSUBSAMPLE_MAX + 1))
    return q / (QSUBSAMPLE_MAX - QSUBSAMPLE_MIN + 1)


@lru_cache(maxsize=4)
def _quality_fn(h: int, w: int):
    import jax

    return jax.jit(quality_core)


def quality_batch_device(frames):
    """(N, H, W) → (N,) scores as a DEVICE array — no fetch.  Chunked
    sweeps collect these and fetch once (utils/devfetch.py); a per-chunk
    fetch costs a full tunnel round trip (~1–2 s) each."""
    import jax.numpy as jnp

    N, H, W = frames.shape
    return _quality_fn(int(H), int(W))(jnp.asarray(frames, jnp.float32))


def quality_batch(frames: np.ndarray) -> np.ndarray:
    """(N, H, W) float32 → (N,) quality scores (higher = sharper)."""
    return np.asarray(quality_batch_device(frames))


def rank_sequence_quality(seq, layer: int = 0, batch: int = 32,
                          progress=None) -> np.ndarray:
    """Quality of every selected frame of a sequence (streamed in
    batches).  Results stored in regdata.quality (the reference writes
    them to the seq file the same way)."""
    from siril_tpu.planetary.source import frame_chunks
    from siril_tpu.utils.devfetch import DeviceCollector

    indices = seq.selected_indices()
    reg = seq.reg(layer)
    done = 0
    col = DeviceCollector()
    for chunk, frames in frame_chunks(seq, indices, layer, batch):
        col.append(quality_batch_device(frames))
        done += len(chunk)
        if progress:
            progress(done / len(indices))
    idx = np.asarray(indices, int)
    reg.quality[idx] = col.concat()[: len(indices)].astype(reg.quality.dtype)
    reg.valid[idx] = True
    # normalize to best=1 (reference convention: relative quality)
    valid = reg.valid & seq.incl
    if valid.any():
        qmax = reg.quality[valid].max()
        if qmax > 0:
            reg.quality[valid] = reg.quality[valid] / qmax
    seq.needs_saving = True
    return reg.quality


def barycentre(layer: np.ndarray, threshold: Optional[float] = None):
    """Full-disk barycentre (quality.c:313) for planetary framing."""
    if threshold is None:
        threshold = float(layer.mean()) * 1.5
    m = np.where(layer > threshold, layer, 0.0)
    tot = m.sum()
    if tot <= 0:
        h, w = layer.shape
        return w / 2.0, h / 2.0
    yy, xx = np.mgrid[0:layer.shape[0], 0:layer.shape[1]]
    return float((m * xx).sum() / tot), float((m * yy).sum() / tot)
