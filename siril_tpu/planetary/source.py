"""Planetary frame source — device-resident SER store.

Every MPP stage (quality rank, global align, reference build, AP
shifts, AP stack) sweeps the whole video.  The streamed path converts
each u16 frame to f32 on the (single-core) host and uploads it again
per sweep; for a 5000×512² SER that is 4+ sweeps × 2.6 GB of wire
traffic and host conversion.  A mono u16 SER that fits the HBM budget
is instead uploaded ONCE as raw u16 and decoded per chunk on device —
chunks become dynamic_slice + scale programs with nothing crossing the
wire.

Reference behavior analog: the reference mmaps the SER and re-reads
per pass (ser.c); holding the video resident is the TPU-native
equivalent of its page-cache reliance.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=8)
def _decode_slice_fn(B: int, H: int, W: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(store, start, inv_max):
        s = lax.dynamic_slice(store, (start, 0, 0), (B, H, W))
        return s.astype(jnp.float32) * inv_max

    return run


def ser_device_store(seq, indices, layer: int = 0):
    """(store_u16_dev, inv_max) for a mono u16 SER that fits the
    budget, else None.  Cached on the sequence — consecutive stages
    reuse the same upload."""
    from siril_tpu.core.sequence import SEQ_SER

    if getattr(seq, "seq_type", None) != SEQ_SER:
        return None
    ser = getattr(seq, "_ser", None)
    if ser is None or ser.header.planes != 1 or \
            ser._dtype.itemsize != 2:
        return None
    idx = tuple(int(i) for i in indices)
    cached = getattr(seq, "_planetary_store", None)
    if cached is not None and cached[0] == idx:
        return cached[1]
    need = len(idx) * ser.height * ser.width * 2
    from siril_tpu.utils.devmem import device_hbm_bytes, memory_budget_bytes

    budget = memory_budget_bytes() if device_hbm_bytes() else (6 << 30)
    if need > 0.35 * budget:
        return None
    import jax

    raw = np.ascontiguousarray(
        np.asarray(ser._mm[np.asarray(idx), :, :, 0]).astype("<u2"))
    store = jax.device_put(raw)
    inv_max = np.float32(1.0 / ((1 << ser.header.bit_depth) - 1))
    result = (store, inv_max)
    seq._planetary_store = (idx, result)
    return result


def frame_chunks(seq, indices, layer: int, batch: int):
    """Yield (chunk_indices, frames) like the streamed reader, with
    ``frames`` a DEVICE f32 [B, H, W] when the resident store applies
    (host np array otherwise)."""
    dev = ser_device_store(seq, indices, layer)
    if dev is None:
        for start in range(0, len(indices), batch):
            chunk = indices[start:start + batch]
            yield chunk, np.stack(
                [seq.read_frame(int(i)).host()[layer] for i in chunk])
        return
    store, inv_max = dev
    N = len(indices)
    H, W = store.shape[1:]
    B = min(batch, N)
    fn = _decode_slice_fn(B, int(H), int(W))
    for start in range(0, N, batch):
        chunk = indices[start:start + batch]
        nb = len(chunk)
        s = start if nb == B else max(N - B, 0)
        frames = fn(store, np.int32(s), inv_max)
        if nb < B:
            frames = frames[B - nb:]
        yield chunk, frames
