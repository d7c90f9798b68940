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
def _decode_gather_fn(B: int, H: int, W: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(store, idx, inv_max):
        s = jnp.take(store, idx, axis=0)          # [B, H, W] gather
        return s.astype(jnp.float32) * inv_max

    return run


def ser_device_store(seq, layer: int = 0):
    """(store_u16_dev, inv_max) holding the WHOLE mono u16 SER when it
    fits the budget, else None.  Cached on the sequence and keyed to the
    full video — every MPP stage (quality on all frames, reference
    build on a quality subset, per-AP shifts on all frames) gathers its
    own frame subset from the SAME single upload.  A per-subset cache
    key would re-upload the whole video once per stage."""
    from siril_tpu.core.sequence import SEQ_SER

    if getattr(seq, "seq_type", None) != SEQ_SER:
        return None
    ser = getattr(seq, "_ser", None)
    if ser is None or ser.header.planes != 1 or \
            ser._dtype.itemsize != 2:
        return None
    cached = getattr(seq, "_planetary_store", None)
    if cached is not None:
        return cached
    n_all = int(ser.header.frame_count)
    need = n_all * ser.height * ser.width * 2
    from siril_tpu.utils.devmem import device_hbm_bytes, memory_budget_bytes

    budget = memory_budget_bytes() if device_hbm_bytes() else (6 << 30)
    if need > 0.35 * budget:
        return None
    import jax

    raw = np.ascontiguousarray(
        np.asarray(ser._mm[:, :, :, 0]).astype("<u2"))
    store = jax.device_put(raw)
    inv_max = np.float32(1.0 / ((1 << ser.header.bit_depth) - 1))
    result = (store, inv_max)
    seq._planetary_store = result
    return result


def frame_chunks(seq, indices, layer: int, batch: int):
    """Yield (chunk_indices, frames) like the streamed reader, with
    ``frames`` a DEVICE f32 [B, H, W] when the resident store applies
    (host np array otherwise)."""
    dev = ser_device_store(seq, layer)
    if dev is None:
        for start in range(0, len(indices), batch):
            chunk = indices[start:start + batch]
            yield chunk, np.stack(
                [seq.read_frame(int(i)).host()[layer] for i in chunk])
        return
    store, inv_max = dev
    N = len(indices)
    B = min(batch, N)
    H, W = store.shape[1:]
    fn = _decode_gather_fn(B, int(H), int(W))
    idx_all = np.asarray(indices, np.int32)
    for start in range(0, N, batch):
        chunk = indices[start:start + batch]
        nb = len(chunk)
        idx = idx_all[start:start + nb]
        if nb < B:                      # pad to the compiled B, slice off
            idx = np.concatenate([np.full(B - nb, idx[0], np.int32), idx])
        frames = fn(store, idx, inv_max)
        if nb < B:
            frames = frames[B - nb:]
        yield chunk, frames
