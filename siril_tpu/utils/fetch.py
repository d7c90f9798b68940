"""Chunked device→host transfer.

The axon tunnel's device→host path degrades nonlinearly with transfer
size (measured 2026-08-17: one 256 MB fetch ≈ 1 MB/s; the same bytes in
32 MB slices ≈ 32 MB/s).  Every sizeable result fetch should go through
``fetch_np`` — it slices the flattened array into ~32 MB pieces and
reassembles on the host.
"""

from __future__ import annotations

import numpy as np

_SLICE_BYTES = 32 << 20


def fetch_np(x, slice_bytes: int = _SLICE_BYTES) -> np.ndarray:
    """Device array → numpy via bounded-size slices, written straight
    into one preallocated buffer (a parts list + concatenate would
    double peak host memory on exactly the large transfers this
    function exists for)."""
    nbytes = x.size * x.dtype.itemsize
    if nbytes <= slice_bytes:
        return np.asarray(x)
    flat = x.reshape(-1)
    per = max(1, slice_bytes // max(x.dtype.itemsize, 1))
    out = np.empty(flat.shape[0], x.dtype)
    for i in range(0, flat.shape[0], per):
        out[i:i + per] = np.asarray(flat[i:i + per])
    return out.reshape(x.shape)
