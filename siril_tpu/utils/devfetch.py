"""Device-result collection for chunked sweeps.

Every per-chunk synchronous ``np.asarray(device_result)`` costs a full
device→host round trip (~1–2 s of latency through the axon tunnel,
regardless of size), so a 5000-frame sweep in 64-frame chunks pays
minutes of pure latency if each chunk fetches its (tiny) result.
``DeviceCollector`` keeps the per-chunk results on device and fetches
them ONCE, concatenated, at the end of the sweep.

Unbounded async dispatch is not free either: each queued chunk program
pins its input buffers (e.g. the decoded (B, H, W) f32 frames) in HBM
until it executes, so the collector applies backpressure by fetching
one (small) result every ``sync_every`` appends — the device executes
programs in order, so waiting on chunk k frees every buffer before it.
(``block_until_ready`` is a no-op under the axon backend; a real fetch
is the only reliable sync.)
"""

from __future__ import annotations

import numpy as np


class DeviceCollector:
    """Collect per-chunk device arrays; ``concat()`` fetches once."""

    def __init__(self, sync_every: int = 8):
        self.parts = []
        self.sync_every = max(int(sync_every), 1)

    def append(self, dev) -> None:
        self.parts.append(dev)
        if len(self.parts) % self.sync_every == 0:
            np.asarray(dev)        # backpressure: drain the queue to here

    def concat(self, axis: int = 0) -> np.ndarray:
        if not self.parts:
            return np.zeros((0,), np.float32)
        if len(self.parts) == 1:
            return np.asarray(self.parts[0])
        import jax.numpy as jnp

        return np.asarray(jnp.concatenate(self.parts, axis=axis))
