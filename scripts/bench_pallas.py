"""Device-only microbench: Pallas fused rejection kernel vs jnp path.

Run on the real TPU:  python scripts/bench_pallas.py [N] [P]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from siril_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from siril_tpu.ops import rejection as rj
from siril_tpu.ops.normalization import ADDITIVE_SCALING
from siril_tpu.ops.stacking import _norm_apply
from siril_tpu.pallas.reject_stack import pallas_reject_mean

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
P = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * 1024 * 1024
RTYPE = rj.WINSORIZED

print("backend:", jax.default_backend(), "N,P =", N, P, flush=True)
rng = np.random.default_rng(0)
base = 0.2 + 0.5 * rng.random(P).astype(np.float32)
stack = base[None] + rng.normal(0, 0.02, (N, P)).astype(np.float32)
stack[rng.random((N, P)) < 0.002] = 0.9
raw = (np.round(np.clip(stack, 0, 1) * 65535) - 32768).astype(np.int16)
scale = (1 + 0.03 * rng.standard_normal(N)).astype(np.float32)
offset = (0.01 * rng.standard_normal(N)).astype(np.float32)
mul = np.ones(N, np.float32)

d_raw = jax.device_put(raw)
d_s, d_o, d_m = map(jax.device_put, (scale, offset, mul))


@jax.jit
def jnp_path(x16, s, o, m):
    xf = (x16.astype(jnp.float32) + 32768.0) / 65535.0
    normed = _norm_apply(xf, s, o, m, ADDITIVE_SCALING)
    return rj.rejection_mean(normed, RTYPE, 3.0, 3.0, n_full=N)


def timeit(fn, label, reps=5):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    print(f"{label}: compile+first {time.perf_counter()-t0:.2f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    gelems = N * P / 1e9
    print(f"{label}: best {best*1e3:.1f} ms  |  {gelems/best:.1f} G elem/s"
          f"  |  {N*P*2/best/1e9:.0f} GB/s u16-input", flush=True)
    return out, best


o1, t1 = timeit(lambda: jnp_path(d_raw, d_s, d_o, d_m), "jnp   ")
o2, t2 = timeit(lambda: pallas_reject_mean(
    d_raw, d_s, d_o, d_m, rtype=RTYPE, mode=ADDITIVE_SCALING,
    siglow=3.0, sighigh=3.0), "pallas")
m1 = np.asarray(o1[0])
m2 = np.asarray(o2[0])
print("max |diff|:", np.abs(m1 - m2).max())
print(f"speedup: {t1/t2:.2f}x")
