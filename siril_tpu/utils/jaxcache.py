"""Persistent XLA compilation cache.

The rejection kernels contain while_loops and compile slowly on TPU
(~minutes via remote compile); the persistent cache makes every process
after the first start hot.  Equivalent role to the reference's FFTW
wisdom cache (settings.h:310-316).
"""

import os


def enable_compilation_cache(path: str = None) -> str:
    import jax

    path = path or os.environ.get(
        "SIRIL_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/siril_tpu_jax"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return path
