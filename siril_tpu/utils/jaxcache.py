"""Persistent XLA compilation cache.

The rejection kernels contain while_loops and compile slowly on TPU
(~minutes via remote compile; the remote compile service itself varies
~100x in speed across days — a trivial reduction measured 29 s on a bad
day).  The persistent cache makes every process after the first start
hot.  Equivalent role to the reference's FFTW wisdom cache
(settings.h:310-316).

Because the cache directory lives under ``~/.cache`` it does NOT survive
a fresh VM, while the git repo does — so a committed seed directory
(``<repo>/cache_seed/``) is copied into the cache on first enable.  Seed
entries are keyed by HLO+compiler-version hash: on a matching image they
hit; on any mismatch they are silently ignored by JAX.  Refresh with
``python scripts/seed_compile_cache.py`` after warming new kernels.
"""

import os
import shutil

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
SEED_DIR = os.path.join(_REPO, "cache_seed")


def seed_from_repo(path: str) -> int:
    """Copy committed seed entries missing from ``path``; returns count."""
    try:
        names = os.listdir(SEED_DIR)
    except OSError:
        return 0
    n = 0
    for name in names:
        if not name.endswith("-cache"):
            continue
        dst = os.path.join(path, name)
        if not os.path.exists(dst):
            # copy via a temp file + os.replace so a process killed
            # mid-copy (the bench watchdog kills arbitrarily) can never
            # leave a truncated entry that the exists-check would then
            # pin forever (JAX's LRUCache.put never overwrites a key)
            # suffix must NOT end in "-cache": a kill mid-copy leaves
            # the temp behind, and anything *-cache is treated as a
            # real entry by seed_compile_cache.py and entry counts
            tmp = os.path.join(path,
                               f".seed_{os.getpid()}_{name}.tmp")
            try:
                shutil.copyfile(os.path.join(SEED_DIR, name), tmp)
                os.replace(tmp, dst)
                n += 1
            except OSError:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
    return n


def enable_compilation_cache(path: str = None) -> str:
    import jax

    path = path or os.environ.get(
        "SIRIL_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/siril_tpu_jax"))
    os.makedirs(path, exist_ok=True)
    seed_from_repo(path)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    return path
