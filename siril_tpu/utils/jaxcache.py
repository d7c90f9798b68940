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
import re
import shutil

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
SEED_DIR = os.path.join(_REPO, "cache_seed")

# LLVM x86 feature names (as embedded in XLA:CPU AOT cache entries) that
# can SIGILL on a host lacking them, mapped to /proc/cpuinfo flag names.
# Tokens NOT in this map (tuning knobs like +prefer-no-gather, plus
# baseline features every x86-64 host has) are ignored — the guard only
# needs the features whose absence crashes, and an unknown token must not
# veto seeding on naming mismatches.
_LLVM_TO_CPUINFO = {
    "avx": "avx", "avx2": "avx2", "fma": "fma", "f16c": "f16c",
    "bmi": "bmi1", "bmi2": "bmi2", "adx": "adx", "aes": "aes",
    "vaes": "vaes", "sha": "sha_ni", "gfni": "gfni",
    "pclmul": "pclmulqdq", "vpclmulqdq": "vpclmulqdq",
    "avxvnni": "avx_vnni", "avxifma": "avx_ifma",
    "avxneconvert": "avx_ne_convert",
    "avx512f": "avx512f", "avx512cd": "avx512cd", "avx512bw": "avx512bw",
    "avx512dq": "avx512dq", "avx512vl": "avx512vl",
    "avx512ifma": "avx512ifma", "avx512vbmi": "avx512vbmi",
    "avx512vbmi2": "avx512_vbmi2", "avx512vnni": "avx512_vnni",
    "avx512bitalg": "avx512_bitalg",
    "avx512vpopcntdq": "avx512_vpopcntdq", "avx512bf16": "avx512_bf16",
    "avx512fp16": "avx512_fp16",
    "avx512vp2intersect": "avx512_vp2intersect",
    "amx-tile": "amx_tile", "amx-int8": "amx_int8",
    "amx-bf16": "amx_bf16", "amx-fp16": "amx_fp16",
}

# an XLA:CPU AOT entry embeds its target machine features as a long
# comma-separated "+feat,-feat,…" list; TPU entries carry no such string
_FEAT_LIST_RE = re.compile(
    rb"[+][a-z0-9.\-]{2,24}(?:,[+-][a-z0-9.\-]{2,24}){3,}")


def _host_cpu_flags():
    """Set of /proc/cpuinfo flags, or None when unreadable (non-Linux —
    be permissive then; the guard exists for Linux driver VMs)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return set(line.split(":", 1)[1].split())
    except OSError:
        pass
    return None


def _entry_required_flags(path: str):
    """cpuinfo flags an entry's embedded machine-feature list requires,
    or None when the entry carries no feature list (TPU program) or
    cannot be inspected (unknown compression — treat as TPU/portable:
    only XLA:CPU AOT entries embed the list this guard looks for)."""
    try:
        with open(path, "rb") as f:
            data = f.read()
        if data[:4] == b"\x28\xb5\x2f\xfd":          # zstd frame
            import zstandard

            data = zstandard.ZstdDecompressor().decompress(
                data, max_output_size=1 << 30)
        m = _FEAT_LIST_RE.search(data)
        if not m:
            return None
        req = set()
        for tok in m.group(0).split(b","):
            if tok.startswith(b"+"):
                flag = _LLVM_TO_CPUINFO.get(tok[1:].decode("ascii",
                                                           "replace"))
                if flag:
                    req.add(flag)
        return req
    except Exception:
        return None


def _sweep_stale_tmps(path: str) -> None:
    """Remove .seed_<pid>_*.tmp files whose writer is no longer alive —
    a SIGKILLed process (the bench watchdog's fallback) leaves its temp
    behind and nothing else ever deletes it."""
    try:
        names = os.listdir(path)
    except OSError:
        return
    for name in names:
        if not (name.startswith(".seed_") and name.endswith(".tmp")):
            continue
        try:
            pid = int(name.split("_")[1])
        except (IndexError, ValueError):
            pid = -1
        if pid == os.getpid():
            continue
        alive = True
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            alive = False
        except (PermissionError, OSError):
            pass                       # exists under another uid: alive
        if not alive or pid < 0:
            try:
                os.unlink(os.path.join(path, name))
            except OSError:
                pass


def seed_from_repo(path: str) -> int:
    """Copy committed seed entries missing from ``path``; returns count.

    CPU AOT entries compiled with machine features this host lacks are
    SKIPPED: XLA's cache key does not include the CPU model, so a seed
    captured on an AVX-512/AMX build VM would load on a plainer driver
    VM and SIGILL mid-execution (the MULTICHIP_r04 XLA warning text is
    the spec for this guard)."""
    _sweep_stale_tmps(path)
    try:
        names = os.listdir(SEED_DIR)
    except OSError:
        return 0
    host_flags = _host_cpu_flags()
    n = 0
    for name in names:
        if not name.endswith("-cache"):
            continue
        dst = os.path.join(path, name)
        if not os.path.exists(dst):
            if host_flags is not None:
                req = _entry_required_flags(os.path.join(SEED_DIR, name))
                if req and not req.issubset(host_flags):
                    continue          # would risk SIGILL on this host
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
