"""Device/host memory budgeting — the reference's memory-capacity
scheduling (``core/OS_utils.c:671`` get_available_memory +
``core/processing.c:487`` seq_compute_mem_limits +
``stacking/median_and_mean.c:1234`` stack_get_max_number_of_rows),
re-based on the accelerator's actual HBM.

``setmem`` semantics (settings.h:402-404): mem_mode 0 = use a RATIO of
the available memory, mode 1 = use a fixed AMOUNT in GB.
"""

from __future__ import annotations

import os
from typing import Optional


def device_hbm_bytes() -> Optional[int]:
    """Total usable accelerator memory, or None when unknown (CPU)."""
    try:
        import jax

        d = jax.devices()[0]
        if d.platform == "cpu":
            return None
        st = d.memory_stats() or {}
        limit = st.get("bytes_limit") or st.get("bytes_reservable_limit")
        if limit:
            return int(limit)
        # PJRT backends that don't expose memory_stats (the axon remote
        # platform): fall back to the known HBM of the device kind
        kind = getattr(d, "device_kind", "") or ""
        known = {"TPU v5 lite": 16, "TPU v5e": 16, "TPU v4": 32,
                 "TPU v5p": 95, "TPU v6 lite": 32, "TPU v3": 16,
                 "TPU v2": 8}
        for name, gb in known.items():
            if name.lower() in kind.lower():
                return gb << 30
    except Exception:
        pass
    return None


def device_hbm_free() -> Optional[int]:
    try:
        import jax

        d = jax.devices()[0]
        if d.platform == "cpu":
            return None
        st = d.memory_stats() or {}
        limit = st.get("bytes_limit") or st.get("bytes_reservable_limit")
        used = st.get("bytes_in_use", 0)
        if limit:
            return int(limit) - int(used)
    except Exception:
        pass
    return None


def host_available_bytes() -> int:
    """get_available_memory (OS_utils.c:671): MemAvailable or total/2."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    try:
        return (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")) // 2
    except (ValueError, OSError):
        return 4 << 30


def memory_budget_bytes(prefs=None) -> int:
    """The compute-memory budget honoring ``setmem``: accelerator HBM
    when present, host RAM otherwise, scaled by the user ratio/amount."""
    if prefs is None:
        from siril_tpu.core.settings import get_settings

        prefs = get_settings()
    total = device_hbm_bytes()
    if total is None:
        total = host_available_bytes()
    if getattr(prefs, "mem_mode", 0) == 1:
        return int(getattr(prefs, "memory_amount", 4.0) * (1 << 30))
    ratio = float(getattr(prefs, "memory_ratio", 0.9))
    return int(total * max(min(ratio, 1.0), 0.05))


def resident_stack_budget(prefs=None) -> int:
    """Raw-u16 bytes the HBM-resident stack path may keep on device.
    The working set peaks at roughly 3× the raw size (f32 decode of one
    layer + sort/scratch), so cap raw at budget/3
    (median_and_mean.c:1234's role for the block planner)."""
    return memory_budget_bytes(prefs) // 3
