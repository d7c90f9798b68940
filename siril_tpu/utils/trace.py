"""First-class timing/tracing — the TPU build's answer to the
reference's ad-hoc ``START_TIMER/END_TIMER`` macros and per-op elapsed
logging (SURVEY §5: "add first-class timing (xprof-compatible) per
stage").

Two layers:

- ``stage(name)`` context manager: wall-clock per pipeline stage,
  accumulated in a process-wide registry; ``report()`` renders it.
  A single shared daemon monitor thread logs a stall heartbeat to
  stderr for any stage blocked past SIRIL_TPU_STALL_LOG_S (set 0 to
  disable); per-stage cost is one dict insert/remove.
- xprof device tracing: set ``SIRIL_TPU_TRACE=/path`` (or call
  ``start_device_trace``) to capture a ``jax.profiler`` trace viewable in
  TensorBoard/Perfetto — covers XLA kernels, transfers, and host gaps.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Iterator, List, Tuple

_lock = threading.Lock()
_acc: Dict[str, List[float]] = defaultdict(list)
_device_trace_dir = None


_STALL_S = float(os.environ.get("SIRIL_TPU_STALL_LOG_S", "90"))


_active: Dict[int, list] = {}       # key -> [name, t0, beats_emitted]
_next_key = 0
_monitor_on = False


def _monitor() -> None:
    """ONE shared daemon thread heartbeats every stale active stage —
    a thread-per-stage() watcher cost ~100 µs per invocation in the
    per-chunk hot loops; registering in a dict costs nanoseconds."""
    while True:
        time.sleep(5.0)
        now = time.perf_counter()
        with _lock:
            items = list(_active.items())
        for key, rec in items:
            name, t0, beats = rec
            k = int((now - t0) // _STALL_S)
            if k > beats:
                rec[2] = k
                # stderr: stdout may carry a line-oriented protocol
                # (the bench child), and injecting from a background
                # thread would corrupt it for strict consumers
                print(f"[stall] stage '{name}' still running after "
                      f"{k * _STALL_S:.0f}s (device compile/exec "
                      "wait?)", file=sys.stderr, flush=True)


def _register(name: str) -> int:
    global _next_key, _monitor_on
    with _lock:
        key = _next_key
        _next_key += 1
        _active[key] = [name, time.perf_counter(), 0]
        if not _monitor_on:
            _monitor_on = True
            threading.Thread(target=_monitor, daemon=True).start()
    return key


@contextmanager
def stage(name: str) -> Iterator[None]:
    """Time one pipeline stage (show_time equivalent, accumulated).

    A stage blocked >90 s (SIRIL_TPU_STALL_LOG_S) logs a heartbeat line
    each interval: device waits hang for minutes-to-forever when the
    remote compile service degrades, and without the heartbeat a stuck
    run is indistinguishable from a dead one in the bench status stream
    (2026-08-20 diagnosis; 0 disables)."""
    t0 = time.perf_counter()
    key = _register(name) if _STALL_S > 0 else None
    try:
        yield
    finally:
        if key is not None:
            with _lock:
                _active.pop(key, None)
        dt = time.perf_counter() - t0
        with _lock:
            _acc[name].append(dt)


def timings() -> Dict[str, Tuple[int, float, float]]:
    """{stage: (calls, total_s, mean_s)}."""
    with _lock:
        return {k: (len(v), sum(v), sum(v) / len(v))
                for k, v in _acc.items() if v}


def report() -> str:
    rows = sorted(timings().items(), key=lambda kv: -kv[1][1])
    if not rows:
        return "no stage timings recorded"
    width = max(len(k) for k, _ in rows)
    lines = [f"{'stage':<{width}}  calls   total s    mean s"]
    for k, (n, tot, mean) in rows:
        lines.append(f"{k:<{width}}  {n:5d}  {tot:8.3f}  {mean:8.4f}")
    return "\n".join(lines)


def reset() -> None:
    with _lock:
        _acc.clear()


def start_device_trace(logdir: str = None) -> bool:
    """Begin an xprof (jax.profiler) device trace."""
    global _device_trace_dir
    logdir = logdir or os.environ.get("SIRIL_TPU_TRACE")
    if not logdir or _device_trace_dir:
        return False
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    _device_trace_dir = logdir
    return True


def stop_device_trace() -> bool:
    global _device_trace_dir
    if not _device_trace_dir:
        return False
    import jax

    jax.profiler.stop_trace()
    _device_trace_dir = None
    return True


def maybe_trace_env() -> None:
    """Start a device trace if SIRIL_TPU_TRACE is set (called by the CLI
    entry so any scripted run can be profiled without code changes)."""
    if os.environ.get("SIRIL_TPU_TRACE"):
        start_device_trace()
