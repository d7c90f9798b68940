"""First-class timing/tracing — the TPU build's answer to the
reference's ad-hoc ``START_TIMER/END_TIMER`` macros and per-op elapsed
logging (SURVEY §5: "add first-class timing (xprof-compatible) per
stage").

Two layers:

- ``stage(name)`` context manager: wall-clock per pipeline stage,
  accumulated in a process-wide registry; ``report()`` renders it.
  Each stage also spawns a daemon watcher thread that logs a stall
  heartbeat to stderr if the stage blocks past SIRIL_TPU_STALL_LOG_S
  (set 0 to disable and make stage() thread-free again).
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


@contextmanager
def stage(name: str) -> Iterator[None]:
    """Time one pipeline stage (show_time equivalent, accumulated).

    A stage blocked >90 s (SIRIL_TPU_STALL_LOG_S) logs a heartbeat line
    each interval: device waits hang for minutes-to-forever when the
    remote compile service degrades, and without the heartbeat a stuck
    run is indistinguishable from a dead one in the bench status stream
    (2026-08-20 diagnosis; 0 disables)."""
    t0 = time.perf_counter()
    done = threading.Event()
    watcher = None
    if _STALL_S > 0:
        def _watch():
            k = 0
            while not done.wait(_STALL_S):
                k += 1
                # stderr: stdout may carry a line-oriented protocol
                # (the bench child), and injecting from a background
                # thread would corrupt it for strict consumers
                print(f"[stall] stage '{name}' still running after "
                      f"{k * _STALL_S:.0f}s (device compile/exec wait?)",
                      file=sys.stderr, flush=True)
        watcher = threading.Thread(target=_watch, daemon=True)
        watcher.start()
    try:
        yield
    finally:
        done.set()
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
