"""Logging — siril_log_* equivalent (core/siril_log.c) fanning out to
stdout and the optional pipe/hook consumers."""

from __future__ import annotations

import sys
import threading
from typing import Callable, List, Optional

_hooks: List[Callable[[str, str], None]] = []
_progress_hooks: List[Callable[[float, Optional[str]], None]] = []
_lock = threading.Lock()
verbosity = 1
_MAX_BUFFER = 10000
_buffer: List[str] = []          # ring buffer (GUI console equivalent)


def get_log_buffer() -> List[str]:
    """Recent log lines (sirilpy get_siril_log backing store)."""
    with _lock:
        return list(_buffer)


def add_log_hook(fn) -> None:
    _hooks.append(fn)


def add_progress_hook(fn) -> None:
    _progress_hooks.append(fn)


def _emit(level: str, msg: str) -> None:
    with _lock:
        if verbosity > 0 or level in ("error", "warning"):
            stream = sys.stderr if level == "error" else sys.stdout
            prefix = {"error": "Error: ", "warning": "Warning: "}.get(level, "")
            print(f"{prefix}{msg}", file=stream, flush=True)
        _buffer.append(msg)
        if len(_buffer) > _MAX_BUFFER:
            del _buffer[:_MAX_BUFFER // 2]
        for h in _hooks:
            try:
                h(level, msg)
            except Exception:
                pass


def log_message(msg: str) -> None:
    _emit("info", msg)


def log_warning(msg: str) -> None:
    _emit("warning", msg)


def log_error(msg: str) -> None:
    _emit("error", msg)


def log_debug(msg: str) -> None:
    if verbosity > 1:
        _emit("debug", msg)


def log_progress(frac: float, text: Optional[str] = None) -> None:
    for h in _progress_hooks:
        try:
            h(frac, text)
        except Exception:
            pass
