"""Processing control: cancellation + stop signaling.

Equivalent of the reference's ``processing_should_continue``
(``core/processing.h:260-264``) and the stop path wired to Ctrl-C /
the pipe 'cancel' command (``core/pipe.c``).  Long operations (the
sequence engine between frames, stacking between blocks, iterative
solvers between outer iterations) poll :func:`processing_should_continue`
and abort cleanly by raising :class:`ProcessingCancelled`.
"""

from __future__ import annotations

import signal
import threading

_stop_event = threading.Event()


class ProcessingCancelled(RuntimeError):
    """Raised by long operations when a stop was requested."""


def request_stop() -> None:
    _stop_event.set()


def clear_stop() -> None:
    _stop_event.clear()


def stop_requested() -> bool:
    return _stop_event.is_set()


def processing_should_continue() -> bool:
    """processing.h:260-264 — poll between frames/blocks/iterations."""
    return not _stop_event.is_set()


def check_cancelled(what: str = "processing") -> None:
    """Raise ProcessingCancelled if a stop was requested."""
    if _stop_event.is_set():
        raise ProcessingCancelled(f"{what} cancelled")


def install_sigint_handler() -> None:
    """First Ctrl-C requests a graceful stop (current operation aborts at
    its next poll); a second Ctrl-C raises KeyboardInterrupt as usual."""
    def handler(signum, frame):
        if _stop_event.is_set():
            raise KeyboardInterrupt
        _stop_event.set()
        import sys

        print("\nStop requested — finishing current step "
              "(Ctrl-C again to force quit)", file=sys.stderr, flush=True)

    try:
        signal.signal(signal.SIGINT, handler)
    except ValueError:
        pass        # not the main thread (e.g. under a test runner)
