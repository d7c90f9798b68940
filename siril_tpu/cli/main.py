"""siril-cli equivalent entry point (``src/main-cli.c:359``).

Usage:
    python -m siril_tpu.cli [-d dir] [-s script.ssf] [-i] [-p] [command …]

  -d dir       set working directory
  -s script    run a .ssf script and exit
  -i           interactive prompt (read commands from stdin)
  -p           pipe mode: read commands from stdin, emit status lines
               (the named-pipe protocol of core/pipe.c over stdio)
"""

from __future__ import annotations

import argparse
import os
import sys

from siril_tpu.cli.context import Session
from siril_tpu.cli.parser import execute_script, process_command_line
from siril_tpu.utils.log import add_log_hook, add_progress_hook, log_message


def build_session(workdir: str = ".") -> Session:
    from siril_tpu.core.settings import Preferences
    from siril_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    ctx = Session(cwd=os.path.abspath(workdir))
    ctx.prefs = Preferences.load_ini()
    ctx.ext = ctx.prefs.ext if ctx.prefs.ext.startswith(".") else \
        "." + ctx.prefs.ext
    ctx.force_16bit = ctx.prefs.force_16bit
    return ctx


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="siril_tpu",
                                 description="TPU-native Siril-compatible CLI")
    ap.add_argument("-d", "--directory", default=".")
    ap.add_argument("-s", "--script")
    ap.add_argument("-i", "--interactive", action="store_true")
    ap.add_argument("-p", "--pipe", action="store_true")
    ap.add_argument("-v", "--version", action="store_true")
    ap.add_argument("command", nargs="*", help="single command to run")
    args = ap.parse_args(argv)

    # xprof device tracing: SIRIL_TPU_TRACE=<dir> captures a profiler
    # trace of the whole run (utils/trace.py, SURVEY §5)
    from siril_tpu.utils.trace import maybe_trace_env

    maybe_trace_env()

    if args.version:
        from siril_tpu.cli.commands import VERSION

        print(f"siril_tpu {VERSION}")
        return 0

    ctx = build_session(args.directory)

    # Ctrl-C requests a graceful stop; running ops abort at their next
    # processing_should_continue poll (processing.h:260-264)
    from siril_tpu.core.processing import (
        clear_stop, install_sigint_handler, request_stop)

    install_sigint_handler()

    if args.pipe:
        # pipe protocol (core/pipe.h): status lines on stdout
        add_log_hook(lambda lvl, msg: print(f"log: {msg}", flush=True))
        add_progress_hook(lambda f, t: print(f"progress: {f:.2f}", flush=True))
        print("ready:", flush=True)
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            if line in ("exit", "quit"):
                break
            if line == "cancel":
                # pipe.c cancel message: stop the running operation
                request_stop()
                print("status: success cancel", flush=True)
                continue
            clear_stop()
            rc = process_command_line(ctx, line)
            print(f"status: {'success' if rc == 0 else 'error'} {line.split()[0]}",
                  flush=True)
            if ctx.stop_requested:
                break
        return 0

    if args.script:
        return execute_script(ctx, args.script)

    if args.command:
        return process_command_line(ctx, " ".join(args.command))

    if args.interactive or sys.stdin.isatty():
        log_message("siril_tpu interactive console — type commands, "
                    "'exit' to quit")
        try:
            while not ctx.stop_requested:
                try:
                    line = input("> ")
                except EOFError:
                    break
                process_command_line(ctx, line)
        except KeyboardInterrupt:
            pass
        return 0

    # commands piped on stdin
    for line in sys.stdin:
        if ctx.stop_requested:
            break
        process_command_line(ctx, line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
