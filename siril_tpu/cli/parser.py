"""Script/line parsing and command execution — equivalent of
``src/core/command_line_processor.c`` (parse_line:97, execute_command:134,
execute_script:246, processcommand:358).
"""

from __future__ import annotations

import shlex
import time
from typing import List, Optional

from siril_tpu.cli.commands import COMMANDS, get_command
from siril_tpu.cli.context import CommandError, Session
from siril_tpu.utils.log import log_error, log_message


def parse_line(line: str) -> List[str]:
    """Word-split honoring quotes; strips comments (# to EOL)."""
    line = line.strip()
    if not line or line.startswith("#"):
        return []
    try:
        lex = shlex.shlex(line, posix=True)
        lex.whitespace_split = True
        lex.commenters = "#"
        return list(lex)
    except ValueError:
        return line.split()


def execute_command(ctx: Session, words: List[str]) -> int:
    """Dispatch one parsed command.  Returns 0 on success."""
    if not words:
        return 0
    cmd = get_command(words[0])
    if cmd is None:
        log_error(f"Unknown command: '{words[0]}' or not implemented yet")
        return 1
    args = words[1:]
    if len(args) < cmd.min_args:
        log_error(f"Usage: {cmd.usage}")
        return 1
    # precondition checks (REQ_CMD_* semantics)
    from siril_tpu.cli.commands import (
        REQ_FOR_CFA,
        REQ_FOR_MONO,
        REQ_FOR_RGB,
        REQ_SINGLE_IMAGE,
    )

    if cmd.req & REQ_SINGLE_IMAGE and ctx.image is None:
        log_error(f"Command {cmd.name} requires a loaded image")
        return 1
    if cmd.req & REQ_FOR_RGB and (ctx.image is None or ctx.image.nchans != 3):
        log_error(f"Command {cmd.name} requires an RGB image")
        return 1
    if cmd.req & REQ_FOR_MONO and (ctx.image is None or ctx.image.nchans != 1):
        log_error(f"Command {cmd.name} requires a mono image")
        return 1
    try:
        cmd.fn(ctx, args)
        return 0
    except CommandError as e:
        log_error(str(e))
        return 1
    except FileNotFoundError as e:
        log_error(f"{cmd.name}: file not found: {e}")
        return 1
    except Exception as e:
        from siril_tpu.core.processing import ProcessingCancelled

        if isinstance(e, ProcessingCancelled):
            log_error(f"{cmd.name}: cancelled")
            ctx.stop_requested = True
            return 1
        raise


def process_command_line(ctx: Session, line: str) -> int:
    return execute_command(ctx, parse_line(line))


def execute_script(ctx: Session, path: str,
                   stop_on_error: bool = True) -> int:
    """Run a .ssf script (execute_script, command_line_processor.c:246)."""
    t0 = time.perf_counter()
    log_message(f"Executing script: {path}")
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            if ctx.stop_requested:
                break
            words = parse_line(line)
            if not words:
                continue
            rc = execute_command(ctx, words)
            if rc != 0 and stop_on_error:
                log_error(f"Script aborted at line {lineno}: {line.strip()}")
                return rc
    log_message(f"Script execution finished successfully "
                f"({time.perf_counter() - t0:.1f} s)")
    return 0
