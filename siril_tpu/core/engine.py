"""Generic sequence execution engine.

TPU-native re-design of the reference's hook-based worker
(``core/processing.c:78`` generic_sequence_worker + ``io/seqwriter.c``):

- the reference runs an OpenMP loop over frames, each thread read→hook→write;
- here, frames stream through a 3-stage pipeline: a thread-pool *reader*
  prefetches frames ahead, the *image hook* (usually a jitted device fn)
  processes them (optionally in device batches), and an async *writer*
  thread drains results with bounded in-flight frames (seqwriter
  backpressure, ``core/processing.c:235-238``).

Hooks mirror generic_seq_args (``core/processing.h:49-145``):
  prepare(ctx)                 — load masters, open outputs
  image(ctx, index, img)       — per-frame transform; returns SirilImage
                                  or None to drop the frame
  finalize(ctx)                — write sidecars, cleanup

Error policy: ``stop_on_error`` aborts the run; otherwise failing frames
are excluded from the output sequence AND unselected in the input
sequence (processing.h:100-102 skip-and-unselect semantics).

Cancellation: ``processing_should_continue`` (core/processing.py) is
polled between frames; a requested stop finishes in-flight writes and
raises ProcessingCancelled (processing.h:260-264).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
import traceback
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np

from siril_tpu.core.image import SirilImage
from siril_tpu.core.sequence import SEQ_SER, Sequence
from siril_tpu.utils.log import log_error, log_message, log_progress


@dataclass
class SeqArgs:
    seq: Sequence
    description: str = "Processing"
    prefix: str = ""
    prepare: Optional[Callable] = None
    image: Optional[Callable] = None
    finalize: Optional[Callable] = None
    stop_on_error: bool = False
    prefetch: int = 4                 # frames read ahead
    max_inflight_writes: int = 8      # seqwriter backpressure
    output: bool = True               # materialize an output sequence
    output_bitdepth: Optional[int] = None
    output_ser: bool = False
    user: dict = field(default_factory=dict)


@dataclass
class SeqResult:
    new_seq: Optional[Sequence] = None
    processed: int = 0
    failed: List[int] = field(default_factory=list)
    user: dict = field(default_factory=dict)


class _AsyncWriter:
    """Dedicated writer thread with bounded queue (io/seqwriter.c)."""

    def __init__(self, max_inflight: int):
        self.q: "queue.Queue" = queue.Queue(maxsize=max_inflight)
        self.errors: List[str] = []
        self.failed_tags: List[int] = []     # frame idx per failed write
        self.t = threading.Thread(target=self._run, daemon=True)
        self.t.start()

    def _run(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            fn, a, tag = item
            try:
                fn(*a)
            except Exception as e:        # pragma: no cover
                self.errors.append(f"{type(e).__name__}: {e}")
                if tag is not None:
                    self.failed_tags.append(tag)

    def submit(self, fn, *a, tag=None):
        self.q.put((fn, a, tag))

    def close(self):
        self.q.put(None)
        self.t.join()


def run_sequence(args: SeqArgs) -> SeqResult:
    seq = args.seq
    indices = seq.selected_indices()
    n = len(indices)
    res = SeqResult()
    ctx = args.user

    if args.prepare is not None:
        args.prepare(ctx)

    out_frames: dict = {}
    writer = _AsyncWriter(args.max_inflight_writes)
    out_dir = seq.directory
    out_name = f"{args.prefix}{seq.name}" if args.prefix else f"{seq.name}_out"
    out_paths: dict = {}

    def write_one(pos, idx, img):
        from siril_tpu.io.fits_io import write_fits

        num = int(seq.filenum[idx])
        path = os.path.join(out_dir,
                            f"{out_name}{num:0{seq.fixed_len}d}.fit")
        bd = args.output_bitdepth if args.output_bitdepth is not None \
            else img.orig_bitdepth
        write_fits(img, path, bitdepth=bd)
        out_paths[pos] = path

    pool = cf.ThreadPoolExecutor(max_workers=max(args.prefetch, 1))
    futures: dict = {}

    def read(pos):
        return seq.read_frame(int(indices[pos]))

    for p in range(min(args.prefetch, n)):
        futures[p] = pool.submit(read, p)

    from siril_tpu.core.processing import (
        ProcessingCancelled, processing_should_continue)

    cancelled = False
    for pos in range(n):
        idx = int(indices[pos])
        if not processing_should_continue():
            cancelled = True
            futures.pop(pos, None)
            break
        try:
            img = futures.pop(pos).result()
        except Exception as e:
            if args.stop_on_error:
                pool.shutdown(wait=False)
                writer.close()
                raise
            log_error(f"{args.description}: frame {idx} read failed: {e}")
            res.failed.append(idx)
            img = None
        nxt = pos + args.prefetch
        if nxt < n:
            futures[nxt] = pool.submit(read, nxt)
        if img is None:
            continue
        try:
            out = args.image(ctx, idx, img) if args.image else img
        except Exception as e:
            if args.stop_on_error:
                pool.shutdown(wait=False)
                writer.close()
                raise
            log_error(f"{args.description}: frame {idx} failed: "
                      f"{type(e).__name__}: {e}")
            res.failed.append(idx)
            continue
        if out is None:
            res.failed.append(idx)
            continue
        res.processed += 1
        if args.output:
            writer.submit(write_one, pos, idx, out, tag=idx)
        log_progress((pos + 1) / n)

    pool.shutdown(wait=True)
    writer.close()
    if writer.errors:
        log_error(f"{args.description}: write errors: {writer.errors[:3]}")
        # frames whose write failed are NOT in the output: report them
        # as failed (and unselect below) instead of silently shrinking
        # the output sequence while still counting them processed
        for tag in writer.failed_tags:
            if tag not in res.failed:
                res.failed.append(tag)
                res.processed = max(res.processed - 1, 0)
    if cancelled:
        log_error(f"{args.description}: cancelled after "
                  f"{res.processed}/{n} frames")
        raise ProcessingCancelled(args.description)

    # skip-and-unselect: failing frames drop out of the input selection
    # (processing.h:100-102)
    if res.failed and not args.stop_on_error:
        for idx in res.failed:
            if 0 <= idx < len(seq.incl):
                seq.incl[idx] = False

    if args.output and out_paths:
        ordered = [out_paths[p] for p in sorted(out_paths)]
        new_seq = Sequence.from_files(ordered, name=out_name,
                                      directory=out_dir)
        res.new_seq = new_seq
    if args.finalize is not None:
        args.finalize(ctx)
    res.user = ctx
    return res
