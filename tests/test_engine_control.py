"""Engine robustness: cancellation (processing_should_continue,
processing.h:260-264) and per-frame error policy (stop_on_error vs
skip-and-unselect, processing.h:100-102), plus HBM-aware memory
budgeting (setmem semantics, OS_utils.c:671 / median_and_mean.c:1234)."""

import numpy as np
import pytest

from siril_tpu.core import processing as proc
from siril_tpu.core.engine import SeqArgs, run_sequence
from siril_tpu.core.image import SirilImage
from siril_tpu.core.sequence import Sequence
from siril_tpu.io.fits_io import write_fits


@pytest.fixture(autouse=True)
def _clean_stop():
    proc.clear_stop()
    yield
    proc.clear_stop()


def make_seq(tmp_path, rng, n=8):
    files = []
    for i in range(n):
        img = SirilImage(
            data=(0.2 + 0.1 * rng.random((16, 16))).astype(np.float32)[None])
        p = tmp_path / f"f_{i:05d}.fit"
        write_fits(img, p, bitdepth=-32)
        files.append(str(p))
    return Sequence.from_files(files, name="f_")


def test_cancel_mid_sequence(tmp_path, rng):
    seq = make_seq(tmp_path, rng)
    seen = []

    def hook(ctx, idx, img):
        seen.append(idx)
        if len(seen) == 3:
            proc.request_stop()
        return img

    with pytest.raises(proc.ProcessingCancelled):
        run_sequence(SeqArgs(seq=seq, image=hook, prefix="pp_"))
    # stopped promptly: at most one frame after the request
    assert len(seen) <= 4


def test_corrupt_frame_skip_and_unselect(tmp_path, rng):
    seq = make_seq(tmp_path, rng)
    # corrupt frame 3 on disk
    with open(seq._file_list[3], "wb") as f:
        f.write(b"NOT A FITS FILE")

    res = run_sequence(SeqArgs(seq=seq, image=lambda c, i, im: im,
                               prefix="pp_", stop_on_error=False))
    assert 3 in res.failed
    assert res.processed == 7
    assert not seq.incl[3]                 # skip-and-unselect
    assert res.new_seq is not None and res.new_seq.number == 7


def test_corrupt_frame_stop_on_error(tmp_path, rng):
    seq = make_seq(tmp_path, rng)
    with open(seq._file_list[2], "wb") as f:
        f.write(b"NOT A FITS FILE")
    with pytest.raises(Exception):
        run_sequence(SeqArgs(seq=seq, image=lambda c, i, im: im,
                             prefix="pp_", stop_on_error=True))


def test_failing_hook_skips(tmp_path, rng):
    seq = make_seq(tmp_path, rng)

    def hook(ctx, idx, img):
        if idx == 5:
            raise ValueError("synthetic failure")
        return img

    res = run_sequence(SeqArgs(seq=seq, image=hook, prefix="pp_"))
    assert res.failed == [5]
    assert not seq.incl[5]


def test_stack_cancel_between_blocks(tmp_path, rng, monkeypatch):
    """Streaming stack aborts at its block-boundary poll."""
    from siril_tpu.ops import rejection as rj
    from siril_tpu.ops import stacking as stk

    seq = make_seq(tmp_path, rng, n=6)
    proc.request_stop()
    monkeypatch.setenv("SIRIL_TPU_RESIDENT_BUDGET", "1")   # force streaming
    with pytest.raises(proc.ProcessingCancelled):
        stk.stack_sequence(seq, stk.StackArgs(method="rej",
                                              rejection=rj.SIGMA))


def test_memory_budget_setmem_semantics():
    from siril_tpu.core.settings import Preferences
    from siril_tpu.utils.devmem import memory_budget_bytes

    p = Preferences()
    p.mem_mode = 1
    p.memory_amount = 2.0
    assert memory_budget_bytes(p) == 2 << 30
    p.mem_mode = 0
    p.memory_ratio = 0.5
    b = memory_budget_bytes(p)
    assert b > 100 << 20            # half of something real


def test_resident_budget_env_override(monkeypatch):
    from siril_tpu.ops.stacking import _resident_budget_bytes

    monkeypatch.setenv("SIRIL_TPU_RESIDENT_BUDGET", "12345")
    assert _resident_budget_bytes() == 12345


def test_sigint_handler_two_stage():
    import signal

    proc.install_sigint_handler()
    handler = signal.getsignal(signal.SIGINT)
    if not callable(handler):
        pytest.skip("handler not installed (non-main thread)")
    handler(signal.SIGINT, None)
    assert proc.stop_requested()
    with pytest.raises(KeyboardInterrupt):
        handler(signal.SIGINT, None)
    signal.signal(signal.SIGINT, signal.default_int_handler)
