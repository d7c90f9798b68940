"""bench.py watchdog behavior — the stall-kill logic only runs on
degraded-tunnel days, so it is locked here with a scripted fake child
(subprocess.Popen monkeypatched in the parent): early kill on a stalled
stage, the longer warm-up leash, and stall reset on progress."""

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402


class FakeStdout:
    """Iterable stdout that releases scripted (delay_s, line) pairs in
    real time, then blocks until closed."""

    def __init__(self, script, done_evt):
        self.script = list(script)
        self.done = done_evt
        self.t0 = time.monotonic()

    def __iter__(self):
        for delay, line in self.script:
            while time.monotonic() - self.t0 < delay:
                if self.done.is_set():
                    return
                time.sleep(0.05)
            if line is None:          # scripted child exit
                self.done.set()
                return
            yield line + "\n"
        # EOF only once the process is "killed"
        while not self.done.is_set():
            time.sleep(0.05)


class FakePopen:
    instances = []

    def __init__(self, script):
        import threading

        self._done = threading.Event()
        self.stdout = FakeStdout(script, self._done)
        self.terminated = False
        self.killed = False
        FakePopen.instances.append(self)

    def poll(self):
        return 0 if self._done.is_set() else None

    def terminate(self):
        self.terminated = True
        self._done.set()

    def kill(self):
        self.killed = True
        self._done.set()

    def wait(self, timeout=None):
        return 0


@pytest.fixture
def fake_popen(monkeypatch):
    FakePopen.instances = []

    def factory(script):
        def _popen(*a, **k):
            return FakePopen(script)
        monkeypatch.setattr(bench.subprocess, "Popen", _popen)
        return FakePopen

    # measure_tpu budget bookkeeping uses module-global T0
    monkeypatch.setattr(bench, "T0", time.monotonic())
    monkeypatch.setattr(bench, "BUDGET_S", 10_000.0)
    bench._best.clear()
    return factory


def test_stalled_stage_killed_early(fake_popen):
    """A stage reporting 180s of stall extrapolates past STALL_KILL_S
    within seconds — the child must be killed long before the
    deadline."""
    fake = fake_popen([
        (0.2, "[stall] stage 'fused.fetch_pre' still running after "
              "180s (device compile/exec wait?)"),
    ])
    t0 = time.monotonic()
    ok = bench.measure_tpu("/nonexistent", [4], cap=120)
    took = time.monotonic() - t0
    assert not ok
    assert bench._best.get("_stall_killed") is True
    assert took < 30, f"stall kill took {took:.0f}s"
    assert fake.instances[0].terminated or fake.instances[0].killed


def test_warmup_stage_gets_longer_leash(fake_popen):
    """A warm-up stall of 180s must NOT trigger the kill (leash 280s);
    a result line afterwards clears it and the capture succeeds."""
    fake = fake_popen([
        (0.2, "[stall] stage 'bench.tunnel_warmup' still running after "
              "180s (device compile/exec wait?)"),
        (2.0, "BENCH_WARMUP 200.0"),
        (2.5, "BENCH_RESULT 4 30.0"),
        (3.0, None),                  # child exits cleanly
    ])
    ok = bench.measure_tpu("/nonexistent", [4], cap=60)
    assert ok
    assert bench._best.get("_stall_killed") is False
    assert bench._best.get("value") == pytest.approx(
        4 * bench.S * bench.S / 1e6 / 30.0, abs=0.01)   # JSON rounds to 2dp
    assert bench._best.get("tunnel_warmup_s") == 200.0


def test_warmup_stall_past_leash_killed(fake_popen):
    fake = fake_popen([
        (0.2, "[stall] stage 'bench.tunnel_warmup' still running after "
              "270s (device compile/exec wait?)"),
    ])
    t0 = time.monotonic()
    ok = bench.measure_tpu("/nonexistent", [4], cap=120)
    assert not ok
    assert bench._best.get("_stall_killed") is True
    assert time.monotonic() - t0 < 40


def test_single_beat_then_completion_not_killed(fake_popen, monkeypatch):
    """A stage that beats ONCE and then completes (no further beats)
    must never be killed — after one beat, 'completed just after' and
    'still stuck' are indistinguishable, so the kill requires the last
    beat below the threshold (second-beat confirmation)."""
    monkeypatch.setattr(bench, "BEAT_S", 2.0)
    monkeypatch.setattr(bench, "STALL_KILL_S", 5.0)
    fake = fake_popen([
        (0.2, "[stall] stage 'fused.fetch_pre' still running after "
              "2s (device compile/exec wait?)"),
        # stage completed; pass later succeeds
        (6.0, "BENCH_RESULT 4 30.0"),
        (6.5, None),
    ])
    ok = bench.measure_tpu("/nonexistent", [4], cap=60)
    assert ok
    assert bench._best.get("_stall_killed") is False


def test_recovered_stage_age_not_leaked_to_next_stage(fake_popen,
                                                      monkeypatch):
    """Stage A's old confirmed age must not combine with stage B's
    first beat (per-name keying): B alone at one beat is not a kill."""
    monkeypatch.setattr(bench, "BEAT_S", 2.0)
    monkeypatch.setattr(bench, "STALL_KILL_S", 5.0)
    fake = fake_popen([
        (0.2, "[stall] stage 'A' still running after 4s "
              "(device compile/exec wait?)"),
        # A recovers (next beat for A never comes); B starts beating
        (1.0, "BENCH_RESULT 4 25.0"),      # progress clears everything
        (1.5, "[stall] stage 'B' still running after 2s "
              "(device compile/exec wait?)"),
        (2.5, None),
    ])
    ok = bench.measure_tpu("/nonexistent", [4], cap=60)
    assert ok
    assert bench._best.get("_stall_killed") is False
