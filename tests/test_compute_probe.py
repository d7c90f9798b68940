"""Device-resident compute probe (tools/compute_probe.py) — traced on
the CPU backend at tiny shapes so the bench's tunnel-independent metric
can never bit-rot silently."""

import numpy as np
import pytest

from siril_tpu.tools.compute_probe import device_compute_probe


@pytest.mark.parametrize("stage", ["full", "nodetect", "stack"])
def test_probe_stages_run_and_measure(stage):
    r = device_compute_probe(n=3, size=128, iters=2, stage=stage)
    assert r["stage"] == stage
    assert r["compute_mpix_s"] > 0
    assert np.isfinite(r["checksum"])
    # loop time is a real measurement, not the compile pass
    assert r["t_loop_s"] < 60


def test_probe_is_deterministic_per_seed():
    r1 = device_compute_probe(n=3, size=128, iters=2, stage="stack")
    r2 = device_compute_probe(n=3, size=128, iters=2, stage="stack")
    assert r1["checksum"] == r2["checksum"]
