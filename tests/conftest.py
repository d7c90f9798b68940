"""Test configuration: force a virtual 8-device CPU mesh so sharding paths
run in CI without TPUs (SURVEY.md §4 implication #3).

The environment's axon sitecustomize pins JAX_PLATFORMS=axon before we
run, so plain env vars are not enough — override via jax.config before
any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
