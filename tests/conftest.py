"""Test configuration: force an 8-device CPU mesh before JAX backends init.

Note: the hosted TPU plugin ignores the ``JAX_PLATFORMS`` env var, so the
platform must be pinned via ``jax.config`` before first backend use.
Benchmarks (`bench.py`) run on the real TPU; tests run everywhere, including
multi-chip sharding tests on the virtual CPU mesh.
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
    return np.random.default_rng(0)
