"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

The driver benches on a real TPU chip; tests run hardware-free on the CPU
backend with 8 virtual devices so `parallel/` sharding paths are exercised
exactly as they would be on an 8-chip ICI mesh.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
