"""Test harness configuration.

Tests run on CPU JAX with 8 virtual devices so the multi-chip sharding paths
(pjit over a Mesh) are exercised without TPU hardware — the fake-backend
substitute recommended in SURVEY.md §4. Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
