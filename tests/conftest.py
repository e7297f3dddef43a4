"""Test harness configuration.

Tests run on CPU JAX with 8 virtual devices so the multi-chip sharding paths
(pjit over a Mesh) are exercised without TPU hardware — the fake-backend
substitute recommended in SURVEY.md §4.

NOTE: the session's sitecustomize (PYTHONPATH=/root/.axon_site) imports jax
at interpreter start and freezes JAX_PLATFORMS=axon, so setting the env var
here is too late — we must go through jax.config before any backend
initializes. Set DINOX_TEST_TPU=1 to run tests against the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("DINOX_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
