"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding semantics are identical between CPU and TPU under XLA,
so mesh/collective tests run here without TPU hardware (SURVEY.md §4).
The environment pins JAX_PLATFORMS=axon (the TPU tunnel), so the platform
must be overridden via jax.config, not env vars.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
