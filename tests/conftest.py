"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(`swarm_tpu.parallel`) are exercised without TPU hardware. Must run before
the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment's sitecustomize imports jax and registers the remote-TPU
# (axon) backend before conftest runs, so the env var alone is too late —
# force the platform through the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
