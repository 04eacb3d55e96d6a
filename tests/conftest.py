"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(`swarm_tpu.parallel`) are exercised without TPU hardware. Must run before
the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # Mosaic-interpreter kernels execute as io_callbacks serialized on the
    # host thread pool; on a 1-CPU host the shards of a 4-way shard_map
    # arrive at their first collective tens of seconds apart, and XLA's
    # default 40 s rendezvous deadline SIGABRTs the process (a timing
    # artifact of interpret-on-CPU, not a deadlock — real-TPU lowering has
    # no such layer). Give stragglers time to arrive.
    flags = (flags
             + " --xla_cpu_collective_call_terminate_timeout_seconds=900"
             ).strip()
os.environ["XLA_FLAGS"] = flags
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
