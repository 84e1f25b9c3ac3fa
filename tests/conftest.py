"""Test harness config: hermetic CPU runs with a virtual 8-device mesh.

Must set env vars before jax is imported anywhere. Real-TPU benchmarking is
done by bench.py, never by tests.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("SE_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax (axon TPU plugin) before conftest
# runs, so env vars alone are too late: update the already-imported config.
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
