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
# Persistent compile cache: this image has ONE CPU core and XLA compiles of
# the model-zoo grad graphs dominate the suite; repeat runs hit the cache.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _seed_torch():
    """Pin torch's global RNG per test: the parity tests build reference
    nn.Modules with default (global-RNG) init, so without this their
    weights — and the marginal numerical error vs our implementation —
    depend on which tests ran earlier in the process (observed as an
    order-dependent demucs-parity flake)."""
    import torch

    torch.manual_seed(0)
    yield
