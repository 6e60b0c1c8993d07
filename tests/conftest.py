"""Test environment: hermetic, CPU-only, 8 virtual devices.

Tests must run without TPU hardware and must exercise multi-chip sharding,
so we force the CPU backend with 8 virtual XLA devices before JAX is
imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox's sitecustomize pins JAX_PLATFORMS to the TPU tunnel; the
# explicit config update overrides it so tests stay hermetic on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402
from jodalrob_twotower_tpu.schema import tiny_synthetic_schema  # noqa: E402


@pytest.fixture(scope="session")
def tiny_dataset():
    """Small planted-cluster dataset shared across tests (fast to build)."""
    return make_synthetic_dataset(
        tiny_synthetic_schema(n_categorical=4, vocab_size=50, n_numeric=8),
        n_notices=512,
        n_companies=512,
        n_pairs=4096,
        n_clusters=16,
        noise=0.2,
        seed=0,
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
