"""Test harness: force an 8-device virtual CPU mesh so multi-device sharding
paths (all-gather contrastive loss, pjit train steps) are exercised without TPU
hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The env var alone is not honored when a TPU plugin (axon) is present —
# force CPU explicitly so tests never ride the hardware tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def mesh8():
    from ctpa.core.config import MeshConfig
    from ctpa.core.mesh import create_mesh

    return create_mesh(MeshConfig(data_parallel=8, model_parallel=1))
