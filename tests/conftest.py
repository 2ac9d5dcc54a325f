"""Force tests onto a virtual 8-device CPU mesh (the reference never had a
fake multi-device backend; this is ours). Must run before jax is imported."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon tunnel overrides JAX_PLATFORMS at interpreter
# startup; force CPU explicitly before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.RandomState(1024)
