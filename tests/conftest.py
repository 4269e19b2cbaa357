"""Test harness: force CPU with 8 virtual devices for multi-chip sharding
tests (the driver validates real multi-chip paths separately)."""

import os

# Force-override: the host environment pins JAX_PLATFORMS=axon (the TPU
# tunnel) and a sitecustomize imports jax at interpreter startup, so env vars
# alone are too late — use jax.config.update before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
