"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run anywhere (the standard way to test pjit/mesh code without TPUs)."""

import os

# Force CPU: the ambient environment points JAX at a remote TPU (axon), which
# is reserved for bench.py. Unit tests run on 8 virtual CPU devices.  The
# axon plugin re-registers itself, so the env var alone is not enough — pin
# the config after import too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
