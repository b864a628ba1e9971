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


def pytest_configure(config):
    """Build the native C++ extension before collection so the host-decode
    tests can never skip silently (they previously skipped 13 tests whenever
    nobody remembered to run ``make -C native``).  Hard-fail when a
    toolchain exists but the build breaks; only a missing compiler skips."""
    import shutil
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native_dir = os.path.join(root, "native")
    if shutil.which("g++") is None and shutil.which("cc") is None:
        return  # no toolchain in this environment: the tests may skip
    r = subprocess.run(
        ["make", "-C", native_dir], capture_output=True, text=True
    )
    if r.returncode != 0:
        raise pytest.UsageError(
            f"native extension build failed (toolchain present):\n"
            f"{r.stdout}\n{r.stderr}"
        )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
