"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Must configure the platform before any test imports trigger backend init.
The axon TPU plugin registers itself at interpreter start and pins
JAX_PLATFORMS=axon, so we override via jax.config (which wins over the env).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: tests that need a real TPU chip")
    config.addinivalue_line("markers", "slow: long-running tests")
