"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding logic is testable without TPU hardware (SURVEY.md §4).

The surrounding environment exports JAX_PLATFORMS=axon (a real TPU chip) and
a pytest plugin imports jax before this conftest runs, so setting the env
var alone is not enough: we also update jax.config (backends initialize
lazily, so this still takes effect), and TPU-default bf16 matmul precision
would break the float32 golden tests anyway.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    + jax.default_backend())
assert jax.device_count() >= 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "slow: long-running system-level test")
