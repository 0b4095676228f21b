"""Test configuration: CPU-only JAX with an 8-device virtual mesh and float64.

Kernel unit tests run in float64 on CPU to compare against the float64 NumPy
reference semantics (the reference implementation is float64 throughout — see
SURVEY.md §7.3); TPU execution uses float32 (bench.py).
"""
import os

# force CPU: the session env pins JAX_PLATFORMS=axon (remote TPU tunnel), which
# must not be used for float64 unit tests (and per-op round-trips are slow)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
