"""Test configuration: CPU-only JAX with an 8-device virtual mesh and float64.

Kernel unit tests run in float64 on CPU to compare against the float64 NumPy
reference semantics (the reference implementation is float64 throughout — see
SURVEY.md §7.3); TPU execution uses float32 (bench.py).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# the AOT export layer (default-on since r5) retraces once more to export —
# pure overhead for single-process test runs
os.environ.setdefault("FRENETIX_TPU_AOT", "0")

import jax  # noqa: E402

# Force CPU. NOTE: the env's axon sitecustomize calls axon.register() at
# interpreter start, which sets jax_platforms="axon,cpu" directly — env vars
# (JAX_PLATFORMS=cpu) are ignored, only a config update after import works.
# The remote-TPU tunnel must not be used for float64 unit tests (TPU has no
# f64; per-op round-trips are ~1.7 s and f64 transfers hang).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the device-sim/fleet tests compile
# multi-minute whole-run scan programs; caching them (keyed by HLO hash, so
# any semantic change recompiles) cuts repeat suite wall time several-fold.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
