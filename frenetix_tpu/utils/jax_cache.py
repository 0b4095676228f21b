"""Persistent XLA compilation cache policy for production entry points.

VERDICT r3 item 5: whole-run scan / fleet programs compile for tens of
seconds; the persistent cache (keyed by HLO hash — any semantic change
recompiles) makes every later process start warm.  One helper so
run_scenario, bench, tpu_regression and the tools all share the same
location:

  * ``FRENETIX_TPU_CACHE_DIR`` env var wins,
  * else ``~/.cache/frenetix_tpu/xla`` (durable, per-user — /tmp is wiped
    across reboots, which is exactly when a warm start matters).

Call before the first jit compilation; safe to call multiple times.
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(min_compile_secs: float = 1.0) -> str | None:
    """Point JAX's persistent compilation cache at the shared directory.

    Returns the cache dir, or None if configuration failed (old JAX, read-
    only filesystem, ...) — entry points treat the cache as best-effort.
    """
    path = os.environ.get("FRENETIX_TPU_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "frenetix_tpu", "xla")
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        return path
    except Exception:
        return None
