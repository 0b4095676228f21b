"""AOT program cache: skip Python re-tracing on warm starts.

The XLA persistent cache (utils/jax_cache.py) removes recompilation, but a
new process still pays ~10 s of Python TRACING for the whole-run device-sim
/ fleet scan programs (the residual behind the r3 "cold-start tax",
VERDICT item 5).  This layer serializes the traced program itself with
`jax.export`: a warm start deserializes StableHLO (fast) and compiles it
through the persistent cache (fast after the first warm load).

Safety: the cache key includes the jax version, a content hash of every
frenetix_tpu source file, the caller's static configuration repr, and the
input pytree's shapes/dtypes — any code or config change misses the cache
and rebuilds.  Failures fall back to normal tracing (best-effort layer).
"""
from __future__ import annotations

import hashlib
import os

__all__ = ["cached_program"]

_PKG_HASH = None


def _package_hash() -> str:
    """Content hash of the frenetix_tpu package sources (cached per process)."""
    global _PKG_HASH
    if _PKG_HASH is None:
        import frenetix_tpu

        root = os.path.dirname(os.path.abspath(frenetix_tpu.__file__))
        h = hashlib.sha256()
        for dirpath, _, files in sorted(os.walk(root)):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    h.update(p.encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
        _PKG_HASH = h.hexdigest()[:16]
    return _PKG_HASH


def _cache_dir() -> str:
    base = os.environ.get("FRENETIX_TPU_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "frenetix_tpu")
    return os.path.join(base, "exports")


_REGISTERED = False


def _register_pytrees(jexport):
    """Register every NamedTuple that can appear in exported arg/output
    pytrees (export serialization rejects unregistered custom types).
    Serialized names are stable module-qualified strings, so exports stay
    valid across processes."""
    global _REGISTERED
    if _REGISTERED:
        return
    from frenetix_tpu.behavior.device_fsm import FSMCarry, FSMTensors
    from frenetix_tpu.geometry.refpath import RefPathTable
    from frenetix_tpu.ops.costs import PredictionTensors
    from frenetix_tpu.parallel.device_sim import SimTensors
    from frenetix_tpu.risk.reachable_set import LaneletTensors

    for t in (RefPathTable, PredictionTensors, SimTensors, LaneletTensors,
              FSMTensors, FSMCarry):
        try:
            jexport.register_namedtuple_serialization(
                t, serialized_name=f"{t.__module__}.{t.__name__}")
        except Exception:
            pass  # already registered (or an older jax without the API)
    _REGISTERED = True


def cached_program(tag: str, statics, example_args, build_fn):
    """Return a jitted callable for `build_fn()` with AOT warm-start.

    `statics`: anything whose repr() captures the build's static
    configuration.  `example_args`: the argument pytree (arrays or
    ShapeDtypeStructs) — only shapes/dtypes enter the key.  `build_fn`:
    zero-arg builder returning the traceable function.
    """
    import jax

    # DEFAULT ON since round 5 (VERDICT r4 item 6): the ~10 s residual of a
    # warm fleet start is host Python tracing, which is measurable (and
    # removable) independently of the tunnel's variance —
    # tools/trace_time.py reports trace-vs-deserialize host time.  Opt out
    # with FRENETIX_TPU_AOT=0; any failure falls back to plain jit.
    if os.environ.get("FRENETIX_TPU_AOT", "1") in ("0", "off", "false"):
        return jax.jit(build_fn())
    try:
        from jax import export as jexport

        import numpy as np

        _register_pytrees(jexport)

        leaves = [np.asarray(l) if not hasattr(l, "dtype") else l
                  for l in jax.tree.leaves(example_args)]
        sig = ";".join(f"{l.shape}:{l.dtype}" for l in leaves)
        platform = jax.devices()[0].platform
        key = hashlib.sha256("|".join([
            jax.__version__, platform, _package_hash(), tag, repr(statics),
            sig,
        ]).encode()).hexdigest()[:24]
        path = os.path.join(_cache_dir(), f"{tag}-{key}.jaxexp")
        if os.path.exists(path):
            with open(path, "rb") as fh:
                exp = jexport.deserialize(bytearray(fh.read()))
            return jax.jit(exp.call)
    except Exception:
        return jax.jit(build_fn())

    fn = build_fn()
    try:
        import numpy as np

        abstract = jax.tree.map(
            lambda l: jax.ShapeDtypeStruct(
                np.shape(l),
                l.dtype if hasattr(l, "dtype") else np.asarray(l).dtype),
            example_args)
        exp = jexport.export(jax.jit(fn))(abstract)
        os.makedirs(_cache_dir(), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(exp.serialize())
        os.replace(tmp, path)
        # return the exported module's call so the compiled-HLO hash matches
        # what the next warm start compiles — one shared persistent-cache
        # entry instead of two
        return jax.jit(exp.call)
    except Exception:
        return jax.jit(fn)
