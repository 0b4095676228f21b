"""AOT export layer (utils/aot_cache) — DEFAULT ON since round 5.

The whole-run scan programs serialize through `jax.export` (all custom
NamedTuple pytrees registered) and a warm process deserializes instead of
re-tracing.  These tests pin: (a) the round trip is value-identical to the
plain jit path, (b) the cache file is written and hit, (c) opt-out works.
"""
import os

import numpy as np
import pytest


def _sim():
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    cfg = load_config()
    cfg.dtype = "float64"
    cfg.debug.activate_logging = False
    return DeviceSimulation(Simulation(make_highway(n_steps=40), cfg))


def test_aot_roundtrip_matches_plain_jit(tmp_path, monkeypatch):
    monkeypatch.setenv("FRENETIX_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("FRENETIX_TPU_AOT", "1")
    from frenetix_tpu.utils.aot_cache import cached_program

    ds = _sim()
    import jax

    plain = jax.jit(ds._build_run())
    out_plain = jax.device_get(plain(ds.tensors))

    fn1 = cached_program("t_devsim", ("k",), ds.tensors, ds._build_run)
    out1 = jax.device_get(fn1(ds.tensors))
    exports = [f for f in os.listdir(tmp_path / "exports")
               if f.endswith(".jaxexp")]
    assert len(exports) == 1 and \
        os.path.getsize(tmp_path / "exports" / exports[0]) > 0

    # second call with the same key: deserializes the export
    fn2 = cached_program("t_devsim", ("k",), ds.tensors, ds._build_run)
    out2 = jax.device_get(fn2(ds.tensors))

    for k in out_plain:
        np.testing.assert_array_equal(out_plain[k], out1[k], err_msg=k)
        np.testing.assert_array_equal(out_plain[k], out2[k], err_msg=k)


def test_aot_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("FRENETIX_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("FRENETIX_TPU_AOT", "0")
    from frenetix_tpu.utils.aot_cache import cached_program

    ds = _sim()
    fn = cached_program("t_off", ("k",), ds.tensors, ds._build_run)
    import jax

    out = jax.device_get(fn(ds.tensors))
    assert np.isfinite(out["trajectories"]).all()
    assert not os.path.exists(tmp_path / "exports")
