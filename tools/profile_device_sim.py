"""Profile the device-resident sim scan on the real TPU.

Usage: python tools/profile_device_sim.py [--trace DIR]

Builds the bench overtake scenario (bench.py::measure_device_sim workload),
runs it once to compile, then a traced run. Prints wall numbers; if the
profiler produces a trace, it is left under --trace for inspection.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/dsim_trace")
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    cfg = load_config()
    cfg.dtype = "float32"
    cfg.simulation.start_multiagent = True
    ds = DeviceSimulation(Simulation(make_overtake(), cfg))
    t0 = time.perf_counter()
    r = ds.run()
    print(f"compile+first: {time.perf_counter() - t0:.2f}s "
          f"steps={r.steps} status={list(r.status)}")
    times = []
    for _ in range(3):
        r = ds.run()
        times.append(r.wall_time)
    wall = float(np.median(times))
    print(f"steady: {wall:.3f}s  ms/cycle={1000 * wall / ds.n_cycles:.2f} "
          f"(n_cycles={ds.n_cycles}, k={ds.k_replan})")

    if not args.no_trace:
        with jax.profiler.trace(args.trace):
            r = ds.run()
        print(f"traced run: {r.wall_time:.3f}s → {args.trace}")


if __name__ == "__main__":
    main()
