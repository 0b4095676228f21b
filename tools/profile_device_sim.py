"""Profile the device-resident sim scan on the real TPU.

Usage: python tools/profile_device_sim.py [--trace DIR] [--no-trace]

Builds the bench overtake scenario (bench.py::measure_device_sim workload),
runs it once to compile, reports honest wall numbers (device_sim walls
include the single real fetch, so they are trustworthy — PERF.md "Timing on
the axon tunnel"), then captures a jax.profiler trace and prints the top
XLA ops by device self-time.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def top_ops(trace_dir, top=20):
    """Aggregate 'XLA Ops' self-times from the newest trace.json.gz."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")),
        key=os.path.getmtime)
    if not paths:
        print(f"(no trace under {trace_dir})")
        return
    data = json.load(gzip.open(paths[-1]))
    names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"].get("name")
    agg = collections.defaultdict(lambda: [0.0, 0])
    for e in data["traceEvents"]:
        if (e.get("ph") == "X"
                and names.get((e["pid"], e["tid"])) == "XLA Ops"):
            agg[e["name"]][0] += e.get("dur", 0)
            agg[e["name"]][1] += 1
    total = sum(v[0] for v in agg.values())
    print(f"=== top XLA ops (device total {total / 1e3:.1f} ms) ===")
    for name, (us, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{us/1e3:9.2f} ms {100*us/total:5.1f}% x{n:<6d} {name[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/dsim_trace")
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    import jax

    from frenetix_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

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
        top_ops(args.trace)


if __name__ == "__main__":
    main()
