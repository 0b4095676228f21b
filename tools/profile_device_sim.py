"""Profile the device-resident sim scan on the real TPU chip.

Round-4 headline task (VERDICT item 1): the device sim executes ~9.2 ms per
sim-step while the standalone fused cycle plans 128 agents in 0.253 ms —
find where the ~40x goes.  Captures a jax.profiler trace of a few scan
cycles and prints the top HLO ops by self time.

Usage: python tools/profile_device_sim.py [--fleet S]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_trace(trace_dir):
    """[(op, total_us, n)] from the newest vm.trace.json.gz (trace-events)."""
    import collections

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")),
        key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    import json

    data = json.load(gzip.open(paths[-1]))
    evs = data["traceEvents"]
    names = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"].get("name")
    agg = collections.defaultdict(lambda: [0.0, 0])
    for e in evs:
        if e.get("ph") != "X":
            continue
        if names.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        agg[e["name"]][0] += e.get("dur", 0)
        agg[e["name"]][1] += 1
    return agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fleet", type=int, default=0)
    ap.add_argument("--trace-dir", default="/tmp/ds_trace")
    ap.add_argument("--lines", default="XLA Ops",
                    help="substring filter on trace line name")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    def build(i=0):
        c = load_config()
        c.dtype = "float32"
        c.simulation.start_multiagent = True
        return DeviceSimulation(Simulation(
            make_overtake(lead_gap=40.0 + 2.0 * i), c))

    if args.fleet:
        sims = [build(i) for i in range(args.fleet)]
        t0 = time.perf_counter()
        run_fleet(sims)
        print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        run_fleet(sims)
        wall = time.perf_counter() - t0
        print(f"fleet run: {wall:.3f}s", flush=True)
        jax.profiler.start_trace(args.trace_dir)
        run_fleet(sims)
        jax.profiler.stop_trace()
    else:
        ds = build()
        t0 = time.perf_counter()
        r = ds.run()
        print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        r = ds.run()
        wall = time.perf_counter() - t0
        print(f"run: {wall:.3f}s steps={r.steps} statuses={r.status}",
              flush=True)
        jax.profiler.start_trace(args.trace_dir)
        ds.run()
        jax.profiler.stop_trace()

    agg = parse_trace(args.trace_dir)
    total = sum(v[0] for v in agg.values())
    print(f"\n=== top XLA ops (total {total/1e3:.1f} ms) ===")
    for name, (us, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{us/1e3:9.2f} ms  {100*us/total:5.1f}%  x{n:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
