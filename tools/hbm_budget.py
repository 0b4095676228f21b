"""HBM budget of the two production batch programs (VERDICT r3 item 2).

AOT-compiles (no execution — compilation succeeds even where the run would
OOM) and reports XLA's memory_analysis per size:

  * the fused multi-agent cycle (parallel.mesh batched path) over the
    A-sweep that OOMed at A=256 in BENCH_r03, and
  * the device-resident fleet (parallel.device_sim.run_fleet program) over
    the S-sweep that OOMed at S=32.

With --dump, additionally writes an XLA dump and prints the largest
allocations from the buffer-assignment file so the giants are attributable
to specific HLO ops.

Usage: python tools/hbm_budget.py [--dump /tmp/xdump] [--agents ...]
       [--fleet ...]
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fmt(n):
    return f"{n / 2**30:8.3f} G"


def report(tag, compiled):
    ma = compiled.memory_analysis()
    print(f"{tag:>28}: args {fmt(ma.argument_size_in_bytes)}  "
          f"out {fmt(ma.output_size_in_bytes)}  "
          f"temp {fmt(ma.temp_size_in_bytes)}  "
          f"total {fmt(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes)}",
          flush=True)
    return ma


def top_buffers(dump_dir, n=12):
    """Largest allocations from the newest buffer-assignment dump."""
    paths = sorted(glob.glob(os.path.join(dump_dir, "*buffer-assignment*")),
                   key=os.path.getmtime)
    if not paths:
        print("  (no buffer-assignment dump found)")
        return
    rows = []
    # lines like: "allocation 12: size 12345678, ..." then "position" lines
    # naming the defining HLO value
    text = open(paths[-1]).read()
    for m in re.finditer(
            r"allocation \d+: size (\d+)[^\n]*\n((?:\s+.*\n){0,4})", text):
        size = int(m.group(1))
        body = m.group(2)
        name = ""
        vm = re.search(r"value: <\d+ ([^\s@]+)", body)
        if vm:
            name = vm.group(1)
        rows.append((size, name, body.strip().split("\n")[0].strip()))
    rows.sort(reverse=True)
    for size, name, first in rows[:n]:
        print(f"  {fmt(size)}  {name or first[:90]}")


def sweep_batched(agent_sizes, dump=None):
    import jax

    from bench_scaling import build_stacked_problem
    from frenetix_tpu.parallel.mesh import _vmapped_body

    print("== fused multi-agent cycle (batched_full_cycle program) ==")
    for a in agent_sizes:
        matrices, masks, ctx = build_stacked_problem(a, dtype=np.float32)
        vb = _vmapped_body(0.1, 30, False, 768)
        compiled = jax.jit(
            lambda m, k, c: vb(m, k, c)).lower(matrices, masks, ctx).compile()
        report(f"A={a}", compiled)
        if dump:
            top_buffers(dump)


def sweep_fleet(fleet_sizes, dump=None):
    import jax

    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.parallel import device_sim as ds_mod
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    def build(i):
        c = load_config()
        c.dtype = "float32"
        c.simulation.start_multiagent = True
        return DeviceSimulation(Simulation(
            make_overtake(lead_gap=40.0 + 2.0 * i), c))

    print("== device-resident fleet (run_fleet program) ==")
    for s_n in fleet_sizes:
        sims = [build(i) for i in range(s_n)]
        stacked, _, a_max, c_max = ds_mod._fleet_stack(sims)
        vrun = jax.vmap(sims[0]._build_run(a_n=a_max, n_cycles=c_max))
        compiled = jax.jit(vrun).lower(stacked).compile()
        report(f"S={s_n} (A={a_max},C={c_max})", compiled)
        if dump:
            top_buffers(dump)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, nargs="*",
                    default=[64, 128, 256, 512])
    ap.add_argument("--fleet", type=int, nargs="*", default=[8, 16, 32])
    ap.add_argument("--dump", default=None,
                    help="XLA dump dir for buffer-assignment attribution")
    args = ap.parse_args()

    if args.dump:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_dump_to={args.dump}")

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    print("device:", jax.devices()[0].device_kind, flush=True)
    if args.agents:
        sweep_batched(args.agents, dump=args.dump)
    if args.fleet:
        sweep_fleet(args.fleet, dump=args.dump)


if __name__ == "__main__":
    main()
