"""Host trace-vs-deserialize time for the whole-run scan programs.

VERDICT r4 item 6: the ~10 s residual of a warm fleet start is host Python
TRACING, measurable independently of the remote-TPU tunnel's variance.
This tool measures, on the CPU backend (no tunnel in the loop):

  trace_s        python tracing + lowering of the program (what a warm
                 start pays WITHOUT the AOT layer)
  export_s       one-time cost of serializing the traced program
  deserialize_s  loading the serialized program back (what a warm start
                 pays WITH the AOT layer, before compilation)

Usage: python tools/trace_time.py [--fleet N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fleet", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.parallel.device_sim import (
        DeviceSimulation, _fleet_stack)
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    def build_sim(i=0):
        c = load_config()
        c.dtype = "float32"
        c.simulation.start_multiagent = True
        return DeviceSimulation(Simulation(
            make_overtake(lead_gap=40.0 + 2.0 * i), c))

    out = {}
    for tag, make in (
        ("devsim", lambda: (build_sim().tensors,
                            build_sim()._build_run)),
        ("fleet", None),
    ):
        if tag == "fleet":
            sims = [build_sim(i) for i in range(args.fleet)]
            stacked, _, a_max, c_max = _fleet_stack(sims)
            base = sims[0]

            def build_fn(base=base, a_max=a_max, c_max=c_max):
                return jax.vmap(base._build_run(a_n=a_max, n_cycles=c_max))

            ex_args = stacked
        else:
            ex_args, build_run = make()
            build_fn = build_run

        t0 = time.perf_counter()
        traced = jax.jit(build_fn()).lower(ex_args)
        trace_s = time.perf_counter() - t0

        from jax import export as jexport

        abstract = jax.tree.map(
            lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), ex_args)
        t0 = time.perf_counter()
        exp = jexport.export(jax.jit(build_fn()))(abstract)
        blob = exp.serialize()
        export_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        exp2 = jexport.deserialize(bytearray(blob))
        fn = jax.jit(exp2.call)
        deserialize_s = time.perf_counter() - t0
        out[tag] = {
            "trace_s": round(trace_s, 2),
            "export_s": round(export_s, 2),
            "deserialize_s": round(deserialize_s, 2),
            "blob_mb": round(len(blob) / 1e6, 2),
            "speedup": round(trace_s / max(deserialize_s, 1e-9), 1),
        }
        del traced, exp, exp2, fn
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
