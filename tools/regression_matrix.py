"""Full-matrix regression corpus (VERDICT r3 item 6): statuses pinned over
{prediction mode x emergency mode x behavior on/off x host/device} across
the synthetic scenario factories + the five reference XMLs.

The reference analog is the evaluation pipeline over a scenario batch
(/root/reference/main.py:86-92); here every cell is one simulation and the
artifact records its outcome fingerprint (per-agent statuses + executed
steps), like TPU_REGRESSION.json does for the five reference scenarios.

Dimension coverage without the full 24-way cross: every scenario runs the
base config on BOTH arms (host loop vs device-resident scan), and the
prediction/emergency/behavior variants rotate deterministically across the
corpus so each dimension value appears on several scenarios.  Device cells
with identical planner shapes additionally run as ONE fleet to pin
fleet==solo statuses at corpus scale.

Usage:
    python tools/regression_matrix.py --out MATRIX_r04.json          # write
    python tools/regression_matrix.py --check MATRIX_r04.json        # pin
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_XML_DIR = "/root/reference/example_scenarios"

FACTORIES = [
    "make_highway", "make_curve", "make_s_curve", "make_overtake",
    "make_lane_change", "make_traffic_light", "make_stop_sign",
    "make_yield_sign", "make_lane_merge", "make_behavior_overtake",
    "make_intersection_crossing", "make_road_exit", "make_double_crossing",
    "make_turn_left", "make_double_lane_change", "make_turn_right",
    "make_crosswalk", "make_convoy",
]

# variant axes (base first; rotation assigns variants to scenarios)
PREDICTION_MODES = ["ground_truth", "constant_velocity", "walenet"]
EMERGENCY_MODES = ["stopping", "min_risk"]
BEHAVIOR = [False, True]


def corpus():
    from frenetix_tpu.io import scenario_factory as sf

    out = [(name.removeprefix("make_"), getattr(sf, name)) for name in FACTORIES]
    if os.path.isdir(REF_XML_DIR):
        from frenetix_tpu.io import load_scenario

        for f in sorted(os.listdir(REF_XML_DIR)):
            if f.endswith(".xml"):
                path = os.path.join(REF_XML_DIR, f)
                out.append((os.path.splitext(f)[0],
                            lambda p=path: load_scenario(p)))
    return out


def cell_configs(i: int):
    """Config variants for corpus entry i: the base cell plus one rotating
    variant per axis — every dimension value recurs across the corpus."""
    cells = [("base", {})]
    cells.append((f"pred={PREDICTION_MODES[i % 3]}",
                  {"prediction": {"mode": PREDICTION_MODES[i % 3]}}))
    cells.append((f"emergency={EMERGENCY_MODES[i % 2]}",
                  {"planning": {"emergency_mode": EMERGENCY_MODES[i % 2]}}))
    if BEHAVIOR[i % 2]:
        cells.append(("behavior=on",
                      {"behavior": {"use_behavior_planner": True}}))
    # dedupe cells that equal base (pred=ground_truth is the default)
    seen, out = set(), []
    for tag, ov in cells:
        key = json.dumps(ov, sort_keys=True)
        if key not in seen:
            seen.add(key)
            out.append((tag, ov))
    return out


def run_cell(scenario_fn, overrides, arm: str):
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    cfg = load_config(overrides=overrides)
    cfg.dtype = "float32"
    cfg.simulation.start_multiagent = True
    cfg.debug.activate_logging = False
    sim = Simulation(scenario_fn(), cfg)
    if arm == "device":
        from frenetix_tpu.parallel.device_sim import DeviceSimulation

        res = DeviceSimulation(sim).run()
        return {"statuses": [int(s) for s in res.status],
                "steps": int(res.steps)}
    res = sim.run()
    return {"statuses": [int(a.status) for a in sim.agents],
            "steps": int(res.steps)}


def build(arms, only=None, shard=None):
    rows = []
    for i, (name, fn) in enumerate(corpus()):
        if only and only not in name:
            continue
        if shard is not None and i % shard[1] != shard[0]:
            continue
        for tag, ov in cell_configs(i):
            for arm in arms:
                key = f"{name}|{tag}|{arm}"
                try:
                    out = run_cell(fn, ov, arm)
                    rows.append({"cell": key, **out})
                    print(f"ok   {key}: {out['statuses']} steps={out['steps']}",
                          flush=True)
                except Exception as e:  # record, don't die — the pin IS the outcome
                    rows.append({"cell": key,
                                 "error": f"{type(e).__name__}: {e}"[:200]})
                    print(f"FAIL {key}: {type(e).__name__}: {e}", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--check", default=None)
    ap.add_argument("--arms", nargs="*", default=["host", "device"])
    ap.add_argument("--only", default=None,
                    help="substring filter on scenario names (quick checks)")
    ap.add_argument("--shard", default=None,
                    help="k/n: run corpus entries with index % n == k "
                         "(parallel workers; merge with tools/matrix_merge)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "ignores JAX_PLATFORMS; only a config update works)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from frenetix_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    shard = None
    if args.shard:
        k, n = args.shard.split("/")
        shard = (int(k), int(n))
    rows = build(args.arms, only=args.only, shard=shard)
    doc = {"n_cells": len(rows), "rows": rows}
    if args.check:
        pinned = json.load(open(args.check))
        by_cell = {r["cell"]: r for r in pinned["rows"]}
        bad = []
        for r in rows:
            p = by_cell.get(r["cell"])
            if p is None:
                continue
            if p != r:
                bad.append((r["cell"], p, r))
        for cell, p, r in bad:
            print(f"DRIFT {cell}: pinned {p} -> now {r}")
        print(f"checked {len(rows)} cells, {len(bad)} drifted")
        raise SystemExit(1 if bad else 0)
    out_path = args.out or "MATRIX_r04.json"
    json.dump(doc, open(out_path, "w"), indent=1)
    n_err = sum(1 for r in rows if "error" in r)
    print(f"wrote {out_path}: {len(rows)} cells ({n_err} errors)")


if __name__ == "__main__":
    main()
