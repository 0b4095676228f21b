"""Selection tie-margin measurement (VERDICT r3 item 7).

The device/host parity story's only caveat is knife-edge ties: a ±1-ulp
cost difference flips argmin when the best and second-best candidates are
close (the scenario-36 caveat, parallel/device_sim.py docstring).  This
tool quantifies how much margin the DEFAULT path actually has: it runs the
five reference scenarios on the host path with `debug.save_all_traj` on,
captures every replan's masked cost vector, and reports the distribution
of (second_best − best) absolute and relative gaps — plus whether the
Neumaier compensated-sum option (`planning.compensated_cost_sum`) changes
any selection and what it costs.

Usage: python tools/tie_margins.py [--out docs/TIE_MARGINS.md]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

XML_DIR = "/root/reference/example_scenarios"


def margins_for(path, compensated: bool):
    import jax

    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    from frenetix_tpu.planner.reactive import ReactivePlanner

    cfg = load_config()
    cfg.dtype = "float32"           # the TPU production dtype
    cfg.debug.activate_logging = False
    cfg.planning.compensated_cost_sum = compensated
    sim = Simulation(load_scenario(path), cfg)

    gaps, rel_gaps, selections = [], [], []
    orig = ReactivePlanner._plan_from_rows

    def hooked(self, rows, res, idx, matrix, mode, **kw):
        cost = np.asarray(res.cost, np.float64)
        sel = np.asarray(res.selectable)
        if sel.sum() >= 2:
            c = np.sort(cost[sel])
            best, second = float(c[0]), float(c[1])
            gaps.append(second - best)
            rel_gaps.append((second - best) / max(abs(best), 1e-12))
        selections.append(int(idx))
        return orig(self, rows, res, idx, matrix, mode, **kw)

    ReactivePlanner._plan_from_rows = hooked
    try:
        sim.run()
    finally:
        ReactivePlanner._plan_from_rows = orig
    statuses = [int(a.status) for a in sim.agents]
    return gaps, rel_gaps, selections, statuses


def device_margins_for(path, behavior=False):
    """Per-cycle selection margins of the DEVICE program itself (VERDICT r4
    item 5: docs/TIE_MARGINS.md measured the host path only, but knife
    edges flip inside the compiled device programs).  Builds the scan with
    `emit_margins=True` (a separate compiled variant — the default
    programs keep their cache entries) and reports the per-agent gap
    distribution."""
    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    import jax

    cfg = load_config()
    cfg.dtype = "float32"
    cfg.simulation.start_multiagent = True
    cfg.debug.activate_logging = False
    if behavior:
        cfg.behavior.use_behavior_planner = True
    sc = load_scenario(path) if str(path).endswith(".xml") else path()
    ds = DeviceSimulation(Simulation(sc, cfg))
    if ds.hybrid_behavior and not ds.fsm_in_scan:
        return None  # hybrid path: host-side margins already cover it
    fn = jax.jit(ds._build_run(fsm_mode=ds.fsm_in_scan,
                               emit_margins=True))
    out = jax.device_get(fn(ds.tensors))
    res = {k: np.asarray(v) for k, v in out.items()
           if k in ("margin_gap", "margin_rel", "status_per_step")}
    # margins only matter while the agent still runs (frozen agents carry
    # stale selections)
    gap = res["margin_gap"]                      # (C, A)
    sps = res["status_per_step"].reshape(gap.shape[0], -1, gap.shape[1])
    live = (sps == 1).any(axis=1)                # (C, A) ran that cycle
    g = gap[live & np.isfinite(gap)]
    return g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--device", action="store_true",
                    help="also measure margins inside the DEVICE programs")
    ap.add_argument("--device-only", action="store_true",
                    help="skip the host-path section (CPU-heavy sims)")
    ap.add_argument("--tpu", action="store_true",
                    help="keep the session backend (real chip) instead of "
                         "forcing CPU — the honest f32 target for --device")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from frenetix_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    all_gaps, all_rel = [], []
    lines = ["# Selection tie margins (five reference scenarios, float32, "
             "host path)", ""]
    if args.device_only:
        lines.append("(host-path section skipped this run — see "
                     "docs/TIE_MARGINS.md for the host table)")
    lines.append("| scenario | replans | min gap | p1 gap | median gap | "
                 "min rel gap | selections flipped by compensated sum | "
                 "wall default → compensated |")
    lines.append("|---|---|---|---|---|---|---|---|")
    for f in sorted(os.listdir(XML_DIR)):
        if args.device_only:
            break
        if not f.endswith(".xml"):
            continue
        path = os.path.join(XML_DIR, f)
        t0 = time.perf_counter()
        gaps, rel, sel, st = margins_for(path, compensated=False)
        w0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        gaps_c, rel_c, sel_c, st_c = margins_for(path, compensated=True)
        w1 = time.perf_counter() - t0
        flips = sum(1 for a, b in zip(sel, sel_c) if a != b)
        g = np.array(gaps)
        lines.append(
            f"| {f.removesuffix('.xml')} | {len(g)} | {g.min():.3e} | "
            f"{np.percentile(g, 1):.3e} | {np.median(g):.3e} | "
            f"{min(rel):.3e} | {flips} (statuses {'same' if st == st_c else f'{st}->{st_c}'}) | "
            f"{w0:.1f}s → {w1:.1f}s |")
        all_gaps += gaps
        all_rel += rel
        print(lines[-1], flush=True)
    g = np.array(all_gaps if all_gaps else [np.nan])
    summary = (
        f"\nOverall: {len(g)} replans; min gap {g.min():.3e}, p1 "
        f"{np.percentile(g, 1):.3e}, median {np.median(g):.3e}; min relative "
        f"gap {min(all_rel) if all_rel else float('nan'):.3e}.  A float32 cost ulp at typical magnitudes "
        f"(~1e1) is ~1e-6 — gaps above ~1e-5 are tie-safe.")
    lines.append(summary)
    print(summary)

    if args.device:
        from frenetix_tpu.io import scenario_factory as sf

        lines += ["", "## Device-program margins (float32 scan, "
                  "emit_margins variant)", "",
                  "Zero gaps are DUPLICATE candidates (the matrix builder "
                  "appends the current ss0/d0 rows, and the stopping d1 "
                  "union can duplicate the centre row) — identical "
                  "trajectories, argmin deterministically picks the first; "
                  "they are not knife edges.  `min>0` is the smallest gap "
                  "between DISTINCT candidates — the margin a ±1-ulp cost "
                  "difference would have to beat to flip a selection.", "",
                  "| scenario | live replans | zero-gap (dup) | min>0 | "
                  "p10>0 | median |",
                  "|---|---|---|---|---|---|"]
        cases = [(f.removesuffix(".xml"),
                  os.path.join(XML_DIR, f), False)
                 for f in sorted(os.listdir(XML_DIR)) if f.endswith(".xml")]
        cases += [("traffic_light|behavior", sf.make_traffic_light, True),
                  ("overtake|behavior", sf.make_overtake, True),
                  ("behavior_overtake|behavior",
                   sf.make_behavior_overtake, True)]
        for name, src_, beh in cases:
            try:
                g = device_margins_for(src_, behavior=beh)
            except Exception as e:
                lines.append(f"| {name} | error: {type(e).__name__} | | | |")
                print(lines[-1], flush=True)
                continue
            if g is None or not len(g):
                lines.append(f"| {name} | (hybrid path / none) | | | | |")
            else:
                pos = g[g > 0]
                lines.append(
                    f"| {name} | {len(g)} | {int((g == 0).sum())} | "
                    f"{pos.min() if len(pos) else float('nan'):.3e} | "
                    f"{np.percentile(pos, 10) if len(pos) else float('nan'):.3e} | "
                    f"{np.median(g):.3e} |")
            print(lines[-1], flush=True)

    if args.out:
        open(args.out, "w").write("\n".join(lines) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
