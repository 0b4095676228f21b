"""TPU float32 regression: the five reference scenarios on the real chip.

Replaces the round-1 scratch driver (`_t_batch_tpu.py`): runs every
ZAM_Tjunction scenario single-agent on the attached TPU (float32, the
production dtype) and compares outcomes against the committed artifact
`TPU_REGRESSION.json` — statuses must match exactly, step counts within
±2 steps (float32 cost ties near decision boundaries can legitimately shift
a cycle; the golden float64 CPU test pins exact selections).

Usage:
    python tpu_regression.py            # compare against the artifact
    python tpu_regression.py --record   # (re)write the artifact

The CPU test suite checks the artifact exists and is well-formed
(tests/test_golden.py::test_tpu_regression_artifact); the actual chip run is
invoked out-of-band (this script) because the suite pins CPU float64.
"""
from __future__ import annotations

import json
import os
import sys
import time

ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "TPU_REGRESSION.json")
SCENARIO_DIR = "/root/reference/example_scenarios"
SCENARIOS = ["23", "24", "27", "36", "42"]
STEP_TOLERANCE = 2


def run_all():
    import jax

    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    results = {}
    for name in SCENARIOS:
        sc = load_scenario(f"{SCENARIO_DIR}/ZAM_Tjunction-1_{name}_T-1.xml")
        cfg = load_config()
        cfg.dtype = "float32"
        cfg.debug.activate_logging = False
        sim = Simulation(sc, cfg)
        t0 = time.time()
        res = sim.run()
        a = sim.agents[0]
        results[name] = {
            "status": res.agent_status[a.id].name,
            "steps": res.steps,
            "wall_s": round(time.time() - t0, 2),
            "final_position": [round(float(v), 2) for v in a.state.position],
        }
        print(f"scenario {name}: {results[name]}", flush=True)

    # device-resident sim (parallel/device_sim): six-agent T-junction as one
    # scan + one fetch on the real chip — statuses/steps pinned like the
    # host-loop rows above
    from frenetix_tpu.parallel.device_sim import DeviceSimulation

    sc = load_scenario(f"{SCENARIO_DIR}/ZAM_Tjunction-1_23_T-1.xml")
    cfg = load_config()
    cfg.dtype = "float32"
    cfg.debug.activate_logging = False
    cfg.simulation.start_multiagent = True
    t0 = time.time()
    dres = DeviceSimulation(Simulation(sc, cfg)).run()
    results["device_sim_23_multiagent"] = {
        "status": ("COMPLETED_SUCCESS"
                   if all(int(s) == 2 for s in dres.status) else
                   str([int(s) for s in dres.status])),
        "steps": int(dres.steps),
        "wall_s": round(time.time() - t0, 2),
        "agents": len(dres.agent_ids),
    }
    print(f"device_sim: {results['device_sim_23_multiagent']}", flush=True)

    # device-resident sim with the responsibility (reach-set) term: the
    # single-agent T-junction with per-cycle precomputed grids + on-device
    # re-selection (planner/reactive.py:448-462 semantics in the scan)
    sc = load_scenario(f"{SCENARIO_DIR}/ZAM_Tjunction-1_23_T-1.xml")
    cfg = load_config()
    cfg.dtype = "float32"
    cfg.debug.activate_logging = False
    cfg.cost_weights["responsibility"] = 0.2
    t0 = time.time()
    dres = DeviceSimulation(Simulation(sc, cfg)).run()
    results["device_sim_23_responsibility"] = {
        "status": ("COMPLETED_SUCCESS"
                   if all(int(s) == 2 for s in dres.status) else
                   str([int(s) for s in dres.status])),
        "steps": int(dres.steps),
        "wall_s": round(time.time() - t0, 2),
    }
    print(f"device_sim resp: {results['device_sim_23_responsibility']}",
          flush=True)

    # behavior-planner HYBRID device sim on the real map: host FSM between
    # device cycles (parallel/device_sim._run_hybrid), float32 on the chip
    sc = load_scenario(f"{SCENARIO_DIR}/ZAM_Tjunction-1_23_T-1.xml")
    cfg = load_config()
    cfg.dtype = "float32"
    cfg.debug.activate_logging = False
    cfg.behavior.use_behavior_planner = True
    t0 = time.time()
    dres = DeviceSimulation(Simulation(sc, cfg)).run()
    results["device_sim_23_behavior_hybrid"] = {
        "status": ("COMPLETED_SUCCESS"
                   if all(int(s) == 2 for s in dres.status) else
                   str([int(s) for s in dres.status])),
        "steps": int(dres.steps),
        "wall_s": round(time.time() - t0, 2),
    }
    print(f"device_sim hybrid: {results['device_sim_23_behavior_hybrid']}",
          flush=True)

    results["_meta"] = {
        "device": str(jax.devices()[0]),
        "dtype": "float32",
    }
    return results


def main():
    record = "--record" in sys.argv
    results = run_all()
    if record:
        with open(ARTIFACT, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"recorded {ARTIFACT}")
        return 0
    with open(ARTIFACT) as f:
        expect = json.load(f)
    failures = []
    keys = SCENARIOS + [k for k in ("device_sim_23_multiagent",
                                    "device_sim_23_responsibility",
                                    "device_sim_23_behavior_hybrid")
                        if k in expect and k in results]
    for name in keys:
        got, want = results[name], expect[name]
        if got["status"] != want["status"]:
            failures.append(f"{name}: status {got['status']} != {want['status']}")
        if abs(got["steps"] - want["steps"]) > STEP_TOLERANCE:
            failures.append(f"{name}: steps {got['steps']} != {want['steps']}")
    if failures:
        print("TPU REGRESSION FAILURES:")
        for f_ in failures:
            print(" ", f_)
        return 1
    print("TPU regression OK: all scenarios match the artifact "
          f"(device {results['_meta']['device']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
