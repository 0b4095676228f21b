"""CLI entry point: run scenarios through the TPU planning stack.

The analog of the reference's `main.py` / `main_multiagent.py`: loads
CommonRoad XMLs, runs a `Simulation` per scenario, appends per-agent outcomes
to `logs/score_overview.csv` and failures (with traceback) to
`logs/log_failures.csv` (main.py:32-47, 81-92).

Usage:
    python -m frenetix_tpu.run_scenario SCENARIO.xml [SCENARIO2.xml ...]
        [--multiagent] [--config-dir DIR] [--logs DIR] [--prediction MODE]
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
import traceback


def run_one(path: str, config, msg_logger=None, log_dir=None, evaluate=False):
    import os
    import time

    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.sim import Simulation

    scenario = load_scenario(path)
    sim_logger = None
    if log_dir is not None and config.debug.activate_logging:
        from frenetix_tpu.evaluation.metrics import CRITICALITY_METRICS
        from frenetix_tpu.utils.sim_logging import SimulationLogger

        sim_logger = SimulationLogger(
            log_dir, evaluation_metrics=CRITICALITY_METRICS if evaluate else None
        )
    t0 = time.perf_counter()
    sim = Simulation(scenario, config, msg_logger, sim_logger=sim_logger,
                     log_dir=log_dir)
    init_time = time.perf_counter() - t0
    if sim_logger:
        sim_logger.log_meta(
            scenario.scenario_id, [a.id for a in sim.agents],
            list(scenario.planning_problems.keys()), init_time,
            {"prediction_mode": config.prediction.mode},
            {"cost_weights": config.cost_weights},
        )
    res = sim.run()
    if log_dir is not None and config.visualization.save_plots:
        from frenetix_tpu.utils.visualization import plot_final

        plot_final(scenario, res, save_path=os.path.join(log_dir, "final.png"))
    if evaluate:
        from frenetix_tpu.evaluation import evaluate_simulation

        evaluate_simulation(scenario, res, config, sim_logger, msg_logger=msg_logger)
    if sim_logger:
        sim_logger.close()
    return res


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scenarios", nargs="+", help="CommonRoad XML files")
    ap.add_argument("--multiagent", action="store_true")
    ap.add_argument("--config-dir", default=None)
    ap.add_argument("--logs", default="logs")
    ap.add_argument("--prediction", default=None,
                    choices=["ground_truth", "constant_velocity", "walenet"])
    ap.add_argument("--evaluate", action="store_true",
                    help="compute criticality metrics after each simulation")
    ap.add_argument("--no-logging", action="store_true")
    ap.add_argument("--plot", action="store_true", help="save per-step frames")
    ap.add_argument("--gif", action="store_true", help="assemble frames into a GIF")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from frenetix_tpu.utils.config import load_config
    from frenetix_tpu.utils.logging import make_msg_logger

    config = load_config(args.config_dir)
    config.simulation.start_multiagent = args.multiagent
    if args.prediction:
        config.prediction.mode = args.prediction
    if args.plot or args.gif:
        config.visualization.save_plots = True
        config.visualization.save_gif = args.gif

    os.makedirs(args.logs, exist_ok=True)
    msg_logger = make_msg_logger(args.logs)
    score_path = os.path.join(args.logs, "score_overview.csv")
    fail_path = os.path.join(args.logs, "log_failures.csv")
    new_file = not os.path.exists(score_path)
    ok = True
    with open(score_path, "a", newline="") as f:
        w = csv.writer(f, delimiter=";")
        if new_file:
            w.writerow(["scenario", "agent", "timestep", "status", "message", "wall_s"])
        for path in args.scenarios:
            name = os.path.splitext(os.path.basename(path))[0]
            try:
                scenario_log_dir = None if args.no_logging else os.path.join(args.logs, name)
                res = run_one(path, config, msg_logger,
                              log_dir=scenario_log_dir, evaluate=args.evaluate)
                for aid, status in res.agent_status.items():
                    w.writerow([name, aid, res.steps, status.name,
                                res.agent_messages[aid], round(res.wall_time, 2)])
                    msg_logger.info(
                        f"{name} agent {aid}: {status.name} ({res.agent_messages[aid]}) "
                        f"steps={res.steps} wall={res.wall_time:.1f}s"
                    )
                    if status.name != "COMPLETED_SUCCESS":
                        ok = False
            except Exception as e:
                ok = False
                msg_logger.error(f"{name} FAILED: {e}")
                with open(fail_path, "a", newline="") as ff:
                    csv.writer(ff, delimiter=";").writerow(
                        [name, repr(e), traceback.format_exc()]
                    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
