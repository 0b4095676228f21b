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
    # --evaluate forces both; evaluation.yaml toggles enable them individually
    ev = config.evaluation
    do_metrics = evaluate or ev.evaluate_simulation
    do_solution_check = evaluate or ev.evaluate_agents
    sim_logger = None
    if log_dir is not None and config.debug.activate_logging:
        from frenetix_tpu.evaluation.metrics import enabled_metrics
        from frenetix_tpu.utils.sim_logging import SimulationLogger

        sim_logger = SimulationLogger(
            log_dir,
            evaluation_metrics=(enabled_metrics(ev.criticality_metrics)
                                if do_metrics else None),
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
    if config.simulation.device_resident_sim:
        # whole-sim-on-device scan, ONE fetch per run (parallel/device_sim);
        # the adapter feeds the normal downstream pipeline
        from frenetix_tpu.parallel.device_sim import DeviceSimulation

        ds = DeviceSimulation(sim)
        res = ds.to_simulation_result(ds.run())
        if log_dir is not None and config.visualization.save_plots:
            # the host loop renders frames in-step; replay them from the
            # fetched trajectories instead
            _replay_device_frames(scenario, sim, res, config, log_dir)
    else:
        res = sim.run()
    if log_dir is not None and config.visualization.save_plots:
        from frenetix_tpu.utils.visualization import (
            plot_final, plot_multiagent_overview,
        )

        plot_final(scenario, res, save_path=os.path.join(log_dir, "final.png"))
        if len(res.histories) > 1:
            plot_multiagent_overview(
                scenario, res, save_path=os.path.join(log_dir, "overview.png")
            )
    if do_metrics or do_solution_check:
        from frenetix_tpu.evaluation import evaluate_simulation

        # solution-check-only runs skip the metric suite entirely and must
        # not feed a logger whose scenario_evaluation table was never created
        evaluate_simulation(scenario, res, config,
                            sim_logger if do_metrics else None,
                            metrics=None if do_metrics else [],
                            msg_logger=msg_logger,
                            check_solutions=do_solution_check,
                            log_dir=log_dir)
    if sim_logger:
        sim_logger.close()
    return res


def main(argv=None):
    # persistent compilation cache: whole-run scan/fleet programs compile
    # for tens of seconds; warm starts hit ~/.cache/frenetix_tpu/xla
    from frenetix_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scenarios", nargs="+",
                    help="CommonRoad XML files or directories of them")
    ap.add_argument("--multiagent", action="store_true")
    ap.add_argument("--device-sim", action="store_true",
                    help="run the WHOLE simulation on device as one scan "
                         "(one fetch per run; parallel/device_sim.py)")
    ap.add_argument("--device-fleet", action="store_true",
                    help="run ALL scenarios as ONE vmapped device scan with "
                         "a single fetch (parallel.device_sim.run_fleet)")
    ap.add_argument("--batched-agents", action="store_true",
                    help="evaluate all agents' cycles in one device call")
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
    ap.add_argument("--workers", type=int, default=1,
                    help="parallel scenario workers (evaluation pipeline, "
                         "main.py:86-92; forces the CPU backend when > 1)")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="dotted config override merged last, e.g. "
                         "--set planning.replanning_frequency=1 "
                         "--set cost_weights.prediction=0.5 (the reference's "
                         "OmegaConf.from_cli, configuration_builder.py:30-34)")
    args = ap.parse_args(argv)

    # expand directories into scenario file lists (evaluation pipeline mode)
    expanded = []
    for path in args.scenarios:
        if os.path.isdir(path):
            expanded.extend(
                sorted(os.path.join(path, f) for f in os.listdir(path)
                       if f.endswith(".xml"))
            )
        else:
            expanded.append(path)
    args.scenarios = expanded

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from frenetix_tpu.utils.config import load_config, parse_cli_overrides
    from frenetix_tpu.utils.logging import make_msg_logger

    config = load_config(args.config_dir, overrides=parse_cli_overrides(args.set),
                         strict_overrides=True)
    # convenience flags only ASSERT their option (a --set override of the same
    # key must not be clobbered by the flag's False default)
    if args.multiagent:
        config.simulation.start_multiagent = True
    if args.batched_agents:
        config.simulation.batched_device_agents = True
    if args.device_sim:
        config.simulation.device_resident_sim = True
    if args.prediction:
        config.prediction.mode = args.prediction
    if args.plot or args.gif:
        config.visualization.save_plots = True
        config.visualization.save_gif = args.gif

    os.makedirs(args.logs, exist_ok=True)
    # msg_log_mode (simulation.yaml): NOTSET/DEBUG/INFO/WARNING/ERROR/CRITICAL
    msg_logger = make_msg_logger(args.logs,
                                 level=config.simulation.msg_log_mode)

    if args.device_fleet:
        return _run_device_fleet(args, config, msg_logger)
    if args.workers > 1:
        return _run_pipeline(args, config, msg_logger)
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


def _replay_device_frames(scenario, sim, res, config, log_dir):
    """Per-step frames (and GIF) for a device-resident run, rendered
    post-hoc from the fetched histories — the host loop draws these live
    inside Simulation.run."""
    from frenetix_tpu.utils.visualization import (
        make_gif, plot_scenario_at_timestep,
    )

    vis = config.visualization
    for t in range(1, res.steps + 1):
        if t % vis.plot_interval:
            continue
        for a in sim.agents:
            h = res.histories.get(a.id, [])
            j = min(t, len(h) - 1)
            if j >= 0:
                a.state = h[j]
                a.record.states = list(h[: j + 1])
        plot_scenario_at_timestep(
            scenario, sim.agents, t,
            save_path=f"{log_dir}/frames/frame_{t:04d}.png",
            window=vis.window, veh_length=config.vehicle.length,
            veh_width=config.vehicle.width, show_ref=vis.draw_reference_path,
            show_labels=vis.show_labels,
            draw_planning_problem=vis.draw_planning_problem,
            draw_icons=vis.draw_icons,
        )
    if vis.save_gif:
        try:
            make_gif(f"{log_dir}/frames", f"{log_dir}/run.gif")
        except Exception:
            pass


def _run_device_fleet(args, config, msg_logger):
    """All scenarios as ONE vmapped device scan + one fetch
    (parallel.device_sim.run_fleet) — the device-batched analog of the
    `--workers` process pipeline."""
    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.sim import Simulation

    score_path = os.path.join(args.logs, "score_overview.csv")
    fail_path = os.path.join(args.logs, "log_failures.csv")
    new_file = not os.path.exists(score_path)
    sims, names = [], []
    ok = True
    for path in args.scenarios:
        name = os.path.splitext(os.path.basename(path))[0]
        try:
            sims.append(DeviceSimulation(
                Simulation(load_scenario(path), config, msg_logger)))
            names.append(name)
        except Exception as e:         # containment: drop from the fleet
            ok = False
            msg_logger.error(f"{name} FAILED to build: {e}")
            with open(fail_path, "a", newline="") as ff:
                csv.writer(ff, delimiter=";").writerow(
                    [name, repr(e), traceback.format_exc()])
    if not sims:
        return 1
    results = run_fleet(sims)
    with open(score_path, "a", newline="") as f:
        w = csv.writer(f, delimiter=";")
        if new_file:
            w.writerow(["scenario", "agent", "timestep", "status", "message",
                        "wall_s"])
        for name, ds, dres in zip(names, sims, results):
            res = ds.to_simulation_result(dres)
            for aid, status in res.agent_status.items():
                w.writerow([name, aid, res.steps, status.name,
                            res.agent_messages[aid], round(dres.wall_time, 2)])
                msg_logger.info(
                    f"{name} agent {aid}: {status.name} steps={res.steps} "
                    f"(fleet of {dres.extras['fleet_size']}, "
                    f"{dres.wall_time:.1f}s total)")
                if status.name != "COMPLETED_SUCCESS":
                    ok = False
            if args.evaluate:
                from frenetix_tpu.evaluation import evaluate_simulation

                evaluate_simulation(ds.sim.scenario, res, config, None,
                                    msg_logger=msg_logger,
                                    check_solutions=False)
    return 0 if ok else 1


def _pipeline_worker(payload):
    """Worker entry (spawned process, CPU backend): one scenario end-to-end."""
    path, config, logs, evaluate, no_logging = payload
    import traceback as tb

    import jax

    jax.config.update("jax_platforms", "cpu")
    name = os.path.splitext(os.path.basename(path))[0]
    try:
        log_dir = None if no_logging else os.path.join(logs, name)
        res = run_one(path, config, None, log_dir=log_dir, evaluate=evaluate)
        return (name, [(aid, st.name, res.agent_messages[aid], res.steps,
                        round(res.wall_time, 2))
                       for aid, st in res.agent_status.items()], None)
    except Exception as e:
        return (name, [], (repr(e), tb.format_exc()))


def _run_pipeline(args, config, msg_logger):
    """Scenario-parallel evaluation pipeline: ProcessPoolExecutor over
    scenarios (reference main.py:86-92, 4 workers default there)."""
    import concurrent.futures as cf
    import multiprocessing as mp

    payloads = [(p, config, args.logs, args.evaluate, args.no_logging)
                for p in args.scenarios]
    score_path = os.path.join(args.logs, "score_overview.csv")
    fail_path = os.path.join(args.logs, "log_failures.csv")
    new_file = not os.path.exists(score_path)
    ok = True
    with open(score_path, "a", newline="") as f:
        w = csv.writer(f, delimiter=";")
        if new_file:
            w.writerow(["scenario", "agent", "timestep", "status", "message", "wall_s"])
        ctx = mp.get_context("spawn")
        with cf.ProcessPoolExecutor(max_workers=args.workers, mp_context=ctx) as ex:
            for name, rows, err in ex.map(_pipeline_worker, payloads):
                if err is not None:
                    ok = False
                    msg_logger.error(f"{name} FAILED: {err[0]}")
                    with open(fail_path, "a", newline="") as ff:
                        csv.writer(ff, delimiter=";").writerow([name, *err])
                    continue
                for aid, status, message, steps, wall in rows:
                    w.writerow([name, aid, steps, status, message, wall])
                    msg_logger.info(f"{name} agent {aid}: {status} ({message}) "
                                    f"steps={steps} wall={wall}s")
                    if status != "COMPLETED_SUCCESS":
                        ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
