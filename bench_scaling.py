"""Scaling benchmark: agent-sharded planning throughput across a device mesh.

Measures cycles/sec (per-agent replanning "solves") at 1, 2, 4, 8 devices with
fixed per-device load (weak scaling) through the shard_map multi-agent path
(parallel.mesh.sharded_full_cycle — the COMPLETE cycle incl. boundary/corridor
checking and lane costs) — the harness behind the ≥80%-linear-scaling target
(BASELINE.md).  On this environment only one real TPU chip is reachable, so
the runnable configuration is the virtual CPU mesh
(`--xla_force_host_platform_device_count`); the numbers validate the SPMD
program and scaling *methodology*, not real ICI bandwidth.

Usage: python bench_scaling.py            (8 virtual CPU devices)
"""
from __future__ import annotations

import os
import time

import numpy as np


def build_stacked_problem(a: int, dtype=np.float32, n_steps: int = 30,
                          m_bucket: int = 256, spread: float = 3.0):
    """A stacked multi-agent planning problem: heterogeneous reference paths,
    ±4 m corridors, shared sampling matrix, 4 predicted obstacles per agent.
    Returns (matrices, masks, stacked CycleContext)."""
    import jax.numpy as jnp

    from frenetix_tpu.geometry.corridor import strip_corridor
    from frenetix_tpu.geometry.refpath import prepare_reference_path
    from frenetix_tpu.ops.costs import COST_TERM_ORDER, PredictionTensors
    from frenetix_tpu.ops.kinematics import VehicleParams
    from frenetix_tpu.ops.sampling import build_sampling_matrix, pad_matrix
    from frenetix_tpu.planner.core import CycleContext
    from frenetix_tpu.parallel.mesh import stack_cycle_contexts

    t = np.linspace(0, np.pi / 3, 300)
    mat = build_sampling_matrix(
        t1_vals=np.round(np.arange(1.1, 3.05, 0.3), 2),
        ss1_vals=np.linspace(5, 15, 9), d1_vals=np.linspace(-3, 3, 9),
        x0_lon=(30.0, 10.0, 0.0), x0_lat=(0.0, 0.0, 0.0), dtype=dtype,
    )
    mat, msk = pad_matrix(mat, m_bucket)

    o, t_pred = 4, n_steps
    weights = np.zeros(len(COST_TERM_ORDER), dtype)
    weights[COST_TERM_ORDER.index("velocity_offset")] = 1.0
    weights[COST_TERM_ORDER.index("distance_to_reference_path")] = 5.0

    ctxs = []
    for i in range(a):
        ref = prepare_reference_path(
            np.stack([150 * np.sin(t) + spread * i, 150 * (1 - np.cos(t))], axis=1),
            extension=20.0, dtype=dtype,
        )
        covs = np.tile(np.eye(2, dtype=dtype) * 0.5, (o, t_pred, 1, 1))
        means = np.tile(np.array([60.0 + spread * i, 5.0], dtype), (o, t_pred, 1))
        preds = PredictionTensors(
            means=means, inv_covs=np.linalg.inv(covs).astype(dtype), covs=covs,
            orientations=np.zeros((o, t_pred), dtype),
            velocities=np.full((o, t_pred), 8.0, dtype),
            lengths=np.full((o,), 4.5, dtype), widths=np.full((o,), 1.8, dtype),
            valid=np.ones((o, t_pred), bool),
        )
        ctxs.append(CycleContext(
            ref=ref, veh=VehicleParams(), weights=np.asarray(weights),
            preds=preds, obstacle_xy=means[:, 0], obstacle_valid=preds.valid[:, 0],
            corridor=strip_corridor(ref, 4.0).astype(dtype),
            lane_segments=np.zeros((0, 2, 2), dtype),
            lane_valid=np.zeros((0,), bool),
            x0_orientation=np.asarray(0.2, dtype),
            desired_velocity=np.asarray(10.0, dtype),
            desired_avg_velocity=np.asarray(10.0, dtype),
        ))
    import jax.numpy as jnp

    matrices = jnp.asarray(np.tile(mat[None], (a, 1, 1)))
    masks = jnp.asarray(np.tile(msk[None], (a, 1)))
    return matrices, masks, stack_cycle_contexts(ctxs)


def main(json_path=None):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import multiprocessing

    import jax

    jax.config.update("jax_platforms", "cpu")

    from frenetix_tpu.parallel.mesh import make_agent_mesh, sharded_full_cycle

    report = {
        "physical_cpus": multiprocessing.cpu_count(),
        "virtual_devices": len(jax.devices()),
        "weak_scaling_full_cycle": [],
        "fleet_weak_scaling": [],
    }
    n_steps, dt = 30, 0.1
    agents_per_device = 4
    results = {}
    for n_dev in [1, 2, 4, 8]:
        if n_dev > len(jax.devices()):
            break
        a = agents_per_device * n_dev
        mesh = make_agent_mesh(jax.devices()[:n_dev])
        matrices, masks, ctx = build_stacked_problem(a)
        step = sharded_full_cycle(mesh, dt=dt, n_steps=n_steps)
        out = step(matrices, masks, ctx)
        jax.block_until_ready(out)
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(matrices, masks, ctx)
        jax.block_until_ready(out)
        dt_run = (time.perf_counter() - t0) / reps
        solves_per_sec = a / dt_run
        results[n_dev] = solves_per_sec
        base = results[1]
        eff = solves_per_sec / (base * n_dev)
        print(
            f"devices={n_dev}: agents={a}, {solves_per_sec:.1f} agent-cycles/s, "
            f"apparent efficiency {100*eff:.0f}%"
        )
        report["weak_scaling_full_cycle"].append({
            "devices": n_dev, "agents": a,
            "agent_cycles_per_sec": round(solves_per_sec, 1),
            "apparent_efficiency_pct": round(100 * eff, 1),
        })

    # --- fleet weak scaling: whole SIMULATIONS sharded over the mesh -------
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.parallel.mesh import make_agent_mesh
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    def build_sim(i):
        cfg = load_config()
        cfg.dtype = "float32"
        return DeviceSimulation(Simulation(
            make_highway(length=100.0, lead_gap=45.0 + 2.0 * i, n_steps=80),
            cfg))

    print("\nfleet (whole sims, zero-collective scenario sharding):")
    for n_dev in [1, 2, 4, 8]:
        if n_dev > len(jax.devices()):
            break
        s = 2 * n_dev
        sims = [build_sim(i) for i in range(s)]
        mesh = make_agent_mesh(jax.devices()[:n_dev], axis_name="scenarios")
        run_fleet(sims, mesh=mesh)                        # compile
        t0 = time.perf_counter()
        res = run_fleet(sims, mesh=mesh)
        wall = time.perf_counter() - t0
        total_steps = sum(r.steps for r in res)
        print(f"devices={n_dev}: scenarios={s}, {s/wall:.2f} sims/s, "
              f"{total_steps/wall:.1f} sim-steps/s, "
              f"statuses={sorted(set(int(x) for r in res for x in r.status))}")
        report["fleet_weak_scaling"].append({
            "devices": n_dev, "scenarios": s,
            "sims_per_sec": round(s / wall, 3),
            "sim_steps_per_sec": round(total_steps / wall, 1),
            "all_success": all(int(x) == 2 for r in res for x in r.status),
        })

    note = (
        "virtual CPU devices share one physical CPU (see physical_cpus), so "
        "weak-scaling efficiency here reflects host saturation, not mesh "
        "behavior. What this run validates: the FULL-cycle shard_map program "
        "(boundary + corridor + cost stack) compiles and executes at every "
        "mesh size with a fixed-size per-step collective (one all_gather of "
        "agent poses), and the fleet program (whole simulations, no "
        "collectives) at every mesh size. Real scaling numbers require a "
        "multi-chip slice."
    )
    report["note"] = note
    print("\nNOTE: " + note)
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_path}")


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else None)
