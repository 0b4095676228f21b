"""Scaling benchmark: agent-sharded planning throughput across a device mesh.

Measures cycles/sec (per-agent replanning "solves") at 1, 2, 4, 8 devices with
fixed per-device load (weak scaling) through the shard_map multi-agent path
(parallel.mesh) — the harness behind the ≥80%-linear-scaling target
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


def main():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frenetix_tpu.geometry.refpath import prepare_reference_path
    from frenetix_tpu.ops.costs import COST_TERM_ORDER, PredictionTensors
    from frenetix_tpu.ops.kinematics import VehicleParams
    from frenetix_tpu.ops.sampling import build_sampling_matrix, pad_matrix
    from frenetix_tpu.parallel.mesh import (
        make_agent_mesh, multi_agent_cycle_sharded, stack_contexts,
    )

    dtype = np.float32
    n_steps = 30
    dt = 0.1
    agents_per_device = 4

    results = {}
    for n_dev in [1, 2, 4, 8]:
        if n_dev > len(jax.devices()):
            break
        a = agents_per_device * n_dev
        mesh = make_agent_mesh(jax.devices()[:n_dev])

        t = np.linspace(0, np.pi / 3, 300)
        refs = [
            prepare_reference_path(
                np.stack([150 * np.sin(t) + 3 * i, 150 * (1 - np.cos(t))], axis=1),
                extension=20.0, dtype=dtype,
            )
            for i in range(a)
        ]
        stacked_ref, x0_th, v_des = stack_contexts(
            refs, np.full(a, 0.2, dtype), np.full(a, 10.0, dtype), None, None
        )
        stacked_ref = type(stacked_ref)(
            *(jnp.asarray(f.astype(dtype)) for f in stacked_ref)
        )

        mat = build_sampling_matrix(
            t1_vals=np.round(np.arange(1.1, 3.05, 0.3), 2),
            ss1_vals=np.linspace(5, 15, 9), d1_vals=np.linspace(-3, 3, 9),
            x0_lon=(30.0, 10.0, 0.0), x0_lat=(0.0, 0.0, 0.0), dtype=dtype,
        )
        mat, msk = pad_matrix(mat, 256)
        matrices = jnp.asarray(np.tile(mat[None], (a, 1, 1)))
        masks = jnp.asarray(np.tile(msk[None], (a, 1)))

        o, t_pred = 4, n_steps
        means = np.tile(np.array([60.0, 5.0], dtype), (a, o, t_pred, 1))
        covs = np.tile(np.eye(2, dtype=dtype) * 0.5, (a, o, t_pred, 1, 1))
        preds = PredictionTensors(
            means=jnp.asarray(means),
            inv_covs=jnp.asarray(np.linalg.inv(covs).astype(dtype)),
            covs=jnp.asarray(covs),
            orientations=jnp.zeros((a, o, t_pred), dtype),
            velocities=jnp.full((a, o, t_pred), 8.0, dtype),
            lengths=jnp.full((a, o), 4.5, dtype),
            widths=jnp.full((a, o), 1.8, dtype),
            valid=jnp.ones((a, o, t_pred), bool),
        )
        weights = np.zeros(len(COST_TERM_ORDER), dtype)
        weights[COST_TERM_ORDER.index("velocity_offset")] = 1.0
        weights[COST_TERM_ORDER.index("distance_to_reference_path")] = 5.0

        step = multi_agent_cycle_sharded(mesh, dt=dt, n_steps=n_steps)
        args = (matrices, masks, stacked_ref, jnp.asarray(x0_th),
                jnp.asarray(v_des), preds, VehicleParams(), jnp.asarray(weights))
        out = step(*args)
        jax.block_until_ready(out[0])
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(*args)
        jax.block_until_ready(out[0])
        dt_run = (time.perf_counter() - t0) / reps
        solves_per_sec = a / dt_run
        results[n_dev] = solves_per_sec
        base = results[1]
        eff = solves_per_sec / (base * n_dev)
        print(
            f"devices={n_dev}: agents={a}, {solves_per_sec:.1f} agent-cycles/s, "
            f"apparent efficiency {100*eff:.0f}%"
        )

    print(
        "\nNOTE: virtual CPU devices share one physical CPU, so weak-scaling "
        "efficiency here reflects host saturation, not mesh behavior. What this "
        "run validates: the shard_map program compiles and executes at every "
        "mesh size with a fixed-size per-step collective (one all_gather of "
        "agent poses). Real scaling numbers require a multi-chip slice."
    )


if __name__ == "__main__":
    main()
