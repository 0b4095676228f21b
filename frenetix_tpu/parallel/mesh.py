"""Multi-agent planning sharded over a TPU device mesh.

Replaces the reference's process-pool agent parallelism — `AgentBatch`
worker processes exchanging pickled CommonRoad objects over
`multiprocessing.Queue`s (cr_scenario_handler/simulation/agent_batch.py:19-222,
simulation.py:410-471, SURVEY.md §2.3 P2 / §2.4) — with the TPU-native layout:

  - agents are a *leading array axis* A over the whole cycle computation
    (vmap of the fused cycle),
  - the agent axis is sharded over the mesh with `shard_map`,
  - the only cross-agent communication is one `all_gather` of executed poses
    per step (the analog of the reference's scenario-mutation sync,
    simulation.py:743-779), riding ICI — no pickling, no queues, no timeouts.

Per-agent reference paths are stacked tables (A, R, ...), padded to a common R
on host, so heterogeneous roads shard with their agents.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frenetix_tpu.geometry.refpath import RefPathTable
from frenetix_tpu.ops import collision as coll
from frenetix_tpu.ops import costs as costs_mod
from frenetix_tpu.ops.kinematics import rollout_candidates

__all__ = ["make_agent_mesh", "stack_contexts", "multi_agent_cycle_sharded"]


def make_agent_mesh(devices=None, axis_name: str = "agents") -> Mesh:
    """1-D mesh over all (or given) devices; agents shard along it."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def stack_contexts(refs, x0_orientations, desired_velocities, preds, weights):
    """Host helper: per-agent RefPathTables (padded to common R by repeating the
    last vertex) + scalars → pytrees with a leading agent axis."""
    import numpy as np

    r_max = max(r.s.shape[0] for r in refs)

    def pad_field(name):
        out = []
        for r in refs:
            a = np.asarray(getattr(r, name))
            k = r_max - a.shape[0]
            if k > 0:
                # extend pathlength monotonically; repeat everything else
                if name == "s":
                    step = a[-1] - a[-2]
                    ext = a[-1] + step * np.arange(1, k + 1)
                    a = np.concatenate([a, ext])
                else:
                    a = np.concatenate([a, np.repeat(a[-1:], k, axis=0)])
            out.append(a)
        return np.stack(out)

    stacked_ref = RefPathTable(
        xy=pad_field("xy"), s=pad_field("s"), theta=pad_field("theta"),
        kappa=pad_field("kappa"), kappa_d=pad_field("kappa_d"),
        kappa_dd=pad_field("kappa_dd"),
    )
    return stacked_ref, jnp.asarray(x0_orientations), jnp.asarray(desired_velocities)


def _single_agent_cycle(matrix, valid_mask, ref, x0_orientation, desired_velocity,
                        preds, veh, weights, dt, n_steps, low_vel_mode):
    """One agent's cycle body (non-jitted inner; vmapped + shard_mapped)."""
    ro = rollout_candidates(
        matrix, ref, veh, dt=dt, n_steps=n_steps, low_vel_mode=low_vel_mode,
        x0_orientation=x0_orientation,
    )
    cost_terms = costs_mod.compute_cost_terms(
        ro, dt=dt, desired_velocity=desired_velocity, preds=preds,
        obstacle_xy=preds.means[:, 0], obstacle_valid=preds.valid[:, 0],
    )
    cost = costs_mod.weighted_total(cost_terms, weights)
    collides = coll.prediction_collisions(ro, preds, veh)
    selectable = ro.feasible & ro.valid & ~collides & valid_mask
    masked = jnp.where(selectable, cost, 1e15)
    best = jnp.argmin(masked)
    # executed pose of the argmin trajectory at the next control step
    nxt = jnp.minimum(1, n_steps)
    pose = jnp.stack([ro.x[best, nxt], ro.y[best, nxt], ro.theta_gl[best, nxt],
                      ro.v[best, nxt]])
    return best, jnp.any(selectable), pose, cost[best]


def multi_agent_cycle_sharded(
    mesh: Mesh,
    *,
    dt: float,
    n_steps: int,
    low_vel_mode: bool = False,
    axis_name: str = "agents",
):
    """Build the jitted sharded multi-agent step.

    Returns fn(matrices (A,M,13), masks (A,M), stacked_ref (A,...), x0_th (A,),
    v_des (A,), preds_stacked (A,...), veh, weights) →
    (best (A,), found (A,), poses_all (A, 4), costs (A,)).

    A must be divisible by the mesh size.  Inside the shard the per-agent
    cycles run vmapped; executed poses are all-gathered across the mesh (the
    cross-agent occupancy exchange) before returning.
    """

    def sharded_body(matrices, masks, ref, x0_th, v_des, preds, veh, weights):
        body = functools.partial(
            _single_agent_cycle, dt=dt, n_steps=n_steps, low_vel_mode=low_vel_mode,
        )
        best, found, poses, best_cost = jax.vmap(
            lambda m, vm, r, th, dv, pr: body(m, vm, r, th, dv, pr, veh, weights)
        )(matrices, masks, ref, x0_th, v_des, preds)
        # cross-agent occupancy exchange over ICI: every shard sees all poses
        poses_all = jax.lax.all_gather(poses, axis_name, axis=0, tiled=True)
        return best, found, poses_all, best_cost

    spec_sharded = P(axis_name)
    spec_repl = P()

    fn = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(spec_sharded,) * 6 + (spec_repl, spec_repl),
        out_specs=(spec_sharded, spec_sharded, spec_repl, spec_sharded),
        check_vma=False,  # all_gather output is replicated; checker can't infer
    )
    return jax.jit(fn)
