"""Device-batched multi-agent stepping: all agents' cycles in ONE computation.

The host-loop Simulation steps agents sequentially (one jit call each); this
module evaluates every running agent's replanning cycle in a single device
program — agents become a leading vmap axis (single chip) that `shard_map`
splits across a mesh (multi-chip; see parallel.mesh for the collective-based
variant with ICI pose exchange).

This is the TPU answer to the reference's `AgentBatch` worker processes
(SURVEY §2.3 P2): instead of ⌈A/num_procs⌉ agents per OS process exchanging
pickled scenarios through queues, A is an array axis and the "batch
synchronization" is the natural SPMD program order.
"""
from __future__ import annotations

import functools

import numpy as np

__all__ = ["BatchedAgentStepper"]


class BatchedAgentStepper:
    """Evaluates a batch of per-agent (matrix, context) cycles in one call.

    Agents must share static config (dt, N, bucket); heterogeneous reference
    paths are stacked to a common R (parallel.mesh.stack_contexts).
    """

    def __init__(self, config, agents):
        import jax
        import jax.numpy as jnp

        from frenetix_tpu.parallel.mesh import stack_contexts

        self.jnp = jnp
        self.config = config
        self.dt = config.planning.dt
        self.n_steps = config.planning.n_steps
        self.agents = agents

        refs = [a.planner.ref_np for a in agents]
        stacked_ref, _, _ = stack_contexts(
            refs,
            x0_orientations=np.zeros(len(agents)),
            desired_velocities=np.zeros(len(agents)),
            preds=None, weights=None,
        )
        dtype = np.float64 if config.dtype == "float64" else np.float32
        self.ref = type(stacked_ref)(
            *(jnp.asarray(f.astype(dtype)) for f in stacked_ref)
        )
        # per-agent corridors, padded to the common R
        r_max = self.ref.s.shape[1]
        cors = []
        for a in agents:
            c = np.asarray(a.planner.corridor)
            if len(c) < r_max:
                c = np.concatenate([c, np.repeat(c[-1:], r_max - len(c), axis=0)])
            cors.append(c[:r_max])
        self.corridors = jnp.asarray(np.stack(cors).astype(dtype))
        self.np_dtype = dtype

        self._step_fn = None

    def _build(self, m_rows, o_obs, t_pred):
        import jax

        from frenetix_tpu.ops import collision as coll
        from frenetix_tpu.ops import costs as costs_mod
        from frenetix_tpu.ops.kinematics import rollout_candidates

        dt, n_steps = self.dt, self.n_steps

        def one_agent(matrix, mask, ref, corridor, preds, x0_th, v_des, veh, weights):
            ro = rollout_candidates(
                matrix, ref, veh, dt=dt, n_steps=n_steps, low_vel_mode=False,
                x0_orientation=x0_th, extra_ref_tables=corridor,
            )
            terms = costs_mod.compute_cost_terms(
                ro, dt=dt, desired_velocity=v_des, preds=preds,
                obstacle_xy=preds.means[:, 0], obstacle_valid=preds.valid[:, 0],
            )
            cost = costs_mod.weighted_total(terms, weights)
            collides = coll.prediction_collisions(ro, preds, veh)
            b_step, v_at = coll.road_departure_corridor(ro, veh)
            sel = ro.feasible & ro.valid & ~collides & (b_step < 0) & mask
            masked = self.jnp.where(sel, cost, 1e15)
            best = self.jnp.argmin(masked)
            return dict(
                best=best, found=self.jnp.any(sel), cost=cost[best],
                x=ro.x[best], y=ro.y[best], theta=ro.theta_gl[best],
                v=ro.v[best], a=ro.a[best], kappa=ro.kappa_gl[best],
                s=ro.s[best], s_dot=ro.s_vel[best], s_ddot=ro.s_acc[best],
                d=ro.d[best], d_dot=ro.d_vel[best], d_ddot=ro.d_acc[best],
                terms=terms[best],
            )

        batched = jax.vmap(
            one_agent,
            in_axes=(0, 0, 0, 0, 0, 0, 0, None, None),
        )
        return jax.jit(batched)

    def step(self, matrices, masks, preds_stacked, x0_orients, v_desireds,
             veh, weights):
        """matrices (A, M, 13) … → dict of (A, ...) selected-trajectory arrays."""
        key = (matrices.shape[1], preds_stacked.means.shape[1],
               preds_stacked.means.shape[2])
        if self._step_fn is None or self._key != key:
            self._step_fn = self._build(*key)
            self._key = key
        jnp = self.jnp
        return self._step_fn(
            jnp.asarray(matrices), jnp.asarray(masks), self.ref, self.corridors,
            preds_stacked, jnp.asarray(x0_orients), jnp.asarray(v_desireds),
            veh, weights,
        )
