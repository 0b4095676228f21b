"""Device-batched multi-agent stepping: all agents' cycles in ONE computation.

The host-loop Simulation steps agents sequentially (one jit call each); this
module evaluates every running agent's replanning cycle in a single device
program — agents become a leading vmap axis (single chip) that `shard_map`
splits across a mesh (multi-chip; parallel.mesh.sharded_full_cycle with ICI
pose exchange).

Both paths run the COMPLETE cycle (`planner.core.evaluate_cycle` — boundary/
corridor checking, lane-center costs, full cost stack), so batched selections
are bit-identical to the sequential host path on the same inputs (asserted by
tests/test_multichip.py).

This is the TPU answer to the reference's `AgentBatch` worker processes
(SURVEY §2.3 P2): instead of ⌈A/num_procs⌉ agents per OS process exchanging
pickled scenarios through queues, A is an array axis and the "batch
synchronization" is the natural SPMD program order.
"""
from __future__ import annotations

import numpy as np

__all__ = ["BatchedAgentStepper"]


class BatchedAgentStepper:
    """Evaluates a batch of per-agent (matrix, context) cycles in one call.

    Agents must share static config (dt, N, bucket); heterogeneous reference
    paths/corridors are stacked to a common R.  Low-velocity and stopping-mode
    agents are handled by the host path (their cycles use different static
    flags); occlusion phantom rows ride the stacked prediction tensors and
    the safety gate runs inside the fused cycle (mesh._one_agent_select).

    `mesh`: optional jax.sharding.Mesh — when given (and the agent count is
    padded to a mesh multiple) the batch runs through
    `parallel.mesh.sharded_full_cycle` instead of single-device vmap, and
    executed poses are all-gathered over ICI.
    """

    def __init__(self, config, agents, mesh=None):
        import jax.numpy as jnp

        from frenetix_tpu.parallel.mesh import _pad_table

        self.jnp = jnp
        self.config = config
        self.dt = config.planning.dt
        self.n_steps = config.planning.n_steps
        self.agents = agents
        self.mesh = mesh

        dtype = np.float64 if config.dtype == "float64" else np.float32
        self.np_dtype = dtype

        # NOTE: this stacking parallels mesh.stack_cycle_contexts (which
        # stacks full CycleContexts); the equality tests in
        # tests/test_multichip.py (sharded == vmap == sequential) are the
        # guard that both stay semantically in sync.
        refs = [a.planner.ref_np for a in agents]
        r_max = max(r.s.shape[0] for r in refs)
        from frenetix_tpu.geometry.refpath import RefPathTable

        self.ref = RefPathTable(**{
            name: jnp.asarray(np.stack([
                _pad_table(getattr(r, name), r_max, is_pathlength=(name == "s"))
                for r in refs
            ]).astype(dtype))
            for name in RefPathTable._fields
        })
        self.corridors = jnp.asarray(np.stack([
            _pad_table(np.asarray(a.planner.corridor), r_max) for a in agents
        ]).astype(dtype))

        # lane segments (for the lane_center_offset cost), padded to common S
        seg_arrays = [np.asarray(a.planner.lane_segments) for a in agents]
        s_max = max(s.shape[0] for s in seg_arrays)
        if s_max:
            segs, valids = [], []
            for a, s in zip(agents, seg_arrays):
                v = np.asarray(a.planner.lane_valid)
                k = s_max - s.shape[0]
                if k > 0:
                    s = np.concatenate([s, np.zeros((k, 2, 2), s.dtype)], axis=0)
                    v = np.concatenate([v, np.zeros(k, bool)])
                segs.append(s)
                valids.append(v)
            self.lane_segments = jnp.asarray(np.stack(segs).astype(dtype))
            self.lane_valid = jnp.asarray(np.stack(valids))
        else:
            a_n = len(agents)
            self.lane_segments = jnp.zeros((a_n, 0, 2, 2), dtype)
            self.lane_valid = jnp.zeros((a_n, 0), bool)

        # lanelet reach-set responsibility term runs in-batch when weighted
        self.resp_weight = float(config.cost_weights.get("responsibility", 0.0))
        # occlusion safety gate runs in-batch when the module is enabled
        self.use_occlusion = bool(config.occlusion.use_occlusion_module)
        from frenetix_tpu.occlusion import PhantomThresholds

        ew = config.external_cost_weights
        self._occl_kwargs = dict(
            occlusion=self.use_occlusion,
            harm_threshold=float(config.occlusion.harm_threshold),
            risk_threshold=float(config.occlusion.risk_threshold),
            thresholds=PhantomThresholds.from_config(config.occlusion),
            occ_pm_weight=float(ew.get("occ_pm", 0.0)),
            # occ_um/occ_ve soft costs run in-batch too; the host pre-pass
            # gathers the per-agent occluder geometry (polar map + phantom
            # silhouette points) and passes it to step()
            occ_um_weight=float(ew.get("occ_um", 0.0)),
            occ_ve_weight=float(ew.get("occ_ve", 0.0)),
            compensated_sum=bool(config.planning.compensated_cost_sum),
        )
        self.use_occ_geom = self.use_occlusion and (
            self._occl_kwargs["occ_um_weight"] != 0.0
            or self._occl_kwargs["occ_ve_weight"] != 0.0)

        # the program is shape-polymorphic via jit retracing; build once
        self._step_fn = self._build()

    def _build(self):
        if self.mesh is not None:
            from frenetix_tpu.parallel.mesh import sharded_full_cycle

            return sharded_full_cycle(
                self.mesh, dt=self.dt, n_steps=self.n_steps, low_vel_mode=False,
                resp_weight=self.resp_weight, **self._occl_kwargs,
            )
        from frenetix_tpu.parallel.mesh import batched_full_cycle

        fn = batched_full_cycle(
            dt=self.dt, n_steps=self.n_steps, low_vel_mode=False,
            resp_weight=self.resp_weight, **self._occl_kwargs,
        )
        # uniform return shape with the sharded variant: (out, poses_all)
        import jax

        from frenetix_tpu.parallel.mesh import _poses_from

        def wrapped(m, msk, ctx, *extras):
            out = fn(m, msk, ctx, *extras)
            return out, _poses_from(out)

        return jax.jit(wrapped)

    def step(self, matrices, masks, preds_stacked, x0_orients, v_desireds,
             veh, weights, reach_grids=None, phantom_masks=None,
             occ_geom=None):
        """matrices (A, M, 13) … → (dict of (A, ...) selected-trajectory
        arrays, poses_all (A, 4) device-resident).  `reach_grids`: an
        agent-stacked ReachSetGrid (mesh.stack_reach_grids), required iff the
        responsibility cost weight is non-zero.  `phantom_masks`: (A, O) bool
        marking occlusion-phantom prediction rows, required iff the occlusion
        module is enabled (the in-batch safety gate).  `occ_geom`:
        (ego (A,2), r_vis (A,K), pts (A,Q,2), pts_valid (A,Q)) per-agent
        occluder geometry, required iff occ_um/occ_ve are weighted."""
        from frenetix_tpu.planner.core import CycleContext

        jnp = self.jnp
        ctx = CycleContext(
            ref=self.ref,
            veh=veh,
            weights=weights,
            preds=preds_stacked,
            obstacle_xy=preds_stacked.means[:, :, 0],
            obstacle_valid=preds_stacked.valid[:, :, 0],
            corridor=self.corridors,
            lane_segments=self.lane_segments,
            lane_valid=self.lane_valid,
            x0_orientation=jnp.asarray(x0_orients),
            desired_velocity=jnp.asarray(v_desireds),
            desired_avg_velocity=jnp.asarray(v_desireds),
        )
        extras = []
        if self.resp_weight != 0.0:
            if reach_grids is None:
                raise ValueError("responsibility weight is non-zero but no "
                                 "reach grids were passed to step()")
            extras.append(reach_grids)
        if self.use_occlusion:
            if phantom_masks is None:
                raise ValueError("occlusion module is enabled but no phantom "
                                 "masks were passed to step()")
            extras.append(jnp.asarray(phantom_masks))
            if self.use_occ_geom:
                if occ_geom is None:
                    raise ValueError(
                        "occ_um/occ_ve are weighted but no occluder geometry "
                        "was passed to step()")
                extras.extend(jnp.asarray(x) for x in occ_geom)
        out, poses_all = self._step_fn(
            jnp.asarray(matrices), jnp.asarray(masks), ctx, *extras
        )
        return out, poses_all
