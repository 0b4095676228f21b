"""Multi-agent planning sharded over a TPU device mesh — FULL cycle.

Replaces the reference's process-pool agent parallelism — `AgentBatch`
worker processes exchanging pickled CommonRoad objects over
`multiprocessing.Queue`s (cr_scenario_handler/simulation/agent_batch.py:19-222,
simulation.py:410-471, SURVEY.md §2.3 P2 / §2.4) — with the TPU-native layout:

  - agents are a *leading array axis* A over the COMPLETE replanning cycle
    (`planner.core.evaluate_cycle` — polynomials, Frenet→Cartesian,
    feasibility, the full cost stack incl. lane-center costs, prediction
    collisions AND road-boundary/corridor checking) — not a reduced subset,
  - the agent axis is sharded over the mesh with `shard_map`; inside a shard
    the per-agent cycles run vmapped,
  - the only cross-agent communication is one `all_gather` of executed poses
    per step (the analog of the reference's scenario-mutation sync,
    simulation.py:743-779), riding ICI — no pickling, no queues, no timeouts,
  - gathered poses stay device-resident: `agent_pose_predictions` rebuilds
    the per-agent obstacle tensors for the NEXT cycle on device
    (SURVEY §2.4 "all-gather of executed poses → rebuild per-agent obstacle
    tensors on-device").

Per-agent reference paths/corridors are stacked tables (A, R, ...), padded to
a common R on host, so heterogeneous roads shard with their agents.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from frenetix_tpu.geometry.refpath import RefPathTable
from frenetix_tpu.ops.costs import PredictionTensors
from frenetix_tpu.planner.core import CycleContext, evaluate_cycle
from frenetix_tpu.risk.reachable_set import ReachSetGrid

__all__ = [
    "make_agent_mesh",
    "stack_cycle_contexts",
    "stack_reach_grids",
    "batched_full_cycle",
    "sharded_full_cycle",
    "agent_pose_predictions",
    "agent_plan_predictions",
    "concat_obstacles",
    "CTX_IN_AXES",
    "CTX_PSPECS",
    "GRID_IN_AXES",
]

# selected-trajectory fields returned per agent (Rollout attr → output key)
_SEL_FIELDS = (
    ("x", "x"), ("y", "y"), ("theta_gl", "theta"), ("v", "v"), ("a", "a"),
    ("kappa_gl", "kappa"), ("s", "s"), ("s_vel", "s_dot"), ("s_acc", "s_ddot"),
    ("d", "d"), ("d_vel", "d_dot"), ("d_acc", "d_ddot"),
)


def make_agent_mesh(devices=None, axis_name: str = "agents") -> Mesh:
    """1-D mesh over all (or given) devices; agents shard along it."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def _pad_table(a, r_max, is_pathlength=False):
    import numpy as np

    a = np.asarray(a)
    k = r_max - a.shape[0]
    if k <= 0:
        return a[:r_max]
    if is_pathlength:
        step = a[-1] - a[-2]
        return np.concatenate([a, a[-1] + step * np.arange(1, k + 1)])
    return np.concatenate([a, np.repeat(a[-1:], k, axis=0)])


def stack_cycle_contexts(ctxs: list[CycleContext]) -> CycleContext:
    """Stack per-agent CycleContexts along a new leading agent axis.

    Reference tables + corridors are padded to a common R, lane segments to a
    common S, predictions to a common O (they normally already match — the
    prediction pipeline pads to max_obstacles).  `veh` and `weights` must be
    shared across agents (they are config-level) and stay unstacked.
    """
    import numpy as np

    r_max = max(int(c.ref.s.shape[0]) for c in ctxs)
    s_max = max(int(c.lane_segments.shape[0]) for c in ctxs)
    o_max = max(int(c.preds.means.shape[0]) for c in ctxs)

    def stack_ref():
        fields = {}
        for name in RefPathTable._fields:
            fields[name] = jnp.asarray(np.stack([
                _pad_table(getattr(c.ref, name), r_max, is_pathlength=(name == "s"))
                for c in ctxs
            ]))
        return RefPathTable(**fields)

    def pad0(a, n):
        a = np.asarray(a)
        if a.shape[0] >= n:
            return a[:n]
        pad = np.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)
        return np.concatenate([a, pad], axis=0)

    def stack_preds():
        fields = {}
        for name in PredictionTensors._fields:
            fields[name] = jnp.asarray(
                np.stack([pad0(getattr(c.preds, name), o_max) for c in ctxs])
            )
        return PredictionTensors(**fields)

    return CycleContext(
        ref=stack_ref(),
        veh=ctxs[0].veh,
        weights=ctxs[0].weights,
        preds=stack_preds(),
        obstacle_xy=jnp.asarray(np.stack([pad0(c.obstacle_xy, o_max) for c in ctxs])),
        obstacle_valid=jnp.asarray(np.stack([pad0(c.obstacle_valid, o_max) for c in ctxs])),
        corridor=jnp.asarray(np.stack([_pad_table(c.corridor, r_max) for c in ctxs])),
        lane_segments=jnp.asarray(np.stack([pad0(c.lane_segments, s_max) for c in ctxs])),
        lane_valid=jnp.asarray(np.stack([pad0(c.lane_valid, s_max) for c in ctxs])),
        x0_orientation=jnp.stack([jnp.asarray(c.x0_orientation) for c in ctxs]),
        desired_velocity=jnp.stack([jnp.asarray(c.desired_velocity) for c in ctxs]),
        desired_avg_velocity=jnp.stack([jnp.asarray(c.desired_avg_velocity) for c in ctxs]),
    )


def stack_reach_grids(grids: list[ReachSetGrid]) -> ReachSetGrid:
    """Stack per-agent ReachSetGrids along a new leading agent axis.

    All grids must share O/T/G (they do — the prediction pipeline pads every
    agent's obstacles to the same slot count, and the grid builder's t/grid
    params are config-level).  `dt_rs` stays a shared scalar."""
    import numpy as np

    return ReachSetGrid(
        origin=jnp.asarray(np.stack([np.asarray(g.origin) for g in grids])),
        occupancy=jnp.asarray(np.stack([np.asarray(g.occupancy) for g in grids])),
        valid=jnp.asarray(np.stack([np.asarray(g.valid) for g in grids])),
        cell=jnp.asarray(np.stack([np.asarray(g.cell) for g in grids])),
        dt_rs=grids[0].dt_rs,
    )


def _default_obstacle_meta(preds):
    """Device-side default crash metadata, inferred from footprint (same
    shared formula as ReactivePlanner._default_meta — see
    risk.harm.meta_from_footprint)."""
    from frenetix_tpu.risk.harm import meta_from_footprint

    return meta_from_footprint(preds.lengths, preds.widths, xp=jnp,
                               dtype=preds.means.dtype)


# vmap axes over a stacked CycleContext: everything per-agent except the
# config-level vehicle parameters and cost weights
CTX_IN_AXES = CycleContext(
    ref=0, veh=None, weights=None, preds=0,
    obstacle_xy=0, obstacle_valid=0, corridor=0,
    lane_segments=0, lane_valid=0,
    x0_orientation=0, desired_velocity=0, desired_avg_velocity=0,
)


def _ctx_pspecs(axis_name: str) -> CycleContext:
    """shard_map PartitionSpecs (prefix pytree) matching CTX_IN_AXES."""
    sh, rep = P(axis_name), P()
    return CycleContext(
        ref=sh, veh=rep, weights=rep, preds=sh,
        obstacle_xy=sh, obstacle_valid=sh, corridor=sh,
        lane_segments=sh, lane_valid=sh,
        x0_orientation=sh, desired_velocity=sh, desired_avg_velocity=sh,
    )


CTX_PSPECS = _ctx_pspecs  # exported for callers building their own programs

# vmap axes over a stacked ReachSetGrid (dt_rs is a shared scalar)
GRID_IN_AXES = ReachSetGrid(origin=0, occupancy=0, valid=0, cell=0, dt_rs=None)


def _one_agent_select(matrix, mask, ctx, grid=None, phantom_mask=None,
                      occ_geom=None, *, dt,
                      n_steps, low_vel_mode, table_window, resp_weight=0.0,
                      harm_threshold=0.1, risk_threshold=1.0, thresholds=None,
                      occ_pm_weight=0.0, occ_um_weight=0.0, occ_ve_weight=0.0,
                      compensated_sum=False):
    """One agent's FULL cycle + on-device selection gather.

    With `resp_weight` ≠ 0 and a per-agent ReachSetGrid, the lanelet
    reach-set responsibility term is added before selection — the in-batch
    equivalent of ReactivePlanner._apply_responsibility (same math: risk
    stack → reach-grid membership → cost += w·term → re-argmin over
    selectable).

    With a `phantom_mask` (O,) bool, the occlusion safety gate runs on
    device — the in-batch equivalent of the host gate in
    ReactivePlanner.plan (planner/reactive.py; reference planner.py:337-339,
    385-389): candidates whose per-phantom risk exceeds the thresholds are
    removed from `selectable` before the argmin.  When NO candidate passes
    the gate, `found` comes back False and the agent falls back to the host
    path, which re-runs densification + the fallback ladder with the same
    gate — matching the sequential semantics."""
    res = evaluate_cycle(
        matrix, mask, ctx, dt=dt, n_steps=n_steps, low_vel_mode=low_vel_mode,
        check_boundary=True, table_window=table_window,
        compensated_sum=compensated_sum,
    )
    use_resp = resp_weight != 0.0 and grid is not None
    use_gate = phantom_mask is not None
    cost, selectable = res.cost, res.selectable
    if use_resp or use_gate:
        from frenetix_tpu.risk.costs import trajectory_risks

        risks = trajectory_risks(
            res.rollout, ctx.preds, _default_obstacle_meta(ctx.preds),
            ctx.veh.mass,
        )
    if use_resp:
        from frenetix_tpu.risk.reachable_set import responsibility_reach_grid

        term = responsibility_reach_grid(res.rollout, grid, risks, dt)
        cost = cost + resp_weight * term
    if use_gate:
        # the SAME shared gate as the host path
        # (OcclusionModule.trajectory_safety_assessment)
        from frenetix_tpu.occlusion import (
            PhantomThresholds, external_occlusion_costs, phantom_safety_mask,
        )

        thr = thresholds or PhantomThresholds(harm=harm_threshold,
                                              risk=risk_threshold)
        safe = phantom_safety_mask(risks, phantom_mask, thr,
                                   rollout=res.rollout, preds=ctx.preds,
                                   veh=ctx.veh, dt=dt)
        selectable = selectable & safe
        if occ_pm_weight or occ_um_weight or occ_ve_weight:
            # all three external soft costs run in-batch; occ_um/occ_ve
            # consume the per-agent occluder geometry (ego, polar map,
            # phantom silhouette points) gathered by the host pre-pass
            # (OcclusionModule.polar_map/occluder_points) or built on
            # device (parallel.device_sim)
            ego = r_vis = pts = pts_valid = None
            if occ_geom is not None:
                ego, r_vis, pts, pts_valid = occ_geom
            cost = cost + external_occlusion_costs(
                res.rollout, w_pm=occ_pm_weight, w_um=occ_um_weight,
                w_ve=occ_ve_weight, risks=risks, phantom_mask=phantom_mask,
                ego=ego, r_vis=r_vis, occluder_pts=pts,
                occluder_valid=pts_valid,
            )
    if use_resp or use_gate:
        masked = jnp.where(selectable, cost, jnp.inf)
        found = jnp.any(selectable)
        b = jnp.where(found, jnp.argmin(masked), res.best_idx).astype(jnp.int32)
    else:
        b, found = res.best_idx, res.found
    out = {key: getattr(res.rollout, attr)[b] for attr, key in _SEL_FIELDS}
    out.update(
        best=b, found=found, cost=cost[b], terms=res.cost_terms[b],
        histogram=res.histogram,
    )
    return out


def _extra_axes(resp_weight, occlusion, occ_geom=False):
    """vmap in_axes for the optional trailing args, in their fixed order:
    ReachSetGrid (iff resp_weight ≠ 0), phantom masks (iff occlusion),
    occluder geometry ego/r_vis/pts/pts_valid (iff occ_geom)."""
    axes = []
    if resp_weight != 0.0:
        axes.append(GRID_IN_AXES)
    if occlusion:
        axes.append(0)
    if occ_geom:
        axes.extend([0, 0, 0, 0])
    return tuple(axes)


def _vmapped_body(dt, n_steps, low_vel_mode, table_window, resp_weight=0.0,
                  occlusion=False, harm_threshold=0.1, risk_threshold=1.0,
                  thresholds=None, occ_pm_weight=0.0, compensated_sum=False,
                  occ_um_weight=0.0, occ_ve_weight=0.0):
    use_grid = resp_weight != 0.0
    use_geom = occlusion and (occ_um_weight != 0.0 or occ_ve_weight != 0.0)

    def body(matrix, mask, ctx, *extras):
        i = 0
        grid = pm = occ_geom = None
        if use_grid:
            grid, i = extras[0], 1
        if occlusion:
            pm, i = extras[i], i + 1
            if use_geom:
                occ_geom = tuple(extras[i:i + 4])
        return _one_agent_select(
            matrix, mask, ctx, grid, pm, occ_geom, dt=dt, n_steps=n_steps,
            low_vel_mode=low_vel_mode, table_window=table_window,
            resp_weight=resp_weight, harm_threshold=harm_threshold,
            risk_threshold=risk_threshold, thresholds=thresholds,
            occ_pm_weight=occ_pm_weight, occ_um_weight=occ_um_weight,
            occ_ve_weight=occ_ve_weight, compensated_sum=compensated_sum,
        )

    return jax.vmap(
        body, in_axes=(0, 0, CTX_IN_AXES,
                       *_extra_axes(resp_weight, occlusion, use_geom))
    )


def batched_full_cycle(*, dt, n_steps, low_vel_mode=False, table_window=768,
                       resp_weight=0.0, occlusion=False, harm_threshold=0.1,
                       risk_threshold=1.0, thresholds=None, occ_pm_weight=0.0,
                       compensated_sum=False, occ_um_weight=0.0,
                       occ_ve_weight=0.0):
    """Single-device (vmap) full multi-agent cycle.

    Returns fn(matrices (A,M,13), masks (A,M), stacked_ctx, *extras) → dict of
    (A,...) selected-trajectory arrays + best/found/cost/terms/histogram.
    Extras, in order: with `resp_weight` ≠ 0 an agent-stacked ReachSetGrid
    (`stack_reach_grids`, selection includes the responsibility term); with
    `occlusion=True` an (A, O) bool phantom-row mask (selection applies the
    occlusion safety gate on device); with occ_um/occ_ve weighted, the
    per-agent occluder geometry ego (A,2), r_vis (A,K), pts (A,Q,2),
    pts_valid (A,Q).
    """
    return jax.jit(_vmapped_body(dt, n_steps, low_vel_mode, table_window,
                                 resp_weight, occlusion, harm_threshold,
                                 risk_threshold, thresholds, occ_pm_weight,
                                 compensated_sum, occ_um_weight,
                                 occ_ve_weight))


def _poses_from(out):
    """Executed pose of every agent at the next control step."""
    return jnp.stack(
        [out["x"][:, 1], out["y"][:, 1], out["theta"][:, 1], out["v"][:, 1]],
        axis=-1,
    )


def sharded_full_cycle(
    mesh: Mesh,
    *,
    dt: float,
    n_steps: int,
    low_vel_mode: bool = False,
    table_window: int = 768,
    axis_name: str = "agents",
    resp_weight: float = 0.0,
    occlusion: bool = False,
    harm_threshold: float = 0.1,
    risk_threshold: float = 1.0,
    thresholds=None,
    occ_pm_weight: float = 0.0,
    compensated_sum: bool = False,
    occ_um_weight: float = 0.0,
    occ_ve_weight: float = 0.0,
):
    """Mesh-sharded full multi-agent cycle with ICI pose exchange.

    fn(matrices (A,M,13), masks (A,M), stacked_ctx, *extras) → (out, poses_all)
    where `out` is the per-agent selection dict (sharded along the agent axis)
    and `poses_all` (A, 4: x,y,θ,v) is replicated on every device (all_gather)
    — feed it to `agent_pose_predictions` to build the next cycle's obstacle
    tensors without ever leaving the device.

    A must be divisible by the mesh size (pad with dummy agents whose masks
    are all-False; their `found` comes back False).  Extras (sharded along
    the agent axis like the contexts), in order: an agent-stacked
    ReachSetGrid iff `resp_weight` ≠ 0; an (A, O) phantom-row mask iff
    `occlusion` (see `batched_full_cycle`).
    """
    vbody = _vmapped_body(dt, n_steps, low_vel_mode, table_window, resp_weight,
                          occlusion, harm_threshold, risk_threshold, thresholds,
                          occ_pm_weight, compensated_sum, occ_um_weight,
                          occ_ve_weight)
    sh, rep = P(axis_name), P()

    def sharded_body(matrices, masks, ctx, *extras):
        out = vbody(matrices, masks, ctx, *extras)
        poses = _poses_from(out)
        poses_all = jax.lax.all_gather(poses, axis_name, axis=0, tiled=True)
        return out, poses_all

    extra_specs = []
    if resp_weight != 0.0:
        extra_specs.append(ReachSetGrid(origin=sh, occupancy=sh, valid=sh,
                                        cell=sh, dt_rs=rep))
    if occlusion:
        extra_specs.append(sh)
        if occ_um_weight != 0.0 or occ_ve_weight != 0.0:
            extra_specs.extend([sh, sh, sh, sh])
    in_specs = (sh, sh, _ctx_pspecs(axis_name), *extra_specs)

    fn = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis_name), P()),
        check_vma=False,  # all_gather output is replicated; checker can't infer
    )
    return jax.jit(fn)


@functools.partial(jax.jit, static_argnames=("horizon",))
def agent_pose_predictions(
    poses_all: jnp.ndarray,
    *,
    horizon: int,
    dt: float,
    length: float,
    width: float,
    cov_pos: float,
    active=None,
):
    """Device-side obstacle tensors from gathered agent poses.

    poses_all (A, 4: x,y,θ,v) → PredictionTensors with O=A obstacles per
    agent: constant-velocity extrapolation of every agent's executed pose
    (the device-resident replacement for the host's `_augment_with_agents`,
    sim/simulation.py).  `valid[i, j] = (i != j)` masks each agent's own row;
    an optional `active` (A,) bool additionally masks terminated agents
    (they leave the world, like the host's status filter).

    Returns a PredictionTensors whose leading axis is the observing agent —
    concatenate with scenario-obstacle tensors along the obstacle axis.
    """
    a = poses_all.shape[0]
    dtype = poses_all.dtype
    pos, th, v = poses_all[:, :2], poses_all[:, 2], poses_all[:, 3]
    steps = (jnp.arange(1, horizon + 1, dtype=dtype) * dt)          # (T,)
    heading = jnp.stack([jnp.cos(th), jnp.sin(th)], axis=-1)        # (A, 2)
    base_means = pos[:, None, :] + (v[:, None] * steps[None, :])[:, :, None] * heading[:, None, :]  # (A, T, 2)

    means = jnp.broadcast_to(base_means[None], (a, a, horizon, 2))
    orientations = jnp.broadcast_to(th[None, :, None], (a, a, horizon))
    velocities = jnp.broadcast_to(v[None, :, None], (a, a, horizon))
    cov = jnp.eye(2, dtype=dtype) * jnp.maximum(cov_pos, 0.1)
    covs = jnp.broadcast_to(cov, (a, a, horizon, 2, 2))
    inv_covs = jnp.broadcast_to(
        jnp.eye(2, dtype=dtype) / jnp.maximum(cov_pos, 0.1), (a, a, horizon, 2, 2)
    )
    not_self = ~jnp.eye(a, dtype=bool)
    if active is not None:
        not_self = not_self & active[None, :]
    valid = jnp.broadcast_to(not_self[:, :, None], (a, a, horizon))
    lengths = jnp.full((a, a), length, dtype)
    widths = jnp.full((a, a), width, dtype)
    return PredictionTensors(
        means=means, inv_covs=inv_covs, covs=covs, orientations=orientations,
        velocities=velocities, lengths=lengths, widths=widths, valid=valid,
    )


def agent_plan_predictions(
    bank: jnp.ndarray,
    bank_len: jnp.ndarray,
    offset,
    *,
    horizon: int,
    length: float,
    width: float,
    cov_pos: float,
    active=None,
):
    """Ground-truth peer rows from the carried plan bank (VERDICT r4 #2).

    `bank` (A, W, 4: center x, y, θ, v): each agent's currently-executing
    plan — bank[j] is its state `j` steps after the bank's replan step.
    `offset` (traced int): index of the first predicted step — k+1 during
    the scan (the peers' plans were selected one cycle ago and executed k
    sub-steps), 1 at cycle 0 (the bank seed holds recorded/CV states from
    the current step).  Row i gathers bank[offset+i], clamped to
    bank_len−1 — identical to the host's last-valid-pose padding
    (`Simulation._peer_future`) — and valid while offset+i < bank_len.

    This is the device twin of the reference's `update_scenario` + GT
    prediction chain (each dummy carries executed history + the planned
    trajectory; the predictor reads it), replacing CV pose extrapolation.
    """
    a, w = bank.shape[0], bank.shape[1]
    dtype = bank.dtype
    idx = offset + jnp.arange(horizon)                              # (T,)
    idx_c = jnp.minimum(idx[None, :], bank_len[:, None] - 1)        # (A, T)
    idx_c = jnp.maximum(idx_c, 0)
    rows = jnp.take_along_axis(bank, idx_c[:, :, None], axis=1)     # (A, T, 4)
    in_plan = idx[None, :] < bank_len[:, None]                      # (A, T)

    means = jnp.broadcast_to(rows[None, :, :, :2], (a, a, horizon, 2))
    orientations = jnp.broadcast_to(rows[None, :, :, 2], (a, a, horizon))
    velocities = jnp.broadcast_to(rows[None, :, :, 3], (a, a, horizon))
    cov = jnp.eye(2, dtype=dtype) * cov_pos
    covs = jnp.broadcast_to(cov, (a, a, horizon, 2, 2))
    inv_covs = jnp.broadcast_to(jnp.eye(2, dtype=dtype) / cov_pos,
                                (a, a, horizon, 2, 2))
    not_self = ~jnp.eye(a, dtype=bool)
    if active is not None:
        not_self = not_self & active[None, :]
    valid = not_self[:, :, None] & in_plan[None]
    lengths = jnp.full((a, a), length, dtype)
    widths = jnp.full((a, a), width, dtype)
    return PredictionTensors(
        means=means, inv_covs=inv_covs, covs=covs, orientations=orientations,
        velocities=velocities, lengths=lengths, widths=widths, valid=valid,
    )


def concat_obstacles(p1: PredictionTensors, p2: PredictionTensors) -> PredictionTensors:
    """Concatenate two (A, O, ...) prediction-tensor sets along the obstacle
    axis (scenario obstacles + agent poses)."""
    return PredictionTensors(*(
        jnp.concatenate([a, b], axis=1) for a, b in zip(p1, p2)
    ))
