"""Simulation orchestrator: scenario + config → stepped agents → result.

The TPU-native counterpart of the reference's `Simulation`
(cr_scenario_handler/simulation/simulation.py): converts dynamic obstacles
into planning agents (multi-agent mode, :154-346), computes global predictions
per step (:677-700), steps all agents in lockstep, checks inter-agent and
agent-obstacle collisions (:702-741), and collects per-agent outcomes
(score_overview semantics, main.py:81-84).

Differences by design (SURVEY §2.3/§2.4): no worker processes and no pickled
scenario exchange — agents run in one process against shared device tensors;
the scale-out axis is the device mesh (frenetix_tpu.parallel), not
multiprocessing.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from frenetix_tpu.io.commonroad import GoalCondition, PlanningProblem, Scenario, State
from frenetix_tpu.sim.agent import Agent, AgentStatus
from frenetix_tpu.sim.prediction import (
    constant_velocity_predictions, ground_truth_predictions, to_device,
)
from frenetix_tpu.utils.config import FrenetixConfig

__all__ = ["Simulation", "SimulationResult"]


def _obb_overlap_np(c1, th1, h1, c2, th2, h2) -> bool:
    """Host scalar SAT test (sim-level collision check, cf.
    simulation.py:702-741 / pycrcc)."""
    axes = []
    for th in (th1, th2):
        c, s = np.cos(th), np.sin(th)
        axes.append(np.array([c, s]))
        axes.append(np.array([-s, c]))
    a1 = [axes[0], axes[1]]
    a2 = [axes[2], axes[3]]
    delta = np.asarray(c2) - np.asarray(c1)
    for ax in axes:
        r1 = h1[0] * abs(ax @ a1[0]) + h1[1] * abs(ax @ a1[1])
        r2 = h2[0] * abs(ax @ a2[0]) + h2[1] * abs(ax @ a2[1])
        if abs(ax @ delta) > r1 + r2:
            return False
    return True


@dataclass
class SimulationResult:
    scenario_id: str
    agent_status: dict
    agent_messages: dict
    steps: int
    wall_time: float
    planning_times: list = field(default_factory=list)
    histories: dict = field(default_factory=dict)

    @property
    def success(self) -> bool:
        return all(s == AgentStatus.COMPLETED_SUCCESS for s in self.agent_status.values())


class Simulation:
    def __init__(self, scenario: Scenario, config: Optional[FrenetixConfig] = None,
                 msg_logger=None, sim_logger=None, log_dir=None):
        import jax.numpy as jnp

        self.jnp = jnp
        self.log_dir = log_dir
        self.scenario = scenario
        self.config = config or FrenetixConfig()
        self.msg_logger = msg_logger
        self.sim_logger = sim_logger
        self.dt = self.config.planning.dt

        ew = self.config.external_cost_weights
        if (not self.config.occlusion.use_occlusion_module
                and any(float(ew.get(k, 0.0)) != 0.0
                        for k in ("occ_pm", "occ_um", "occ_ve"))):
            # the external terms only evaluate inside the occlusion-module
            # branch — a nonzero weight without the module must not be a
            # silent no-op
            raise ValueError(
                "external_cost_weights require occlusion.use_occlusion_module"
            )

        horizon = scenario.max_time_step
        if horizon > 0:
            self.max_steps = int(horizon * self.config.simulation.max_steps_factor)
        else:
            self.max_steps = self.config.simulation.fallback_max_steps

        self.agents: list[Agent] = []
        for pid, pp in scenario.planning_problems.items():
            self.agents.append(
                Agent(pid, pp, scenario, self.config, msg_logger, log_dir=log_dir)
            )

        if self.config.simulation.start_multiagent:
            self._create_obstacle_agents()

        self.agent_obstacle_ids = {a.id for a in self.agents}

        if self.config.behavior.use_behavior_planner and len(self.agents) > 1:
            # behavior perception must observe LIVE peers, not the stale
            # recorded trajectories of agent-converted obstacles — the
            # combination the reference does not support (behavior.yaml:2)
            from frenetix_tpu.sim.world_view import attach_world_views

            attach_world_views(self)

    # ----------------------------------------------------------- multi-agent
    def _create_obstacle_agents(self):
        """Convert dynamic obstacles into planning agents: goal region from the
        obstacle's final trajectory state (simulation.py:154-346)."""
        sim_cfg = self.config.simulation
        n_wanted = sim_cfg.number_of_agents
        candidates = self.scenario.dynamic_obstacles
        if sim_cfg.use_specific_agents:
            wanted = set(sim_cfg.agent_ids)
            candidates = [ob for ob in candidates if ob.obstacle_id in wanted]
        elif n_wanted >= 0:
            if sim_cfg.select_agents_randomly and n_wanted < len(candidates):
                # fresh entropy unless agent_selection_seed pins the sample
                # (the reference samples with the process-global RNG,
                # simulation.py:258-265)
                rng = np.random.default_rng(sim_cfg.agent_selection_seed)
                pick = sorted(rng.choice(len(candidates), size=n_wanted,
                                         replace=False).tolist())
                candidates = [candidates[i] for i in pick]
            else:
                candidates = candidates[:n_wanted]
        for ob in candidates:
            if ob.obstacle_type not in ("car", "truck", "bus"):
                continue
            if not ob.trajectory:
                continue
            final = ob.trajectory[-1]
            ang = final.orientation
            ca, sa = np.cos(ang), np.sin(ang)
            rot = np.array([[ca, -sa], [sa, ca]])
            half = np.array([[4.0, 2.0], [4.0, -2.0], [-4.0, -2.0], [-4.0, 2.0]])
            shape = (half @ rot.T) + final.position
            goal = GoalCondition(
                position_shape=shape,
                time_interval=(0, final.time_step + 20),
                velocity_interval=None,
            )
            init = ob.initial_state
            pp = PlanningProblem(
                problem_id=ob.obstacle_id,
                initial_state=State(
                    time_step=init.time_step, position=init.position,
                    orientation=init.orientation, velocity=init.velocity,
                    acceleration=init.acceleration,
                ),
                goals=[goal],
            )
            try:
                self.agents.append(
                    Agent(ob.obstacle_id, pp, self.scenario, self.config,
                          self.msg_logger, log_dir=self.log_dir)
                )
            except Exception as e:  # agent-creation containment (simulation.py:423-447)
                if self.msg_logger:
                    self.msg_logger.warning(f"dropping agent {ob.obstacle_id}: {e}")

    # ----------------------------------------------------------- predictions
    def _visible_obstacle_ids(self, t: int, exclude: set) -> list[int]:
        ids = []
        for ob in self.scenario.dynamic_obstacles:
            if ob.obstacle_id in exclude:
                continue
            if ob.state_at_time(t) is not None:
                ids.append(ob.obstacle_id)
        for ob in self.scenario.static_obstacles:
            if ob.obstacle_id not in exclude:
                ids.append(ob.obstacle_id)
        return ids

    def _predictions_for_step(self, t: int):
        """Global prediction step (prestep_simulation, simulation.py:677-700)."""
        pcfg = self.config.prediction
        ids = self._visible_obstacle_ids(t, self.agent_obstacle_ids)
        horizon = pcfg.horizon_steps
        dtype = np.float64 if self.config.dtype == "float64" else np.float32
        if pcfg.mode == "ground_truth":
            pd = ground_truth_predictions(
                self.scenario, ids, t, horizon,
                cov_pos=pcfg.cov_pos, max_obstacles=pcfg.max_obstacles, dtype=dtype,
            )
        elif pcfg.mode == "walenet":
            from frenetix_tpu.models.walenet import walenet_predictions
            from frenetix_tpu.sim.world_view import WorldView

            # neighbor grids + histories read live executed agent states —
            # the reference's update_scenario rewrites the dummies before
            # each global prediction, so even scenario obstacles' nets see
            # the agents where they actually are (wale_net preprocessing
            # over the mutated scenario)
            wv = WorldView(self.scenario, self.agents,
                           veh_length=self.config.vehicle.length,
                           veh_width=self.config.vehicle.width) \
                if self.agents else None
            pd = walenet_predictions(
                self.scenario, ids, t, horizon,
                max_obstacles=pcfg.max_obstacles, dtype=dtype, world=wv,
            )
        else:
            pd = constant_velocity_predictions(
                self.scenario, ids, t, horizon, dt=self.dt,
                max_obstacles=pcfg.max_obstacles, dtype=dtype,
            )
        k = pcfg.uncertainty_margin_sigma
        if k > 0.0:
            # widen the collision footprint with the predictor's own
            # uncertainty (mean 1σ over the horizon); opt-in — 0.0 matches
            # the reference's mean-path collision checking
            sig = (np.sqrt(np.maximum(pd["covs"][:, :, 0, 0], 0.0))
                   + np.sqrt(np.maximum(pd["covs"][:, :, 1, 1], 0.0)))
            m = k * 0.5 * np.where(pd["valid"].any(axis=1), sig.mean(axis=1), 0.0)
            pd["lengths"] = pd["lengths"] + m.astype(pd["lengths"].dtype)
            pd["widths"] = pd["widths"] + (0.5 * m).astype(pd["widths"].dtype)
        return pd, ids

    def _filter_for_agent(self, pd, ids, agent):
        """Per-agent sensor filtering: invalidate prediction rows for
        obstacles the agent cannot see (agent.py:157-179 →
        sensor_model.get_visible_objects)."""
        pcfg = self.config.prediction
        if not pcfg.use_sensor_model:
            return pd
        from frenetix_tpu.sim.sensor_model import visible_obstacles

        if pcfg.calc_occlusions and not hasattr(self, "_road_segments"):
            # static geometry — dissolve the lanelet-union boundary ONCE
            from frenetix_tpu.sim.visible_area import road_boundary_segments

            self._road_segments = road_boundary_segments(self.scenario)
        # other agents' LIVE poses still occlude even though their scenario
        # trajectories went stale when they became agents
        veh = self.config.vehicle
        extra = [
            (a.state.position, a.state.orientation, veh.length, veh.width)
            for a in self.agents
            if a.id != agent.id
            and a.status in (AgentStatus.IDLE, AgentStatus.RUNNING)
        ]
        vis = set(visible_obstacles(
            self.scenario, agent.id, agent.state, agent.state.time_step,
            sensor_radius=pcfg.sensor_radius,
            occlusions=pcfg.calc_occlusions,
            veh_length=self.config.vehicle.length,
            cone_angle=pcfg.cone_angle,
            cone_safety_dist=pcfg.cone_safety_dist,
            agent_ids=self.agent_obstacle_ids,
            road_segments=getattr(self, "_road_segments", None),
            extra_occluders=extra,
        ))
        for k, oid in enumerate(ids[: pd["valid"].shape[0]]):
            if oid not in vis:
                pd["valid"][k] = False
        return pd

    def _peer_future(self, a: Agent, t: int, horizon: int, dtype):
        """Mode-faithful future of one live peer agent — the analog of the
        reference's scenario mutation + re-prediction (simulation.py:743-779
        `update_scenario` publishes each agent's executed history + its
        CURRENT PLANNED TRAJECTORY into its dummy obstacle, and the next
        global prediction step runs the configured predictor over it).

        ground_truth:  the remainder of the peer's current plan, converted
          rear-axle → center (the reference's GT predictor reads the dummy's
          trajectory, prediction_helpers.py:209-261 — i.e. the plan),
          truncated at plan end; before the first plan exists (step 0) the
          converted obstacle's recorded trajectory, like the reference's
          not-yet-updated dummy; CV extrapolation only when neither exists
          (an ego planning problem with no recorded trajectory).
        walenet: handled in `_peer_rows_for_step` (the net runs over the
          peers' executed histories through a WorldView, one batch).
        constant_velocity: extrapolate the current pose (this repo's own
          deployment-realistic mode; the reference has no CV mode).

        Returns (means (H,2), orientations (H,), velocities (H,), valid (H,),
        cov (2,2)).  Invalid tail rows pad with the last valid pose, same as
        `ground_truth_predictions`."""
        from frenetix_tpu.sim.prediction import extrapolate_constant_velocity

        mode = self.config.prediction.mode
        st = a.state
        means = np.zeros((horizon, 2))
        orient = np.full(horizon, float(st.orientation))
        vel = np.full(horizon, float(st.velocity))
        valid = np.zeros(horizon, bool)
        cov_pos = self.config.prediction.cov_pos

        if mode == "ground_truth":
            plan = a.current_plan
            if plan is not None:
                wb = self.config.vehicle.wb_rear_axle
                n = len(plan.x)
                for i in range(horizon):
                    j = a.plan_step + 1 + i
                    if j >= n:
                        break
                    th = float(plan.theta[j])
                    means[i] = (plan.x[j] + wb * np.cos(th),
                                plan.y[j] + wb * np.sin(th))
                    orient[i] = th
                    vel[i] = float(plan.v[j])
                    valid[i] = True
            else:
                ob = self.scenario.obstacles.get(a.id)
                if ob is not None:
                    for i in range(horizon):
                        s = ob.state_at_time(t + 1 + i)
                        if s is None:
                            break
                        means[i] = s.position
                        orient[i] = float(s.orientation)
                        vel[i] = float(s.velocity)
                        valid[i] = True
            cov = np.eye(2) * cov_pos
            if valid.any():
                n_v = int(valid.sum())
                means[n_v:] = means[n_v - 1]
                orient[n_v:] = orient[n_v - 1]
                vel[n_v:] = vel[n_v - 1]
                return means, orient, vel, valid, cov

        # constant-velocity row (CV mode, and the GT fallback when the peer
        # has neither a plan nor a recorded trajectory)
        means = extrapolate_constant_velocity(
            st.position, st.orientation, st.velocity, horizon, self.dt)
        valid[:] = True
        cov = np.eye(2) * (cov_pos if mode == "ground_truth"
                           else max(cov_pos, 0.1))
        return means, orient, vel, valid, cov

    def _peer_rows_for_step(self, t: int) -> dict:
        """Every live agent's peer-visible prediction row, computed ONCE per
        step (the reference runs ONE global prediction over all dummies) and
        cached; observers then take all rows but their own."""
        cached = getattr(self, "_peer_rows_cache", None)
        if cached is not None and cached[0] == t:
            return cached[1]
        horizon = self.config.prediction.horizon_steps
        dtype = np.float64 if self.config.dtype == "float64" else np.float32
        live = [a for a in self.agents
                if a.status in (AgentStatus.IDLE, AgentStatus.RUNNING)]
        rows = {}
        if self.config.prediction.mode == "walenet" and live:
            # the net consumes each peer's EXECUTED history (the reference's
            # wale_net.py:236-259 reads the dummy's updated trajectory);
            # WorldView serves live states wherever the scenario would serve
            # stale recorded ones
            from frenetix_tpu.models.walenet import walenet_predictions
            from frenetix_tpu.sim.world_view import WorldView

            wv = WorldView(self.scenario, self.agents,
                           veh_length=self.config.vehicle.length,
                           veh_width=self.config.vehicle.width)
            ids = [a.id for a in live]
            wp = walenet_predictions(
                self.scenario, ids, t, horizon,
                max_obstacles=len(ids), dtype=dtype, world=wv)
            for k, a in enumerate(live):
                rows[a.id] = dict(
                    means=wp["means"][k], orientations=wp["orientations"][k],
                    velocities=wp["velocities"][k], valid=wp["valid"][k],
                    covs=wp["covs"][k], inv_covs=wp["inv_covs"][k])
        else:
            for a in live:
                means, orient, vel, valid, cov = self._peer_future(
                    a, t, horizon, dtype)
                rows[a.id] = dict(
                    means=means.astype(dtype),
                    orientations=orient.astype(dtype),
                    velocities=vel.astype(dtype), valid=valid,
                    covs=np.broadcast_to(
                        cov.astype(dtype), (horizon, 2, 2)),
                    inv_covs=np.broadcast_to(
                        np.linalg.inv(cov).astype(dtype), (horizon, 2, 2)))
        self._peer_rows_cache = (t, rows)
        return rows

    def _augment_with_agents(self, pd, for_agent: Agent):
        """Other agents appear as predicted obstacles with mode-faithful
        futures (`_peer_future`): their planned trajectories in ground-truth
        mode, net predictions over executed histories in walenet mode, CV
        extrapolation in constant-velocity mode.

        Terminated agents are NOT included: in the reference a finished
        agent's recorded trajectory simply ends, so it has no state at later
        steps — keeping its frozen final pose as a phantom box makes
        followers crash into a vehicle that "completed" mid-road."""
        others = [
            a for a in self.agents
            if a.id != for_agent.id
            and a.status in (AgentStatus.IDLE, AgentStatus.RUNNING)
        ]
        if not others:
            return pd
        free = list(np.where(~pd["valid"].any(axis=1))[0])
        if len(free) < len(others):
            # peer agents are safety-critical: when the fixed tensor width
            # leaves too few free rows, evict the FARTHEST scenario obstacles
            # (zip-truncating peers would make agents invisible to each other)
            if not getattr(self, "_warned_slots", False):
                self._warned_slots = True
                if self.msg_logger:
                    self.msg_logger.warning(
                        "prediction.max_obstacles too small for all peers; "
                        "evicting farthest obstacles"
                    )
            valid_rows = np.where(pd["valid"].any(axis=1))[0]
            dist = np.linalg.norm(
                pd["means"][valid_rows, 0] - np.asarray(for_agent.state.position)[None],
                axis=1,
            )
            need = len(others) - len(free)
            for row in valid_rows[np.argsort(dist)[::-1][:need]]:
                pd["valid"][row] = False
                free.append(int(row))
        rows = self._peer_rows_for_step(int(for_agent.state.time_step))
        for a, slot in zip(others, free):
            r = rows[a.id]
            pd["means"][slot] = r["means"]
            pd["orientations"][slot] = r["orientations"]
            pd["velocities"][slot] = r["velocities"]
            pd["covs"][slot] = r["covs"]
            pd["inv_covs"][slot] = r["inv_covs"]
            pd["lengths"][slot] = self.config.vehicle.length + 0.5
            pd["widths"][slot] = self.config.vehicle.width + 0.2
            pd["valid"][slot] = r["valid"]
        return pd

    # ------------------------------------------------------------- collisions
    def _check_collisions(self, t: int):
        """Agent-vs-obstacle and agent-vs-agent OBB checks at step t
        (check_collision, simulation.py:702-741)."""
        veh = self.config.vehicle
        h_agent = (veh.length / 2.0, veh.width / 2.0)
        for a in self.agents:
            if a.status not in (AgentStatus.RUNNING, AgentStatus.IDLE):
                continue
            for ob in self.scenario.obstacles.values():
                if ob.obstacle_id in self.agent_obstacle_ids:
                    continue
                st = ob.state_at_time(t)
                if st is None:
                    continue
                if _obb_overlap_np(
                    a.state.position, a.state.orientation, h_agent,
                    st.position, st.orientation, (ob.length / 2.0, ob.width / 2.0),
                ):
                    a.set_collision()
                    self._write_collision_report(a)
                    break
            if a.status == AgentStatus.COLLISION:
                continue
            for b in self.agents:
                if b.id == a.id:
                    continue
                # terminated agents leave the world — the reference's agent
                # trajectories simply end, so they have no later states
                if b.status not in (AgentStatus.IDLE, AgentStatus.RUNNING):
                    continue
                if _obb_overlap_np(
                    a.state.position, a.state.orientation, h_agent,
                    b.state.position, b.state.orientation, h_agent,
                ):
                    a.set_collision()
                    self._write_collision_report(a)
                    break

    def _step_agents_batched(self, running, pd_base, ids):
        """All agents' replanning cycles in one device call
        (parallel.batched_sim.BatchedAgentStepper); per-agent host work is
        reduced to bookkeeping + executing the selected state."""
        import time as _time

        import jax

        from frenetix_tpu.ops.sampling import build_sampling_matrix, pad_matrix
        from frenetix_tpu.planner.reactive import PlannedTrajectory
        from frenetix_tpu.sim.prediction import to_device

        if not hasattr(self, "_batched_stepper"):
            from frenetix_tpu.parallel.batched_sim import BatchedAgentStepper

            mesh = None
            if self.config.simulation.sharded_device_agents:
                devs = jax.devices()
                # the agent axis must divide evenly over the mesh; otherwise
                # stay on single-device vmap (same program, no shard_map)
                n_use = len(devs)
                while n_use > 1 and len(self.agents) % n_use != 0:
                    n_use //= 2
                if n_use > 1:
                    from frenetix_tpu.parallel.mesh import make_agent_mesh

                    mesh = make_agent_mesh(devs[:n_use])
            self._batched_mesh = mesh
            self._batched_stepper = BatchedAgentStepper(
                self.config, self.agents, mesh=mesh
            )
            from frenetix_tpu.ops.costs import COST_TERM_ORDER

            w = np.array([self.config.cost_weights.get(k, 0.0)
                          for k in COST_TERM_ORDER], self._batched_stepper.np_dtype)
            self._batched_weights = self.jnp.asarray(w)

        stepper = self._batched_stepper
        active = [a for a in running if a.pre_step() == AgentStatus.RUNNING]
        if not active:
            return

        low_thr = self.config.planning.low_vel_mode_threshold
        replanners = [a for a in active if a.needs_replan()]

        # per-agent predictions — only replanners consume them; plan-executing
        # agents would pay the full sensor pass for nothing
        per_pd, phantom_masks = {}, {}
        for a in replanners:
            pd, pm = self._agent_predictions(pd_base, ids, a)
            if pm is not None:
                phantom_masks[a.id] = pm
            per_pd[a.id] = pd

        # behavior planners run on host ahead of the fused batch (they are
        # sequential control logic); their outputs feed the device cycle.
        # Stopping-mode agents (armed stop point → quintic sampling, a
        # different static flag) fall back to the host path this step; a
        # reference-path change invalidates the stacked tables.
        from frenetix_tpu.planner.reactive import wants_stopping_mode
        from frenetix_tpu.sim.planner_interfaces import apply_behavior_output

        stop_thr = self.config.behavior.stopping_mode_threshold
        behavior_v_des = {}
        behavior_forced_host = set()
        for a in replanners:
            if a.behavior is None:
                continue
            b_out = a.behavior.execute(None, a.state, a.state.time_step)
            if apply_behavior_output(a, b_out):
                # reference path changed → stacked tables are stale
                if hasattr(self, "_batched_stepper"):
                    del self._batched_stepper
                    stepper = None
            behavior_v_des[a.id] = b_out.desired_velocity
            if wants_stopping_mode(a.planner.stop_point, a.x_cl, stop_thr):
                behavior_forced_host.add(a.id)
        if stepper is None:
            from frenetix_tpu.parallel.batched_sim import BatchedAgentStepper

            self._batched_stepper = BatchedAgentStepper(
                self.config, self.agents,
                mesh=getattr(self, "_batched_mesh", None),
            )
            stepper = self._batched_stepper

        batchable = [a for a in replanners
                     if a.state.velocity >= low_thr
                     and a.id not in behavior_forced_host]
        host_only = [a for a in replanners
                     if a.state.velocity < low_thr
                     or a.id in behavior_forced_host]

        # lanelet reach-set grids for the in-batch responsibility term (the
        # host path builds the same grids in update_planner; here they stack
        # along the agent axis and the term is applied inside the fused cycle
        # — parallel.mesh._one_agent_select)
        reach_grids = None
        if stepper.resp_weight != 0.0 and batchable:
            from frenetix_tpu.parallel.mesh import stack_reach_grids
            from frenetix_tpu.risk.reachable_set import build_reach_set_grids

            # real grids only for the agents whose batch rows are consumed;
            # non-batch rows (plan executors, host-only replanners) share one
            # cached all-invalid grid instead of re-allocating ~3 MB each
            o_slots = pd_base["valid"].shape[0]
            dummy = getattr(self, "_dummy_reach_grid", None)
            if dummy is None or dummy.occupancy.shape[0] != o_slots:
                dummy = build_reach_set_grids(
                    self.scenario,
                    np.asarray(pd_base["means"][:, 0]),
                    np.asarray(pd_base["orientations"][:, 0]),
                    np.asarray(pd_base["velocities"][:, 0]),
                    np.asarray(pd_base["lengths"]),
                    np.asarray(pd_base["widths"]),
                    np.zeros(o_slots, bool),
                )
                self._dummy_reach_grid = dummy
            batch_ids = {a.id for a in batchable}
            glist = []
            for a in self.agents:
                if a.id not in batch_ids:
                    glist.append(dummy)
                    continue
                pd = per_pd[a.id]
                glist.append(build_reach_set_grids(
                    self.scenario,
                    np.asarray(pd["means"][:, 0]),
                    np.asarray(pd["orientations"][:, 0]),
                    np.asarray(pd["velocities"][:, 0]),
                    np.asarray(pd["lengths"]),
                    np.asarray(pd["widths"]),
                    np.asarray(pd["valid"][:, 0]),
                ))
            reach_grids = stack_reach_grids(glist)

        # (A, O) occlusion phantom-row masks for the in-batch safety gate
        # (mesh._one_agent_select); all-False rows for agents without
        # phantoms this step (the gate is then a no-op for them)
        all_phantom_masks = None
        occ_geom = None
        if stepper.use_occlusion and batchable:
            o_slots = pd_base["valid"].shape[0]
            all_phantom_masks = np.zeros((len(self.agents), o_slots), bool)
            for i, a in enumerate(self.agents):
                if a.id in phantom_masks:
                    all_phantom_masks[i] = phantom_masks[a.id]
            if stepper.use_occ_geom:
                # occ_um/occ_ve inputs, stacked per agent: the same polar
                # maps / phantom silhouette points the sequential host path
                # gathers one agent at a time (reactive._occlusion_pack)
                a_n = len(self.agents)
                dtype = stepper.np_dtype
                egos = np.zeros((a_n, 2), dtype)
                r_all = None
                pts_all = vld_all = None
                for i, a in enumerate(self.agents):
                    mod = a.occlusion
                    if mod is None:
                        continue
                    r_vis, ego = mod.polar_map(a.state, a.state.time_step)
                    pts, vld = mod.occluder_points()
                    if r_all is None:
                        r_all = np.zeros((a_n, len(r_vis)), dtype)
                        r_all[:] = mod.sensor_radius   # unknown rows: open
                        pts_all = np.zeros((a_n,) + pts.shape, dtype)
                        vld_all = np.zeros((a_n,) + vld.shape, bool)
                    egos[i] = ego
                    r_all[i] = r_vis
                    pts_all[i] = pts
                    vld_all[i] = vld
                occ_geom = (None if r_all is None
                            else (egos, r_all, pts_all, vld_all))

        # progressive densification stays batched: agents that miss at one
        # sampling level re-run in the next level's batch
        # (reactive_planner_cpp.py:329-377); only the terminal fallback
        # ladder (standstill / stopping / min-risk) goes to host
        pending = list(batchable)
        level = self.config.planning.sampling_min
        while pending and level < self.config.planning.sampling_max:
            t0 = _time.perf_counter()
            a_index = {a.id: i for i, a in enumerate(self.agents)}
            mats, v_des, x0_th = {}, {}, {}
            max_m = 0
            for a in pending:
                a.ensure_x_cl()
                a.planner.current_velocity = float(a.state.velocity)
                t1, ss1, d1 = a.planner._sampling_ranges(level, a.x_cl)
                m = build_sampling_matrix(
                    t1_vals=t1, ss1_vals=ss1, d1_vals=d1,
                    x0_lon=a.x_cl[0], x0_lat=a.x_cl[1], dtype=stepper.np_dtype,
                )
                mats[a.id] = m
                v_des[a.id] = behavior_v_des.get(a.id, a.desired_velocity())
                x0_th[a.id] = a.state.orientation
                max_m = max(max_m, len(m))
            bucket = self.config.debug.matrix_bucket
            max_m = ((max_m + bucket - 1) // bucket) * bucket
            # never shrink: keeps the jit cache to a handful of specializations
            max_m = max(max_m, getattr(self, "_batched_max_m", 0))
            self._batched_max_m = max_m

            n_agents = len(self.agents)
            all_mats = np.zeros((n_agents, max_m, 13), stepper.np_dtype)
            all_masks = np.zeros((n_agents, max_m), bool)
            all_vdes = np.zeros(n_agents, stepper.np_dtype)
            all_th = np.zeros(n_agents, stepper.np_dtype)
            pred_list = []
            dummy_pd = {k: v.copy() for k, v in pd_base.items()}
            for i, a in enumerate(self.agents):
                if a.id in mats:
                    m, msk = pad_matrix(mats[a.id], max_m)
                    all_mats[i] = m[:max_m]
                    all_masks[i] = msk[:max_m]
                    all_vdes[i] = v_des[a.id]
                    all_th[i] = x0_th[a.id]
                    pred_list.append(to_device(per_pd[a.id], self.jnp))
                else:
                    all_mats[i] = all_mats[i - 1] if i else 0.001
                    all_mats[i, :, 1] = 1.0  # harmless dummy rows
                    pred_list.append(to_device(dummy_pd, self.jnp))
            preds_stacked = jax.tree.map(
                lambda *xs: self.jnp.stack(xs), *pred_list
            )
            out, poses_all = stepper.step(
                all_mats, all_masks, preds_stacked, all_th, all_vdes,
                self.config.vehicle, self._batched_weights,
                reach_grids=reach_grids, phantom_masks=all_phantom_masks,
                occ_geom=occ_geom,
            )
            # device-resident executed poses: the exposed hook for
            # device-side obstacle rebuild (parallel.mesh.
            # agent_pose_predictions — the lockstep loop the driver dryrun
            # exercises); the host loop itself reads agent states directly
            self._last_poses_all = poses_all
            # ONE device→host fetch of the whole selection dict — per-agent
            # per-field `np.asarray(out[k][i])` slices each pay a separate
            # device round trip (~40 s of a 48 s six-agent CPU run)
            out = jax.device_get(out)
            batch_time = _time.perf_counter() - t0
            found = out["found"]
            still_pending = []
            for a in pending:
                i = a_index[a.id]
                # honest accounting: one fused call covers the whole batch —
                # record the batch wall time + size, and the amortized share
                a.record.batch_planning_times.append((batch_time, len(pending)))
                a.record.planning_times.append(batch_time / max(len(pending), 1))
                if found[i]:
                    g = lambda k: np.asarray(out[k][i], dtype=stepper.np_dtype)
                    plan = PlannedTrajectory(
                        x=g("x"), y=g("y"), theta=g("theta"), v=g("v"),
                        a=g("a"), kappa=g("kappa"), s=g("s"), s_dot=g("s_dot"),
                        s_ddot=g("s_ddot"), d=g("d"), d_dot=g("d_dot"),
                        d_ddot=g("d_ddot"), cost=float(out["cost"][i]),
                        sampling_parameters=all_mats[i, int(out["best"][i])],
                        mode="optimal", cost_terms=np.asarray(out["terms"][i]),
                    ).compute_steering(self.config.vehicle.wheelbase)
                    a.apply_external_plan(plan)
                else:
                    still_pending.append(a)
            pending = still_pending
            level += 1
        host_only.extend(pending)  # exhausted all levels → host fallback ladder

        # host path: low-velocity agents + batched misses (fallback ladder)
        for a in host_only:
            pd = per_pd[a.id]
            a.current_plan = None
            a.step(to_device(pd, self.jnp), pd["means"][:, 0], pd["valid"][:, 0])

        # everyone else just executes their next planned state
        done_ids = {a.id for a in host_only}
        for a in active:
            if a.id not in done_ids:
                a.execute_next_state()

    def _agent_predictions(self, pd_base, ids, a):
        """Per-agent prediction pipeline: sensor filter → live-agent augment
        → occlusion phantom injection (+ arming the planner's host-side
        safety gate).  The ONE definition shared by the sequential and the
        batched step paths — they must stay bit-identical for the
        batched == sequential parity the tests pin.  Returns
        (pd, phantom_mask-or-None)."""
        pd = {k: v.copy() for k, v in pd_base.items()}
        pd = self._filter_for_agent(pd, ids, a)
        pd = self._augment_with_agents(pd, a)
        phantom_mask = None
        if a.occlusion is not None:
            # mirror the sensor path: agent obstacles' recorded trajectories
            # are stale — exclude them as occluders and use live poses
            veh = self.config.vehicle
            a.occlusion.occluder_exclude = {p.id for p in self.agents}
            a.occlusion.extra_occluders = [
                (p.state.position, p.state.orientation, veh.length, veh.width)
                for p in self.agents
                if p.id != a.id
                and p.status in (AgentStatus.IDLE, AgentStatus.RUNNING)
            ]
            before = pd["valid"].any(axis=1).copy()
            pd, _ = a.occlusion.augment_predictions(
                pd, a.state, a.state.time_step, self.dt
            )
            phantom_mask = pd["valid"].any(axis=1) & ~before
            # host fallbacks (low-vel / stopping / batched misses) apply
            # the same gate through the planner; ego pose feeds the
            # external soft-cost terms (occ_um polar map)
            a.planner.set_occlusion_module(a.occlusion, phantom_mask,
                                           ego_state=a.state,
                                           time_step=a.state.time_step)
        return pd, phantom_mask

    def _check_road_departure(self):
        """Flag executed off-road poses as failures.

        The reference registers the road boundary in the global collision
        checker (simulation.py:474-495), so an executed state leaving the
        drivable area is a detected collision — not merely prevented by the
        planner's corridor.  Here: an agent whose vehicle center lies outside
        every lanelet polygon has left the road."""
        if not self.config.simulation.check_road_boundary:
            return
        for a in self.agents:
            if a.status != AgentStatus.RUNNING:
                continue
            if not self.scenario.find_lanelets_by_position(a.state.position):
                a.status = AgentStatus.COLLISION
                a.message = "road departure"
                self._write_collision_report(a)

    def _write_collision_report(self, agent):
        if not self.config.debug.collision_report or self.log_dir is None:
            return
        try:
            from frenetix_tpu.evaluation.collision_report import collision_report

            collision_report(agent, self.scenario, self.config.vehicle,
                             log_dir=self.log_dir)
        except Exception:
            pass

    # -------------------------------------------------------------- main loop
    def run(self) -> SimulationResult:
        t_start = time.perf_counter()
        t = 0
        while t < self.max_steps:
            t_step0 = time.perf_counter()
            running = [a for a in self.agents
                       if a.status in (AgentStatus.IDLE, AgentStatus.RUNNING)]
            if not running:
                break
            pd_base, ids = self._predictions_for_step(t)
            if (self.config.simulation.batched_device_agents and len(self.agents) > 1):
                self._step_agents_batched(running, pd_base, ids)
            else:
                # build every agent's predictions from the SAME pre-step
                # snapshot before any agent executes (lockstep semantics —
                # the reference's prestep, simulation.py:677-700; also keeps
                # the sequential and batched paths bit-identical)
                per_pd = {}
                for a in running:
                    per_pd[a.id] = self._agent_predictions(pd_base, ids, a)[0]
                for a in running:
                    pd = per_pd[a.id]
                    preds = to_device(pd, self.jnp)
                    a.step(preds, pd["means"][:, 0], pd["valid"][:, 0])
            t += 1
            self._check_collisions(t)
            self._check_road_departure()
            vis = self.config.visualization
            if ((vis.save_plots and self.log_dir) or vis.show_plots) \
                    and t % vis.plot_interval == 0:
                from frenetix_tpu.utils.visualization import plot_scenario_at_timestep

                plot_scenario_at_timestep(
                    self.scenario, self.agents, t,
                    predictions=pd_base if vis.draw_predictions else None,
                    save_path=(f"{self.log_dir}/frames/frame_{t:04d}.png"
                               if vis.save_plots and self.log_dir else None),
                    show=vis.show_plots,
                    window=vis.window,
                    veh_length=self.config.vehicle.length,
                    veh_width=self.config.vehicle.width,
                    show_ref=vis.draw_reference_path,
                    show_labels=vis.show_labels,
                    draw_planning_problem=vis.draw_planning_problem,
                    draw_icons=vis.draw_icons,
                )
            if self.sim_logger:
                plan_t = sum(
                    a.record.planning_times[-1:][0] if a.record.planning_times else 0.0
                    for a in running
                )
                self.sim_logger.log_global_time(
                    self.scenario.scenario_id, t, time.perf_counter() - t_step0
                )
                self.sim_logger.log_batch_time(
                    self.scenario.scenario_id, "0", t,
                    time.perf_counter() - t_step0, plan_t,
                )
        for a in self.agents:
            if a.status in (AgentStatus.IDLE, AgentStatus.RUNNING):
                a.set_timelimit()
        if self.sim_logger:
            self.sim_logger.log_results(
                self.scenario.scenario_id, self.agents,
                set(self.scenario.planning_problems.keys()),
            )

        vis = self.config.visualization
        if vis.save_plots and self.log_dir and vis.save_gif:
            from frenetix_tpu.utils.visualization import make_gif

            try:
                make_gif(f"{self.log_dir}/frames", f"{self.log_dir}/run.gif")
            except Exception:
                pass

        return SimulationResult(
            scenario_id=self.scenario.scenario_id,
            agent_status={a.id: a.status for a in self.agents},
            agent_messages={a.id: a.message for a in self.agents},
            steps=t,
            wall_time=time.perf_counter() - t_start,
            planning_times=[pt for a in self.agents for pt in a.record.planning_times],
            histories={a.id: a.record.states for a in self.agents},
        )
