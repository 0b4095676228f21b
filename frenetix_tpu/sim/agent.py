"""Agent: one planning vehicle's lifecycle in the simulation.

Merges the responsibilities of the reference's `Agent`
(cr_scenario_handler/simulation/agent.py), `FrenetPlannerInterface`
(planner_interfaces/frenet_interface.py) and `VelocityPlanner` /
`GoalReachedChecker` (utils/velocity_planner.py, utils/goalcheck.py):

  - per-step lifecycle: collision → time limit → goal check → plan
    (agent.py:185-270),
  - replanning-frequency logic: plan every k-th step, consume previously
    planned states in between (frenet_interface.py:211-287),
  - desired velocity from distance-to-goal / remaining time, clipped to
    ±5 m/s around current speed (velocity_planner.py:94-129),
  - rear-axle ↔ center conversion between planner states and CommonRoad
    obstacle states (state.py:15-75).
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from frenetix_tpu.planner.initial_state import compute_initial_state_np
from frenetix_tpu.planner.reactive import PlannedTrajectory, ReactivePlanner
from frenetix_tpu.planner.route import reference_path_for_problem

__all__ = ["AgentStatus", "Agent"]


class AgentStatus(enum.IntEnum):
    """Matches the reference's AgentStatus progression (agent_status.py:12-88)."""

    IDLE = 0
    RUNNING = 1
    COMPLETED_SUCCESS = 2
    TIMELIMIT = 3
    COLLISION = 4
    ERROR = 5


@dataclass
class EgoState:
    """Vehicle-center state (CommonRoad convention)."""

    time_step: int
    position: np.ndarray
    orientation: float
    velocity: float
    acceleration: float = 0.0
    yaw_rate: float = 0.0
    steering_angle: float = 0.0


@dataclass
class _RearAxleState:
    x: float
    y: float
    orientation: float
    velocity: float
    acceleration: float
    steering_angle: float
    yaw_rate: float = 0.0


@dataclass
class AgentRecord:
    states: list = field(default_factory=list)        # executed EgoStates
    planning_times: list = field(default_factory=list)
    # fused-batch calls cover many agents at once; (wall_time, batch_size)
    # per call — planning_times then carries the amortized share
    batch_planning_times: list = field(default_factory=list)
    messages: list = field(default_factory=list)


class Agent:
    def __init__(self, agent_id: int, planning_problem, scenario, config, msg_logger=None,
                 log_dir=None):
        self.id = agent_id
        self.problem = planning_problem
        self.scenario = scenario
        self.config = config
        self.msg_logger = msg_logger
        self.status = AgentStatus.IDLE
        self.message = "initialized"
        self.record = AgentRecord()

        self.planner = ReactivePlanner(config, msg_logger)
        self.veh = config.vehicle
        # planner-interface plugin (sim/planner_interfaces.py registry)
        from frenetix_tpu.sim.planner_interfaces import get_planner_interface

        self.interface = get_planner_interface(
            config.simulation.used_planner_interface
        )(self)
        self.dt = config.planning.dt
        self.k_replan = max(1, config.planning.replanning_frequency)

        # route + reference path + drivable corridor
        polyline, self.route = reference_path_for_problem(scenario, planning_problem)
        self.planner.set_reference_path(
            polyline, scenario.drivable_polygons(),
            lanelets=list(scenario.lanelets.values())
            if config.cost_weights.get("lane_center_offset", 0) != 0 else None,
        )

        # per-agent trajectory logging (logging_helpers.py schemas)
        self.logger = None
        if log_dir is not None and config.debug.activate_logging:
            import os

            from frenetix_tpu.utils.trajectory_logging import TrajectoryLogger

            self.logger = TrajectoryLogger(
                os.path.join(log_dir, str(agent_id)),
                [k for k, v in config.cost_weights.items() if v != 0],
                config_dict={"cost_weights": config.cost_weights},
                save_all_traj=config.debug.save_all_traj,
                save_unweighted=config.debug.save_unweighted_costs,
                log_risk=config.debug.log_risk,
            )
            self.logger.write_reference_path(self.planner.ref_np.xy)

        init = planning_problem.initial_state
        self.state = EgoState(
            time_step=init.time_step,
            position=np.array(init.position, dtype=float),
            orientation=float(init.orientation),
            velocity=float(init.velocity),
            acceleration=float(init.acceleration),
            yaw_rate=float(init.yaw_rate),
        )
        self.record.states.append(self.state)

        self.current_plan: Optional[PlannedTrajectory] = None
        self.plan_step = 0            # index into current plan
        self.x_cl = None              # curvilinear state carried between plans
        self._goal_s = self._compute_goal_s()
        self._goal_time = self._goal_time_interval()

        # optional occlusion module (occlusion.yaml use_occlusion_module)
        self.occlusion = None
        if config.occlusion.use_occlusion_module:
            from frenetix_tpu.occlusion import OcclusionModule, PhantomThresholds

            occ = config.occlusion
            self.occlusion = OcclusionModule(
                scenario,
                sensor_radius=config.prediction.sensor_radius,
                max_phantoms=occ.max_phantoms,
                harm_threshold=occ.harm_threshold,
                risk_threshold=occ.risk_threshold,
                thresholds=PhantomThresholds.from_config(occ),
                phantom_type=occ.phantom_type,
                spawn_point_behind_dynamic_obstacle=occ.spawn_point_behind_dynamic_obstacle,
                spawn_point_behind_static_obstacle=occ.spawn_point_behind_static_obstacle,
                spawn_points_behind_turn=occ.spawn_points_behind_turn,
                max_dynamic_spawn_points=occ.max_dynamic_spawn_points,
                max_static_spawn_points=occ.max_static_spawn_points,
                variance_factor=occ.variance_factor,
                size_factor_length=occ.size_factor_length,
                size_factor_width=occ.size_factor_width,
                veh=config.vehicle,
                dt=config.planning.dt,
                route_xy=np.asarray(polyline),
            )

        # optional behavior planner (behavior.yaml use_behavior_planner);
        # it owns the reference path from here on (frenet_interface.py:116-125)
        self.behavior = None
        if config.behavior.use_behavior_planner:
            from frenetix_tpu.behavior import BehaviorModule

            # behavior timing follows the planner (frenet_interface.py:117-118)
            config.behavior.dt = config.planning.dt
            config.behavior.replanning_frequency = config.planning.replanning_frequency
            behavior_log = None
            if log_dir is not None and config.debug.activate_logging:
                import os as _os

                behavior_log = _os.path.join(log_dir, str(agent_id))
            self.behavior = BehaviorModule(
                scenario, planning_problem, config,
                reference_path=polyline, route_ids=self.route,
                ego_id=agent_id, msg_logger=msg_logger, log_path=behavior_log,
            )

    # ------------------------------------------------------------------ goal
    def _goal_polygons(self):
        polys = []
        for g in self.problem.goals:
            for lid in g.position_lanelets:
                if lid in self.scenario.lanelets:
                    polys.append(self.scenario.lanelets[lid].polygon)
            if g.position_shape is not None:
                polys.append(g.position_shape)
        return polys

    def _compute_goal_s(self) -> Optional[float]:
        polys = self._goal_polygons()
        if not polys:
            return None
        centers = [p.mean(axis=0) for p in polys]
        ref = self.planner.ref_np
        s_vals = []
        for c in centers:
            d = np.linalg.norm(np.asarray(ref.xy) - c[None], axis=1)
            s_vals.append(float(np.asarray(ref.s)[int(np.argmin(d))]))
        return float(np.mean(s_vals))

    def _goal_time_interval(self):
        for g in self.problem.goals:
            if g.time_interval is not None:
                return g.time_interval
        return None

    def goal_reached(self) -> bool:
        """Position (∈ goal lanelet/shape) ∧ velocity-interval check
        (goalcheck.py:83-172; the time lower bound is not enforced — reaching
        the goal early counts, like the reference's "faster-than-target"
        handling)."""
        from frenetix_tpu.io.commonroad import _point_in_ring

        p = self.state.position
        for g in self.problem.goals:
            pos_ok = True
            polys = []
            for lid in g.position_lanelets:
                if lid in self.scenario.lanelets:
                    polys.append(self.scenario.lanelets[lid].polygon)
            if g.position_shape is not None:
                polys.append(g.position_shape)
            if polys:
                pos_ok = any(_point_in_ring(p, ring) for ring in polys)
            vel_ok = True
            if g.velocity_interval is not None:
                lo, hi = g.velocity_interval
                vel_ok = lo <= self.state.velocity <= hi
            if pos_ok and vel_ok:
                return True
        return False

    # ------------------------------------------------------------- velocities
    def desired_velocity(self) -> float:
        """distance-to-goal / remaining-time, clipped to ±5 m/s of current
        (velocity_planner.py:94-129)."""
        v_cur = self.state.velocity
        if self._goal_s is None:
            return v_cur
        x_cl = self.x_cl
        s_cur = x_cl[0][0] if x_cl is not None else 0.0
        dist = self._goal_s - s_cur
        if self._goal_time is not None:
            remaining = (self._goal_time[1] - self.state.time_step) * self.dt
        else:
            remaining = max(dist, 0.0) / max(v_cur, 1.0)
        if dist <= 2.0:
            for g in self.problem.goals:
                if g.velocity_interval is not None:
                    lo, hi = g.velocity_interval
                    return max(0.0, (lo + hi) / 2.0)
            return 0.0
        if remaining <= 0:
            return max(v_cur, 1.0)
        v_des = dist / remaining
        return float(np.clip(v_des, max(v_cur - 5.0, 0.0), v_cur + 5.0))

    # -------------------------------------------------------------- stepping
    def _rear_axle_state(self) -> _RearAxleState:
        wb = self.veh.wb_rear_axle
        return _RearAxleState(
            x=self.state.position[0] - wb * np.cos(self.state.orientation),
            y=self.state.position[1] - wb * np.sin(self.state.orientation),
            orientation=self.state.orientation,
            velocity=self.state.velocity,
            acceleration=self.state.acceleration,
            steering_angle=self.state.steering_angle,
            yaw_rate=self.state.yaw_rate,
        )

    def pre_step(self) -> AgentStatus:
        """Status/goal bookkeeping before planning (agent.py:185-230)."""
        if self.status in (AgentStatus.COMPLETED_SUCCESS, AgentStatus.COLLISION,
                           AgentStatus.TIMELIMIT, AgentStatus.ERROR):
            return self.status
        self.status = AgentStatus.RUNNING
        if self.goal_reached():
            self.status = AgentStatus.COMPLETED_SUCCESS
            self.message = "success"
        return self.status

    def needs_replan(self) -> bool:
        return self.current_plan is None or self.plan_step >= self.k_replan

    def ensure_x_cl(self):
        if self.x_cl is None:
            ra = self._rear_axle_state()
            self.x_cl = compute_initial_state_np(
                self.planner.ref_np, ra, self.veh.wheelbase,
                ra.velocity < self.config.planning.low_vel_mode_threshold,
            )
        return self.x_cl

    def apply_external_plan(self, plan) -> None:
        """Accept a plan computed by the batched device stepper."""
        self.current_plan = plan
        self.plan_step = 0

    def step(self, predictions, obstacle_xy, obstacle_valid) -> AgentStatus:
        """One simulation step: maybe replan, then execute the next state."""
        import time as _time

        if self.pre_step() != AgentStatus.RUNNING:
            return self.status

        need_replan = self.needs_replan()
        if need_replan:
            t0 = _time.perf_counter()
            try:
                self.interface.update_planner(predictions, obstacle_xy, obstacle_valid)
                plan = self.interface.step_interface()
            except Exception as e:  # containment: agent degrades, sim continues
                self.status = AgentStatus.ERROR
                self.message = f"planner error: {e}"
                return self.status
            self.record.planning_times.append(_time.perf_counter() - t0)
            if plan is not None and self.logger is not None:
                self.logger.log_cycle(
                    self.state.time_step, plan, self.planner.infeasible_histogram,
                    self.record.planning_times[-1], self.planner.desired_velocity,
                    cost_weights=self.config.cost_weights,
                )
                if (self.config.debug.save_all_traj
                        and self.planner.last_cycle is not None):
                    res, mat, msk = self.planner.last_cycle
                    self.logger.log_all_candidates(
                        self.state.time_step, res, mat, msk,
                        dt=self.config.planning.dt)
            if plan is None:
                self.status = AgentStatus.ERROR
                self.message = "no feasible trajectory"
                return self.status
            self.current_plan = plan
            self.plan_step = 0

        return self.execute_next_state()

    def execute_next_state(self) -> AgentStatus:
        """Consume the next state of the current plan
        (frenet_interface.py:229-287)."""
        # execute the next planned state
        self.plan_step += 1
        j = self.plan_step
        plan = self.current_plan
        j = min(j, len(plan.x) - 1)
        wb = self.veh.wb_rear_axle
        theta = float(plan.theta[j])
        center = np.array([
            plan.x[j] + wb * np.cos(theta),
            plan.y[j] + wb * np.sin(theta),
        ])
        self.state = EgoState(
            time_step=self.state.time_step + 1,
            position=center,
            orientation=theta,
            velocity=float(plan.v[j]),
            acceleration=float(plan.a[j]),
            yaw_rate=(float(plan.theta[j]) - float(plan.theta[j - 1])) / self.dt if j > 0 else 0.0,
            steering_angle=float(np.arctan2(self.veh.wheelbase * plan.kappa[j], 1.0)),
        )
        self.record.states.append(self.state)
        # curvilinear state carried to the next replan
        self.x_cl = (
            np.array([plan.s[j], plan.s_dot[j], plan.s_ddot[j]]),
            np.array([plan.d[j], plan.d_dot[j], plan.d_ddot[j]]),
        )
        return self.status

    def set_collision(self):
        self.status = AgentStatus.COLLISION
        self.message = "collision"

    def set_timelimit(self):
        self.status = AgentStatus.TIMELIMIT
        self.message = "time limit reached"
