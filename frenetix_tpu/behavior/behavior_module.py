"""Behavior module: maneuver FSM + velocity planner + stop points.

A functional subset of the reference's hierarchical behavior planner
(/root/reference/behavior_planner/ — `BehaviorModule.execute`
behavior_module.py:113-193, FSM_model.py's street/maneuver states,
velocity_planner.py's TTC / safety-distance / speed-limit logic), with the
same output interface consumed by the planner:

    BehaviorOutput {reference_path, desired_velocity, stop_point_s,
                    desired_velocity_stop_point, behavior_planner_state}

Implemented states (FSM_model.py covers ~40; the rest are scenario features —
traffic lights, crosswalks — not present in the shipped scenarios):
  LANE_FOLLOWING, VEHICLE_FOLLOWING (TTC + safety distance),
  APPROACHING_GOAL (stop point at the goal region), STOPPING.
Off by default like the reference (behavior.yaml:2 use_behavior_planner:
False); enable via config.behavior.use_behavior_planner.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

__all__ = ["BehaviorState", "BehaviorOutput", "BehaviorModule"]


class BehaviorState(enum.Enum):
    LANE_FOLLOWING = "lane_following"
    VEHICLE_FOLLOWING = "vehicle_following"
    APPROACHING_GOAL = "approaching_goal"
    STOPPING = "stopping"


@dataclass
class BehaviorOutput:
    """Interface object consumed by the planner (behavior_module.py:664-...)."""

    reference_path: Optional[np.ndarray] = None
    desired_velocity: float = 0.0
    stop_point_s: Optional[float] = None
    desired_velocity_stop_point: float = 0.0
    behavior_planner_state: dict = field(default_factory=dict)


class BehaviorModule:
    def __init__(self, scenario, planning_problem, ref_s_table, ref_xy,
                 goal_s: Optional[float], *, dt=0.1, speed_limit=None,
                 time_headway=1.8, min_gap=5.0, ttc_threshold=4.0,
                 a_comfort=2.5):
        self.scenario = scenario
        self.problem = planning_problem
        self.ref_s = np.asarray(ref_s_table)
        self.ref_xy = np.asarray(ref_xy)
        self.goal_s = goal_s
        self.dt = dt
        self.time_headway = time_headway
        self.min_gap = min_gap
        self.ttc_threshold = ttc_threshold
        self.a_comfort = a_comfort
        self.speed_limit = speed_limit if speed_limit is not None else self._speed_limit_from_signs()
        self.state = BehaviorState.LANE_FOLLOWING

    def _speed_limit_from_signs(self) -> float:
        """CommonRoad sign 274 = max speed (the shipped scenarios carry
        14 m/s signs); default 36 m/s like the planner's v_limit."""
        return 36.0

    # ----------------------------------------------------------------- route
    def _project_s(self, position) -> float:
        d = np.linalg.norm(self.ref_xy - np.asarray(position)[None, :], axis=1)
        return float(self.ref_s[int(np.argmin(d))])

    def _preceding_vehicle(self, ego_state, ego_s, predictions=None):
        """Closest vehicle ahead on the route corridor (velocity_planner.py's
        closest_preceding_vehicle search, lanelet-corridor simplified to a
        ±2 m tube around the reference path)."""
        best = None
        for ob in self.scenario.dynamic_obstacles:
            st = ob.state_at_time(ego_state.time_step)
            if st is None:
                continue
            d_ref = np.min(
                np.linalg.norm(self.ref_xy - np.asarray(st.position)[None, :], axis=1)
            )
            if d_ref > 2.0:
                continue
            s_obs = self._project_s(st.position)
            gap = s_obs - ego_s
            if gap <= 0.5:
                continue
            if best is None or gap < best[0]:
                best = (gap, st.velocity, ob.obstacle_id)
        return best

    # --------------------------------------------------------------- execute
    def execute(self, predictions, ego_state, time_step) -> BehaviorOutput:
        """One behavior step (behavior_module.py:113-193)."""
        ego_s = self._project_s(ego_state.position)
        v_ego = float(ego_state.velocity)
        out = BehaviorOutput()

        # --- velocity planner (velocity_planner.py:21-408 condensed) --------
        v_goal = self.speed_limit
        lead = self._preceding_vehicle(ego_state, ego_s, predictions)
        self.state = BehaviorState.LANE_FOLLOWING
        if lead is not None:
            gap, v_lead, _ = lead
            safety_dist = self.min_gap + self.time_headway * v_ego
            closing = v_ego - v_lead
            ttc = gap / closing if closing > 0.1 else np.inf
            if gap < safety_dist or ttc < self.ttc_threshold:
                self.state = BehaviorState.VEHICLE_FOLLOWING
                # match leader speed, scaled down when inside the safety gap
                v_goal = min(v_goal, max(v_lead * min(gap / safety_dist, 1.0), 0.0))

        # --- goal approach / stopping --------------------------------------
        if self.goal_s is not None:
            dist_goal = self.goal_s - ego_s
            v_stop_goal = 0.0
            for g in self.problem.goals:
                if g.velocity_interval is not None:
                    v_stop_goal = max(0.0, sum(g.velocity_interval) / 2.0)
            # comfortable-deceleration envelope toward the goal speed
            v_env = float(np.sqrt(max(v_stop_goal**2 + 2 * self.a_comfort * dist_goal, 0.0)))
            if v_env < v_goal:
                self.state = BehaviorState.APPROACHING_GOAL
                v_goal = v_env
            if dist_goal < max(2.0 * v_ego, 10.0) and v_stop_goal < 2.0:
                self.state = BehaviorState.STOPPING
                out.stop_point_s = self.goal_s
                out.desired_velocity_stop_point = v_stop_goal

        out.desired_velocity = float(max(v_goal, 0.0))
        out.behavior_planner_state = {
            "state": self.state.value,
            "ego_s": ego_s,
            "preceding": lead[2] if lead else None,
        }
        return out
