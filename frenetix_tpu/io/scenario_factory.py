"""Synthetic scenario generator: parametric road layouts for testing.

Broadens end-to-end coverage beyond the five shipped T-junction scenarios:
straight highways, constant-radius curves and S-curves with configurable
traffic (lead vehicles, oncoming traffic) and a goal region at the end of the
route.  Produces the same `Scenario` objects as the XML reader, and
`commonroad_writer.write_scenario` can persist them as valid 2020a XML.
"""
from __future__ import annotations

import numpy as np

from frenetix_tpu.io.commonroad import (
    GoalCondition, Lanelet, Obstacle, PlanningProblem, Scenario, State,
)

__all__ = ["make_highway", "make_curve", "make_s_curve", "make_overtake"]


def _lanelet_from_center(lid, center, half_width, successors=(), **kw):
    d = np.gradient(center, axis=0)
    theta = np.arctan2(d[:, 1], d[:, 0])
    normal = np.stack([-np.sin(theta), np.cos(theta)], axis=1)
    return Lanelet(
        lanelet_id=lid,
        left_vertices=center + half_width * normal,
        right_vertices=center - half_width * normal,
        center_vertices=center.copy(),
        successors=list(successors),
        **kw,
    )


def _traffic(center, speeds, dt, n_steps, start_offsets, lane_offset=0.0):
    """Vehicles following the centerline at constant speed."""
    from frenetix_tpu.geometry.refpath import polyline_pathlength

    s_tab = polyline_pathlength(center)
    d = np.gradient(center, axis=0)
    theta_tab = np.unwrap(np.arctan2(d[:, 1], d[:, 0]))
    normal = np.stack([-np.sin(theta_tab), np.cos(theta_tab)], axis=1)

    obstacles = {}
    for i, (v, s0) in enumerate(zip(speeds, start_offsets)):
        states = []
        for t in range(n_steps + 1):
            s = min(s0 + v * dt * t, s_tab[-1] - 1e-3)
            x = np.interp(s, s_tab, center[:, 0]) + lane_offset * np.interp(
                s, s_tab, normal[:, 0]
            )
            y = np.interp(s, s_tab, center[:, 1]) + lane_offset * np.interp(
                s, s_tab, normal[:, 1]
            )
            th = np.interp(s, s_tab, theta_tab)
            states.append(State(t, np.array([x, y]), float(th), float(v)))
        obstacles[100 + i] = Obstacle(
            obstacle_id=100 + i, obstacle_type="car", role="dynamic",
            length=4.5, width=2.0, initial_state=states[0], trajectory=states[1:],
        )
    return obstacles


def _assemble(scenario_id, centers, lane_width, obstacles, ego_v, goal_frac,
              dt, n_steps):
    lanelets = {}
    for k, c in enumerate(centers):
        succ = [50000 + k + 1] if k + 1 < len(centers) else []
        lanelets[50000 + k] = _lanelet_from_center(50000 + k, c, lane_width / 2, succ)

    route = np.concatenate(centers, axis=0)
    goal_idx = int(goal_frac * (len(route) - 1))
    goal_center = route[goal_idx]
    half = np.array([[5.0, 3.0], [5.0, -3.0], [-5.0, -3.0], [-5.0, 3.0]])
    goal = GoalCondition(
        position_shape=half + goal_center,
        time_interval=(0, n_steps),
        velocity_interval=(0.0, ego_v + 6.0),
    )
    d0 = route[1] - route[0]
    pp = PlanningProblem(
        problem_id=60000,
        initial_state=State(0, route[0] + 0.5 * d0, float(np.arctan2(d0[1], d0[0])),
                            float(ego_v)),
        goals=[goal],
    )
    return Scenario(scenario_id, dt, lanelets, obstacles, {60000: pp})


def make_highway(length=250.0, lanes=1, lane_width=3.6, ego_v=15.0,
                 lead_v=10.0, lead_gap=40.0, dt=0.1, n_steps=200):
    """Straight highway with a slower lead vehicle."""
    n = int(length)
    center = np.stack([np.linspace(0, length, n), np.zeros(n)], axis=1)
    obstacles = _traffic(center, [lead_v], dt, n_steps, [lead_gap])
    return _assemble("SYN_Highway-1", [center], lane_width, obstacles, ego_v,
                     0.9, dt, n_steps)


def make_curve(radius=80.0, arc=np.pi / 2, lane_width=3.6, ego_v=12.0,
               lead_v=8.0, dt=0.1, n_steps=200):
    """Constant-radius left curve with a lead vehicle."""
    n = max(int(radius * arc), 60)
    t = np.linspace(0, arc, n)
    center = np.stack([radius * np.sin(t), radius * (1 - np.cos(t))], axis=1)
    obstacles = _traffic(center, [lead_v], dt, n_steps, [35.0])
    return _assemble("SYN_Curve-1", [center], lane_width, obstacles, ego_v,
                     0.9, dt, n_steps)


def make_s_curve(radius=60.0, lane_width=3.6, ego_v=10.0, dt=0.1, n_steps=250):
    """S-curve (left then right) with two vehicles ahead."""
    n = max(int(radius * np.pi / 2), 60)
    t = np.linspace(0, np.pi / 3, n)
    c1 = np.stack([radius * np.sin(t), radius * (1 - np.cos(t))], axis=1)
    # mirror the curvature for the second half, continuing tangent
    th_end = np.pi / 3
    d = np.array([np.cos(th_end), np.sin(th_end)])
    nvec = np.array([np.sin(th_end), -np.cos(th_end)])
    c2 = (
        c1[-1][None]
        + radius * np.sin(t)[:, None] * d[None]
        + radius * (1 - np.cos(t))[:, None] * nvec[None]
    )
    center = np.concatenate([c1, c2[1:]], axis=0)
    obstacles = _traffic(center, [7.0, 9.0], dt, n_steps, [30.0, 70.0])
    return _assemble("SYN_SCurve-1", [center], lane_width, obstacles, ego_v,
                     0.85, dt, n_steps)


def make_overtake(length=220.0, lane_width=3.6, ego_v=14.0, lead_v=6.0,
                  lead_gap=35.0, dt=0.1, n_steps=200):
    """Two same-direction lanes; a slow lead blocks the right lane — the ego
    must use the lateral sampling range (and the left lane's drivable area)
    to get past it."""
    n = int(length)
    x = np.linspace(0, length, n)
    right_center = np.stack([x, np.zeros(n)], axis=1)
    left_center = np.stack([x, np.full(n, lane_width)], axis=1)

    right = _lanelet_from_center(50000, right_center, lane_width / 2)
    left = _lanelet_from_center(50001, left_center, lane_width / 2)
    right.adj_left = 50001
    right.adj_left_same_direction = True
    left.adj_right = 50000
    left.adj_right_same_direction = True
    lanelets = {50000: right, 50001: left}

    obstacles = _traffic(right_center, [lead_v], dt, n_steps, [lead_gap])

    goal_center = right_center[int(0.92 * (n - 1))]
    half = np.array([[6.0, 3.2], [6.0, -3.2], [-6.0, -3.2], [-6.0, 3.2]])
    goal = GoalCondition(
        position_shape=half + goal_center,
        time_interval=(0, n_steps),
        velocity_interval=(0.0, ego_v + 6.0),
    )
    pp = PlanningProblem(
        problem_id=60000,
        initial_state=State(0, right_center[0] + np.array([1.0, 0.0]), 0.0,
                            float(ego_v)),
        goals=[goal],
    )
    return Scenario("SYN_Overtake-1", dt, lanelets, obstacles, {60000: pp})
