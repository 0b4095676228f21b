"""CommonRoad 2020a scenario XML reader (host-side, stdlib ElementTree).

Replaces the reference's dependency on the `commonroad-io` package
(`CommonRoadFileReader`, used at cr_scenario_handler/utils/general.py:17 via
simulation.py:142) with a dependency-free reader covering what the planning
stack consumes: the lanelet network (bounds, topology, adjacency), static and
dynamic obstacles with their trajectories, and planning problems (initial
state + goal region with position/time/velocity/orientation conditions).
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

__all__ = [
    "Lanelet",
    "Obstacle",
    "State",
    "GoalCondition",
    "PlanningProblem",
    "Scenario",
    "load_scenario",
]


@dataclass
class State:
    """One trajectory/initial state (exact values)."""

    time_step: int
    position: np.ndarray  # (2,)
    orientation: float = 0.0
    velocity: float = 0.0
    acceleration: float = 0.0
    yaw_rate: float = 0.0


@dataclass
class Lanelet:
    lanelet_id: int
    left_vertices: np.ndarray   # (V, 2)
    right_vertices: np.ndarray  # (V, 2)
    center_vertices: np.ndarray  # (V, 2)
    successors: list[int] = field(default_factory=list)
    predecessors: list[int] = field(default_factory=list)
    adj_left: Optional[int] = None
    adj_left_same_direction: bool = False
    adj_right: Optional[int] = None
    adj_right_same_direction: bool = False
    lanelet_type: str = ""

    @property
    def polygon(self) -> np.ndarray:
        """Closed ring: left bound + reversed right bound."""
        return np.concatenate([self.left_vertices, self.right_vertices[::-1]], axis=0)

    def contains_point(self, p) -> bool:
        return bool(_point_in_ring(np.asarray(p, dtype=np.float64), self.polygon))


@dataclass
class Obstacle:
    obstacle_id: int
    obstacle_type: str          # car / truck / pedestrian / ...
    role: str                   # "dynamic" | "static"
    length: float
    width: float
    initial_state: State
    trajectory: list[State] = field(default_factory=list)  # dynamic only
    shape_kind: str = "rectangle"

    def state_at_time(self, t: int) -> Optional[State]:
        """State at scenario time step t; None once the obstacle disappears
        (matches commonroad DynamicObstacle.state_at_time semantics)."""
        if t == self.initial_state.time_step:
            return self.initial_state
        if self.role == "static":
            s = self.initial_state
            return State(t, s.position, s.orientation, 0.0, 0.0)
        for st in self.trajectory:
            if st.time_step == t:
                return st
        return None

    @property
    def final_time_step(self) -> int:
        if self.trajectory:
            return self.trajectory[-1].time_step
        return self.initial_state.time_step


@dataclass
class GoalCondition:
    """One goal state of a planning problem (conditions AND-combined)."""

    position_lanelets: list[int] = field(default_factory=list)
    position_shape: Optional[np.ndarray] = None  # (V, 2) polygon ring
    time_interval: Optional[tuple[int, int]] = None
    velocity_interval: Optional[tuple[float, float]] = None
    orientation_interval: Optional[tuple[float, float]] = None


@dataclass
class PlanningProblem:
    problem_id: int
    initial_state: State
    goals: list[GoalCondition]


@dataclass
class Scenario:
    scenario_id: str
    dt: float
    lanelets: dict[int, Lanelet]
    obstacles: dict[int, Obstacle]
    planning_problems: dict[int, PlanningProblem]

    @property
    def dynamic_obstacles(self) -> list[Obstacle]:
        return [o for o in self.obstacles.values() if o.role == "dynamic"]

    @property
    def static_obstacles(self) -> list[Obstacle]:
        return [o for o in self.obstacles.values() if o.role == "static"]

    @property
    def max_time_step(self) -> int:
        steps = [o.final_time_step for o in self.dynamic_obstacles]
        return max(steps) if steps else 0

    def find_lanelets_by_position(self, p) -> list[int]:
        p = np.asarray(p, dtype=np.float64)
        return [lid for lid, ll in self.lanelets.items() if ll.contains_point(p)]

    def drivable_polygons(self) -> list[np.ndarray]:
        return [ll.polygon for ll in self.lanelets.values()]


# --------------------------------------------------------------------------
# parsing helpers
# --------------------------------------------------------------------------


def _point_in_ring(p: np.ndarray, ring: np.ndarray) -> bool:
    a = ring
    b = np.roll(ring, -1, axis=0)
    cond = (a[:, 1] > p[1]) != (b[:, 1] > p[1])
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = a[:, 0] + (p[1] - a[:, 1]) * (b[:, 0] - a[:, 0]) / (b[:, 1] - a[:, 1])
    return bool(np.sum(cond & (p[0] < x_int)) % 2)


def _points(el) -> np.ndarray:
    pts = [
        (float(pt.findtext("x")), float(pt.findtext("y"))) for pt in el.findall("point")
    ]
    return np.asarray(pts, dtype=np.float64)


def _exact(el, name, default=0.0) -> float:
    sub = el.find(name)
    if sub is None:
        return default
    txt = sub.findtext("exact")
    return float(txt) if txt is not None else default


def _interval(el, name):
    sub = el.find(name)
    if sub is None:
        return None
    lo = sub.findtext("intervalStart")
    hi = sub.findtext("intervalEnd")
    if lo is None or hi is None:
        ex = sub.findtext("exact")
        if ex is not None:
            return (float(ex), float(ex))
        return None
    return (float(lo), float(hi))


def _parse_state(el) -> State:
    pos_el = el.find("position")
    point = pos_el.find("point") if pos_el is not None else None
    if point is not None:
        position = np.array(
            [float(point.findtext("x")), float(point.findtext("y"))], dtype=np.float64
        )
    else:
        position = np.zeros(2)
    t = el.find("time")
    time_step = int(float(t.findtext("exact"))) if t is not None and t.findtext("exact") else 0
    return State(
        time_step=time_step,
        position=position,
        orientation=_exact(el, "orientation"),
        velocity=_exact(el, "velocity"),
        acceleration=_exact(el, "acceleration"),
        yaw_rate=_exact(el, "yawRate"),
    )


def _parse_lanelet(el) -> Lanelet:
    left = _points(el.find("leftBound"))
    right = _points(el.find("rightBound"))
    n = min(len(left), len(right))
    left, right = left[:n], right[:n]
    ll = Lanelet(
        lanelet_id=int(el.attrib["id"]),
        left_vertices=left,
        right_vertices=right,
        center_vertices=(left + right) / 2.0,
        successors=[int(s.attrib["ref"]) for s in el.findall("successor")],
        predecessors=[int(s.attrib["ref"]) for s in el.findall("predecessor")],
        lanelet_type=(el.findtext("laneletType") or "").strip(),
    )
    adj_l = el.find("adjacentLeft")
    if adj_l is not None:
        ll.adj_left = int(adj_l.attrib["ref"])
        ll.adj_left_same_direction = adj_l.attrib.get("drivingDir", "same") == "same"
    adj_r = el.find("adjacentRight")
    if adj_r is not None:
        ll.adj_right = int(adj_r.attrib["ref"])
        ll.adj_right_same_direction = adj_r.attrib.get("drivingDir", "same") == "same"
    return ll


def _parse_shape(el) -> tuple[str, float, float]:
    rect = el.find("rectangle")
    if rect is not None:
        return "rectangle", float(rect.findtext("length")), float(rect.findtext("width"))
    circ = el.find("circle")
    if circ is not None:
        r = float(circ.findtext("radius"))
        return "circle", 2 * r, 2 * r
    poly = el.find("polygon")
    if poly is not None:
        pts = _points(poly)
        ext = pts.max(axis=0) - pts.min(axis=0)
        return "polygon", float(ext[0]), float(ext[1])
    return "rectangle", 4.5, 2.0


def _parse_obstacle(el, role: str) -> Obstacle:
    kind, length, width = _parse_shape(el.find("shape"))
    init = _parse_state(el.find("initialState"))
    traj = []
    traj_el = el.find("trajectory")
    if traj_el is not None:
        traj = [_parse_state(st) for st in traj_el.findall("state")]
        traj.sort(key=lambda s: s.time_step)
    return Obstacle(
        obstacle_id=int(el.attrib["id"]),
        obstacle_type=(el.findtext("type") or "car").strip(),
        role=role,
        length=length,
        width=width,
        initial_state=init,
        trajectory=traj,
        shape_kind=kind,
    )


def _parse_planning_problem(el, lanelets) -> PlanningProblem:
    init = _parse_state(el.find("initialState"))
    goals = []
    for goal_el in el.findall("goalState"):
        g = GoalCondition()
        pos = goal_el.find("position")
        if pos is not None:
            g.position_lanelets = [int(l.attrib["ref"]) for l in pos.findall("lanelet")]
            rect = pos.find("rectangle")
            if rect is not None:
                length = float(rect.findtext("length"))
                width = float(rect.findtext("width"))
                c_el = rect.find("center")
                if c_el is not None:
                    cx = float(c_el.findtext("x"))
                    cy = float(c_el.findtext("y"))
                else:
                    cx = cy = 0.0
                o_el = rect.findtext("orientation")
                ang = float(o_el) if o_el else 0.0
                ca, sa = np.cos(ang), np.sin(ang)
                rot = np.array([[ca, -sa], [sa, ca]])
                half = np.array(
                    [[length, width], [length, -width], [-length, -width], [-length, width]]
                ) / 2.0
                g.position_shape = (half @ rot.T) + np.array([cx, cy])
        ti = _interval(goal_el, "time")
        if ti is not None:
            g.time_interval = (int(ti[0]), int(ti[1]))
        g.velocity_interval = _interval(goal_el, "velocity")
        g.orientation_interval = _interval(goal_el, "orientation")
        goals.append(g)
    return PlanningProblem(
        problem_id=int(el.attrib["id"]), initial_state=init, goals=goals
    )


def load_scenario(path: str) -> Scenario:
    """Parse a CommonRoad 2020a XML file."""
    tree = ET.parse(path)
    root = tree.getroot()
    dt = float(root.attrib.get("timeStepSize", "0.1"))
    scenario_id = root.attrib.get("benchmarkID", "unknown")

    lanelets = {}
    for el in root.findall("lanelet"):
        ll = _parse_lanelet(el)
        lanelets[ll.lanelet_id] = ll

    obstacles = {}
    for el in root.findall("dynamicObstacle"):
        ob = _parse_obstacle(el, "dynamic")
        obstacles[ob.obstacle_id] = ob
    for el in root.findall("staticObstacle"):
        ob = _parse_obstacle(el, "static")
        obstacles[ob.obstacle_id] = ob
    # legacy single-tag form
    for el in root.findall("obstacle"):
        role = (el.findtext("role") or "dynamic").strip().lower()
        ob = _parse_obstacle(el, role)
        obstacles[ob.obstacle_id] = ob

    problems = {}
    for el in root.findall("planningProblem"):
        pp = _parse_planning_problem(el, lanelets)
        problems[pp.problem_id] = pp

    return Scenario(
        scenario_id=scenario_id,
        dt=dt,
        lanelets=lanelets,
        obstacles=obstacles,
        planning_problems=problems,
    )
