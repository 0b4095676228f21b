"""Criticality metrics: per-agent, per-timestep measures.

The metric set mirrors the reference's `Measures`
(/root/reference/cr_scenario_handler/evaluation/metrics.py:19-931; enabled set
in configurations/simulation/evaluation.yaml): HW, THW, TTC, TIT, TET, DCE,
TTCE, a_long_req, BTN, a_lat_req, STN, ET, PET, MSD, PSD, jerk(/lat/long),
acc(/lat/long), v(/lat/long).

Implementation notes (differences to the reference documented per metric):
computed post-hoc on host NumPy over the recorded state history; leading-
vehicle search uses the ego frame (ahead within a lateral corridor) instead of
the reference's curvilinear lanelet projection; ET/PET use a conflict-cell
grid approximation instead of lanelet intersection polygons.
"""
from __future__ import annotations

import numpy as np

__all__ = ["CRITICALITY_METRICS", "Measures"]

CRITICALITY_METRICS = [
    "hw", "thw", "ttc", "tit", "tet", "dce", "ttce", "a_long_req", "btn",
    "a_lat_req", "stn", "et", "pet", "msd", "psd", "jerk", "jerk_lat",
    "jerk_long", "acc", "a_lat", "a_long", "v", "v_lat", "v_long",
]


class Measures:
    """Computes all enabled metrics for one agent over its history.

    states: list of EgoState (position, orientation, velocity, acceleration,
    yaw_rate, time_step); obstacle trajectories come from the scenario plus
    the other agents' histories.
    """

    def __init__(self, agent_id, scenario, states, other_histories=None, *,
                 dt=0.1, a_max_long=11.5, a_max_lat=8.0, radius=100.0, tau=2.0,
                 lane_halfwidth=1.75, veh_length=4.508, veh_width=1.61):
        self.agent_id = agent_id
        self.scenario = scenario
        self.states = states
        self.dt = dt
        self.a_max_long = a_max_long
        self.a_max_lat = a_max_lat
        self.radius = radius
        self.tau = tau
        self.lane_halfwidth = lane_halfwidth
        self.veh_length = veh_length
        self.veh_width = veh_width

        self.t_steps = np.array([s.time_step for s in states])
        self.pos = np.array([s.position for s in states])          # (T, 2)
        self.theta = np.array([s.orientation for s in states])
        self.vel = np.array([s.velocity for s in states])
        self.acc_arr = np.array([s.acceleration for s in states])
        self.yaw_rate = np.array([getattr(s, "yaw_rate", 0.0) for s in states])

        self._others = self._collect_others(other_histories or {})
        self._lead = None
        self._dist = None

    # ------------------------------------------------------------- obstacles
    def _collect_others(self, other_histories):
        """Per-timestep (position, velocity, orientation) of every other
        traffic participant within `radius` (metrics.py:95-115)."""
        out = []
        agent_ids = set(other_histories.keys())
        for ob in self.scenario.dynamic_obstacles:
            if ob.obstacle_id == self.agent_id or ob.obstacle_id in agent_ids:
                continue
            out.append(("obs", ob))
        for aid, hist in other_histories.items():
            if aid != self.agent_id:
                out.append(("agent", hist))
        return out

    def _other_state(self, entry, t):
        kind, data = entry
        if kind == "obs":
            return data.state_at_time(t)
        for s in data:
            if s.time_step == t:
                return s
        return None

    def _relative_states(self):
        """(T, O, 4): [dist, rel_long, rel_lat, v_obs] per step; NaN if absent."""
        if self._dist is not None:
            return self._dist
        t_len = len(self.states)
        o = len(self._others)
        rel = np.full((t_len, o, 4), np.nan)
        for ti, t in enumerate(self.t_steps):
            c, s = np.cos(self.theta[ti]), np.sin(self.theta[ti])
            for oi, entry in enumerate(self._others):
                st = self._other_state(entry, int(t))
                if st is None:
                    continue
                d = np.asarray(st.position) - self.pos[ti]
                dist = float(np.hypot(d[0], d[1]))
                if dist > self.radius:
                    continue
                rel[ti, oi] = [dist, d[0] * c + d[1] * s, -d[0] * s + d[1] * c,
                               st.velocity]
        self._dist = rel
        return rel

    def _leading(self):
        """Per-step index/headway/velocity of the closest obstacle ahead in
        the ego corridor (stand-in for the curvilinear same-lane search)."""
        if self._lead is not None:
            return self._lead
        rel = self._relative_states()
        ahead = (rel[:, :, 1] > 0) & (np.abs(rel[:, :, 2]) < self.lane_halfwidth)
        long_gap = np.where(ahead, rel[:, :, 1], np.inf)
        idx = np.argmin(long_gap, axis=1) if rel.shape[1] else np.zeros(len(self.states), int)
        hw = np.take_along_axis(long_gap, idx[:, None], axis=1)[:, 0] if rel.shape[1] else np.full(len(self.states), np.inf)
        v_obs = np.take_along_axis(rel[:, :, 3], idx[:, None], axis=1)[:, 0] if rel.shape[1] else np.zeros(len(self.states))
        hw = hw - self.veh_length  # bumper-to-bumper
        self._lead = (hw, v_obs)
        return self._lead

    # ------------------------------------------------------------- kinematic
    def v(self):
        return self.vel.copy()

    def v_long(self):
        return self.vel * np.cos(0.0)  # slip-free single-track assumption

    def v_lat(self):
        """Lateral velocity from the heading-relative position increments."""
        out = np.zeros_like(self.vel)
        if len(self.pos) > 1:
            d = np.diff(self.pos, axis=0) / self.dt
            lat = -d[:, 0] * np.sin(self.theta[:-1]) + d[:, 1] * np.cos(self.theta[:-1])
            out[1:] = lat
        return out

    def a_long(self):
        return self.acc_arr.copy()

    def a_lat(self):
        return self.vel * self.yaw_rate

    def acc(self):
        return np.hypot(self.a_long(), self.a_lat())

    def jerk_long(self):
        out = np.zeros_like(self.acc_arr)
        out[1:] = np.diff(self.a_long()) / self.dt
        return out

    def jerk_lat(self):
        out = np.zeros_like(self.acc_arr)
        out[1:] = np.diff(self.a_lat()) / self.dt
        return out

    def jerk(self):
        return np.hypot(self.jerk_long(), self.jerk_lat())

    # ------------------------------------------------------------ criticality
    def hw(self):
        return self._leading()[0]

    def thw(self):
        hw, _ = self._leading()
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(self.vel > 0.1, hw / self.vel, np.inf)

    def ttc(self):
        hw, v_obs = self._leading()
        closing = self.vel - v_obs
        with np.errstate(divide="ignore", invalid="ignore"):
            ttc = np.where((closing > 0.1) & np.isfinite(hw), hw / closing, np.inf)
        return np.maximum(ttc, 0.0)

    def tet(self):
        """Per-step indicator·dt of TTC < tau (TET = its sum)."""
        return (self.ttc() < self.tau).astype(float) * self.dt

    def tit(self):
        """Per-step ∫(1/TTC - 1/tau)dt contribution for TTC < tau."""
        ttc = self.ttc()
        mask = (ttc < self.tau) & (ttc > 1e-6)
        out = np.zeros_like(ttc)
        out[mask] = (1.0 / ttc[mask] - 1.0 / self.tau) * self.dt
        return out

    def dce(self):
        """Distance of closest encounter up to each step (running min)."""
        rel = self._relative_states()
        if rel.shape[1] == 0:
            return np.full(len(self.states), np.inf)
        d = np.nanmin(np.where(np.isnan(rel[:, :, 0]), np.inf, rel[:, :, 0]), axis=1)
        return np.minimum.accumulate(d)

    def ttce(self):
        """Time (steps·dt) until the closest encounter from each step."""
        rel = self._relative_states()
        if rel.shape[1] == 0:
            return np.full(len(self.states), np.inf)
        d = np.nanmin(np.where(np.isnan(rel[:, :, 0]), np.inf, rel[:, :, 0]), axis=1)
        t_min = int(np.argmin(d))
        return np.maximum((t_min - np.arange(len(d))) * self.dt, 0.0)

    def a_long_req(self):
        """Deceleration required to match the leader's speed within the gap:
        -(Δv)²/(2·hw)."""
        hw, v_obs = self._leading()
        closing = np.maximum(self.vel - v_obs, 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            req = np.where(
                np.isfinite(hw) & (hw > 0.1), -(closing**2) / (2.0 * hw), 0.0
            )
        return req

    def btn(self):
        return np.abs(self.a_long_req()) / self.a_max_long

    def a_lat_req(self):
        """Lateral acceleration needed to clear the leader laterally within
        TTC: 2·w_clear / TTC²."""
        ttc = self.ttc()
        w_clear = self.veh_width  # half widths of both vehicles, approximately
        with np.errstate(divide="ignore", invalid="ignore"):
            req = np.where(np.isfinite(ttc) & (ttc > 1e-3), 2.0 * w_clear / ttc**2, 0.0)
        return req

    def stn(self):
        return self.a_lat_req() / self.a_max_lat

    def msd(self):
        """Minimum stopping distance v²/(2·a_max)."""
        return self.vel**2 / (2.0 * self.a_max_long)

    def psd(self):
        """Proportion of stopping distance: remaining gap / MSD."""
        hw, _ = self._leading()
        msd = self.msd()
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(msd > 0.1, hw / msd, np.inf)

    def et(self):
        """Encroachment time: per-step dt spent within the conflict cell (any
        other participant's path cell, 2 m grid)."""
        cells = self._conflict_cells()
        if not cells:
            return np.zeros(len(self.states))
        ego_cells = {tuple((p // 2.0).astype(int)) for p in self.pos}
        out = np.array(
            [self.dt if tuple((p // 2.0).astype(int)) in cells else 0.0
             for p in self.pos]
        )
        return out

    def pet(self):
        """Post-encroachment time: min |t_ego - t_other| over shared 2 m path
        cells (per step: the scenario-global PET)."""
        cells = self._conflict_cell_times()
        pet = np.inf
        for ti, p in enumerate(self.pos):
            key = tuple((p // 2.0).astype(int))
            if key in cells:
                for t_other in cells[key]:
                    pet = min(pet, abs(self.t_steps[ti] - t_other) * self.dt)
        return np.full(len(self.states), pet)

    def _conflict_cells(self):
        cells = set()
        for entry in self._others:
            for t in self.t_steps:
                st = self._other_state(entry, int(t))
                if st is not None:
                    cells.add(tuple((np.asarray(st.position) // 2.0).astype(int)))
        return cells

    def _conflict_cell_times(self):
        cells: dict = {}
        for entry in self._others:
            kind, data = entry
            t_range = range(int(self.t_steps[0]), int(self.t_steps[-1]) + 1)
            for t in t_range:
                st = self._other_state(entry, t)
                if st is not None:
                    key = tuple((np.asarray(st.position) // 2.0).astype(int))
                    cells.setdefault(key, []).append(t)
        return cells

    def compute(self, metrics=None):
        """→ pandas DataFrame indexed by time_step."""
        import pandas as pd

        metrics = metrics or CRITICALITY_METRICS
        data = {}
        for m in metrics:
            try:
                data[m] = getattr(self, m)()
            except Exception:
                data[m] = np.full(len(self.states), np.nan)
        return pd.DataFrame(data, index=self.t_steps)
