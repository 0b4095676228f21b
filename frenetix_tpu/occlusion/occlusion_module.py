"""Occlusion module: phantom agents at occlusion boundaries + safety gating.

The reference hooks an external package (TUM-AVS/Frenetix-Occlusion, configured
by configurations/simulation/occlusion.yaml and called via
`occlusion_module.trajectory_safety_assessment` at planner.py:385-389 /
:337-339).  This module implements the configured feature set natively:

  - spawn locator: occlusion boundary points behind static/dynamic obstacles
    (the shadow edge as seen from the ego) and behind corridor turns,
  - agent manager: phantom pedestrians/bicycles at spawn points with
    inflated-uncertainty constant-velocity predictions toward the ego
    corridor (occlusion.yaml agent_manager parameters),
  - safety assessment: phantom rows are appended to the cycle's
    PredictionTensors so the existing batched risk stack prices them;
    candidates whose phantom harm/risk exceed the configured thresholds are
    excluded from selection (the reference marks them invalid,
    planner.py:337-339).

Off by default (occlusion.yaml use_occlusion_module: False).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import numpy as np

__all__ = ["PhantomSpec", "OcclusionModule", "PhantomThresholds",
           "phantom_safety_mask"]

# occlusion.yaml agent_manager defaults (per-type phantom parameters)
PHANTOM_TYPES = {
    "pedestrian": dict(velocity=1.4, length=0.3, width=0.5),
    "bicycle": dict(velocity=5.0, length=2.0, width=0.9),
    "car": dict(velocity=10.0, length=4.8, width=2.0),
    "truck": dict(velocity=10.0, length=9.0, width=2.5),
}


class PhantomThresholds(NamedTuple):
    """occlusion.yaml metric_thresholds: None = metric deactivated.

    `harm` ('hr') / `risk` / `cp` / `be` are severity metrics — a candidate
    is unsafe when the metric EXCEEDS its threshold.  `ttc` / `wttc` /
    `ttce` / `dce` are criticality metrics (smaller = worse) — unsafe when
    the metric falls BELOW its threshold.  The defaults reproduce the
    reference's default gate (harm 0.1, risk 1, everything else null)."""

    harm: Optional[float] = 0.1
    risk: Optional[float] = 1.0
    cp: Optional[float] = None
    ttc: Optional[float] = None
    wttc: Optional[float] = None
    ttce: Optional[float] = None
    dce: Optional[float] = None
    be: Optional[float] = None

    @staticmethod
    def from_config(occ_cfg) -> "PhantomThresholds":
        t = dict(occ_cfg.metric_thresholds or {})
        unknown = set(t) - set(PhantomThresholds._fields)
        if unknown:
            # a typo'd threshold key must not silently leave the gate at its
            # defaults (cf. the strict --set override contract)
            raise ValueError(
                f"unknown occlusion metric threshold(s) {sorted(unknown)}; "
                f"valid: {list(PhantomThresholds._fields)}"
            )
        t.setdefault("harm", occ_cfg.harm_threshold)
        t.setdefault("risk", occ_cfg.risk_threshold)
        return PhantomThresholds(**{
            k: (None if t.get(k) is None else float(t[k]))
            for k in PhantomThresholds._fields
        })


def phantom_safety_mask(risks, phantom_mask, thresholds: PhantomThresholds,
                        *, rollout=None, preds=None, veh=None, dt=0.1,
                        a_max=8.0):
    """(M,) bool safe-mask of candidates against PHANTOM obstacle rows,
    per the activated metric thresholds (occlusion.yaml activated_metrics /
    metric_thresholds; the reference's external occlusion module invalidates
    failing candidates at planner.py:337-339).

    jnp-pure and jit/vmap-safe (`thresholds` is static Python): the ONE
    definition shared by the host gate (ReactivePlanner.plan) and the fused
    device batch (parallel.mesh._one_agent_select).

    Metric definitions against each phantom's mean trajectory:
      harm — expected phantom harm (harm x collision probability; raw harm
             alone would reject any moving candidate however unlikely the
             encounter), per phantom;
      risk — the same, summed over phantoms;
      cp   — max-over-time collision probability, per phantom;
      dce  — distance of closest encounter (center distance, min over time);
      ttce — time of the closest encounter;
      ttc  — first time the center distance enters the combined enclosing
             circles (inf = never);
      wttc — worst-case ttc: the phantom additionally closes 1/2 a_max t^2
             (it may accelerate toward the ego);
      be   — required constant braking to stop before the closest-encounter
             gap, in m/s^2 (the upstream package is external; this is the
             documented in-repo definition).

    `rollout`/`preds`/`veh` are only required when a geometric metric
    (cp/ttc/wttc/ttce/dce/be) is activated."""
    import jax.numpy as jnp

    pm = jnp.asarray(phantom_mask)
    pmr = pm[None, :]
    safe = None

    def AND(s, c):
        return c if s is None else s & c

    phantom_risk = jnp.where(pmr, risks.obst_risk_per_obst, 0.0)
    if thresholds.harm is not None:
        safe = AND(safe, jnp.all(phantom_risk <= thresholds.harm, axis=1))
    if thresholds.risk is not None:
        safe = AND(safe, jnp.sum(phantom_risk, axis=1) <= thresholds.risk)
    if thresholds.cp is not None:
        cp = jnp.where(pmr, risks.coll_prob_per_obst, 0.0)
        safe = AND(safe, jnp.all(cp <= thresholds.cp, axis=1))

    geom = (thresholds.ttc, thresholds.wttc, thresholds.ttce, thresholds.dce,
            thresholds.be)
    if any(g is not None for g in geom):
        big = jnp.asarray(1e9, rollout.x.dtype)
        n = min(rollout.x.shape[1] - 1, preds.means.shape[1])
        ex, ey = rollout.x[:, None, 1:n + 1], rollout.y[:, None, 1:n + 1]
        px = preds.means[None, :, :n, 0]
        py = preds.means[None, :, :n, 1]
        d = jnp.hypot(ex - px, ey - py)                        # (M, O, n)
        d = jnp.where(pmr[..., None], d, big)
        t = (jnp.arange(1, n + 1, dtype=rollout.x.dtype)) * dt
        # enclosing-circle contact radius, (O,); veh.length/width may be
        # traced scalars (the fused batch passes ctx.veh under jit)
        r = 0.5 * (jnp.hypot(preds.lengths, preds.widths)
                   + jnp.hypot(jnp.asarray(veh.length, rollout.x.dtype),
                               jnp.asarray(veh.width, rollout.x.dtype)))
        if thresholds.dce is not None:
            dce = jnp.where(pmr, jnp.min(d, axis=2), big)
            safe = AND(safe, jnp.all(dce >= thresholds.dce, axis=1))
        if thresholds.ttce is not None:
            tce = jnp.where(pmr, t[jnp.argmin(d, axis=2)], big)
            safe = AND(safe, jnp.all(tce >= thresholds.ttce, axis=1))
        if thresholds.ttc is not None:
            hit = d <= r[None, :, None]
            ttc = jnp.min(jnp.where(hit, t, big), axis=2)
            safe = AND(safe, jnp.all(ttc >= thresholds.ttc, axis=1))
        if thresholds.wttc is not None:
            hit = d <= r[None, :, None] + 0.5 * a_max * t[None, None, :] ** 2
            wttc = jnp.min(jnp.where(hit, t, big), axis=2)
            safe = AND(safe, jnp.all(wttc >= thresholds.wttc, axis=1))
        if thresholds.be is not None:
            i_ce = jnp.argmin(d, axis=2)                       # (M, O)
            v_ce = jnp.take_along_axis(
                jnp.broadcast_to(rollout.v[:, None, 1:n + 1], d.shape),
                i_ce[..., None], axis=2,
            )[..., 0]
            gap = jnp.maximum(jnp.min(d, axis=2) - r[None, :], 0.5)
            be = jnp.where(pmr, v_ce ** 2 / (2.0 * gap), 0.0)
            safe = AND(safe, jnp.all(be <= thresholds.be, axis=1))

    if safe is None:
        return jnp.ones(risks.obst_risk_per_obst.shape[0], bool)
    return safe


def external_occlusion_costs(rollout, *, w_pm=0.0, w_um=0.0, w_ve=0.0,
                             risks=None, phantom_mask=None, ego=None,
                             r_vis=None, occluder_pts=None,
                             occluder_valid=None):
    """(M,) soft occlusion cost terms (cost.yaml external_cost_weights; the
    reference wires these to the external Frenetix-Occlusion package — the
    in-repo definitions, all pure jnp and batched over candidates:

      occ_pm — Phantom Module: expected harm against phantom rows
               (Σ over phantoms of harm × collision probability),
      occ_um — Uncertainty Map: mean depth of trajectory points BEYOND the
               visible range of their ray (distance into unobserved space,
               from the polar visibility map `r_vis` (K,) around `ego`),
      occ_ve — Visibility Estimator: exp-decay proximity to occluder
               silhouette points — lateral clearance from occluders widens
               the visible wedge, so closeness is penalized.
    """
    import jax.numpy as jnp

    m = rollout.x.shape[0]
    cost = jnp.zeros(m, rollout.x.dtype)
    if w_pm and risks is not None and phantom_mask is not None:
        pm = jnp.asarray(phantom_mask)[None, :]
        cost = cost + w_pm * jnp.sum(
            jnp.where(pm, risks.obst_risk_per_obst, 0.0), axis=1)
    need_geometry = (w_um and r_vis is not None) or (
        w_ve and occluder_pts is not None and occluder_pts.shape[0] > 0)
    if need_geometry:
        if ego is None:
            raise ValueError("occ_um/occ_ve require the ego position")
        ex, ey = ego[0], ego[1]
        x, y = rollout.x[:, 1:], rollout.y[:, 1:]
    if w_um and r_vis is not None:
        r_vis = jnp.asarray(r_vis)
        k = r_vis.shape[0]
        d = jnp.hypot(x - ex, y - ey)
        ang = jnp.arctan2(y - ey, x - ex)
        # nearest-ray lookup, mirroring VisibleArea.r_at
        idx = jnp.round((ang + jnp.pi) / (2.0 * jnp.pi) * k).astype(jnp.int32) % k
        depth = jnp.maximum(d - r_vis[idx], 0.0)
        cost = cost + w_um * jnp.mean(depth, axis=1)
    if w_ve and occluder_pts is not None and occluder_pts.shape[0] > 0:
        pts = jnp.asarray(occluder_pts)                       # (Q, 2)
        dq = jnp.hypot(x[:, None, :] - pts[None, :, 0:1],
                       y[:, None, :] - pts[None, :, 1:2])     # (M, Q, N)
        if occluder_valid is not None:
            big = jnp.asarray(1e9, rollout.x.dtype)
            dq = jnp.where(jnp.asarray(occluder_valid)[None, :, None], dq, big)
        d_near = jnp.min(dq, axis=1)                          # (M, N)
        cost = cost + w_ve * jnp.mean(jnp.exp(-d_near / 2.0), axis=1)
    return cost


@dataclass
class PhantomSpec:
    position: np.ndarray
    heading: float
    agent_type: str = "pedestrian"


@dataclass
class OcclusionModule:
    scenario: object
    sensor_radius: float = 50.0
    max_phantoms: int = 4
    harm_threshold: float = 0.1       # metric_thresholds.harm
    risk_threshold: float = 1.0       # metric_thresholds.risk
    variance_factor: float = 1.05
    phantom_type: str = "pedestrian"
    # full metric gate (None → built from harm/risk thresholds above)
    thresholds: Optional[PhantomThresholds] = None
    # spawn_locator flags (occlusion.yaml): which occlusion sources get
    # phantom spawn points, and how many per category
    spawn_point_behind_dynamic_obstacle: bool = True
    spawn_point_behind_static_obstacle: bool = True
    spawn_points_behind_turn: bool = False
    max_dynamic_spawn_points: int = 4
    max_static_spawn_points: int = 4
    # agent_manager size inflation factors (occlusion.yaml size_factor_*)
    size_factor_length: float = 1.2
    size_factor_width: float = 1.3
    # reference path for turn spawn points (set by the owning agent)
    route_xy: Optional[np.ndarray] = None
    # gate geometry context (set by the planner when geometric metrics are on)
    veh: object = None
    dt: float = 0.1
    _last_phantoms: list = field(default_factory=list)

    def __post_init__(self):
        if self.thresholds is None:
            self.thresholds = PhantomThresholds(harm=self.harm_threshold,
                                                risk=self.risk_threshold)

    # ------------------------------------------------------------ spawn points
    def find_spawn_points(self, ego_state, time_step, route_xy=None):
        """Occlusion boundary points (spawn_locator semantics): for each
        obstacle between the ego and its shadow, the point just past the
        obstacle's silhouette edge; optionally points behind route turns
        (the unseen inside of a street corner).  Returns up to
        `max_phantoms` PhantomSpecs, nearest first, respecting the
        per-category spawn_locator caps."""
        ego = np.asarray(ego_state.position, dtype=float)
        dyn, stat = [], []
        for ob in self.scenario.obstacles.values():
            is_dynamic = getattr(ob, "role", "dynamic") == "dynamic"
            if is_dynamic and not self.spawn_point_behind_dynamic_obstacle:
                continue
            if not is_dynamic and not self.spawn_point_behind_static_obstacle:
                continue
            st = ob.state_at_time(time_step)
            if st is None:
                continue
            d_vec = np.asarray(st.position) - ego
            dist = float(np.hypot(*d_vec))
            if dist < 2.0 or dist > self.sensor_radius:
                continue
            ray = d_vec / dist
            # silhouette edge: offset perpendicular to the view ray by the
            # obstacle's half extent, then step behind the obstacle
            perp = np.array([-ray[1], ray[0]])
            half = max(ob.length, ob.width) / 2.0
            for side in (+1.0, -1.0):
                p = np.asarray(st.position) + side * perp * (half + 0.5) + ray * 1.0
                # phantom walks toward the ego's forward corridor
                heading = float(np.arctan2(-side * perp[1], -side * perp[0]))
                (dyn if is_dynamic else stat).append(
                    (dist, PhantomSpec(p, heading, self.phantom_type)))
        dyn.sort(key=lambda x: x[0])
        stat.sort(key=lambda x: x[0])
        specs = (dyn[: self.max_dynamic_spawn_points]
                 + stat[: self.max_static_spawn_points])
        if self.spawn_points_behind_turn:
            specs += self._turn_spawn_points(ego, route_xy)
        specs.sort(key=lambda x: x[0])
        self._last_phantoms = [s for _, s in specs[: self.max_phantoms]]
        return self._last_phantoms

    def _turn_spawn_points(self, ego, route_xy=None, kappa_threshold=0.03):
        """Spawn points on the unseen inside of route turns ahead
        (spawn_points_behind_turn): at the first high-curvature route point
        within sensor range, offset one lane width toward the turn center,
        heading across the ego's path."""
        xy = route_xy if route_xy is not None else self.route_xy
        if xy is None or len(xy) < 5:
            return []
        xy = np.asarray(xy, dtype=float)
        seg = np.linalg.norm(np.diff(xy, axis=0), axis=1)
        s = np.concatenate([[0.0], np.cumsum(seg)])
        dx, dy = np.gradient(xy[:, 0], s), np.gradient(xy[:, 1], s)
        ddx, ddy = np.gradient(dx, s), np.gradient(dy, s)
        kappa = (dx * ddy - dy * ddx) / np.maximum(
            (dx * dx + dy * dy) ** 1.5, 1e-12)
        dist = np.linalg.norm(xy - ego[None], axis=1)
        ahead = (dist > 5.0) & (dist < self.sensor_radius)
        hot = np.where(ahead & (np.abs(kappa) > kappa_threshold))[0]
        if len(hot) == 0:
            return []
        i = int(hot[np.argmin(dist[hot])])
        normal = np.array([-dy[i], dx[i]])
        normal /= max(np.linalg.norm(normal), 1e-9)
        inside = normal * np.sign(kappa[i])        # toward the turn center
        p = xy[i] + 3.6 * inside
        heading = float(np.arctan2(-inside[1], -inside[0]))
        return [(float(dist[i]), PhantomSpec(p, heading, self.phantom_type))]

    # --------------------------------------------------------------- phantoms
    def phantom_prediction_rows(self, specs, horizon, dt, dtype=np.float32):
        """PredictionTensors field rows for the phantom agents (constant
        velocity toward their heading, inflated covariance)."""
        params = PHANTOM_TYPES[self.phantom_type]
        o = len(specs)
        means = np.zeros((o, horizon, 2), dtype)
        covs = np.zeros((o, horizon, 2, 2), dtype)
        orientations = np.zeros((o, horizon), dtype)
        velocities = np.full((o, horizon), params["velocity"], dtype)
        steps = np.arange(1, horizon + 1)
        for k, sp in enumerate(specs):
            heading = np.array([np.cos(sp.heading), np.sin(sp.heading)])
            means[k] = sp.position[None] + (
                params["velocity"] * dt * steps
            )[:, None] * heading[None]
            orientations[k] = sp.heading
            var = (0.3 + 0.2 * steps * dt) * self.variance_factor
            covs[k, :, 0, 0] = var
            covs[k, :, 1, 1] = var
        inv = np.linalg.inv(covs.astype(np.float64)).astype(dtype)
        return dict(
            means=means, covs=covs, inv_covs=inv, orientations=orientations,
            velocities=velocities,
            lengths=np.full(o, params["length"] * self.size_factor_length, dtype),
            widths=np.full(o, params["width"] * self.size_factor_width, dtype),
            valid=np.ones((o, horizon), bool),
        )

    def augment_predictions(self, pd, ego_state, time_step, dt):
        """Append phantom rows into free slots of a prediction dict."""
        specs = self.find_spawn_points(ego_state, time_step)
        if not specs:
            return pd, 0
        horizon = pd["means"].shape[1]
        rows = self.phantom_prediction_rows(specs, horizon, dt, pd["means"].dtype)
        free = np.where(~pd["valid"].any(axis=1))[0]
        n = min(len(free), len(specs))
        for j in range(n):
            slot = free[j]
            for key in ("means", "covs", "inv_covs", "orientations",
                        "velocities", "lengths", "widths", "valid"):
                pd[key][slot] = rows[key][j]
        return pd, n

    # ------------------------------------------------- external-cost inputs
    def polar_map(self, ego_state, time_step, n_rays: int = 720):
        """(r_vis (K,), ego (2,)) — polar visibility map around the ego from
        obstacle shadows within sensor range (input to the occ_um uncertainty
        cost).  Road walls are deliberately excluded: off-road space is
        handled by the boundary check, not priced as 'unobserved'.

        Agent-converted obstacles are skipped via `occluder_exclude` (their
        scenario trajectories go stale when they become agents) and their
        LIVE poses occlude via `extra_occluders` — both set per step by the
        owning simulation, mirroring the sensor path.  Cached per time_step
        (densification levels within one plan call reuse it)."""
        key = (int(time_step), n_rays)
        if getattr(self, "_polar_cache_key", None) == key:
            return self._polar_cache
        from frenetix_tpu.sim.visible_area import (
            obstacle_obb_segments, polar_visibility,
        )

        exclude = getattr(self, "occluder_exclude", frozenset())
        extras = getattr(self, "extra_occluders", ())
        ego = np.asarray(ego_state.position, dtype=np.float64)
        segs = []
        for ob in self.scenario.obstacles.values():
            if ob.obstacle_id in exclude:
                continue
            st = ob.state_at_time(time_step)
            if st is None:
                continue
            # extent margin: a body protruding into range occludes even when
            # its center is just outside (cf. compute_visible_area)
            if (np.linalg.norm(np.asarray(st.position) - ego)
                    > self.sensor_radius + max(ob.length, ob.width)):
                continue
            segs.append(obstacle_obb_segments(
                st.position, st.orientation, ob.length, ob.width))
        for pos, theta, length, width in extras:
            if (np.linalg.norm(np.asarray(pos) - ego)
                    > self.sensor_radius + max(length, width)):
                continue
            segs.append(obstacle_obb_segments(pos, theta, length, width))
        segs = (np.concatenate(segs, axis=0) if segs
                else np.zeros((0, 2, 2)))
        _, r_vis = polar_visibility(ego, segs, self.sensor_radius, n_rays)
        self._polar_cache_key = key
        self._polar_cache = (r_vis, ego)
        return r_vis, ego

    def occluder_points(self):
        """(Q, 2) padded silhouette points of the current phantoms + (Q,)
        valid mask (input to the occ_ve visibility-adaptation cost); fixed
        Q = max_phantoms so the jitted cost program does not retrace."""
        q = self.max_phantoms
        pts = np.zeros((q, 2))
        valid = np.zeros(q, bool)
        for i, sp in enumerate(self._last_phantoms[:q]):
            pts[i] = sp.position
            valid[i] = True
        return pts, valid

    # -------------------------------------------------------------- assessment
    def trajectory_safety_assessment(self, risks, phantom_mask, rollout=None,
                                     preds=None):
        """(M,) bool safe-mask per the activated metric thresholds
        (occlusion.yaml; reference invalidates at planner.py:337-339).
        Delegates to the shared `phantom_safety_mask` — the same function the
        fused device batch uses.

        risks: risk.costs.TrajectoryRisks for the cycle (phantom rows
        included); phantom_mask: (O,) bool marking which obstacle rows are
        phantoms; rollout/preds: required when a geometric metric
        (cp/ttc/wttc/ttce/dce/be) is activated."""
        return phantom_safety_mask(
            risks, phantom_mask, self.thresholds,
            rollout=rollout, preds=preds, veh=self.veh, dt=self.dt,
        )
