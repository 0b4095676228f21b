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

import numpy as np

__all__ = ["PhantomSpec", "OcclusionModule"]

# occlusion.yaml agent_manager defaults
PHANTOM_TYPES = {
    "pedestrian": dict(velocity=1.4, length=0.3, width=0.5),
    "bicycle": dict(velocity=5.0, length=2.0, width=0.9),
}


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
    _last_phantoms: list = field(default_factory=list)

    # ------------------------------------------------------------ spawn points
    def find_spawn_points(self, ego_state, time_step, route_xy=None):
        """Occlusion boundary points: for each obstacle between the ego and
        its shadow, the point just past the obstacle's silhouette edge
        (spawn_locator semantics).  Returns up to `max_phantoms` PhantomSpecs,
        nearest first."""
        ego = np.asarray(ego_state.position, dtype=float)
        specs = []
        for ob in self.scenario.obstacles.values():
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
                specs.append((dist, PhantomSpec(p, heading, self.phantom_type)))
        specs.sort(key=lambda x: x[0])
        self._last_phantoms = [s for _, s in specs[: self.max_phantoms]]
        return self._last_phantoms

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
            lengths=np.full(o, params["length"] * 1.2, dtype),
            widths=np.full(o, params["width"] * 1.3, dtype),
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

    # -------------------------------------------------------------- assessment
    def trajectory_safety_assessment(self, risks, phantom_mask):
        """(M,) bool safe-mask: candidate passes iff its harm/risk against
        every PHANTOM stays below the thresholds (occlusion.yaml
        metric_thresholds; reference invalidates at planner.py:337-339).

        risks: risk.costs.TrajectoryRisks for the cycle (phantom rows
        included); phantom_mask: (O,) bool marking which obstacle rows are
        phantoms."""
        import jax.numpy as jnp

        pm = jnp.asarray(phantom_mask)[None, :]
        # expected phantom harm = harm × collision probability (risk); raw
        # harm alone would reject any moving candidate regardless of how
        # unlikely the encounter is
        phantom_risk = jnp.where(pm, risks.obst_risk_per_obst, 0.0)
        harm_ok = jnp.all(phantom_risk <= self.harm_threshold, axis=1)
        risk_total_ok = jnp.sum(phantom_risk, axis=1) <= self.risk_threshold
        return harm_ok & risk_total_ok
