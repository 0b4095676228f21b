"""Simple reachable sets for responsibility assessment.

Behavioral spec: `ReachSetSimple` / `simple_reachable_set`
(/root/reference/frenetix_motion_planner/utility/reachable_set_simple.py:9,114)
+ the reach-set responsibility check (`calc_responsibility_reach_set`,
frenetix_motion_planner/utility/responsibility.py:6-54): per obstacle and
future time t, an over-approximating occupancy polygon; if the ego's planned
position at t lies OUTSIDE every obstacle's reach set, the obstacle cannot
cause that conflict and its risk is subtracted from the responsibility cost.

TPU-native design: the reference builds pygeos polygon unions along lanelet
successor chains; here each reach set is an analytic sector-annulus
over-approximation (acceleration-bounded speed interval × heading spread that
grows with yaw-rate capability), and point-in-set tests are closed-form —
batched over (candidates × obstacles × timesteps) on device.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["reach_set_params", "point_in_reach_set", "responsibility_reach_set"]


def reach_set_params(preds, *, a_max=7.0, yaw_spread_rate=0.35):
    """Per-(obstacle, timestep) reach-set parameters from current obstacle
    states: radius interval [r_min, r_max] and heading spread at each future
    step.  preds: PredictionTensors (uses step-0 pose/velocity only — reach
    sets bound what the obstacle COULD do, not the prediction)."""
    o, t_pred = preds.orientations.shape
    dt_steps = jnp.arange(1, t_pred + 1, dtype=preds.means.dtype)
    v0 = preds.velocities[:, 0][:, None]           # (O, 1)
    tt = dt_steps[None, :] * 0.1                   # (1, T) horizon seconds
    r_max = v0 * tt + 0.5 * a_max * tt**2
    r_min = jnp.maximum(v0 * tt - 0.5 * a_max * tt**2, 0.0)
    spread = jnp.minimum(yaw_spread_rate * tt, jnp.pi / 2)
    return dict(
        origin=preds.means[:, 0],                  # (O, 2)
        heading=preds.orientations[:, 0],          # (O,)
        r_min=r_min, r_max=r_max, spread=spread,   # (O, T)
    )


def point_in_reach_set(points, rs):
    """points (..., T, 2) → (..., O, T) bool: inside the sector annulus."""
    d = points[..., None, :, :] - rs["origin"][None, :, None, :]  # (..., O, T, 2)
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ang = jnp.arctan2(d[..., 1], d[..., 0])
    dang = jnp.abs(jnp.mod(ang - rs["heading"][None, :, None] + jnp.pi, 2 * jnp.pi) - jnp.pi)
    inside = (
        (dist >= rs["r_min"][None] - 1e-6)
        & (dist <= rs["r_max"][None] + 1e-6)
        & (dang <= rs["spread"][None])
    )
    # standstill-capable: near the origin is always reachable
    inside = inside | (dist <= 2.0)
    return inside


def responsibility_reach_set(ro, preds, risks):
    """(M,) responsibility cost via reach sets: for obstacles whose reach set
    never contains the ego trajectory, subtract their risk
    (responsibility.py:36-53 semantics)."""
    o = preds.num_obstacles
    m = ro.x.shape[0]
    if o == 0:
        return jnp.zeros(m, ro.x.dtype)
    t = min(ro.x.shape[1] - 1, preds.horizon)
    rs = reach_set_params(preds)
    ego = jnp.stack([ro.x[:, 1 : t + 1], ro.y[:, 1 : t + 1]], axis=-1)  # (M, t, 2)
    inside = point_in_reach_set(ego, {
        k: (v[:, :t] if getattr(v, "ndim", 0) == 2 else v) for k, v in rs.items()
    })  # (M, O, t)
    inside = inside & preds.valid[None, :, :t]
    ever_inside = jnp.any(inside, axis=2)  # (M, O)
    resp = jnp.where(ever_inside, 0.0, 1.0) * risks.obst_present[None, :]
    return -jnp.sum(resp * risks.obst_risk_per_obst, axis=1)
