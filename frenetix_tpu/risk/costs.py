"""Risk computation & ethical aggregation, batched over all candidates.

Behavioral spec: `/root/reference/risk_assessment/risk_costs.py` and
`harm_estimation.py:217-355` (simplified crash-angle path, the default —
risk.json `crash_angle_simplified: true`):

  per (candidate, obstacle, timestep):
    pdof  = pred_yaw - θ_ego + π
    rel   = atan2(pred_y - y, pred_x - x)
    angles: ego = rel - θ_ego,  obstacle = π + rel - pred_yaw
    Δv    = √(v² + v_pred² + 2·v·v_pred·cos(pdof))   (momentum exchange)
    harms = model(Δv·m_other/(m_ego+m_other), angle)
    risk  = harm · collision_probability;  max over time, then obstacles.

  Ethical aggregation principles (:124-227): bayesian, equality, maximin, ego;
  responsibility via the ±45° action-space view check (responsibility.py:57-89).

The reference computes this per-trajectory in Python (only for the selected /
fallback trajectories); here the whole (M, O, T) tensor is one fused device
computation so risk can be a first-class cost term for every candidate.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from frenetix_tpu.risk import harm as harm_mod
from frenetix_tpu.risk.probability import collision_probability_fast, inv_mahalanobis

__all__ = ["DEFAULT_RISK_MODES", "TrajectoryRisks", "trajectory_risks",
           "bayesian_costs", "equality_costs", "maximin_costs", "ego_costs",
           "responsibility_costs"]

# configurations/risk.json defaults
DEFAULT_RISK_MODES = {
    "harm_mode": "log_reg",
    "ignore_angle": False,
    "sym_angle": True,
    "reduced_angle_areas": True,
    "crash_angle_simplified": True,
    "fast_prob_mahalanobis": False,
    "trajectory_risk": "max",
    "max_acceptable_risk": 1.0,
}


class TrajectoryRisks(NamedTuple):
    ego_risk_per_obst: jnp.ndarray   # (M, O) max-over-time ego risk
    obst_risk_per_obst: jnp.ndarray  # (M, O)
    ego_harm_per_obst: jnp.ndarray   # (M, O) max-over-time harm
    obst_harm_per_obst: jnp.ndarray  # (M, O)
    ego_risk: jnp.ndarray            # (M,) max over obstacles
    obst_risk: jnp.ndarray           # (M,)
    obst_present: jnp.ndarray        # (O,) bool
    coll_prob_per_obst: jnp.ndarray = None  # (M, O) max-over-time coll. prob


def _harm_tensors(ro, preds, meta, ego_mass, coeffs, modes, pl):
    """(ego_harm, obst_harm) of shape (M, O, pl) — the harm_model dispatch
    (harm_estimation.py:128-240) batched: pdof/impact angles via the
    simplified crash-angle model (helpers/properties.py:327-359), the
    mass-ratio Δv split (:51-75), then the protected/unprotected model
    selection.  Factored out so the reference-chain oracle
    (tests/test_harm_dispatch_oracle.py) can pin it directly."""
    theta = ro.theta_gl[:, None, :pl]          # (M, 1, t)
    v_ego = ro.v[:, None, :pl]
    x = ro.x[:, None, :pl]
    y = ro.y[:, None, :pl]
    pred_yaw = preds.orientations[None, :, :pl]  # (1, O, t)
    pred_v = preds.velocities[None, :, :pl]
    px = preds.means[None, :, :pl, 0]
    py = preds.means[None, :, :pl, 1]

    pdof = pred_yaw - theta + jnp.pi
    rel = jnp.arctan2(py - y, px - x)
    ego_angle = rel - theta
    obs_angle = jnp.pi + rel - pred_yaw

    delta_v = jnp.sqrt(
        jnp.maximum(
            v_ego**2 + pred_v**2 + 2.0 * v_ego * pred_v * jnp.cos(pdof), 0.0
        )
    )
    m_obst = meta.mass[None, :, None]
    ego_dv = m_obst / (ego_mass + m_obst) * delta_v
    obst_dv = ego_mass / (ego_mass + m_obst) * delta_v

    kw = dict(
        coeffs=coeffs,
        ignore_angle=modes["ignore_angle"],
        sym=modes["sym_angle"],
        reduced=modes["reduced_angle_areas"],
    )
    if modes["harm_mode"] == "log_reg":
        harm_prot_ego = harm_mod.log_reg_harm(ego_dv, ego_angle, **kw)
        harm_prot_obs = harm_mod.log_reg_harm(obst_dv, obs_angle, **kw)
    elif modes["harm_mode"] == "ref_speed":
        harm_prot_ego = harm_mod.ref_speed_harm(ego_dv, ego_angle, **kw)
        harm_prot_obs = harm_mod.ref_speed_harm(obst_dv, obs_angle, **kw)
    else:  # gidas
        harm_prot_ego = harm_mod.gidas_harm(ego_dv, coeffs)
        harm_prot_obs = harm_mod.gidas_harm(obst_dv, coeffs)

    # unprotected opponents: ego harm via ignore-angle log-reg, obstacle via
    # the pedestrian regression; static structures → harm 1
    # (harm_estimation.py:155-172, get_model :397-420)
    harm_unprot_ego = harm_mod.log_reg_harm(ego_dv, ego_angle, coeffs=coeffs,
                                            ignore_angle=True)
    harm_unprot_obs = harm_mod.pedestrian_harm(obst_dv, coeffs)

    prot = meta.protected[None, :, None]
    ego_harm = jnp.where(prot == 1, harm_prot_ego,
                         jnp.where(prot == 0, harm_unprot_ego, 1.0))
    obst_harm = jnp.where(prot == 1, harm_prot_obs,
                          jnp.where(prot == 0, harm_unprot_obs, 1.0))
    return ego_harm, obst_harm


def trajectory_risks(
    ro,
    preds,
    meta: harm_mod.ObstacleMeta,
    ego_mass: float,
    coeffs=None,
    modes=None,
) -> TrajectoryRisks:
    """Batched `calc_risk` (risk_costs.py:20-121) over all candidates."""
    coeffs = coeffs or harm_mod.DEFAULT_HARM_COEFFS
    modes = modes or DEFAULT_RISK_MODES
    m = ro.x.shape[0]
    o = preds.num_obstacles
    dtype = ro.x.dtype
    if o == 0:
        z2 = jnp.zeros((m, 0), dtype)
        z1 = jnp.zeros((m,), dtype)
        return TrajectoryRisks(z2, z2, z2, z2, z1, z1, jnp.zeros((0,), bool), z2)

    n1 = ro.x.shape[1]
    # harm alignment: ego step i vs prediction step i, i = 0..pl-1
    # (harm_estimation.py:247-249: pred_length = min(len(traj.x)-1, len(pred)))
    pl = min(n1 - 1, preds.horizon)
    ego_harm, obst_harm = _harm_tensors(ro, preds, meta, ego_mass, coeffs,
                                        modes, pl)

    # collision probability (risk_costs.py:66-80); output index j ↔ ego step
    # j+1, the reference multiplies harm[t]·prob[t] elementwise (:97-105)
    if modes["fast_prob_mahalanobis"]:
        prob, pt = inv_mahalanobis(ro, preds)
    else:
        from frenetix_tpu.ops.kinematics import VehicleParams

        veh = VehicleParams()  # only length/width used for the 3-rect shape
        prob, pt = collision_probability_fast(ro, preds, veh)
    t = min(pl, pt)
    step_ok = preds.valid[None, :, :t]
    ego_risk_t = ego_harm[..., :t] * prob[..., :t] * step_ok
    obst_risk_t = obst_harm[..., :t] * prob[..., :t] * step_ok

    obst_present = jnp.any(preds.valid, axis=1)
    pm = obst_present[None, :]
    ego_risk_po = jnp.max(ego_risk_t, axis=2) * pm
    obst_risk_po = jnp.max(obst_risk_t, axis=2) * pm
    ego_harm_po = jnp.max(ego_harm[..., :t] * step_ok, axis=2) * pm
    obst_harm_po = jnp.max(obst_harm[..., :t] * step_ok, axis=2) * pm

    return TrajectoryRisks(
        ego_risk_per_obst=ego_risk_po,
        obst_risk_per_obst=obst_risk_po,
        ego_harm_per_obst=ego_harm_po,
        obst_harm_per_obst=obst_harm_po,
        ego_risk=jnp.max(ego_risk_po, axis=1),
        obst_risk=jnp.max(obst_risk_po, axis=1),
        obst_present=obst_present,
        coll_prob_per_obst=jnp.max(prob[..., :t] * step_ok, axis=2) * pm,
    )


def _n_present(risks):
    return jnp.maximum(jnp.sum(risks.obst_present), 1)


def bayesian_costs(risks: TrajectoryRisks, boundary_harm):
    """(Σ ego_risk + Σ obst_risk + boundary_harm) / (2·n) (risk_costs.py:124-146)."""
    n = _n_present(risks)
    return (
        jnp.sum(risks.ego_risk_per_obst, axis=1)
        + jnp.sum(risks.obst_risk_per_obst, axis=1)
        + boundary_harm
    ) / (2.0 * n)


def equality_costs(risks: TrajectoryRisks):
    """Σ |ego_risk_o - obst_risk_o| / n (risk_costs.py:149-174)."""
    n = _n_present(risks)
    return jnp.sum(
        jnp.abs(risks.ego_risk_per_obst - risks.obst_risk_per_obst), axis=1
    ) / n


def maximin_costs(risks: TrajectoryRisks, boundary_harm, eps=1e-9, scale=10):
    """max harm among near-zero-risk partners, ^scale (risk_costs.py:177-204)."""
    mm_ego = risks.ego_harm_per_obst * (risks.ego_risk_per_obst < eps)
    mm_obst = risks.obst_harm_per_obst * (risks.obst_risk_per_obst < eps)
    m = jnp.maximum(jnp.max(mm_ego, axis=1), jnp.max(mm_obst, axis=1))
    return jnp.maximum(m, boundary_harm) ** scale


def ego_costs(risks: TrajectoryRisks, boundary_harm):
    """Σ ego_risk + boundary_harm (risk_costs.py:207-222)."""
    return jnp.sum(risks.ego_risk_per_obst, axis=1) + boundary_harm


def responsibility_costs(risks: TrajectoryRisks, preds, ego_position, ego_orientation):
    """Action-space responsibility: obstacles outside the ego's forward ±45°
    sector carry their own risk (responsibility.py:57-89, sign as in
    get_responsibility_cost :251): cost = -Σ resp_o · obst_risk_o."""
    rel = jnp.arctan2(
        preds.means[:, 0, 1] - ego_position[1],
        preds.means[:, 0, 0] - ego_position[0],
    )
    inside = jnp.abs(
        jnp.mod(rel - ego_orientation + jnp.pi, 2 * jnp.pi) - jnp.pi
    ) <= (jnp.pi / 4.0)
    resp = jnp.where(inside, 0.0, 1.0) * risks.obst_present
    return -jnp.sum(resp[None, :] * risks.obst_risk_per_obst, axis=1)
