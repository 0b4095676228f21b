"""Post-collision analysis report.

Behavioral spec: `coll_report`
(/root/reference/cr_scenario_handler/evaluation/collision_report.py:24-206):
identify the collision partner, compute the harm estimate for both parties at
the impact state (momentum-exchange Δv + the configured harm model), write a
report and a crash-geometry plot.
"""
from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["collision_report"]


def collision_report(agent, scenario, veh, log_dir=None, other_agents=None):
    """Analyze the collision that ended `agent`; returns the report dict."""
    import jax.numpy as jnp

    from frenetix_tpu.risk.harm import (
        log_reg_harm, obstacle_mass, obstacle_protection, pedestrian_harm,
    )

    st = agent.state
    t = st.time_step
    partner = None
    partner_state = None
    best_d = np.inf
    candidates = list(scenario.obstacles.values())
    for ob in candidates:
        if ob.obstacle_id == agent.id:
            continue
        obs_st = ob.state_at_time(t)
        if obs_st is None:
            continue
        d = float(np.linalg.norm(np.asarray(obs_st.position) - st.position))
        if d < best_d:
            best_d, partner, partner_state = d, ob, obs_st

    report = {
        "agent_id": agent.id,
        "time_step": int(t),
        "ego_velocity": float(st.velocity),
        "ego_position": [float(v) for v in st.position],
    }
    if partner is not None and best_d < (veh.length + partner.length):
        # crash kinematics (harm_estimation.py simplified-angle path)
        pdof = partner_state.orientation - st.orientation + np.pi
        rel = np.arctan2(partner_state.position[1] - st.position[1],
                         partner_state.position[0] - st.position[0])
        ego_angle = rel - st.orientation
        obs_angle = np.pi + rel - partner_state.orientation
        delta_v = np.sqrt(max(
            st.velocity**2 + partner_state.velocity**2
            + 2 * st.velocity * partner_state.velocity * np.cos(pdof), 0.0,
        ))
        m_obs = obstacle_mass(partner.obstacle_type, partner.length * partner.width)
        m_obs = max(m_obs, 1.0)
        ego_dv = m_obs / (veh.mass + m_obs) * delta_v
        obs_dv = veh.mass / (veh.mass + m_obs) * delta_v
        prot = obstacle_protection(partner.obstacle_type)
        ego_harm = float(log_reg_harm(jnp.asarray(ego_dv), jnp.asarray(ego_angle)))
        if prot == 1:
            obs_harm = float(log_reg_harm(jnp.asarray(obs_dv), jnp.asarray(obs_angle)))
        elif prot == 0:
            obs_harm = float(pedestrian_harm(jnp.asarray(obs_dv)))
        else:
            obs_harm = 1.0
        report.update({
            "partner_id": partner.obstacle_id,
            "partner_type": partner.obstacle_type,
            "partner_velocity": float(partner_state.velocity),
            "distance": best_d,
            "pdof_rad": float(pdof),
            "delta_v_ego": float(ego_dv),
            "delta_v_partner": float(obs_dv),
            "ego_harm": ego_harm,
            "partner_harm": obs_harm,
        })
    else:
        report["partner_id"] = None
        report["note"] = "no collision partner identified (road boundary?)"

    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        with open(os.path.join(log_dir, f"collision_report_agent_{agent.id}.json"), "w") as f:
            json.dump(report, f, indent=2)
        try:
            _plot_crash(agent, scenario, partner, t, veh,
                        os.path.join(log_dir, f"collision_agent_{agent.id}.png"))
        except Exception:
            pass
    return report


def _plot_crash(agent, scenario, partner, t, veh, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from frenetix_tpu.utils.visualization import _draw_lanelets, _vehicle_patch

    fig, ax = plt.subplots(figsize=(8, 7))
    _draw_lanelets(ax, scenario)
    hist = np.array([s.position for s in agent.record.states])
    ax.plot(hist[:, 0], hist[:, 1], "b.-", ms=2)
    _vehicle_patch(ax, agent.state.position, agent.state.orientation,
                   veh.length, veh.width, "#cc3333")
    if partner is not None:
        st = partner.state_at_time(t)
        if st is not None:
            _vehicle_patch(ax, st.position, st.orientation, partner.length,
                           partner.width, "#4477aa")
    ax.set_xlim(agent.state.position[0] - 30, agent.state.position[0] + 30)
    ax.set_ylim(agent.state.position[1] - 25, agent.state.position[1] + 25)
    ax.set_aspect("equal")
    ax.set_title(f"collision — agent {agent.id} @ t={t}")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
