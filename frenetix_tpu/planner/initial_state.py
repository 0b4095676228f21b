"""Curvilinear initial-state computation (Werling Eqs. A.3 / A.5).

Behavioral spec: `Planner._compute_initial_states`
(/root/reference/frenetix_motion_planner/planner.py:567-635), which the C++
backend mirrors in `frenetix.compute_initial_state`
(reactive_planner_cpp.py:211-218).  Host-or-device callable (pure jnp); used
once per replanning cycle on a single state, and batched (vmap) over agents by
the multi-agent engine.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from frenetix_tpu.geometry import frenet as fr

__all__ = ["CartesianState", "compute_initial_state"]


class CartesianState(NamedTuple):
    """Planner state at the rear axle (ReactivePlannerState, state.py:15-75)."""

    x: jnp.ndarray
    y: jnp.ndarray
    orientation: jnp.ndarray
    velocity: jnp.ndarray
    acceleration: jnp.ndarray
    steering_angle: jnp.ndarray
    yaw_rate: jnp.ndarray


def compute_initial_state(ref, state: CartesianState, wheelbase, low_vel_mode: bool):
    """Cartesian state → curvilinear (x0_lon, x0_lat) triples.

    Returns ((s, ṡ, s̈), (d, ḋ, d̈)); in low-velocity mode the lateral
    derivatives are w.r.t. arclength (planner.py:617-624).
    """
    s, d = fr.cartesian_to_frenet(ref, state.x, state.y)
    idx, lam, _ = fr.segment_index(ref.s, s)

    theta_cl = state.orientation - fr.interp_angle_table(ref.theta, idx, lam)
    kr = fr.interp_table(ref.kappa, idx, lam)
    kr_d = fr.interp_table(ref.kappa_d, idx, lam)
    kappa_0 = jnp.tan(state.steering_angle) / wheelbase

    cos_t = jnp.cos(theta_cl)
    tan_t = jnp.tan(theta_cl)
    one_krd = 1.0 - kr * d

    # d' and d'' w.r.t. arclength — Werling A.3 / A.5 (planner.py:600-602)
    d_p = one_krd * tan_t
    d_pp = -(kr_d * d + kr * d_p) * tan_t + (one_krd / (cos_t * cos_t)) * (
        kappa_0 * one_krd / cos_t - kr
    )

    s_velocity = state.velocity * cos_t / one_krd
    s_acceleration = state.acceleration - (s_velocity**2 / cos_t) * (
        one_krd * tan_t * (kappa_0 * one_krd / cos_t - kr) - (kr_d * d + kr * d_p)
    )
    s_acceleration = s_acceleration / (one_krd / cos_t)

    if low_vel_mode:
        d_velocity = d_p
        d_acceleration = d_pp
    else:
        d_velocity = state.velocity * jnp.sin(theta_cl)
        d_acceleration = s_acceleration * d_p + s_velocity**2 * d_pp

    x0_lon = jnp.stack([s, s_velocity, s_acceleration])
    x0_lat = jnp.stack([d, d_velocity, d_acceleration])
    return x0_lon, x0_lat
