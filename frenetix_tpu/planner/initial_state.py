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


def compute_initial_state_np(ref_np, state, wheelbase: float, low_vel_mode: bool):
    """Host NumPy twin of `compute_initial_state` for the per-cycle scalar case
    (one state; a device round-trip would cost more than the math).

    `state` needs fields x, y, orientation, velocity, acceleration,
    steering_angle.  Raises ValueError when the state cannot be projected, like
    the reference (planner.py:574-578, 606-608).
    """
    import numpy as np

    xy = np.asarray(ref_np.xy, dtype=np.float64)
    ref_s = np.asarray(ref_np.s, dtype=np.float64)
    p = np.array([float(state.x), float(state.y)])

    a = xy[:-1]
    b = xy[1:]
    ab = b - a
    seg_len2 = np.maximum(np.sum(ab * ab, axis=1), 1e-12)
    t = np.clip(np.sum((p[None] - a) * ab, axis=1) / seg_len2, 0.0, 1.0)
    closest = a + t[:, None] * ab
    dist2 = np.sum((p[None] - closest) ** 2, axis=1)
    i = int(np.argmin(dist2))
    s = float(ref_s[i] + t[i] * (ref_s[i + 1] - ref_s[i]))
    cross = ab[i, 0] * (p[1] - a[i, 1]) - ab[i, 1] * (p[0] - a[i, 0])
    d = float(np.sqrt(dist2[i])) * (1.0 if cross >= 0 else -1.0)

    ds = ref_s[1] - ref_s[0]
    idx = int(np.clip(np.floor(s / ds), 0, len(ref_s) - 2))
    lam = s / ds - idx

    def interp(tab):
        tab = np.asarray(tab, dtype=np.float64)
        return tab[idx] + lam * (tab[idx + 1] - tab[idx])

    theta_r = interp(ref_np.theta)
    theta_r = np.fmod(theta_r, 2 * np.pi)
    theta_cl = float(state.orientation) - theta_r
    kr = interp(ref_np.kappa)
    kr_d = interp(ref_np.kappa_d)
    kappa_0 = np.tan(float(state.steering_angle)) / wheelbase

    cos_t = np.cos(theta_cl)
    tan_t = np.tan(theta_cl)
    one_krd = 1.0 - kr * d

    d_p = one_krd * tan_t
    d_pp = -(kr_d * d + kr * d_p) * tan_t + (one_krd / cos_t**2) * (
        kappa_0 * one_krd / cos_t - kr
    )

    s_velocity = float(state.velocity) * cos_t / one_krd
    if s_velocity < 0:
        raise ValueError(
            "Initial state or reference incorrect: curvilinear velocity negative"
        )
    s_acceleration = float(state.acceleration) - (s_velocity**2 / cos_t) * (
        one_krd * tan_t * (kappa_0 * one_krd / cos_t - kr) - (kr_d * d + kr * d_p)
    )
    s_acceleration /= one_krd / cos_t

    if low_vel_mode:
        d_velocity = d_p
        d_acceleration = d_pp
    else:
        d_velocity = float(state.velocity) * np.sin(theta_cl)
        d_acceleration = s_acceleration * d_p + s_velocity**2 * d_pp

    return (
        np.array([s, s_velocity, s_acceleration]),
        np.array([d, d_velocity, d_acceleration]),
    )
