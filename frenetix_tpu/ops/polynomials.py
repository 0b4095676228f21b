"""Batched quartic/quintic polynomial trajectories (closed-form, no linear solver).

Behavioral spec: the per-object NumPy implementation in the reference
(`/root/reference/frenetix_motion_planner/polynomial_trajectory.py`):
  - QuarticTrajectory._calc_coeffs_static_ (443-488): longitudinal polynomials
    constrained by end *velocity* (and zero end acceleration), solved there as a
    2x2 `np.linalg.solve` behind an `lru_cache`.
  - QuinticTrajectory._calc_coeffs_static (283-343): lateral (or stopping)
    polynomials constrained by the full end state, solved as a 3x3 system.
  - squared_jerk_integral (172-191), calc_position/velocity/acceleration/jerk
    (230-272).

TPU-native design: the 2x2 / 3x3 systems have tiny closed-form inverses, so the
coefficient "solve" for M candidates is a handful of fused elementwise VPU ops
over (M,)-vectors — no batched LU, no cache, no Python objects.  Evaluation over
the horizon is a Horner scheme broadcast over (M, N+1).

All functions are shape-polymorphic over leading batch dims and dtype-preserving
(float32 on TPU; tests run float64 on CPU for parity with the reference).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "quartic_coeffs",
    "quintic_coeffs",
    "poly_position",
    "poly_velocity",
    "poly_acceleration",
    "poly_jerk",
    "squared_jerk_integral",
]


def quartic_coeffs(xs, vxs, axs, v_target, T):
    """Coefficients [a0..a5] (a5=0) of the end-velocity-constrained quartic.

    Solves the same system as the reference's
    `QuarticTrajectory._calc_coeffs_static_` (polynomial_trajectory.py:454-488):

        [[3T^2, 4T^3], [6T, 12T^2]] @ [a3, a4] = [v1 - vxs - axs*T, -axs]

    in closed form (det = 12 T^4):

        a3 = c1/T^2 - c2/(3T),   a4 = -c1/(2T^3) + c2/(4T^2)

    with c1 = v_target - vxs - axs*T, c2 = -axs.

    Args are broadcastable arrays; returns an array of shape (..., 6).
    """
    xs, vxs, axs, v_target, T = jnp.broadcast_arrays(
        *map(jnp.asarray, (xs, vxs, axs, v_target, T))
    )
    c1 = v_target - vxs - axs * T
    c2 = -axs
    invT = 1.0 / T
    invT2 = invT * invT
    a3 = c1 * invT2 - c2 * (invT / 3.0)
    a4 = -0.5 * c1 * invT2 * invT + 0.25 * c2 * invT2
    zeros = jnp.zeros_like(T)
    return jnp.stack([xs, vxs, 0.5 * axs, a3, a4, zeros], axis=-1)


def quintic_coeffs(xs, vxs, axs, xe, vxe, axe, T):
    """Coefficients [a0..a5] of the fully end-state-constrained quintic.

    Same system as `QuinticTrajectory._calc_coeffs_static`
    (polynomial_trajectory.py:295-343), closed form:

        b0 = xe - xs - vxs*T - axs*T^2/2
        b1 = vxe - vxs - axs*T
        b2 = axe - axs
        a3 = ( 20 b0 -  8 b1 T +   b2 T^2) / (2 T^3)
        a4 = (-30 b0 + 14 b1 T - 2 b2 T^2) / (2 T^4)
        a5 = ( 12 b0 -  6 b1 T +   b2 T^2) / (2 T^5)
    """
    xs, vxs, axs, xe, vxe, axe, T = jnp.broadcast_arrays(
        *map(jnp.asarray, (xs, vxs, axs, xe, vxe, axe, T))
    )
    T2 = T * T
    b0 = xe - xs - vxs * T - 0.5 * axs * T2
    b1 = vxe - vxs - axs * T
    b2 = axe - axs
    invT = 1.0 / T
    invT2 = invT * invT
    invT3 = invT2 * invT
    a3 = 0.5 * (20.0 * b0 - 8.0 * b1 * T + b2 * T2) * invT3
    a4 = 0.5 * (-30.0 * b0 + 14.0 * b1 * T - 2.0 * b2 * T2) * invT3 * invT
    a5 = 0.5 * (12.0 * b0 - 6.0 * b1 * T + b2 * T2) * invT3 * invT2
    return jnp.stack([xs, vxs, 0.5 * axs, a3, a4, a5], axis=-1)


def _c(coeffs, i):
    return coeffs[..., i, None] if coeffs.ndim else coeffs[i]


def poly_position(coeffs, tau):
    """p(tau) for coeffs (..., 6) and tau (..., N) — Horner, broadcasts.

    Matches `PolynomialTrajectory.calc_position` (polynomial_trajectory.py:259-272).
    """
    a0, a1, a2, a3, a4, a5 = (coeffs[..., i : i + 1] for i in range(6))
    return a0 + tau * (a1 + tau * (a2 + tau * (a3 + tau * (a4 + tau * a5))))


def poly_velocity(coeffs, tau):
    """dp/dtau — matches calc_velocity (polynomial_trajectory.py:253-257)."""
    _, a1, a2, a3, a4, a5 = (coeffs[..., i : i + 1] for i in range(6))
    return a1 + tau * (2.0 * a2 + tau * (3.0 * a3 + tau * (4.0 * a4 + tau * 5.0 * a5)))


def poly_acceleration(coeffs, tau):
    """d2p/dtau2 — matches calc_acceleration (polynomial_trajectory.py:241-251)."""
    a2, a3, a4, a5 = (coeffs[..., i : i + 1] for i in range(2, 6))
    return 2.0 * a2 + tau * (6.0 * a3 + tau * (12.0 * a4 + tau * 20.0 * a5))


def poly_jerk(coeffs, tau):
    """d3p/dtau3 — matches calc_jerk (polynomial_trajectory.py:230-239)."""
    a3, a4, a5 = (coeffs[..., i : i + 1] for i in range(3, 6))
    return 6.0 * a3 + tau * (24.0 * a4 + tau * 60.0 * a5)


def squared_jerk_integral(coeffs, t):
    """∫_0^t jerk(τ)^2 dτ, closed form.

    Matches `PolynomialTrajectory.squared_jerk_integral`
    (polynomial_trajectory.py:172-191).  coeffs (..., 6), t broadcastable.
    """
    a3 = coeffs[..., 3]
    a4 = coeffs[..., 4]
    a5 = coeffs[..., 5]
    t = jnp.asarray(t)
    t2 = t * t
    t3 = t2 * t
    t4 = t3 * t
    t5 = t4 * t
    return (
        36.0 * a3 * a3 * t
        + 144.0 * a3 * a4 * t2
        + (240.0 * a3 * a5 + 192.0 * a4 * a4) * t3
        + 720.0 * a4 * a5 * t4
        + 720.0 * a5 * a5 * t5
    )
