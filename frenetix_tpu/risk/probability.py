"""Collision probabilities vs. Gaussian predictions, batched.

Behavioral spec: `/root/reference/risk_assessment/collision_probability.py` —
  - get_collision_probability_fast (:141-261): ego occupancy approximated by 3
    axis-aligned rectangles × 3 obstacle means (center/front/back), rectangle
    probability via the bivariate-normal CDF (`mvn.mvnun`), 5 m distance gate,
    zero-covariance fallback to 0.1·I, result divided by 3.
  - get_inv_mahalanobis_dist (:264-299): 1/(Δᵀ Σ⁻¹ Δ)² surrogate.
  - normalize_prob (:393-431): piecewise-linear probability mapping.

TPU-native design: `mvn.mvnun` (Fortran quadrature, one call per rectangle)
becomes a vectorized Drezner-style bivariate-normal CDF — Gauss-Legendre
quadrature over the correlation parameter, fixed node count, pure elementwise
ops — evaluated for all (candidate, obstacle, timestep, 3×3) cells at once.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm

__all__ = [
    "bvn_cdf",
    "rectangle_probability",
    "collision_probability_fast",
    "inv_mahalanobis",
    "normalize_probability",
]

# 24-point Gauss-Legendre nodes/weights on [0, 1]
_GL_X, _GL_W = np.polynomial.legendre.leggauss(24)
_GL_X = (_GL_X + 1.0) / 2.0
_GL_W = _GL_W / 2.0


def bvn_cdf(x, y, rho):
    """Standard bivariate normal CDF Φ₂(x, y, ρ), vectorized.

    Uses Φ₂ = Φ(x)Φ(y) + 1/(2π) ∫₀^ρ exp(-(x²-2rxy+y²)/(2(1-r²)))/√(1-r²) dr
    with fixed Gauss-Legendre quadrature (~1e-7 absolute accuracy for
    |ρ| ≤ 0.99, ample vs. the reference's mvnun tolerances).
    """
    x, y, rho = jnp.broadcast_arrays(*map(jnp.asarray, (x, y, rho)))
    nodes = jnp.asarray(_GL_X, x.dtype)
    weights = jnp.asarray(_GL_W, x.dtype)
    r = rho[..., None] * nodes  # (..., Q)
    one_m_r2 = 1.0 - r * r
    xx = x[..., None]
    yy = y[..., None]
    integrand = jnp.exp(
        -(xx * xx - 2.0 * r * xx * yy + yy * yy) / (2.0 * one_m_r2)
    ) / jnp.sqrt(one_m_r2)
    integral = jnp.sum(integrand * weights, axis=-1) * rho
    return norm.cdf(x) * norm.cdf(y) + integral / (2.0 * jnp.pi)


def rectangle_probability(lower, upper, mean, cov):
    """P(lower ≤ X ≤ upper) for 2-D normal X ~ N(mean, cov), broadcast.

    lower/upper/mean: (..., 2); cov: (..., 2, 2).  Inclusion-exclusion over the
    four corners of the standardized rectangle (the mvn.mvnun replacement).
    """
    sx = jnp.sqrt(jnp.maximum(cov[..., 0, 0], 1e-12))
    sy = jnp.sqrt(jnp.maximum(cov[..., 1, 1], 1e-12))
    rho = jnp.clip(cov[..., 0, 1] / (sx * sy), -0.99, 0.99)
    a1 = (lower[..., 0] - mean[..., 0]) / sx
    a2 = (lower[..., 1] - mean[..., 1]) / sy
    b1 = (upper[..., 0] - mean[..., 0]) / sx
    b2 = (upper[..., 1] - mean[..., 1]) / sy
    p = (
        bvn_cdf(b1, b2, rho)
        - bvn_cdf(a1, b2, rho)
        - bvn_cdf(b1, a2, rho)
        + bvn_cdf(a1, a2, rho)
    )
    return jnp.clip(p, 0.0, 1.0)


def collision_probability_fast(ro, preds, veh):
    """(M, T-1) collision probability per candidate, summed over obstacles —
    the batched `get_collision_probability_fast` (3 ego rectangles × 3
    obstacle means, 5 m gate, /3 normalization).

    Returns (prob_per_obstacle (M, O, t), t) with the reference's alignment:
    output index j corresponds to ego step j+1 vs. prediction step j.
    """
    n1 = ro.x.shape[1]
    # guard `i < len(mean_list)` (collision_probability.py:201) → the last
    # prediction step is never used
    t = min(n1 - 1, preds.horizon - 1)
    ego_xy = jnp.stack([ro.x[:, 1 : t + 1], ro.y[:, 1 : t + 1]], axis=-1)  # (M, t, 2)
    ego_th = ro.theta_gl[:, 1 : t + 1]

    mean_c = preds.means[:, :t]  # (O, t, 2)
    # NOTE the reference's one-step yaw offset: the front/back mean points
    # use yaw_list[1:min_len] against mean_list[:min_len-1]
    # (collision_probability.py:180-183) — prediction step j's means pair
    # with step j+1's orientation.  Pinned by
    # tests/test_reference_oracles.py::test_collision_probability_fast…
    yaw = preds.orientations[:, 1 : t + 1]
    half_len_vec = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1) * (
        preds.lengths[:, None, None] / 2.0
    )
    means3 = jnp.stack(
        [mean_c, mean_c + half_len_vec, mean_c - half_len_vec], axis=0
    )  # (3, O, t, 2)

    # 5 m distance gate on the minimum of the three mean distances
    delta = means3[:, None] - ego_xy[None, :, None]  # (3, M, O, t, 2)
    dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    gate = jnp.min(dist, axis=0) <= 5.0  # (M, O, t)

    # 3 axis-aligned ego rectangles: centers at 0, ±(2/3)(l/2) along heading
    heading = jnp.stack([jnp.cos(ego_th), jnp.sin(ego_th)], axis=-1)  # (M, t, 2)
    off = (2.0 / 3.0) * (veh.length / 2.0)
    centers3 = jnp.stack(
        [ego_xy, ego_xy + off * heading, ego_xy - off * heading], axis=0
    )  # (3, M, t, 2)
    offset = jnp.asarray([veh.length / 6.0, veh.width / 2.0], ro.x.dtype)
    lower3 = centers3 - offset
    upper3 = centers3 + offset

    cov = preds.covs[:, :t]  # (O, t, 2, 2)
    # zero-cov (ground-truth) fallback (collision_probability.py:215-217)
    cov_zero = jnp.all(jnp.abs(cov) < 1e-12, axis=(-2, -1))
    eye = jnp.eye(2, dtype=cov.dtype) * 0.1
    cov = jnp.where(cov_zero[..., None, None], eye, cov)

    # broadcast: rect r (3) × mean m (3) × (M, O, t)
    p = rectangle_probability(
        lower3[:, None, :, None],          # (3, 1, M, 1, t, 2)
        upper3[:, None, :, None],
        means3[None, :, None],             # (1, 3, 1, O, t, 2)
        cov[None, None, None],             # (1, 1, 1, O, t, 2, 2)
    )  # (3, 3, M, O, t)
    prob = jnp.sum(p, axis=(0, 1)) / 3.0
    prob = prob * gate.astype(prob.dtype) * preds.valid[None, :, :t].astype(prob.dtype)
    return prob, t


def inv_mahalanobis(ro, preds):
    """(M, O, t) inverse-Mahalanobis surrogate (collision_probability.py:264-299),
    alignment: index j ↔ ego step j+1 vs. prediction step j."""
    n1 = ro.x.shape[1]
    t = min(n1 - 1, preds.horizon - 1)  # same `i < T` guard as above
    ego = jnp.stack([ro.x[:, 1 : t + 1], ro.y[:, 1 : t + 1]], axis=-1)
    delta = ego[:, None] - preds.means[None, :, :t]
    md2 = jnp.einsum("moti,otij,motj->mot", delta, preds.inv_covs[:, :t], delta)
    out = 1.0 / jnp.maximum(md2 * md2, 1e-12)
    return out * preds.valid[None, :, :t].astype(out.dtype), t


def normalize_probability(prob):
    """Piecewise-linear probability normalization (collision_probability.py:393-431)."""
    conds = [
        prob > 1e-1,
        prob > 1e-2,
        prob > 1e-4,
        prob > 1e-10,
        prob > 1e-70,
    ]
    vals = [
        0.6666666666666666 * prob + 0.33333333333333337,
        1.1111111111111114 * prob + 0.28888888888888886,
        10.101010101010099 * prob + 0.198989898989899,
        1000.001000001 * prob + 0.0999998999999,
        900000000.0000001 * prob + 0.01,
    ]
    return jnp.select(conds, vals, jnp.full_like(prob, 0.001))
