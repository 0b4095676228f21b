"""Batched cost stack: every cost term is one reduction over (M, N+1).

Behavioral spec: the Python partial cost functions of the reference
(`/root/reference/frenetix_motion_planner/cost_functions/partial_cost_functions.py`)
and the weighted aggregation in `AdaptableCostFunction.calc_cost`
(cost_function.py:78-91: total = Σ_k w_k · c_k, zero-weight terms dropped).
The C++ engine registers the equivalent cost functors per name
(reactive_planner_cpp.py:114-178); default weights live in
configurations/frenetix_motion_planner/cost.yaml.

TPU-native design: no per-trajectory Python dispatch — each term maps the whole
(M, N+1) state bank to an (M,) vector in one fused XLA reduction; the weighted
sum is a tiny matmul-like contraction.  Obstacle/prediction terms consume
fixed-shape device tensors with validity masks instead of Python dicts.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = [
    "PredictionTensors",
    "simpson_uniform",
    "compute_cost_terms",
    "COST_TERM_ORDER",
]


class PredictionTensors(NamedTuple):
    """Fixed-shape obstacle predictions (device-resident).

    Replaces the reference's per-obstacle dict
    {pos_list (T,2), cov_list (T,2,2), orientation_list, shape}
    (prediction_helpers.py / wale_net.py) with padded tensors + masks:
    O = max obstacles, T = prediction horizon steps.
    """

    means: jnp.ndarray      # (O, T, 2)
    inv_covs: jnp.ndarray   # (O, T, 2, 2) — inverse covariances
    covs: jnp.ndarray       # (O, T, 2, 2)
    orientations: jnp.ndarray  # (O, T)
    velocities: jnp.ndarray  # (O, T) — predicted speeds (risk Δv inputs)
    lengths: jnp.ndarray    # (O,)
    widths: jnp.ndarray     # (O,)
    valid: jnp.ndarray      # (O, T) bool — step exists for this obstacle

    @property
    def num_obstacles(self) -> int:
        return self.means.shape[0]

    @property
    def horizon(self) -> int:
        return self.means.shape[1]


def empty_predictions(n_steps: int, dtype=jnp.float32) -> PredictionTensors:
    """A zero-obstacle PredictionTensors placeholder with static shapes."""
    z = jnp.zeros
    return PredictionTensors(
        means=z((0, n_steps, 2), dtype),
        inv_covs=z((0, n_steps, 2, 2), dtype),
        covs=z((0, n_steps, 2, 2), dtype),
        orientations=z((0, n_steps), dtype),
        velocities=z((0, n_steps), dtype),
        lengths=z((0,), dtype),
        widths=z((0,), dtype),
        valid=z((0, n_steps), bool),
    )


def simpson_uniform(y, dx, axis=-1):
    """Composite Simpson over uniformly spaced samples, matching
    `scipy.integrate.simps(..., even='avg')` — the routine used by the
    reference's cost terms (partial_cost_functions.py:12,31,44,149,195).

    Odd sample count → pure Simpson; even sample count → average of
    (Simpson on [0:-1] + trapezoid on last interval) and
    (Simpson on [1:] + trapezoid on first interval).
    """
    y = jnp.moveaxis(y, axis, -1)
    n = y.shape[-1]

    def _simpson_odd(yy):
        k = yy.shape[-1]
        if k < 3:
            return jnp.sum((yy[..., :-1] + yy[..., 1:]) * 0.5 * dx, axis=-1)
        w = jnp.ones((k,), yy.dtype)
        w = w.at[1:-1:2].set(4.0)
        w = w.at[2:-1:2].set(2.0)
        return jnp.sum(yy * w, axis=-1) * (dx / 3.0)

    if n % 2 == 1:
        return _simpson_odd(y)
    trap_last = 0.5 * dx * (y[..., -1] + y[..., -2])
    trap_first = 0.5 * dx * (y[..., 0] + y[..., 1])
    res1 = _simpson_odd(y[..., :-1]) + trap_last
    res2 = _simpson_odd(y[..., 1:]) + trap_first
    return 0.5 * (res1 + res2)


# ---------------------------------------------------------------------------
# individual cost terms — each maps a Rollout (+aux) to an (M,) vector
# ---------------------------------------------------------------------------


def acceleration_costs(ro, dt):
    """∫ a² dt (partial_cost_functions.py:24-33)."""
    return simpson_uniform(ro.a * ro.a, dt)


def jerk_costs(ro, dt):
    """∫ (da/dt)² dt (partial_cost_functions.py:36-46)."""
    jerk = jnp.diff(ro.a, axis=1) / dt
    return simpson_uniform(jerk * jerk, dt)


def lateral_jerk_costs(ro, dt):
    """Closed-form squared-jerk integral of the lateral polynomial over [0, dt]
    (partial_cost_functions.py:49-55)."""
    from frenetix_tpu.ops.polynomials import squared_jerk_integral

    return squared_jerk_integral(ro.coeffs_lat, dt)


def longitudinal_jerk_costs(ro, dt):
    """(partial_cost_functions.py:58-64)."""
    from frenetix_tpu.ops.polynomials import squared_jerk_integral

    return squared_jerk_integral(ro.coeffs_lon, dt)


def orientation_offset_costs(ro, dt):
    """∫ (dθ_cl/dt)² dt (partial_cost_functions.py:141-151)."""
    dtheta = jnp.diff(ro.theta_cl, axis=1) / dt
    return simpson_uniform(dtheta * dtheta, dt)


def velocity_offset_costs(ro, desired_velocity):
    """Σ_{i≥(N+1)//2}^{N-1} |v_i - v_des|  +  (v_N - v_des)²
    (partial_cost_functions.py:120-130)."""
    n1 = ro.v.shape[1]
    half = n1 // 2
    dev = jnp.abs(ro.v[:, half:-1] - desired_velocity)
    return jnp.sum(dev, axis=1) + jnp.abs((ro.v[:, -1] - desired_velocity) ** 2)


def distance_to_reference_path_costs(ro):
    """(Σ|d| + 5|d_N|) / (N+1) (partial_cost_functions.py:154-169)."""
    n1 = ro.d.shape[1]
    return (jnp.sum(jnp.abs(ro.d), axis=1) + 5.0 * jnp.abs(ro.d[:, -1])) / n1


def path_length_costs(ro, dt):
    """∫ v dt (partial_cost_functions.py:189-196)."""
    return simpson_uniform(ro.v, dt)


def velocity_costs(ro, desired_avg_velocity):
    """|mean(v) - v_avg_target| — the goal-directed average-velocity cost
    (partial_cost_functions.py:215-293).  The goal-dependent target scalar
    (avg distance-to-goal / remaining time, or the goal-interval mean velocity)
    is resolved on host and passed in."""
    return jnp.abs(jnp.mean(ro.v, axis=1) - desired_avg_velocity)


def distance_to_obstacles_costs(ro, obstacle_xy, obstacle_valid):
    """Σ_obstacles Σ_steps 1/dist² to current obstacle positions
    (partial_cost_functions.py:172-186).  obstacle_xy: (O, 2), padded rows
    masked by obstacle_valid (O,)."""
    if obstacle_xy.shape[0] == 0:
        return jnp.zeros(ro.x.shape[0], ro.x.dtype)
    dx = ro.x[:, :, None] - obstacle_xy[None, None, :, 0]  # (M, N+1, O)
    dy = ro.y[:, :, None] - obstacle_xy[None, None, :, 1]
    inv = 1.0 / jnp.maximum(dx * dx + dy * dy, 1e-12)
    inv = inv * obstacle_valid[None, None, :].astype(inv.dtype)
    return jnp.sum(inv, axis=(1, 2))


def lane_center_offset_costs(ro, lane_segments, lane_valid):
    """Mean distance to the nearest lanelet centerline
    (partial_cost_functions.py:91-117): per step, distance of (x, y) to the
    closest center segment; steps with no lanelet nearby contribute 5.
    lane_segments: (S, 2, 2) [a, b] endpoints (padded), lane_valid: (S,)."""
    if lane_segments.shape[0] == 0:
        return jnp.zeros(ro.x.shape[0], ro.x.dtype)
    p = jnp.stack([ro.x, ro.y], axis=-1)[:, :, None, :]      # (M, N+1, 1, 2)
    a = lane_segments[None, None, :, 0, :]                    # (1, 1, S, 2)
    b = lane_segments[None, None, :, 1, :]
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-9)
    t = jnp.clip(jnp.sum((p - a) * ab, axis=-1) / denom, 0.0, 1.0)
    closest = a + t[..., None] * ab
    d2 = jnp.sum((p - closest) ** 2, axis=-1)                 # (M, N+1, S)
    d2 = jnp.where(lane_valid[None, None, :], d2, jnp.inf)
    dist = jnp.sqrt(jnp.min(d2, axis=-1))
    # no lanelet for the position -> flat 5 penalty (reference :114-115);
    # "no lanelet" approximated as nearest centerline beyond half a lane + margin
    dist = jnp.where(dist > 5.0, 5.0, dist)
    return jnp.mean(dist, axis=1)


def prediction_costs(ro, preds: PredictionTensors):
    """Inverse-Mahalanobis collision surrogate: Σ_o Σ_{i=1..N, i<T_o}
    1 / (Δᵀ Σ⁻¹ Δ)² with Δ = traj_i - mean_{i-1}
    (get_inv_mahalanobis_dist, risk_assessment/collision_probability.py:264-299;
    selected as the prediction cost at partial_cost_functions.py:341-356)."""
    if preds.num_obstacles == 0:
        return jnp.zeros(ro.x.shape[0], ro.x.dtype)
    n1 = ro.x.shape[1]
    # pairs (i, i-1) for i in 1..N with the reference's guard `i < T`
    # (collision_probability.py:287) — the LAST prediction step is never used
    t_traj = min(n1 - 1, preds.horizon - 1)
    ego = jnp.stack([ro.x[:, 1 : t_traj + 1], ro.y[:, 1 : t_traj + 1]], axis=-1)
    mean = preds.means[:, :t_traj]          # (O, t, 2)
    icov = preds.inv_covs[:, :t_traj]       # (O, t, 2, 2)
    delta = ego[:, None] - mean[None]       # (M, O, t, 2)
    md2 = jnp.einsum("moti,otij,motj->mot", delta, icov, delta)
    contrib = 1.0 / jnp.maximum(md2 * md2, 1e-12)
    # step i contributes iff prediction step i-1 exists AND step i exists:
    # reference guards `if i < len(mean_list)` (collision_probability.py:287)
    step_ok = preds.valid[:, :t_traj]
    contrib = contrib * step_ok[None].astype(contrib.dtype)
    return jnp.sum(contrib, axis=(1, 2))


COST_TERM_ORDER = (
    "acceleration",
    "jerk",
    "lateral_jerk",
    "longitudinal_jerk",
    "orientation_offset",
    "path_length",
    "lane_center_offset",
    "velocity_offset",
    "velocity",
    "distance_to_reference_path",
    "distance_to_obstacles",
    "prediction",
    "responsibility",
)


def compute_cost_terms(
    ro,
    *,
    dt: float,
    desired_velocity,
    preds: PredictionTensors,
    obstacle_xy,
    obstacle_valid,
    desired_avg_velocity=0.0,
    lane_segments=None,
    lane_valid=None,
    responsibility_cost=None,
):
    """All cost terms as an (M, K) matrix in COST_TERM_ORDER.

    Terms whose inputs are absent (lane_center, responsibility) default to 0 —
    they carry zero weight in the reference default config (cost.yaml) too.
    """
    m = ro.x.shape[0]
    zeros = jnp.zeros((m,), ro.x.dtype)
    terms = {
        "acceleration": acceleration_costs(ro, dt),
        "jerk": jerk_costs(ro, dt),
        "lateral_jerk": lateral_jerk_costs(ro, dt),
        "longitudinal_jerk": longitudinal_jerk_costs(ro, dt),
        "orientation_offset": orientation_offset_costs(ro, dt),
        "path_length": path_length_costs(ro, dt),
        "lane_center_offset": (
            lane_center_offset_costs(ro, lane_segments, lane_valid)
            if lane_segments is not None else zeros
        ),
        "velocity_offset": velocity_offset_costs(ro, desired_velocity),
        "velocity": velocity_costs(ro, desired_avg_velocity),
        "distance_to_reference_path": distance_to_reference_path_costs(ro),
        "distance_to_obstacles": distance_to_obstacles_costs(ro, obstacle_xy, obstacle_valid),
        "prediction": prediction_costs(ro, preds),
        "responsibility": responsibility_cost if responsibility_cost is not None else zeros,
    }
    return jnp.stack([terms[k] for k in COST_TERM_ORDER], axis=1)


def weighted_total(cost_terms, weights, compensated=False):
    """total_m = Σ_k w_k · c_{mk} (cost_function.py:78-91).

    `compensated=True` switches the dot product to a fixed-order
    Neumaier-compensated sum: the K per-term products are accumulated in
    COST_TERM_ORDER with a running error term, so the total is correctly
    rounded independent of how the compiler would otherwise reassociate or
    tile the contraction.  Two candidates with mathematically equal weighted
    totals then compare bitwise-equal and argmin's first-index tie-break
    resolves them deterministically — the knife-edge class where
    compile-variant reassociation noise flips near-tie selections (the
    scenario-36 caveat in parallel/device_sim.py) goes away at this stage.
    XLA does not reassociate floating point, so the compensation survives
    compilation.
    """
    if not compensated:
        return cost_terms @ weights
    prods = cost_terms * weights          # one rounding per product
    s = prods[..., 0]
    c = jnp.zeros_like(s)
    for k in range(1, prods.shape[-1]):   # static unroll (K = 13)
        x = prods[..., k]
        t = s + x
        # Neumaier: recover the rounding error of s + x exactly
        c = c + jnp.where(jnp.abs(s) >= jnp.abs(x), (s - t) + x, (x - t) + s)
        s = t
    return s + c
