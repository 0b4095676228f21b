"""Fused batched rollout: sampling matrix → Frenet states → Cartesian states →
kinematic feasibility masks.

This is the TPU replacement for the hot core of the reference's C++ engine —
`frenetix.TrajectoryHandler.generate_trajectories` + `FillCoordinates` + the
four feasibility functions (reactive_planner_cpp.py:96-112, 144-149, 256, 349).
The *behavioral spec* is the pure-Python backend `ReactivePlannerPython
.check_feasibility` (/root/reference/frenetix_motion_planner/reactive_planner.py:274-577),
which this module reproduces as one vectorized array program over the whole
candidate batch:

    (M, 13) sampling matrix ──► (M, N+1) state tensors + (M,) masks

with no per-candidate Python objects and no data-dependent control flow (the
reference's early `break`s become masks; its sequential θ carry-forward for
standstill steps becomes a cumulative-max gather).

Sampling-matrix column layout (matches generate_sampling_matrix,
sampling_matrix.py:85-121 / reactive_planner_cpp.py:239-251):

    0: t0   1: t1    2: s0    3: ss0   4: sss0  5: ss1  6: sss1
    7: d0   8: dd0   9: ddd0  10: d1   11: dd1  12: ddd1

Infeasibility histogram slots (logging_helpers.py:363-373,
reactive_planner.py:286-569):

    0 total infeasible/invalid      6 yaw-rate constraint
    1 |s̈| > a_max pre-check         7 curvature-rate constraint
    2 ṡ < -eps pre-check            8 acceleration constraint
    3 s beyond reference path       9 out of projection domain
    4 v < -eps                     10 negative ṡ (validity)
    5 curvature constraint
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from frenetix_tpu.geometry import frenet as fr
from frenetix_tpu.ops import polynomials as poly

__all__ = ["VehicleParams", "Rollout", "rollout_candidates"]

_EPS = 1e-5  # matches reactive_planner.py:26


class VehicleParams(NamedTuple):
    """Kinematic vehicle limits (subset of configurations/simulation/vehicle.yaml,
    resolved from the CommonRoad vehicle model DB — BMW 320i defaults)."""

    length: float = 4.508
    width: float = 1.610
    mass: float = 1475.0
    wheelbase: float = 2.578
    wb_rear_axle: float = 1.422
    a_max: float = 11.5
    v_max: float = 50.8
    v_switch: float = 7.319
    delta_max: float = 1.023
    v_delta_max: float = 0.4
    kappa_dot_max: float = 0.4  # hard-coded 0.4 in reactive_planner.py:517


class Rollout(NamedTuple):
    """All per-candidate state tensors of one replanning cycle.

    Shapes: (M, N+1) unless noted.  Mirrors the reference's CartesianSample /
    CurviLinearSample pair (trajectories.py:56-334) as two banks of columns.
    """

    s: jnp.ndarray
    s_vel: jnp.ndarray
    s_acc: jnp.ndarray
    d: jnp.ndarray
    d_vel: jnp.ndarray
    d_acc: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    theta_gl: jnp.ndarray
    theta_cl: jnp.ndarray
    v: jnp.ndarray
    a: jnp.ndarray
    kappa_gl: jnp.ndarray
    kappa_dot: jnp.ndarray
    extras: object            # tuple of K (M, N+1) interpolated extra ref
                              # tables (columns-major interp output) or None
    coeffs_lon: jnp.ndarray   # (M, 6)
    coeffs_lat: jnp.ndarray   # (M, 6)
    traj_len: jnp.ndarray     # (M,) int — valid sample count before extension
    feasible: jnp.ndarray     # (M,) bool
    valid: jnp.ndarray        # (M,) bool
    inf_slots: jnp.ndarray    # (M, 11) bool — per-candidate violated slots

    @property
    def histogram(self) -> jnp.ndarray:
        """(11,) int infeasibility histogram (slot 0 = total count)."""
        return jnp.sum(self.inf_slots, axis=0)


def _carry_forward_theta(active, theta_active, theta_init):
    """θ_gl for standstill steps: keep the previous *active* orientation, or the
    initial orientation if no step was active yet (reactive_planner.py:445-454).

    Vectorized form of the sequential carry: a log-depth associative scan with
    the "keep last active value" combiner (a take_along_axis gather here costs
    ~4 ms per replan on TPU; the scan is a handful of fused elementwise passes).
    """
    init = jnp.broadcast_to(theta_init[:, None], theta_active.shape)
    seeded = jnp.where(active, theta_active, init)
    seen0 = jnp.concatenate([jnp.ones_like(active[:, :1]), active[:, 1:]], axis=1)

    def combine(a, b):
        a_seen, a_val = a
        b_seen, b_val = b
        return a_seen | b_seen, jnp.where(b_seen, b_val, a_val)

    _, carried = jax.lax.associative_scan(combine, (seen0, seeded), axis=1)
    return carried


def rollout_candidates(
    matrix: jnp.ndarray,
    ref,
    params: VehicleParams,
    *,
    dt: float,
    n_steps: int,
    low_vel_mode: bool,
    x0_orientation,
    quintic_lon: bool = False,
    extra_ref_tables=None,
    table_window: int = 0,
) -> Rollout:
    """Evaluate all candidates of a sampling matrix in one fused computation.

    Args:
        matrix: (M, 13) sampling matrix (column layout above).
        ref: RefPathTable (device arrays).
        params: VehicleParams.
        dt: planner step (planning.yaml:6, default 0.1).
        n_steps: horizon steps N (planning.yaml:8 → N=30); output has N+1 samples.
        low_vel_mode: lateral planning over arclength instead of time
            (reactive_planner.py:324-341; threshold planning.yaml:10).
        x0_orientation: initial Cartesian orientation (for standstill carry).
        quintic_lon: end-position-constrained longitudinal polynomials (the
            stopping-trajectory mode, reactive_planner.py:628-671) — column 5
            is then the end *position* s1 instead of end velocity ss1.
    """
    dtype = matrix.dtype
    m = matrix.shape[0]
    n1 = n_steps + 1

    t1 = matrix[:, 1]
    s0, ss0, sss0 = matrix[:, 2], matrix[:, 3], matrix[:, 4]
    ss1, sss1 = matrix[:, 5], matrix[:, 6]
    d0, dd0, ddd0 = matrix[:, 7], matrix[:, 8], matrix[:, 9]
    d1, dd1, ddd1 = matrix[:, 10], matrix[:, 11], matrix[:, 12]

    # ---- longitudinal polynomial + rollout over the fixed time grid ---------
    if quintic_lon:
        coeffs_lon = poly.quintic_coeffs(s0, ss0, sss0, ss1, jnp.zeros_like(ss1), sss1, t1)
    else:
        coeffs_lon = poly.quartic_coeffs(s0, ss0, sss0, ss1, t1)

    tgrid = jnp.arange(n1, dtype=dtype) * dt  # (N+1,)
    # Valid samples before extension: round(t1/dt)+1 — the *intended*
    # quantization of the reference's `arange(0, t1+dt, dt)` (whose float
    # accumulation overshoots by one step for most t1; we use the clean
    # semantics, see tests/reference_impl.py).
    traj_len = jnp.clip(jnp.round(t1 / dt).astype(jnp.int32) + 1, 2, n1)
    t_end = (traj_len - 1).astype(dtype) * dt
    step_mask = tgrid[None, :] < (traj_len[:, None]).astype(dtype) * dt  # (M, N+1)

    tau = jnp.minimum(tgrid[None, :], t_end[:, None])
    s_in = poly.poly_position(coeffs_lon, tau)
    sv_in = poly.poly_velocity(coeffs_lon, tau)
    sa_in = poly.poly_acceleration(coeffs_lon, tau)

    # s-enlargement: constant-velocity extrapolation past t1
    # (reactive_planner.py:319-322)
    s_end = poly.poly_position(coeffs_lon, t_end[:, None])[:, 0]
    v_end = poly.poly_velocity(coeffs_lon, t_end[:, None])[:, 0]
    s_ext = s_end[:, None] + (tgrid[None, :] - t_end[:, None]) * v_end[:, None]
    s = jnp.where(step_mask, s_in, s_ext)
    s_vel = jnp.where(step_mask, sv_in, v_end[:, None])
    s_acc = jnp.where(step_mask, sa_in, jnp.zeros_like(sa_in))

    # ---- lateral polynomial (time domain, or arclength in low-vel mode) ----
    if low_vel_mode:
        # delta_tau = s(t1) - s0, or t1 if that span is non-positive
        # (reactive_planner.py:161-165)
        span = s_end - s0
        lat_T = jnp.where(span > 0.0, span, t1)
        tau_lat = jnp.where(step_mask, s - s0[:, None], span[:, None])
    else:
        lat_T = t1
        tau_lat = tau
    coeffs_lat = poly.quintic_coeffs(d0, dd0, ddd0, d1, dd1, ddd1, lat_T)
    # tau_lat is already clamped to its end value in the extension region, so
    # evaluating the polynomial everywhere reproduces the reference's constant
    # d-enlargement (reactive_planner.py:343-346) exactly.
    d = poly.poly_position(coeffs_lat, tau_lat)
    zeros = jnp.zeros((), dtype)
    d_vel = jnp.where(step_mask, poly.poly_velocity(coeffs_lat, tau_lat), zeros)
    d_acc = jnp.where(step_mask, poly.poly_acceleration(coeffs_lat, tau_lat), zeros)

    # ---- validity / pre-feasibility -----------------------------------------
    slot = jnp.zeros((m, 11), dtype=bool)
    neg_svel = jnp.any(s_vel < -_EPS, axis=1)
    slot = slot.at[:, 10].set(neg_svel)   # validity (reactive_planner.py:350-354)
    slot = slot.at[:, 2].set(neg_svel)    # pre-check   (:381-385)
    slot = slot.at[:, 1].set(jnp.any(jnp.abs(s_acc) > params.a_max, axis=1))  # (:375-379)
    s_vel = jnp.where(jnp.abs(s_vel) < _EPS, 0.0, s_vel)  # (:355)

    # ---- Werling A.8 transform (vectorized over (M, N+1)) -------------------
    moving = s_vel > 0.001
    if low_vel_mode:
        dp = d_vel
        dpp = d_acc
    else:
        dp = jnp.where(moving, d_vel / jnp.where(moving, s_vel, 1.0), 0.0)
        ddot = d_acc - dp * s_acc
        dpp = jnp.where(moving, ddot / jnp.where(moving, s_vel * s_vel, 1.0), 0.0)

    # ALL reference-path lookups (θ, κ, dκ/ds, x, y) in one fused two-hot
    # matmul (see geometry.frenet.interp_weights)
    tabs = fr.interp_ref_tables(
        ref, s, extra_tables=extra_ref_tables,
        window_rows=table_window if table_window else None,
        window_anchor=s0[0] if table_window else None,
    )
    in_dom = tabs["in_domain"]
    slot = slot.at[:, 3].set(jnp.any(~in_dom, axis=1))
    alpha = tabs["alpha"]
    k_r = tabs["k_r"]
    k_r_d = tabs["k_r_d"]

    theta_cl_pt = jnp.arctan2(dp, jnp.ones_like(dp))
    theta_gl_pt = theta_cl_pt + alpha
    if low_vel_mode:
        theta_cl = theta_cl_pt
        theta_gl = theta_gl_pt
    else:
        # standstill steps keep the previous global orientation
        # (reactive_planner.py:445-454)
        x0_theta = jnp.broadcast_to(jnp.asarray(x0_orientation, dtype), (m,))
        theta_gl_hold = _carry_forward_theta(moving, theta_gl_pt, x0_theta)
        theta_gl = jnp.where(moving, theta_gl_pt, theta_gl_hold)
        theta_cl = jnp.where(moving, theta_cl_pt, theta_gl - alpha)

    one_krd = 1.0 - k_r * d
    cos_t = jnp.cos(theta_cl)
    tan_t = jnp.tan(theta_cl)
    cos_ratio = cos_t / one_krd

    kappa_gl = (dpp + (k_r * dp + k_r_d * d) * tan_t) * cos_t * cos_ratio * cos_ratio \
        + cos_ratio * k_r
    v = s_vel * (one_krd / cos_t)
    a = s_acc * (one_krd / cos_t) + (s_vel * s_vel / cos_t) * (
        one_krd * tan_t * (kappa_gl * (one_krd / cos_t) - k_r) - (k_r_d * d + k_r * dp)
    )

    # ---- constraint masks (reactive_planner.py:480-533) ---------------------
    kappa_max = jnp.tan(params.delta_max) / params.wheelbase
    slot = slot.at[:, 4].set(jnp.any(v < -_EPS, axis=1))
    slot = slot.at[:, 5].set(jnp.any(jnp.abs(kappa_gl) > kappa_max, axis=1))

    dtheta = jnp.diff(theta_gl, axis=1) / dt
    yaw_rate = jnp.concatenate([jnp.zeros((m, 1), dtype), dtheta], axis=1)
    yaw_rate_r = jnp.round(yaw_rate * 1e5) / 1e5  # round(yaw_rate, 5) (:504)
    slot = slot.at[:, 6].set(jnp.any(jnp.abs(yaw_rate_r) > kappa_max * v, axis=1))

    dkappa = jnp.diff(kappa_gl, axis=1) / dt
    kappa_dot_chk = jnp.concatenate([jnp.zeros((m, 1), dtype), dkappa], axis=1)
    slot = slot.at[:, 7].set(
        jnp.any(jnp.abs(kappa_dot_chk) > params.kappa_dot_max, axis=1)
    )

    a_max_v = jnp.where(
        v > params.v_switch, params.a_max * params.v_switch / jnp.where(v > params.v_switch, v, 1.0), params.a_max
    )
    slot = slot.at[:, 8].set(jnp.any((a < -params.a_max) | (a > a_max_v), axis=1))

    # ---- Cartesian positions (reactive_planner.py:537-547) ------------------
    # reuse the fused table lookup: pos = ref(s) + d·normal(θ_lerp)
    theta_lerp = tabs["theta_lerp"]
    x = tabs["x"] - d * jnp.sin(theta_lerp)
    y = tabs["y"] + d * jnp.cos(theta_lerp)
    slot = slot.at[:, 9].set(jnp.any(~in_dom, axis=1))

    # kappa_dot output column: append([0], diff(kappa_gl)) WITHOUT /dt —
    # matches CartesianSample construction (reactive_planner.py:551-553)
    kappa_dot_out = jnp.concatenate(
        [jnp.zeros((m, 1), dtype), jnp.diff(kappa_gl, axis=1)], axis=1
    )

    feasible = ~(slot[:, 1] | slot[:, 2] | slot[:, 3] | slot[:, 4] | slot[:, 5]
                 | slot[:, 6] | slot[:, 7] | slot[:, 8])
    valid = ~(slot[:, 10] | slot[:, 9])
    slot = slot.at[:, 0].set(~(feasible & valid))

    return Rollout(
        s=s, s_vel=s_vel, s_acc=s_acc, d=d, d_vel=d_vel, d_acc=d_acc,
        x=x, y=y, theta_gl=theta_gl, theta_cl=theta_cl, v=v, a=a,
        kappa_gl=kappa_gl, kappa_dot=kappa_dot_out, extras=tabs["extras"],
        coeffs_lon=coeffs_lon, coeffs_lat=coeffs_lat,
        traj_len=traj_len, feasible=feasible, valid=valid, inf_slots=slot,
    )
