"""Batched rollout vs. the scalar-loop oracle on a curved reference path."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frenetix_tpu.geometry.refpath import prepare_reference_path
from frenetix_tpu.ops.kinematics import VehicleParams, rollout_candidates
from frenetix_tpu.ops.sampling import build_sampling_matrix, linspace_samples, time_samples
from tests import reference_impl as oracle

DT = 0.1
N = 30

# always go through jit — per-op eager dispatch is pathologically slow
rollout_jit = jax.jit(
    rollout_candidates,
    static_argnames=("dt", "n_steps", "low_vel_mode", "quintic_lon"),
)


def make_ref():
    t = np.linspace(0, np.pi / 3, 500)
    xy = np.stack([120 * np.sin(t), 120 * (1 - np.cos(t))], axis=1)
    return prepare_reference_path(xy, extension=30.0)


def make_matrix(level=1, v0=10.0):
    x0_lon = (35.0, v0, 0.2)
    x0_lat = (0.4, 0.05, 0.01)
    t1 = np.concatenate([time_samples(1.1, 3.0, DT, level), [N * DT]])
    ss1 = np.union1d(linspace_samples(max(v0 - 5, 0.001), v0 + 5, level), [x0_lon[1]])
    d1 = np.union1d(linspace_samples(-3, 3, level), [x0_lat[0]])
    return build_sampling_matrix(
        t1_vals=np.unique(t1), ss1_vals=ss1, d1_vals=d1, x0_lon=x0_lon, x0_lat=x0_lat
    ), x0_lon, x0_lat


@pytest.mark.parametrize("low_vel_mode", [False, True])
def test_rollout_matches_oracle(low_vel_mode):
    ref = make_ref()
    veh = VehicleParams()
    v0 = 1.2 if low_vel_mode else 10.0
    matrix, _, _ = make_matrix(level=1, v0=v0)
    x0_orientation = 0.35

    ro = rollout_jit(
        jnp.asarray(matrix), ref, veh,
        dt=DT, n_steps=N, low_vel_mode=low_vel_mode, x0_orientation=x0_orientation,
    )

    fields = ["s", "s_vel", "s_acc", "d", "d_vel", "d_acc", "x", "y",
              "theta_gl", "theta_cl", "v", "a", "kappa_gl"]
    got = {f: np.asarray(getattr(ro, f)) for f in fields}
    feas = np.asarray(ro.feasible)
    valid = np.asarray(ro.valid)
    slots = np.asarray(ro.inf_slots)

    n_checked = 0
    check_idx = list(range(0, matrix.shape[0], 5))
    for i in check_idx:
        exp = oracle.check_feasibility_single(
            matrix[i], ref, veh, dt=DT, n_steps=N,
            low_vel_mode=low_vel_mode, x0_orientation=x0_orientation,
        )
        for f in fields:
            np.testing.assert_allclose(
                got[f][i], exp[f], rtol=1e-8, atol=1e-8,
                err_msg=f"candidate {i} field {f} (low_vel={low_vel_mode})",
            )
        assert feas[i] == exp["feasible"], (i, slots[i], exp["slots"])
        assert valid[i] == exp["valid"], i
        np.testing.assert_array_equal(slots[i], exp["slots"], err_msg=f"cand {i}")
        n_checked += 1
    assert n_checked == len(check_idx)
    # the test set must exercise both outcomes to be meaningful
    assert feas.any() and (~feas).any()


def test_traj_len_and_extension():
    """t-sampled candidates shorter than the horizon are constant-extended."""
    ref = make_ref()
    veh = VehicleParams()
    matrix, x0_lon, _ = make_matrix(level=0)
    ro = rollout_jit(
        jnp.asarray(matrix), ref, veh,
        dt=DT, n_steps=N, low_vel_mode=False, x0_orientation=0.35,
    )
    t1 = matrix[:, 1]
    expected_len = np.round(t1 / DT).astype(int) + 1
    np.testing.assert_array_equal(np.asarray(ro.traj_len), np.clip(expected_len, 2, N + 1))
    s = np.asarray(ro.s)
    s_vel = np.asarray(ro.s_vel)
    for i in range(matrix.shape[0]):
        L = int(np.asarray(ro.traj_len)[i])
        if L <= N:
            # beyond L: constant velocity, linear position
            np.testing.assert_allclose(s_vel[i, L:], s_vel[i, L - 1], rtol=1e-12)
            np.testing.assert_allclose(
                np.diff(s[i, L - 1 :]), DT * s_vel[i, L - 1], rtol=1e-9, atol=1e-12
            )


def test_standstill_theta_carry():
    """Candidates with ~zero velocity keep the initial global orientation."""
    ref = make_ref()
    veh = VehicleParams()
    x0_lon = (35.0, 0.0, 0.0)
    x0_lat = (0.0, 0.0, 0.0)
    matrix = build_sampling_matrix(
        t1_vals=[3.0], ss1_vals=[0.0], d1_vals=[0.0], x0_lon=x0_lon, x0_lat=x0_lat
    )
    x0_orientation = 0.123
    ro = rollout_jit(
        jnp.asarray(matrix), ref, veh,
        dt=DT, n_steps=N, low_vel_mode=False, x0_orientation=x0_orientation,
    )
    np.testing.assert_allclose(np.asarray(ro.theta_gl)[0], x0_orientation, atol=1e-12)


def test_stopping_rollout_matches_oracle():
    """quintic_lon (end-position-constrained) mode vs. the scalar oracle."""
    ref = make_ref()
    veh = VehicleParams()
    x0_lon = (35.0, 8.0, 0.0)
    x0_lat = (0.2, 0.0, 0.0)
    matrix = build_sampling_matrix(
        t1_vals=[2.0, 3.0], ss1_vals=[45.0, 50.0, 55.0],  # end positions
        d1_vals=[-0.3, 0.0, 0.3], x0_lon=x0_lon, x0_lat=x0_lat,
    )
    ro = rollout_jit(
        jnp.asarray(matrix), ref, veh,
        dt=DT, n_steps=N, low_vel_mode=False, x0_orientation=0.35,
        quintic_lon=True,
    )
    for i in range(matrix.shape[0]):
        exp = oracle.check_feasibility_single(
            matrix[i], ref, veh, dt=DT, n_steps=N,
            low_vel_mode=False, x0_orientation=0.35, quintic_lon=True,
        )
        for f in ["s", "s_vel", "d", "v", "x", "y"]:
            np.testing.assert_allclose(
                np.asarray(getattr(ro, f))[i], exp[f], rtol=1e-8, atol=1e-8,
                err_msg=f"stopping candidate {i} field {f}",
            )
    # end velocity of in-horizon candidates reaches ~0 at t1
    s_vel = np.asarray(ro.s_vel)
    lens = np.asarray(ro.traj_len)
    for i in range(matrix.shape[0]):
        np.testing.assert_allclose(s_vel[i, lens[i] - 1], 0.0, atol=1e-6)


# --------------------------------------------------- hand-computed fixtures
# Third differential-test leg (independent of tests/reference_impl.py, which
# shares its author with the kernels): closed-form Werling solutions on
# degenerate reference geometries.


def _rollout(matrix, ref, low_vel=False):
    import jax.numpy as jnp

    from frenetix_tpu.ops.kinematics import VehicleParams, rollout_candidates

    ref_j = type(ref)(*(jnp.asarray(f) for f in ref))
    return rollout_candidates(
        jnp.asarray(matrix), ref_j, VehicleParams(), dt=0.1, n_steps=30,
        low_vel_mode=low_vel, x0_orientation=jnp.asarray(0.0),
    )


def test_straight_path_closed_form():
    """κ_r = 0 (straight x-axis reference): Werling A.8 degenerates to
      x = s(t), y = d(t), θ = atan(d'), v = sqrt(ṡ² + ḋ²),
      a = (ṡ·s̈ + ḋ·d̈)/v  — all hand-derivable without the oracle."""
    from frenetix_tpu.geometry.refpath import prepare_reference_path
    from frenetix_tpu.ops import polynomials as poly
    from frenetix_tpu.ops.sampling import build_sampling_matrix

    n = 400
    line = np.stack([np.linspace(0.0, 400.0, n), np.zeros(n)], axis=1)
    ref = prepare_reference_path(line, smooth=False, extension=0.0,
                                 dtype=np.float64)

    x0_lon = (50.0, 10.0, 0.0)
    x0_lat = (0.5, 0.2, 0.0)
    matrix = build_sampling_matrix(
        t1_vals=[3.0], ss1_vals=[12.0], d1_vals=[-1.0],
        x0_lon=x0_lon, x0_lat=x0_lat, dtype=np.float64,
    )
    ro = _rollout(matrix, ref)

    t = np.arange(31) * 0.1
    c_lon = np.asarray(ro.coeffs_lon)[0]
    c_lat = np.asarray(ro.coeffs_lat)[0]
    s = np.asarray(poly.poly_position(c_lon[None], t[None]))[0]
    s_d = np.asarray(poly.poly_velocity(c_lon[None], t[None]))[0]
    s_dd = np.asarray(poly.poly_acceleration(c_lon[None], t[None]))[0]
    d = np.asarray(poly.poly_position(c_lat[None], t[None]))[0]
    d_d = np.asarray(poly.poly_velocity(c_lat[None], t[None]))[0]

    # hand-derived closed forms for the straight path
    np.testing.assert_allclose(np.asarray(ro.x)[0], s, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ro.y)[0], d, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ro.theta_gl)[0], np.arctan2(d_d / s_d, 1.0), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(ro.v)[0], np.sqrt(s_d**2 + d_d**2), rtol=1e-12
    )
    # longitudinal-only sanity: with d ≡ const the acceleration equals s̈
    assert bool(np.asarray(ro.feasible)[0])


def test_circular_path_closed_form():
    """Constant curvature κ_r = 1/R with a centerline candidate (d ≡ 0):
    the vehicle follows the circle exactly — κ_gl = 1/R, v = ṡ, positions on
    the circle at angle s/R (hand-computable from the circle geometry)."""
    from frenetix_tpu.geometry.refpath import RefPathTable
    from frenetix_tpu.ops.sampling import build_sampling_matrix

    R = 100.0
    ds = 0.5
    n = 700
    s_tab = np.arange(n) * ds
    ang = s_tab / R
    # exact analytic tables: uniform arclength on the circle
    ref = RefPathTable(
        xy=np.stack([R * np.sin(ang), R * (1 - np.cos(ang))], axis=1),
        s=s_tab,
        theta=ang.copy(),            # tangent angle = s/R (unwrapped)
        kappa=np.full(n, 1.0 / R),
        kappa_d=np.zeros(n),
        kappa_dd=np.zeros(n),
    )

    x0_lon = (60.0, 10.0, 0.0)
    x0_lat = (0.0, 0.0, 0.0)
    matrix = build_sampling_matrix(
        t1_vals=[3.0], ss1_vals=[10.0], d1_vals=[0.0],   # hold the centerline
        x0_lon=x0_lon, x0_lat=x0_lat, dtype=np.float64,
    )
    ro = _rollout(matrix, ref)

    s = np.asarray(ro.s)[0]
    # hand-derived: on the circle, θ_gl = s/R, κ_gl = 1/R, v = ṡ = 10
    np.testing.assert_allclose(np.asarray(ro.kappa_gl)[0], 1.0 / R, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ro.v)[0], 10.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ro.theta_gl)[0], s / R, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ro.x)[0], R * np.sin(s / R), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ro.y)[0], R * (1 - np.cos(s / R)), atol=1e-6
    )
    assert bool(np.asarray(ro.feasible)[0])
