"""Differential tests of core math against the REFERENCE'S OWN code
(VERDICT r3 item 3): randomized inputs driven through BOTH implementations.

The reference planner as a whole is not runnable here (commonroad/frenetix
not installed), but these modules import clean with zero or trivial stubs —
the same pattern as tests/test_walenet_reference_oracle.py:

  * frenetix_motion_planner/sampling_matrix.py — numpy/itertools only
    (generate_sampling_matrix:85-122, TimeSampling/…Sampling:124-215)
  * frenetix_motion_planner/polynomial_trajectory.py — stub `methodtools`
    (lru_cache pass-through) + `commonroad.common.validity` (predicates)
  * risk_assessment/utils/{logistic_regression*,reference_speed*}.py — numpy
  * risk_assessment/collision_probability.py — stub `commonroad_dc.pycrcc`
    (RectOBB geometry accessors) and `scipy.stats.mvn.mvnun` (removed in
    scipy ≥ 1.15; replaced by inclusion-exclusion over scipy's own
    multivariate_normal.cdf — still independent of this repo's math)

Coefficients for the harm oracles come from the reference's committed
configurations/harm_parameters.json, converted to this repo's list layout —
so the test also pins DEFAULT_HARM_COEFFS against the reference's numbers.
"""
import importlib
import json
import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "frenetix_motion_planner")),
    reason="reference tree not available",
)


def _install_stub(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    # register on the parent package so `import a.b` binds a.b
    if "." in name:
        parent_name, child = name.rsplit(".", 1)
        parent = _install_stub(parent_name)
        setattr(parent, child, mod)
    return mod


def _ref_import(name: str):
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(name)


# --------------------------------------------------------------------------
# sampling_matrix.py
# --------------------------------------------------------------------------


def test_sampling_matrix_matches_reference(rng):
    ref = _ref_import("frenetix_motion_planner.sampling_matrix")
    from frenetix_tpu.ops.sampling import build_sampling_matrix

    for _ in range(10):
        nt, nv, nd = rng.integers(1, 6, size=3)
        t1 = np.sort(rng.uniform(0.4, 3.0, nt))
        ss1 = np.sort(rng.uniform(0.0, 20.0, nv))
        d1 = np.sort(rng.uniform(-3.0, 3.0, nd))
        x0_lon = rng.uniform(-5.0, 5.0, 3)
        x0_lat = rng.uniform(-2.0, 2.0, 3)
        theirs = ref.generate_sampling_matrix(
            t0_range=0.0, t1_range=t1, s0_range=x0_lon[0],
            ss0_range=x0_lon[1], sss0_range=x0_lon[2], ss1_range=ss1,
            sss1_range=0.0, d0_range=x0_lat[0], dd0_range=x0_lat[1],
            ddd0_range=x0_lat[2], d1_range=d1, dd1_range=0.0,
            ddd1_range=0.0)
        ours = build_sampling_matrix(
            t1_vals=t1, ss1_vals=ss1, d1_vals=d1,
            x0_lon=x0_lon, x0_lat=x0_lat, dtype=np.float64)
        # same rows in the same (t, v, d) product order
        np.testing.assert_array_equal(ours, theirs)


def test_sampling_grids_match_reference_handler():
    ref = _ref_import("frenetix_motion_planner.sampling_matrix")
    from frenetix_tpu.ops.sampling import linspace_samples, time_samples

    dt, t_min, horizon = 0.1, 0.4, 3.0
    max_lvl = 4
    ts = ref.TimeSampling(t_min, horizon, max_lvl, dt)
    vs = ref.VelocitySampling(3.0, 17.5, max_lvl)
    ds = ref.LateralPositionSampling(-3.5, 2.5, max_lvl)
    for lvl in range(max_lvl):
        np.testing.assert_allclose(
            time_samples(t_min, horizon, dt, lvl),
            np.sort(list(ts.to_range(lvl))), atol=0)
        np.testing.assert_allclose(
            linspace_samples(3.0, 17.5, lvl),
            np.sort(list(vs.to_range(lvl))), atol=0)
        np.testing.assert_allclose(
            linspace_samples(-3.5, 2.5, lvl),
            np.sort(list(ds.to_range(lvl))), atol=0)


# --------------------------------------------------------------------------
# polynomial_trajectory.py
# --------------------------------------------------------------------------


def _ref_polynomials():
    _install_stub("methodtools", lru_cache=lambda *a, **k: (lambda f: f))
    _install_stub(
        "commonroad.common.validity",
        is_natural_number=lambda *a, **k: True,
        is_positive=lambda *a, **k: True,
        is_real_number=lambda *a, **k: True,
        is_real_number_vector=lambda *a, **k: True,
    )
    return _ref_import("frenetix_motion_planner.polynomial_trajectory")


def test_quintic_polynomial_matches_reference(rng):
    ref = _ref_polynomials()
    from frenetix_tpu.ops.polynomials import (
        poly_acceleration, poly_jerk, poly_position, poly_velocity,
        quintic_coeffs, squared_jerk_integral)

    for _ in range(25):
        x0 = rng.uniform(-10, 10, 3)
        xd = rng.uniform(-10, 10, 3)
        T = float(rng.uniform(0.4, 5.0))
        traj = ref.QuinticTrajectory(tau_0=0.0, delta_tau=T,
                                     x_0=x0.copy(), x_d=xd.copy())
        ours = np.asarray(quintic_coeffs(*x0, *xd, T), np.float64)
        np.testing.assert_allclose(ours, traj.coeffs, rtol=1e-9, atol=1e-12)
        taus = rng.uniform(0.0, T, 7)
        np.testing.assert_allclose(
            np.asarray(poly_position(ours, taus)).ravel(),
            [traj.calc_point(t) for t in taus], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(poly_velocity(ours, taus)).ravel(),
            [traj.calc_first_derivative(t) for t in taus],
            rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(poly_acceleration(ours, taus)).ravel(),
            [traj.calc_second_derivative(t) for t in taus],
            rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(poly_jerk(ours, taus)).ravel(),
            [traj.calc_third_derivative(t) for t in taus],
            rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(
            float(squared_jerk_integral(ours, T)),
            traj.squared_jerk_integral(T), rtol=1e-9)


def test_quartic_polynomial_matches_reference(rng):
    ref = _ref_polynomials()
    from frenetix_tpu.ops.polynomials import (
        poly_position, poly_velocity, quartic_coeffs)

    for _ in range(25):
        x0 = rng.uniform(-10, 10, 3)
        xd = rng.uniform(0.0, 20.0, 2)  # (v_target, a_target=unused)
        T = float(rng.uniform(0.4, 5.0))
        traj = ref.QuarticTrajectory(tau_0=0.0, delta_tau=T,
                                     x_0=x0.copy(), x_d=xd.copy())
        ours = np.asarray(quartic_coeffs(x0[0], x0[1], x0[2], xd[0], T),
                          np.float64)
        np.testing.assert_allclose(ours, traj.coeffs, rtol=1e-9, atol=1e-12)
        taus = rng.uniform(0.0, T, 7)
        np.testing.assert_allclose(
            np.asarray(poly_position(ours, taus)).ravel(),
            [traj.calc_point(t) for t in taus], rtol=1e-9, atol=1e-12)
        # end-velocity constraint satisfied identically
        np.testing.assert_allclose(
            float(np.asarray(poly_velocity(ours, np.array([T]))).ravel()[0]),
            xd[0], rtol=1e-9, atol=1e-9)


# --------------------------------------------------------------------------
# harm models (risk_assessment/utils/*)
# --------------------------------------------------------------------------


def _ref_coeffs():
    with open(os.path.join(REF_ROOT,
                           "configurations/harm_parameters.json")) as fh:
        return json.load(fh)


def _our_coeffs(ref_c):
    """Reference JSON → this repo's list layout (risk/harm.py)."""
    lr, rs = ref_c["log_reg"], ref_c["ref_speed"]
    return {
        "log_reg": {
            "complete_angle_areas": {
                "const": lr["complete_angle_areas"]["const"],
                "speed": lr["complete_angle_areas"]["speed"],
                "imp": [lr["complete_angle_areas"][f"Imp_{i}"]
                        for i in range(1, 12)],
            },
            "reduced_angle_areas": lr["reduced_angle_areas"],
            "ignore_angle": lr["ignore_angle"],
            "complete_sym_angle_areas": {
                "const": lr["complete_sym_angle_areas"]["const"],
                "speed": lr["complete_sym_angle_areas"]["speed"],
                "imp": [lr["complete_sym_angle_areas"][k] for k in
                        ("Imp_1_11", "Imp_2_10", "Imp_3_9", "Imp_4_8",
                         "Imp_5_7", "Imp_6")],
            },
            "reduced_sym_angle_areas": lr["reduced_sym_angle_areas"],
        },
        "ref_speed": {
            "complete_angle_areas": {
                "speeds": [rs["complete_angle_areas"][f"ref_speed_{i}"]
                           for i in range(1, 13)],
                "exp": rs["complete_angle_areas"]["exp"],
            },
            "reduced_angle_areas": {
                "front": rs["reduced_angle_areas"]["ref_speed_front"],
                "right_side": rs["reduced_angle_areas"]["ref_speed_right_side"],
                "rear": rs["reduced_angle_areas"]["ref_speed_rear"],
                "driver_side": rs["reduced_angle_areas"]["ref_speed_driver_side"],
                "exp": rs["reduced_angle_areas"]["exp"],
            },
            "ignore_angle": rs["ignore_angle"],
            "complete_sym_angle_areas": {
                "speeds": [rs["complete_sym_angle_areas"][k] for k in
                           ("ref_speed_1_11", "ref_speed_2_10",
                            "ref_speed_3_9", "ref_speed_4_8",
                            "ref_speed_5_7", "ref_speed_6", "ref_speed_12")],
                "exp": rs["complete_sym_angle_areas"]["exp"],
            },
            "reduced_sym_angle_areas": {
                "front": rs["reduced_sym_angle_areas"]["ref_speed_front"],
                "side": rs["reduced_sym_angle_areas"]["ref_speed_side"],
                "rear": rs["reduced_sym_angle_areas"]["ref_speed_rear"],
                "exp": rs["reduced_sym_angle_areas"]["exp"],
            },
        },
        "gidas": ref_c["gidas"],
        "pedestrian": ref_c["pedestrian"],
        "pedestrian_MAIS2+": ref_c["pedestrian_MAIS2+"],
    }


def _angles(rng, n=64):
    """Random angles in (-pi, pi) clear of the reference's bin edges (its
    comparisons are open/closed inconsistently at exact multiples of 15°)."""
    a = rng.uniform(-np.pi + 0.02, np.pi - 0.02, n)
    deg = np.round(a * 180 / np.pi)
    a += np.where(np.abs(np.abs(deg) % 15) < 1, 0.02, 0.0)
    return a


def test_log_reg_harm_matches_reference(rng):
    sym = _ref_import("risk_assessment.utils.logistic_regression_symmetrical")
    asym = _ref_import(
        "risk_assessment.utils.logistic_regression_asymmetrical")
    from frenetix_tpu.risk.harm import log_reg_harm

    ref_c, ours_c = _ref_coeffs(), None
    ours_c = _our_coeffs(ref_c)
    dv = rng.uniform(0.0, 35.0, 64)
    ang = _angles(rng)
    cases = [
        (lambda: sym.get_protected_inj_prob_log_reg_ignore_angle(dv, ref_c),
         dict(ignore_angle=True)),
        (lambda: sym.get_protected_inj_prob_log_reg_reduced_sym(
            dv, ang.copy(), ref_c), dict(sym=True, reduced=True)),
        (lambda: sym.get_protected_inj_prob_log_reg_complete_sym(
            dv, ang.copy(), ref_c), dict(sym=True, reduced=False)),
        (lambda: asym.get_protected_inj_prob_log_reg_reduced(
            dv, ang.copy(), ref_c), dict(sym=False, reduced=True)),
        (lambda: asym.get_protected_inj_prob_log_reg_complete(
            dv, ang.copy(), ref_c), dict(sym=False, reduced=False)),
    ]
    for ref_fn, kw in cases:
        theirs = np.asarray(ref_fn(), np.float64)
        mine = np.asarray(log_reg_harm(dv, ang.copy(), ours_c, **kw))
        np.testing.assert_allclose(mine, theirs, rtol=1e-12, atol=1e-15,
                                   err_msg=str(kw))


def test_ref_speed_harm_matches_reference(rng):
    sym = _ref_import("risk_assessment.utils.reference_speed_symmetrical")
    asym = _ref_import("risk_assessment.utils.reference_speed_asymmetrical")
    from frenetix_tpu.risk.harm import ref_speed_harm

    ref_c = _ref_coeffs()
    ours_c = _our_coeffs(ref_c)
    dv = rng.uniform(0.0, 60.0, 64)   # reaches the min(·, 1) clamp
    ang = _angles(rng)
    cases = [
        (sym.get_protected_inj_prob_ref_speed_ignore_angle,
         dict(ignore_angle=True)),
        (sym.get_protected_inj_prob_ref_speed_reduced_sym,
         dict(sym=True, reduced=True)),
        (sym.get_protected_inj_prob_ref_speed_complete_sym,
         dict(sym=True, reduced=False)),
        # NOTE: BOTH asymmetrical ref_speed variants are skipped — the
        # reference functions crash on every possible input (the angle loop
        # overwrites `reference` with a scalar instead of `reference[i] = …`,
        # then the model loop indexes `reference[i]`:
        # reference_speed_asymmetrical.py:32-65 (complete) and :92-112
        # (reduced) — dead code upstream).  This repo's sym=False branches
        # implement the documented RS12A/RS4A binning; their angle→area
        # mapping is cross-checked against the WORKING symmetrical variants
        # above (same bin edges, mirrored coefficients).
    ]
    for ref_fn, kw in cases:
        # the reference mixes scalar/array handling — drive it per sample;
        # some variants index velocity, some treat it as scalar
        def _one(v, a, fn=ref_fn):
            try:
                return np.ravel(fn(np.array([v]), np.array([a]), ref_c))[0]
            except (TypeError, ValueError):
                return np.ravel(fn(float(v), np.array([a]), ref_c))[0]

        theirs = np.array([_one(dv[i], ang[i]) for i in range(len(dv))])
        mine = np.asarray(ref_speed_harm(dv, ang.copy(), ours_c, **kw))
        np.testing.assert_allclose(mine, theirs, rtol=1e-9, atol=1e-12,
                                   err_msg=str(kw))


def test_gidas_harm_matches_reference(rng):
    # gidas.py → helpers.properties → commonroad ObstacleType + pycrcc
    # trajectory queries (neither used on the delta-v path we exercise)
    _install_stub("commonroad.scenario.obstacle",
                  ObstacleType=types.SimpleNamespace(
                      CAR="car", TRUCK="truck", BUS="bus", BICYCLE="bicycle",
                      PEDESTRIAN="pedestrian",
                      PRIORITY_VEHICLE="priorityVehicle",
                      PARKED_VEHICLE="parkedVehicle", TRAIN="train",
                      MOTORCYCLE="motorcycle", TAXI="taxi"))
    _install_stub(
        "commonroad_dc.collision.trajectory_queries.trajectory_queries",
        trajectories_collision_dynamic_obstacles=lambda *a, **k: None)
    _install_stub("commonroad_dc.pycrcc", RectOBB=_StubRectOBB)
    gid = _ref_import("risk_assessment.utils.gidas")
    from frenetix_tpu.risk.harm import gidas_harm

    ref_c = _ref_coeffs()
    ours_c = _our_coeffs(ref_c)
    for _ in range(16):
        ego = types.SimpleNamespace(velocity=float(rng.uniform(0, 25)),
                                    yaw=0.0, mass=float(rng.uniform(900, 2500)))
        obs = types.SimpleNamespace(velocity=float(rng.uniform(0, 25)),
                                    yaw=0.0, mass=float(rng.uniform(50, 120)),
                                    protection=0)
        pdof = float(rng.uniform(-np.pi, np.pi))
        ego_harm_ref, obs_harm_ref = gid.get_unprotected_gidas_harm(
            ego, obs, pdof, ref_c)
        # reproduce the reference's delta-v split, then compare the harm maps
        props = _ref_import("risk_assessment.helpers.properties")
        dv_ego, dv_obs = props.calc_delta_v(ego, obs, pdof)
        np.testing.assert_allclose(float(gidas_harm(dv_ego, ours_c)),
                                   ego_harm_ref, rtol=1e-12)
        # unprotected road user: pedestrian MAIS2+ model (gidas.py:85-95)
        ours_obs = 1.0 / (1.0 + np.exp(
            ref_c["pedestrian_MAIS2+"]["const"]
            - ref_c["pedestrian_MAIS2+"]["speed"] * dv_obs))
        np.testing.assert_allclose(ours_obs, obs_harm_ref, rtol=1e-12)


# --------------------------------------------------------------------------
# collision_probability.py
# --------------------------------------------------------------------------


class _StubRectOBB:
    """pycrcc.RectOBB accessor surface used by
    get_center_points_for_shape_estimation (collision_probability.py:336-372)."""

    def __init__(self, rx, ry, orientation, cx, cy):
        self._rx = rx
        self._axis = np.array([np.cos(orientation), np.sin(orientation)])
        self._center = np.array([cx, cy])

    def center(self):
        return self._center

    def r_x(self):
        return self._rx

    def local_x_axis(self):
        return self._axis


def _mvnun(lower, upper, mean, cov):
    """scipy.stats.mvn.mvnun replacement (removed in scipy ≥ 1.15):
    P(lower ≤ X ≤ upper) by inclusion-exclusion over scipy's own
    multivariate_normal.cdf — independent of this repo's bvn math."""
    from scipy.stats import multivariate_normal

    mvn_dist = multivariate_normal(mean=np.asarray(mean, float),
                                   cov=np.asarray(cov, float))
    lo, up = np.asarray(lower, float), np.asarray(upper, float)
    p = (mvn_dist.cdf(up)
         - mvn_dist.cdf([up[0], lo[1]])
         - mvn_dist.cdf([lo[0], up[1]])
         + mvn_dist.cdf(lo))
    return max(float(p), 0.0), 0


def _ref_collision_probability():
    _install_stub("commonroad_dc.pycrcc", RectOBB=_StubRectOBB)
    mod = _ref_import("risk_assessment.collision_probability")
    mod.mvn = types.SimpleNamespace(mvnun=_mvnun)
    mod.pycrcc = sys.modules["commonroad_dc.pycrcc"]
    return mod


def _random_case(rng, n1=12, horizon=12, n_obs=2):
    """One ego trajectory + predictions in BOTH input schemas."""
    import jax.numpy as jnp

    from frenetix_tpu.ops.costs import PredictionTensors

    x = np.cumsum(rng.uniform(0.5, 1.5, n1)) + rng.uniform(-2, 2)
    y = rng.uniform(-1, 1, n1).cumsum() * 0.3
    theta = rng.uniform(-0.3, 0.3, n1)
    traj = types.SimpleNamespace(cartesian=types.SimpleNamespace(
        x=x, y=y, theta=theta))

    preds_dict = {}
    means = np.zeros((n_obs, horizon, 2))
    covs = np.zeros((n_obs, horizon, 2, 2))
    oris = np.zeros((n_obs, horizon))
    lengths = np.zeros(n_obs)
    widths = np.zeros(n_obs)
    for o in range(n_obs):
        # obstacles near the ego path so the 5 m gate passes sometimes
        base = np.stack([x[:horizon], y[:horizon]], axis=1)
        means[o] = base + rng.uniform(-4.0, 4.0, (horizon, 2))
        a = rng.uniform(0.05, 0.6, horizon)
        b = rng.uniform(0.05, 0.6, horizon)
        c = rng.uniform(-0.1, 0.1, horizon)
        covs[o, :, 0, 0] = a
        covs[o, :, 1, 1] = b
        covs[o, :, 0, 1] = covs[o, :, 1, 0] = c * np.sqrt(a * b)
        oris[o] = rng.uniform(-np.pi, np.pi, horizon)
        lengths[o] = rng.uniform(3.5, 5.5)
        widths[o] = rng.uniform(1.6, 2.2)
        preds_dict[100 + o] = {
            "pos_list": means[o].copy(),
            "cov_list": covs[o].copy(),
            "orientation_list": oris[o].copy(),
            "v_list": np.full(horizon, 5.0),
            "shape": {"length": lengths[o], "width": widths[o]},
        }

    inv = np.linalg.inv(covs)
    tensors = PredictionTensors(
        means=jnp.asarray(means), inv_covs=jnp.asarray(inv),
        covs=jnp.asarray(covs), orientations=jnp.asarray(oris),
        velocities=jnp.asarray(np.full((n_obs, horizon), 5.0)),
        lengths=jnp.asarray(lengths), widths=jnp.asarray(widths),
        valid=jnp.ones((n_obs, horizon), bool))
    ro = types.SimpleNamespace(
        x=jnp.asarray(x)[None], y=jnp.asarray(y)[None],
        theta_gl=jnp.asarray(theta)[None])
    return traj, preds_dict, tensors, ro


def test_collision_probability_fast_matches_reference(rng):
    ref = _ref_collision_probability()
    from frenetix_tpu.risk.probability import collision_probability_fast

    veh = types.SimpleNamespace(length=4.6, width=1.8)
    for _ in range(4):
        traj, preds_dict, tensors, ro = _random_case(rng)
        theirs = ref.get_collision_probability_fast(traj, preds_dict, veh)
        mine, t = collision_probability_fast(ro, tensors, veh)
        mine = np.asarray(mine, np.float64)  # (M=1, O, t)
        for o, oid in enumerate(sorted(preds_dict)):
            np.testing.assert_allclose(
                mine[0, o, :], np.asarray(theirs[oid])[:t],
                rtol=5e-4, atol=1e-7,
                err_msg=f"obstacle {oid}")


def test_inv_mahalanobis_matches_reference(rng):
    ref = _ref_collision_probability()
    from frenetix_tpu.risk.probability import inv_mahalanobis

    veh = types.SimpleNamespace(length=4.6, width=1.8)
    for _ in range(4):
        traj, preds_dict, tensors, ro = _random_case(rng)
        theirs = ref.get_inv_mahalanobis_dist(traj, preds_dict, veh)
        mine, t = inv_mahalanobis(ro, tensors)
        total_mine = np.asarray(mine, np.float64).sum(axis=1)[0]  # over obs
        total_theirs = np.zeros_like(total_mine)
        for oid in preds_dict:
            total_theirs += np.asarray(theirs[oid])[:t]
        np.testing.assert_allclose(total_mine, total_theirs,
                                   rtol=1e-5, atol=1e-9)


def test_normalize_prob_matches_reference(rng):
    ref = _ref_collision_probability()
    from frenetix_tpu.risk.probability import normalize_probability

    probs = np.concatenate([
        10.0 ** rng.uniform(-80, 0, 128), [0.0, 1.0, 1e-10, 1e-4, 1e-2, 1e-1]])
    theirs = np.array([ref.normalize_prob(p) for p in probs])
    mine = np.asarray(normalize_probability(probs), np.float64)
    np.testing.assert_allclose(mine, theirs, rtol=1e-12, atol=1e-15)
