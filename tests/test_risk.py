"""Risk stack: bivariate-normal CDF, harm models, batched risk computation."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import multivariate_normal

from frenetix_tpu.risk.probability import (
    bvn_cdf, rectangle_probability, normalize_probability,
)
from frenetix_tpu.risk.harm import (
    DEFAULT_HARM_COEFFS, log_reg_harm, ref_speed_harm, gidas_harm,
    pedestrian_harm, angle_range, obstacle_mass,
)


def test_bvn_cdf_against_scipy(rng):
    for _ in range(30):
        rho = rng.uniform(-0.95, 0.95)
        x, y = rng.normal(0, 1.5, 2)
        expected = multivariate_normal(
            mean=[0, 0], cov=[[1, rho], [rho, 1]]
        ).cdf([x, y])
        got = float(bvn_cdf(x, y, rho))
        np.testing.assert_allclose(got, expected, atol=5e-6)


def test_rectangle_probability_against_scipy(rng):
    for _ in range(20):
        mean = rng.normal(0, 2, 2)
        a = rng.uniform(0.3, 2.0)
        b = rng.uniform(0.3, 2.0)
        c = rng.uniform(-0.8, 0.8) * np.sqrt(a * b)
        cov = np.array([[a, c], [c, b]])
        lo = mean + rng.uniform(-3, -0.5, 2)
        hi = lo + rng.uniform(0.5, 3, 2)
        mn = multivariate_normal(mean=mean, cov=cov)
        expected = (
            mn.cdf(hi) - mn.cdf([lo[0], hi[1]]) - mn.cdf([hi[0], lo[1]]) + mn.cdf(lo)
        )
        got = float(
            rectangle_probability(jnp.asarray(lo), jnp.asarray(hi),
                                  jnp.asarray(mean), jnp.asarray(cov))
        )
        np.testing.assert_allclose(got, expected, atol=1e-5)


def test_angle_range():
    vals = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -3 * np.pi, 4.0, -4.0])
    got = np.asarray(angle_range(jnp.asarray(vals)))
    for g in got:
        assert -np.pi < g <= np.pi + 1e-12
    np.testing.assert_allclose(got[0], 0.0)
    np.testing.assert_allclose(abs(got[1]), np.pi)


def _oracle_log_reg_reduced_sym(velocity, angle, coeff):
    """Scalar oracle of logistic_regression_symmetrical.py:70-110."""
    t_a = np.pi / 4
    t_b = 3 * t_a
    if -t_a < angle < t_a:
        a = 0.0
    elif t_a <= angle < t_b or -t_a >= angle > -t_b:
        a = coeff["log_reg"]["reduced_sym_angle_areas"]["side"]
    else:
        a = coeff["log_reg"]["reduced_sym_angle_areas"]["rear"]
    c = coeff["log_reg"]["reduced_sym_angle_areas"]
    return 1 / (1 + np.exp(-c["const"] - c["speed"] * velocity - a))


def test_log_reg_reduced_sym_matches_oracle(rng):
    for _ in range(100):
        v = rng.uniform(0, 30)
        ang = rng.uniform(-np.pi, np.pi)
        expected = _oracle_log_reg_reduced_sym(v, ang, DEFAULT_HARM_COEFFS)
        got = float(log_reg_harm(v, ang, sym=True, reduced=True))
        np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_log_reg_monotone_in_speed():
    v = jnp.linspace(0.0, 40.0, 50)
    for kw in [dict(ignore_angle=True), dict(sym=True, reduced=False),
               dict(sym=False, reduced=True), dict(sym=False, reduced=False)]:
        h = np.asarray(log_reg_harm(v, jnp.zeros_like(v), **kw))
        assert np.all(np.diff(h) > 0), kw
        assert np.all((h > 0) & (h < 1))


def test_ref_speed_and_gidas_range():
    v = jnp.linspace(0.0, 80.0, 40)
    h = np.asarray(ref_speed_harm(v, jnp.zeros_like(v)))
    assert np.all((h >= 0) & (h <= 1.0 + 1e-9))
    assert h[-1] == pytest.approx(1.0)  # above reference speed → certain harm
    g = np.asarray(gidas_harm(v))
    p = np.asarray(pedestrian_harm(v))
    assert np.all(np.diff(g) > 0) and np.all(np.diff(p) > 0)


def test_obstacle_mass_table():
    assert obstacle_mass("truck", 10.0) == 25000.0
    assert obstacle_mass("pedestrian", 0.5) == 75.0
    car = obstacle_mass("car", 4.5 * 2.0)
    assert 1000 < car < 2500


def test_normalize_probability_piecewise():
    ref_map = [
        (0.5, 0.6666666666666666 * 0.5 + 0.33333333333333337),
        (0.05, 1.1111111111111114 * 0.05 + 0.28888888888888886),
        (1e-3, 10.101010101010099 * 1e-3 + 0.198989898989899),
        (1e-6, 1000.001000001 * 1e-6 + 0.0999998999999),
        (1e-20, 900000000.0000001 * 1e-20 + 0.01),
        (1e-80, 0.001),
    ]
    for p, expected in ref_map:
        got = float(normalize_probability(jnp.asarray(p)))
        np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_trajectory_risks_sanity():
    """A candidate heading into an obstacle carries more risk than one
    steering clear; empty predictions → zero risk."""
    import jax

    from frenetix_tpu.geometry.refpath import prepare_reference_path
    from frenetix_tpu.ops.costs import PredictionTensors, empty_predictions
    from frenetix_tpu.ops.kinematics import VehicleParams, rollout_candidates
    from frenetix_tpu.ops.sampling import build_sampling_matrix
    from frenetix_tpu.risk.costs import trajectory_risks
    from frenetix_tpu.risk.harm import ObstacleMeta

    xy = np.stack([np.linspace(0, 200, 400), np.zeros(400)], axis=1)
    ref = prepare_reference_path(xy, extension=10.0)
    veh = VehicleParams()
    matrix = build_sampling_matrix(
        t1_vals=[3.0], ss1_vals=[10.0], d1_vals=[0.0, 3.0],
        x0_lon=(20.0, 10.0, 0.0), x0_lat=(0.0, 0.0, 0.0),
    )
    ro = jax.jit(
        rollout_candidates,
        static_argnames=("dt", "n_steps", "low_vel_mode", "quintic_lon"),
    )(jnp.asarray(matrix), ref, veh, dt=0.1, n_steps=30, low_vel_mode=False,
      x0_orientation=0.0)

    t_pred = 30
    means = np.zeros((1, t_pred, 2))
    means[0, :, 0] = 35.0 + 0.0 * np.arange(t_pred)  # parked in-lane at x=35
    covs = np.tile(np.eye(2) * 0.3, (1, t_pred, 1, 1))
    preds = PredictionTensors(
        means=jnp.asarray(means), inv_covs=jnp.asarray(np.linalg.inv(covs)),
        covs=jnp.asarray(covs), orientations=jnp.zeros((1, t_pred)),
        velocities=jnp.zeros((1, t_pred)),
        lengths=jnp.asarray([4.5]), widths=jnp.asarray([2.0]),
        valid=jnp.ones((1, t_pred), bool),
    )
    meta = ObstacleMeta(mass=jnp.asarray([1500.0]), protected=jnp.asarray([1]))
    risks = trajectory_risks(ro, preds, meta, veh.mass)
    ego = np.asarray(risks.ego_risk)
    assert ego[0] > 10 * max(ego[1], 1e-12), ego  # head-on ≫ swerving
    assert float(risks.obst_risk[0]) > 0

    risks0 = trajectory_risks(ro, empty_predictions(t_pred, jnp.float64),
                              ObstacleMeta(mass=jnp.zeros(0), protected=jnp.zeros(0, jnp.int32)),
                              veh.mass)
    assert np.all(np.asarray(risks0.ego_risk) == 0)
