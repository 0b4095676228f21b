"""Batched cost stack vs. the scalar oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from frenetix_tpu.geometry.refpath import prepare_reference_path
from frenetix_tpu.ops import costs as cm
from frenetix_tpu.ops.costs import COST_TERM_ORDER, PredictionTensors
from frenetix_tpu.ops.kinematics import VehicleParams, rollout_candidates
from frenetix_tpu.ops.sampling import build_sampling_matrix
from tests import reference_impl as oracle

DT = 0.1
N = 30

rollout_jit = jax.jit(
    rollout_candidates, static_argnames=("dt", "n_steps", "low_vel_mode", "quintic_lon")
)


def _setup():
    t = np.linspace(0, np.pi / 4, 400)
    ref = prepare_reference_path(
        np.stack([150 * np.sin(t), 150 * (1 - np.cos(t))], axis=1), extension=20.0
    )
    veh = VehicleParams()
    matrix = build_sampling_matrix(
        t1_vals=[1.5, 2.0, 3.0], ss1_vals=[8.0, 10.0, 12.0],
        d1_vals=[-1.5, 0.0, 1.5], x0_lon=(30.0, 10.0, 0.1), x0_lat=(0.2, 0.05, 0.0),
    )
    ro = rollout_jit(jnp.asarray(matrix), ref, veh, dt=DT, n_steps=N,
                     low_vel_mode=False, x0_orientation=0.3)
    return ref, veh, matrix, ro


def test_simpson_matches_scipy_semantics(rng):
    for n in [5, 30, 31]:
        y = rng.normal(size=(4, n))
        got = np.asarray(cm.simpson_uniform(jnp.asarray(y), 0.1))
        expected = np.array([oracle.simpson_scipy_like(row, 0.1) for row in y])
        np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_cost_terms_match_oracle(rng):
    ref, veh, matrix, ro = _setup()

    o, t_pred = 2, 25
    means = rng.normal(45, 10, (o, t_pred, 2))
    covs = np.tile(np.eye(2) * 0.6, (o, t_pred, 1, 1))
    inv = np.linalg.inv(covs)
    preds = PredictionTensors(
        means=jnp.asarray(means), inv_covs=jnp.asarray(inv), covs=jnp.asarray(covs),
        orientations=jnp.zeros((o, t_pred)), velocities=jnp.full((o, t_pred), 5.0),
        lengths=jnp.full(o, 4.5), widths=jnp.full(o, 2.0),
        valid=jnp.ones((o, t_pred), bool),
    )
    obstacle_xy = means[:, 0]
    v_des = 11.0

    terms = np.asarray(
        cm.compute_cost_terms(
            ro, dt=DT, desired_velocity=v_des, preds=preds,
            obstacle_xy=jnp.asarray(obstacle_xy),
            obstacle_valid=jnp.ones(o, bool),
        )
    )
    idx = {n: i for i, n in enumerate(COST_TERM_ORDER)}

    for i in range(matrix.shape[0]):
        res = oracle.check_feasibility_single(
            matrix[i], ref, veh, dt=DT, n_steps=N,
            low_vel_mode=False, x0_orientation=0.3,
        )
        exp = oracle.cost_terms_single(
            res, dt=DT, desired_velocity=v_des,
            pred_means=means, pred_inv_covs=inv, pred_len=t_pred,
            obstacle_xy=obstacle_xy,
        )
        for name in ["acceleration", "jerk", "lateral_jerk", "longitudinal_jerk",
                     "orientation_offset", "velocity_offset",
                     "distance_to_reference_path", "path_length",
                     "distance_to_obstacles", "prediction"]:
            np.testing.assert_allclose(
                terms[i, idx[name]], exp[name], rtol=1e-6, atol=1e-8,
                err_msg=f"candidate {i} cost {name}",
            )


def test_weighted_total():
    ref, veh, matrix, ro = _setup()
    terms = cm.compute_cost_terms(
        ro, dt=DT, desired_velocity=10.0,
        preds=cm.empty_predictions(N, jnp.float64),
        obstacle_xy=jnp.zeros((0, 2)), obstacle_valid=jnp.zeros(0, bool),
    )
    w = jnp.asarray(np.linspace(0.1, 1.3, len(COST_TERM_ORDER)))
    total = np.asarray(cm.weighted_total(terms, w))
    np.testing.assert_allclose(total, np.asarray(terms) @ np.asarray(w), rtol=1e-12)
