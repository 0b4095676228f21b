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


def test_compensated_sum_tie_stability():
    """VERDICT r2 item 8: knife-edge selections must not depend on last-ulp
    noise.  With `compensated=True` the weighted total is the correctly
    rounded exact sum, so (a) candidates with mathematically equal totals
    compare bitwise-equal and argmin's first-index rule breaks the tie
    deterministically, and (b) ±1-ulp perturbations of OTHER candidates
    cannot flip the selection."""
    k = len(COST_TERM_ORDER)
    base = np.array(
        [512.0, 1.0, 3.0e-3, 3.75, 0.25, 37.0, 7.0, 1.0e-2, 0.5, 2.0,
         9.0, 11.0, 0.125][:k], np.float32)
    w = jnp.asarray(np.ones(k, np.float32))

    # rows 0 and 1: permutations of the same products → mathematically equal
    # totals; rows 2 and 3: clearly worse candidates
    rows = np.stack([
        base,
        base[::-1],
        base * 1.5,
        base + 0.5,
    ]).astype(np.float32)
    terms = jnp.asarray(rows)

    total = np.asarray(cm.weighted_total(terms, w, compensated=True))
    assert total[0] == total[1], "permuted-term totals must be bitwise equal"
    assert int(np.argmin(total)) == 0, "exact tie must resolve to first index"

    # correctly rounded: matches the float64 exact sum rounded to f32
    exact = (rows.astype(np.float64) @ np.ones(k)).astype(np.float32)
    np.testing.assert_array_equal(total, exact)

    # ±1 ulp noise on the non-tied candidates leaves the selection alone
    for row, direction in ((2, np.inf), (2, -np.inf), (3, np.inf), (3, -np.inf)):
        noisy = rows.copy()
        noisy[row] = np.nextafter(noisy[row], np.float32(direction))
        t2 = np.asarray(cm.weighted_total(jnp.asarray(noisy), w, compensated=True))
        assert int(np.argmin(t2)) == 0

    # a MATHEMATICAL order change does move the selection (sensitivity is
    # semantic, not numeric): push row 0's dominant term well past row 1
    moved = rows.copy()
    moved[0, 0] += 0.01
    t3 = np.asarray(cm.weighted_total(jnp.asarray(moved), w, compensated=True))
    assert int(np.argmin(t3)) == 1


def test_compensated_sum_in_cycle():
    """evaluate_cycle(compensated_sum=True) selects a candidate with the same
    semantics as the plain path (identical selection on a non-degenerate
    workload, totals within float tolerance)."""
    from frenetix_tpu.ops.costs import empty_predictions
    from frenetix_tpu.planner.core import CycleContext, evaluate_cycle

    ref, veh, matrix, ro = _setup()
    from frenetix_tpu.geometry.corridor import strip_corridor
    corridor = strip_corridor(ref, 3.5)
    w = np.zeros(len(COST_TERM_ORDER))
    for name, val in dict(velocity_offset=1.0, lateral_jerk=0.2,
                          distance_to_reference_path=5.0).items():
        w[COST_TERM_ORDER.index(name)] = val
    ctx = CycleContext(
        ref=ref, veh=veh, weights=jnp.asarray(w),
        preds=empty_predictions(N, jnp.float64),
        obstacle_xy=jnp.zeros((0, 2)), obstacle_valid=jnp.zeros(0, bool),
        corridor=jnp.asarray(corridor),
        lane_segments=jnp.zeros((0, 2, 2)), lane_valid=jnp.zeros(0, bool),
        x0_orientation=jnp.asarray(0.3), desired_velocity=jnp.asarray(10.0),
        desired_avg_velocity=jnp.asarray(10.0),
    )
    mask = jnp.ones(matrix.shape[0], bool)
    r_plain = evaluate_cycle(jnp.asarray(matrix), mask, ctx, dt=DT, n_steps=N,
                             low_vel_mode=False)
    r_comp = evaluate_cycle(jnp.asarray(matrix), mask, ctx, dt=DT, n_steps=N,
                            low_vel_mode=False, compensated_sum=True)
    assert int(r_plain.best_idx) == int(r_comp.best_idx)
    np.testing.assert_allclose(np.asarray(r_plain.cost), np.asarray(r_comp.cost),
                               rtol=1e-12)


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
