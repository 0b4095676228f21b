"""End-to-end harm-dispatch oracle: `risk/costs.trajectory_risks`'s harm
tensors vs the REFERENCE'S OWN dispatch chain on random scalar cases
(round-4 extension of tests/test_reference_oracles.py):

  reference chain: calc_crash_angle_simple (helpers/properties.py:327-359)
  → get_obstacle_mass (:16-48) → calc_delta_v (:51-75)
  → get_protected_log_reg_harm / get_unprotected_log_reg_harm
    (utils/logistic_regression.py:23-161), driven with the repo's default
    risk modes (risk.json: log_reg, sym+reduced angle areas).

Pins the full plumbing the batched device path relies on: pdof/impact
angles, the mass-ratio Δv split, protected-vs-unprotected selection, and
the pedestrian regression — not just the leaf formulas.
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
    not os.path.isdir(os.path.join(REF_ROOT, "risk_assessment")),
    reason="reference tree not available",
)

from test_reference_oracles import (  # noqa: E402
    _install_stub, _our_coeffs, _ref_coeffs, _ref_import, _StubRectOBB)


def _ref_modules():
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
    props = _ref_import("risk_assessment.helpers.properties")
    lr = _ref_import("risk_assessment.utils.logistic_regression")
    return props, lr


def _case(rng, protected: bool):
    """One (ego trajectory, single obstacle) case in both input schemas."""
    import jax.numpy as jnp

    from frenetix_tpu.ops.costs import PredictionTensors
    from frenetix_tpu.risk import harm as harm_mod

    t = 8
    x = np.cumsum(rng.uniform(0.8, 1.4, t + 1))
    y = 0.2 * np.cumsum(rng.uniform(-0.5, 0.5, t + 1))
    theta = rng.uniform(-0.5, 0.5, t + 1)
    v_ego = rng.uniform(4.0, 16.0, t + 1)

    if protected:
        length, width = rng.uniform(4.0, 5.2), rng.uniform(1.7, 2.0)
        obstacle_type = "car"
    else:
        length, width = 0.4, 0.4          # pedestrian-sized footprint
        obstacle_type = "pedestrian"
    means = np.stack([x[:t] + rng.uniform(2, 6, t),
                      y[:t] + rng.uniform(-2, 2, t)], axis=1)
    oris = rng.uniform(-np.pi, np.pi, t)
    v_obs = rng.uniform(0.5, 12.0, t)
    covs = np.tile(np.eye(2) * 0.3, (1, t, 1, 1))
    preds = PredictionTensors(
        means=jnp.asarray(means[None]), inv_covs=jnp.asarray(np.linalg.inv(covs)),
        covs=jnp.asarray(covs), orientations=jnp.asarray(oris[None]),
        velocities=jnp.asarray(v_obs[None]),
        lengths=jnp.asarray([length]), widths=jnp.asarray([width]),
        valid=jnp.ones((1, t), bool))
    ro = types.SimpleNamespace(
        x=jnp.asarray(x)[None], y=jnp.asarray(y)[None],
        theta_gl=jnp.asarray(theta)[None], v=jnp.asarray(v_ego)[None])
    ref_pred = {"pos_list": means, "orientation_list": oris, "v_list": v_obs}
    traj = types.SimpleNamespace(x=x, y=y, theta=theta, v=v_ego)
    meta = harm_mod.meta_from_footprint(np.array([length]), np.array([width]),
                                        dtype=np.float64)
    return ro, preds, meta, traj, ref_pred, obstacle_type, length * width


@pytest.mark.parametrize("protected", [True, False])
def test_harm_dispatch_matches_reference_chain(rng, protected):
    props, lr = _ref_modules()
    from frenetix_tpu.risk import harm as harm_mod
    from frenetix_tpu.risk.costs import DEFAULT_RISK_MODES, trajectory_risks

    ref_c = _ref_coeffs()
    ours_c = _our_coeffs(ref_c)
    ego_mass = 1475.0
    veh_size = 4.508 * 1.610

    for _ in range(4):
        ro, preds, meta, traj, ref_pred, obstacle_type, size = _case(
            rng, protected)
        # repo mass model must agree with the reference's
        ref_mass = props.get_obstacle_mass(obstacle_type, size)
        if protected:
            assert harm_mod.obstacle_mass(obstacle_type, size) == pytest.approx(
                ref_mass, rel=1e-12)
            np.testing.assert_allclose(np.asarray(meta.mass), [ref_mass],
                                       rtol=1e-6)
        risks = trajectory_risks(ro, preds, meta, ego_mass, coeffs=ours_c,
                                 modes=DEFAULT_RISK_MODES)
        # reproduce the reference per time step (harm at ego step i vs
        # prediction step i — risk/costs.py alignment note)
        import jax

        # re-derive the repo's internal per-step harms by re-running the
        # public function with a single-step window each time
        for i in range(0, 6, 2):
            pdof, ego_angle, obs_angle = props.calc_crash_angle_simple(
                traj, {7: ref_pred}, 7, i)
            ego = types.SimpleNamespace(
                velocity=float(traj.v[i]), yaw=float(traj.theta[i]),
                mass=ego_mass, size=veh_size, protection=1)
            obs = types.SimpleNamespace(
                velocity=float(ref_pred["v_list"][i]),
                yaw=float(ref_pred["orientation_list"][i]),
                mass=ref_mass, size=size, protection=1 if protected else 0)
            # DELIBERATE divergence (documented in risk/harm.py): the
            # reference bins the RAW angle — obs_angle = π + rel − yaw spans
            # (−π, 3π), and every out-of-range value collapses into the
            # "rear" coefficient regardless of true geometry
            # (harm_estimation.py:329-335 passes unwrapped angles;
            # logistic_regression_symmetrical.py:92-100 else-bins them).
            # This repo wraps into (−π, π] first (harm.angle_range), so the
            # oracle feeds the reference the WRAPPED angles — pinning the
            # shared math exactly while isolating the one intentional fix.
            wrap = lambda a: (a + np.pi) % (2 * np.pi) - np.pi
            ego_angle, obs_angle = wrap(ego_angle), wrap(obs_angle)
            if protected:
                h_ego, h_obs = lr.get_protected_log_reg_harm(
                    ego, obs, pdof, np.array([ego_angle]),
                    np.array([obs_angle]), DEFAULT_RISK_MODES, ref_c)
                h_ego, h_obs = float(np.ravel(h_ego)[0]), float(np.ravel(h_obs)[0])
            else:
                h_ego, h_obs = lr.get_unprotected_log_reg_harm(
                    ego, obs, pdof, ref_c)
                h_ego, h_obs = float(np.ravel(h_ego)[0]), float(np.ravel(h_obs)[0])
            from frenetix_tpu.risk.costs import _harm_tensors  # noqa: PLC0415

            mine_ego, mine_obs = _harm_tensors(
                ro, preds, meta, ego_mass, ours_c, DEFAULT_RISK_MODES, 8)
            np.testing.assert_allclose(float(mine_ego[0, 0, i]), h_ego,
                                       rtol=1e-9,
                                       err_msg=f"ego harm step {i}")
            np.testing.assert_allclose(float(mine_obs[0, 0, i]), h_obs,
                                       rtol=1e-9,
                                       err_msg=f"obstacle harm step {i}")
        # sanity on the public output
        assert np.asarray(risks.ego_risk).shape == (1,)
