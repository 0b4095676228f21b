"""Occlusion module: spawn points, phantom predictions, safety gating."""
import numpy as np
import jax.numpy as jnp


def _scenario_with_parked_truck():
    from frenetix_tpu.io.commonroad import Obstacle, Scenario, State

    truck = Obstacle(
        obstacle_id=9, obstacle_type="truck", role="static", length=9.0,
        width=2.5, initial_state=State(0, np.array([20.0, 3.5]), 0.0, 0.0),
    )
    return Scenario("occ", 0.1, {}, {9: truck}, {})


class _Ego:
    position = np.array([0.0, 0.0])
    orientation = 0.0
    velocity = 10.0


def test_spawn_points_behind_obstacle():
    from frenetix_tpu.occlusion import OcclusionModule

    sc = _scenario_with_parked_truck()
    mod = OcclusionModule(sc)
    specs = mod.find_spawn_points(_Ego(), 0)
    assert 1 <= len(specs) <= mod.max_phantoms
    for sp in specs:
        # phantom sits near the truck's silhouette, beyond the ego
        assert np.linalg.norm(sp.position - np.array([20.0, 3.5])) < 12.0
        assert np.linalg.norm(sp.position - _Ego.position) > 5.0


def test_phantom_rows_and_gate():
    from frenetix_tpu.occlusion import OcclusionModule
    from frenetix_tpu.risk.costs import TrajectoryRisks

    sc = _scenario_with_parked_truck()
    mod = OcclusionModule(sc, harm_threshold=0.05, risk_threshold=0.5)
    specs = mod.find_spawn_points(_Ego(), 0)
    rows = mod.phantom_prediction_rows(specs, horizon=30, dt=0.1)
    assert rows["means"].shape == (len(specs), 30, 2)
    assert np.all(rows["widths"] > 0)
    assert np.all(np.linalg.eigvalsh(rows["covs"].reshape(-1, 2, 2)) > 0)

    # gate: candidate 0 risky vs phantom, candidate 1 safe
    m, o = 2, 3
    phantom_mask = np.array([False, True, True])
    obst_risk = np.zeros((m, o))
    obst_risk[0, 1] = 0.2   # above harm threshold vs a phantom
    obst_risk[:, 0] = 9.9   # huge risk vs a REAL obstacle — must not gate
    risks = TrajectoryRisks(
        ego_risk_per_obst=jnp.zeros((m, o)),
        obst_risk_per_obst=jnp.asarray(obst_risk),
        ego_harm_per_obst=jnp.zeros((m, o)),
        obst_harm_per_obst=jnp.asarray(obst_risk),
        ego_risk=jnp.zeros(m), obst_risk=jnp.zeros(m),
        obst_present=jnp.ones(o, bool),
    )
    safe = np.asarray(mod.trajectory_safety_assessment(risks, phantom_mask))
    assert not safe[0]
    assert safe[1]


def test_occlusion_slows_past_blind_spot():
    """End-to-end behavioral effect: a parked truck creates a blind spot; with
    the occlusion module on, the ego passes it markedly slower (phantom
    pedestrian risk gates fast candidates)."""
    from frenetix_tpu.io.commonroad import Obstacle, State
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    sc = make_highway(ego_v=13.0, lead_v=13.0, lead_gap=120.0, n_steps=150)
    sc.obstacles[200] = Obstacle(
        obstacle_id=200, obstacle_type="truck", role="static", length=9.0,
        width=2.5, initial_state=State(0, np.array([60.0, 2.6]), 0.0, 0.0),
    )

    def passing_speed(occ):
        cfg = load_config()
        cfg.dtype = "float64"
        cfg.occlusion.use_occlusion_module = occ
        cfg.occlusion.harm_threshold = 0.02
        res = Simulation(sc, cfg).run()
        assert list(res.agent_status.values())[0].name == "COMPLETED_SUCCESS"
        v = [s.velocity for s in res.histories[60000] if 45 < s.position[0] < 65]
        return float(np.mean(v))

    v_off = passing_speed(False)
    v_on = passing_speed(True)
    assert v_on < 0.7 * v_off, (v_on, v_off)
