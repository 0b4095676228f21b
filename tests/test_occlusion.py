"""Occlusion module: spawn points, phantom predictions, safety gating."""
import numpy as np
import pytest
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


@pytest.mark.slow
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


# -------------------------------------------------- visible-area polar model


def test_polar_visibility_known_shadow():
    """A wall segment at x=10 spanning y∈[-5,5]: rays through it clip at the
    wall, rays past its ends reach the sensor radius."""
    from frenetix_tpu.sim.visible_area import polar_visibility

    segs = np.array([[[10.0, -5.0], [10.0, 5.0]]])
    phi, r = polar_visibility([0.0, 0.0], segs, radius=50.0, n_rays=720)
    # straight ahead (phi=0): clipped at exactly 10
    k0 = np.argmin(np.abs(phi))
    assert abs(r[k0] - 10.0) < 1e-9
    # behind (phi=pi): free
    k_pi = np.argmin(np.abs(np.abs(phi) - np.pi))
    assert r[k_pi] == 50.0
    # at 45°: ray exits past the wall end (y=5 at x=5 < 10) → free
    k45 = np.argmin(np.abs(phi - np.pi / 4))
    assert r[k45] == 50.0


def test_visible_area_obstacle_shadow():
    """A vehicle between ego and a target hides it; moving the target
    sideways out of the wedge makes it visible (the reference's occlusion
    wedge, sensor_model.py:204-221)."""
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.sim.visible_area import (
        compute_visible_area, obstacle_obb_segments,
    )

    sc = make_highway()
    # blocker: car at (20, 0) heading +x; ego at origin
    area = compute_visible_area(sc, 60000, [0.0, 0.0], 0, 60.0,
                                road_segments=np.zeros((0, 2, 2)),
                                include_obstacles=False)
    # manually: only blocker as occluder
    from frenetix_tpu.sim.visible_area import VisibleArea, polar_visibility

    segs = obstacle_obb_segments([20.0, 0.0], 0.0, 4.5, 2.0)
    phi, r = polar_visibility([0.0, 0.0], segs, radius=60.0, n_rays=1440)
    va = VisibleArea([0.0, 0.0], phi, r)
    assert not va.points_visible(np.array([[40.0, 0.0]]))[0]   # in the shadow
    assert va.points_visible(np.array([[40.0, 6.0]]))[0]       # beside it
    assert va.points_visible(np.array([[10.0, 0.0]]))[0]       # in front
    # the blocker itself stays visible (silhouette-corner tolerance)
    assert va.obstacle_visible([20.0, 0.0], 0.0, 4.5, 2.0)


def test_road_boundary_segments_dissolve():
    """Adjacent lanelets share an edge — the shared bound is interior and
    must not appear in the union boundary."""
    from frenetix_tpu.io.scenario_factory import make_lane_change
    from frenetix_tpu.sim.visible_area import road_boundary_segments

    sc = make_lane_change()
    segs = road_boundary_segments(sc)
    assert len(segs) > 0
    # the shared bound is the right lane's LEFT bound at y = 1.8
    mids = segs.mean(axis=1)
    assert not np.any(np.abs(mids[:, 1] - 1.8) < 1e-6), \
        "shared lane boundary leaked into the union boundary"
    # outer bounds at y=-1.8 and y=5.4 must be there
    assert np.any(np.abs(mids[:, 1] + 1.8) < 1e-6)
    assert np.any(np.abs(mids[:, 1] - 5.4) < 1e-6)


def test_visible_obstacles_with_area_model():
    """End-to-end sensor pipeline: a lead car hides a further car on the same
    ray; both visible without the blocker."""
    from frenetix_tpu.io.commonroad import Obstacle, State
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.sim.sensor_model import visible_obstacles

    sc = make_highway()

    class Ego:
        position = np.array([0.0, 0.0])
        orientation = 0.0

    # place two obstacles on one ray: blocker at 20 m, target at 40 m
    for oid, x in ((300, 20.0), (301, 40.0)):
        st = State(0, np.array([x, 0.0]), 0.0, 0.0)
        sc.obstacles[oid] = Obstacle(
            obstacle_id=oid, obstacle_type="car", role="static",
            length=4.5, width=2.0, initial_state=st,
        )
    del sc.obstacles[100]  # remove the factory's lead vehicle

    ids, area = visible_obstacles(
        sc, 60000, Ego(), 0, sensor_radius=60.0, occlusions=True,
        cone_filter=False, return_area=True,
    )
    assert 300 in ids
    assert 301 not in ids          # shadowed by 300
    assert area is not None
    poly = area.polygon()
    assert poly.shape[1] == 2 and len(poly) >= 360


def test_extra_occluders_block_sight():
    """Live-agent poses passed as extra occluders cast shadows like scenario
    obstacles (multi-agent occlusion fix: agent-converted obstacles' scenario
    trajectories are stale, so their live poses must occlude instead)."""
    from frenetix_tpu.io.commonroad import Obstacle, State
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.sim.sensor_model import visible_obstacles

    sc = make_highway()
    del sc.obstacles[100]
    # a static target straight ahead at 40 m
    st = State(0, np.array([40.0, 0.0]), 0.0, 0.0)
    sc.obstacles[301] = Obstacle(
        obstacle_id=301, obstacle_type="car", role="static",
        length=4.5, width=2.0, initial_state=st,
    )

    class Ego:
        position = np.array([0.0, 0.0])
        orientation = 0.0

    kw = dict(sensor_radius=60.0, occlusions=True, cone_filter=False)
    assert 301 in visible_obstacles(sc, 60000, Ego(), 0, **kw)
    # a live vehicle at 20 m on the same ray (not a scenario obstacle)
    blocker = [(np.array([20.0, 0.0]), 0.0, 4.5, 2.0)]
    assert 301 not in visible_obstacles(
        sc, 60000, Ego(), 0, extra_occluders=blocker, **kw
    )


# ------------------------------------------- full metric-threshold gate


def _gate_fixture():
    """Two candidates driving +x at 10 m/s; obstacle row 0 is REAL (far),
    row 1 is a standing phantom at (5, 1).  Candidate 0 passes within 1 m
    of the phantom; candidate 1 (offset to y=-7) stays ~8 m away."""
    import jax.numpy as jnp

    from frenetix_tpu.risk.costs import TrajectoryRisks

    n = 10
    t = np.arange(n + 1) * 0.1

    class RO:
        x = jnp.asarray(np.stack([10.0 * t, 10.0 * t]))
        y = jnp.asarray(np.stack([np.zeros(n + 1), np.full(n + 1, -7.0)]))
        v = jnp.full((2, n + 1), 10.0)

    class Preds:
        means = jnp.asarray(np.stack([
            np.tile([100.0, 100.0], (n, 1)),       # real obstacle, far away
            np.tile([5.0, 1.0], (n, 1)),           # phantom
        ]))
        lengths = jnp.asarray([4.5, 0.36])
        widths = jnp.asarray([2.0, 0.65])

    class Veh:
        length, width = 4.5, 2.0

    cp = np.array([[0.9, 0.5], [0.9, 0.01]])      # real column must NOT gate
    risks = TrajectoryRisks(
        ego_risk_per_obst=jnp.zeros((2, 2)),
        obst_risk_per_obst=jnp.zeros((2, 2)),
        ego_harm_per_obst=jnp.zeros((2, 2)),
        obst_harm_per_obst=jnp.zeros((2, 2)),
        ego_risk=jnp.zeros(2), obst_risk=jnp.zeros(2),
        obst_present=jnp.ones(2, bool),
        coll_prob_per_obst=jnp.asarray(cp),
    )
    phantom_mask = np.array([False, True])
    return RO(), Preds(), Veh(), risks, phantom_mask


def test_metric_gate_geometric_thresholds():
    """Each occlusion.yaml metric threshold activated alone discriminates
    the close-encounter candidate from the clear one, and never gates on
    the REAL obstacle row."""
    from frenetix_tpu.occlusion import PhantomThresholds, phantom_safety_mask

    ro, preds, veh, risks, pm = _gate_fixture()
    base = dict(harm=None, risk=None)

    def gate(**kw):
        thr = PhantomThresholds(**{**base, **kw})
        return np.asarray(phantom_safety_mask(
            risks, pm, thr, rollout=ro, preds=preds, veh=veh, dt=0.1))

    assert gate(dce=2.0).tolist() == [False, True]
    assert gate(ttc=1.0).tolist() == [False, True]   # contact r ≈ 2.8 m
    assert gate(wttc=0.5).tolist() == [False, True]
    assert gate(cp=0.1).tolist() == [False, True]
    assert gate(be=20.0).tolist() == [False, True]   # 100 vs ~10 m/s² req.
    # ttce gates the encounter TIME (0.5 s for both candidates)
    assert gate(ttce=0.3).tolist() == [True, True]
    assert gate(ttce=1.0).tolist() == [False, False]
    # nothing activated → everything passes
    assert gate().tolist() == [True, True]


def test_thresholds_from_config():
    from frenetix_tpu.occlusion import PhantomThresholds
    from frenetix_tpu.utils.config import FrenetixConfig

    cfg = FrenetixConfig()
    thr = PhantomThresholds.from_config(cfg.occlusion)
    assert thr == PhantomThresholds(harm=0.1, risk=1.0)   # reference default

    cfg.occlusion.metric_thresholds = {"dce": 2.0, "harm": None}
    thr = PhantomThresholds.from_config(cfg.occlusion)
    assert thr.dce == 2.0 and thr.harm is None and thr.risk == 1.0


def test_spawn_locator_flags():
    """occlusion.yaml spawn_locator: per-category enable flags + caps."""
    from frenetix_tpu.io.commonroad import Obstacle, Scenario, State
    from frenetix_tpu.occlusion import OcclusionModule

    truck = Obstacle(
        obstacle_id=9, obstacle_type="truck", role="static", length=9.0,
        width=2.5, initial_state=State(0, np.array([20.0, 3.5]), 0.0, 0.0))
    car = Obstacle(
        obstacle_id=10, obstacle_type="car", role="dynamic", length=4.5,
        width=2.0, initial_state=State(0, np.array([30.0, -3.5]), 0.0, 5.0))
    sc = Scenario("occ", 0.1, {}, {9: truck, 10: car}, {})

    near = lambda sp, p: np.linalg.norm(sp.position - p) < 12.0
    t_pos, c_pos = np.array([20.0, 3.5]), np.array([30.0, -3.5])

    specs = OcclusionModule(sc, spawn_point_behind_static_obstacle=False,
                            max_phantoms=8).find_spawn_points(_Ego(), 0)
    assert specs and all(near(s, c_pos) for s in specs)

    specs = OcclusionModule(sc, spawn_point_behind_dynamic_obstacle=False,
                            max_phantoms=8).find_spawn_points(_Ego(), 0)
    assert specs and all(near(s, t_pos) for s in specs)

    specs = OcclusionModule(sc, max_dynamic_spawn_points=1,
                            max_static_spawn_points=1,
                            max_phantoms=8).find_spawn_points(_Ego(), 0)
    assert sum(near(s, c_pos) for s in specs) == 1
    assert sum(near(s, t_pos) for s in specs) == 1


def test_spawn_points_behind_turn():
    """spawn_points_behind_turn: a phantom on the unseen inside of the next
    route turn, offset toward the turn center."""
    from frenetix_tpu.io.commonroad import Scenario
    from frenetix_tpu.occlusion import OcclusionModule

    sc = Scenario("occ", 0.1, {}, {}, {})
    th = np.linspace(0, np.pi / 2, 50)
    arc = np.stack([20.0 * np.sin(th), 20.0 * (1 - np.cos(th))], axis=1)
    mod = OcclusionModule(sc, spawn_points_behind_turn=True, route_xy=arc)
    specs = mod.find_spawn_points(_Ego(), 0)
    assert len(specs) == 1
    center = np.array([0.0, 20.0])
    d_route = np.linalg.norm(arc - specs[0].position[None], axis=1).min()
    # inside the turn: closer to the arc center than the arc radius
    assert np.linalg.norm(specs[0].position - center) < 20.0 - 2.0
    assert d_route < 5.0

    # flag off (default): no spawn points on an empty scenario
    assert OcclusionModule(sc, route_xy=arc).find_spawn_points(_Ego(), 0) == []


def test_threshold_typos_raise():
    from frenetix_tpu.occlusion import PhantomThresholds
    from frenetix_tpu.utils.config import FrenetixConfig

    cfg = FrenetixConfig()
    cfg.occlusion.metric_thresholds = {"dcee": 2.0}
    try:
        PhantomThresholds.from_config(cfg.occlusion)
        assert False, "typo'd threshold key must raise"
    except ValueError as e:
        assert "dcee" in str(e)


# ------------------------------------------------ external soft-cost terms


def test_external_occlusion_costs_geometry():
    """cost.yaml external_cost_weights: hand geometry for each term."""
    import jax.numpy as jnp

    from frenetix_tpu.occlusion import external_occlusion_costs

    n = 10
    t = np.arange(n + 1)

    class RO:
        # candidate 0 stays within 8 m of the ego; candidate 1 runs to 20 m
        x = jnp.asarray(np.stack([0.8 * t, 2.0 * t]))
        y = jnp.zeros((2, n + 1))

    ego = jnp.zeros(2)
    r_vis = jnp.full(720, 10.0)          # visible out to 10 m on every ray

    # occ_um: only candidate 1 enters unobserved space (beyond 10 m)
    c = np.asarray(external_occlusion_costs(
        RO(), w_um=1.0, ego=ego, r_vis=r_vis))
    assert c[0] == 0.0 and c[1] > 0.0
    # mean depth of candidate 1: max(2t - 10, 0) averaged over t=1..10
    exp = np.maximum(2.0 * np.arange(1, 11) - 10.0, 0.0).mean()
    assert abs(c[1] - exp) < 1e-5

    # occ_ve: candidate 0 passes the occluder point (4, 0) closely
    pts = np.array([[4.0, 0.0], [0.0, 0.0]])
    valid = np.array([True, False])      # padded row must not contribute
    c = np.asarray(external_occlusion_costs(
        RO(), w_ve=1.0, ego=ego, occluder_pts=jnp.asarray(pts),
        occluder_valid=jnp.asarray(valid)))
    assert c[0] > c[1] > 0.0

    # occ_pm: phantom risk sum
    class Risks:
        obst_risk_per_obst = jnp.asarray([[0.5, 0.3], [0.5, 0.1]])

    c = np.asarray(external_occlusion_costs(
        RO(), w_pm=2.0, risks=Risks(), phantom_mask=np.array([False, True])))
    assert np.allclose(c, [0.6, 0.2])


@pytest.mark.slow
def test_external_costs_e2e_and_batched_parity():
    """occ_um/occ_ve wired end-to-end through the host planner (blind-spot
    scenario still completes); the batched path applies the same soft costs
    in-batch (geometry gathered by the pre-pass) and reproduces the
    sequential run exactly."""
    from frenetix_tpu.io.commonroad import Obstacle, State
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    def scenario():
        sc = make_highway(ego_v=13.0, lead_v=13.0, lead_gap=120.0, n_steps=150)
        sc.obstacles[200] = Obstacle(
            obstacle_id=200, obstacle_type="truck", role="static", length=9.0,
            width=2.5,
            initial_state=State(0, np.array([60.0, 2.6]), 0.0, 0.0),
        )
        return sc

    def config(batched):
        cfg = load_config()
        cfg.dtype = "float64"
        cfg.occlusion.use_occlusion_module = True
        cfg.external_cost_weights["occ_um"] = 2.0
        cfg.external_cost_weights["occ_ve"] = 0.5
        cfg.simulation.batched_device_agents = batched
        return cfg

    res = Simulation(scenario(), config(False)).run()
    assert list(res.agent_status.values())[0].name == "COMPLETED_SUCCESS"

    res_b = Simulation(scenario(), config(True)).run()
    assert list(res_b.agent_status.values())[0].name == "COMPLETED_SUCCESS"
    assert res_b.steps == res.steps
    h, hb = res.histories[60000], res_b.histories[60000]
    for i in range(len(h)):
        np.testing.assert_allclose(hb[i].position, h[i].position, atol=1e-9,
                                   err_msg=f"step {i}")


def test_external_cost_config_guards(tmp_path):
    """Fix pack: cost.yaml external_cost_weights load; typo'd dict keys raise
    in strict mode; nonzero weights without the module raise; occ_um without
    ego raises."""
    import jax.numpy as jnp

    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.occlusion import external_occlusion_costs
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config, parse_cli_overrides

    # cost.yaml round trip incl. external_cost_weights
    (tmp_path / "cost.yaml").write_text(
        "cost_weights:\n  prediction: 0.7\n"
        "external_cost_weights:\n  occ_pm: 1.5\n")
    cfg = load_config(str(tmp_path))
    assert cfg.cost_weights["prediction"] == 0.7
    assert cfg.external_cost_weights["occ_pm"] == 1.5

    # strict override typo in a fixed-schema dict raises
    for bad in ("external_cost_weights.occ_pmm=1.0",
                "cost_weights.predction=1.0",
                "evaluation.criticality_metrics.ttcc=false"):
        try:
            load_config(overrides=parse_cli_overrides([bad]),
                        strict_overrides=True)
            assert False, bad
        except ValueError:
            pass

    # nonzero weight without the occlusion module fails loudly
    cfg2 = load_config()
    cfg2.external_cost_weights["occ_um"] = 1.0
    try:
        Simulation(make_highway(), cfg2)
        assert False, "external weights without the module must raise"
    except ValueError as e:
        assert "use_occlusion_module" in str(e)

    # occ_um without an ego position is an error, not a NameError
    class RO:
        x = jnp.zeros((2, 5))
        y = jnp.zeros((2, 5))

    try:
        external_occlusion_costs(RO(), w_um=1.0, r_vis=jnp.full(720, 10.0))
        assert False
    except ValueError as e:
        assert "ego" in str(e)


def test_polar_map_excludes_agents_and_caches():
    """polar_map skips agent-converted obstacles (stale trajectories), takes
    live poses as extra occluders, and caches per time_step."""
    import numpy as np

    from frenetix_tpu.io.commonroad import Obstacle, Scenario, State
    from frenetix_tpu.occlusion import OcclusionModule

    car = Obstacle(
        obstacle_id=7, obstacle_type="car", role="dynamic", length=4.5,
        width=2.0, initial_state=State(0, np.array([15.0, 0.0]), 0.0, 5.0))
    sc = Scenario("occ", 0.1, {}, {7: car}, {})

    class Ego:
        position = np.array([0.0, 0.0])

    mod = OcclusionModule(sc, sensor_radius=50.0)
    r_blocked, _ = mod.polar_map(Ego(), 0)
    k0 = len(r_blocked) // 2  # phi = 0 ray (straight +x)
    assert r_blocked[k0] < 14.0          # the car's OBB clips the ray

    mod2 = OcclusionModule(sc, sensor_radius=50.0)
    mod2.occluder_exclude = {7}          # 7 became an agent → stale pose out
    r_free, _ = mod2.polar_map(Ego(), 0)
    assert r_free[k0] == 50.0
    mod2.extra_occluders = [(np.array([15.0, 0.0]), 0.0, 4.5, 2.0)]
    r_live, _ = mod2.polar_map(Ego(), 0)   # cached → extras ignored this step
    assert r_live[k0] == 50.0
    r_live, _ = mod2.polar_map(Ego(), 1)   # new step → live pose occludes
    assert r_live[k0] < 14.0
