"""Device-resident simulation (parallel/device_sim): parity vs the host loop.

The entire multi-agent simulation runs as one lax.scan with a single
device→host fetch; these tests pin its semantics step-by-step against the
host Simulation (sequential and batched paths).
"""
import numpy as np
import pytest


def _cfg(**kw):
    from frenetix_tpu.utils.config import load_config

    cfg = load_config()
    cfg.dtype = "float64"
    for k, v in kw.items():
        obj = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return cfg


def _run_device(scenario, cfg):
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation

    return DeviceSimulation(Simulation(scenario, cfg)).run()


def test_device_sim_single_agent_matches_host_exactly():
    """Highway lead-follow: the device scan must reproduce the host loop's
    executed trajectory step by step (same plans → same states), including
    the first cycle's stopping-mode fallback (the factory ego starts just
    before the drivable corridor)."""
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    res_d = _run_device(make_highway(), _cfg())
    res_h = Simulation(make_highway(), _cfg()).run()

    assert res_h.agent_status[60000] == AgentStatus.COMPLETED_SUCCESS
    assert int(res_d.status[0]) == int(AgentStatus.COMPLETED_SUCCESS)
    assert res_d.steps == res_h.steps
    # the device sim went through the same fallback on cycle 0
    assert not res_d.found[0, 0] and res_d.found[1, 0]

    h = res_h.histories[60000]          # h[i] = state after executed step i
    for i in range(1, len(h)):
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, :2], h[i].position, atol=1e-9,
            err_msg=f"step {i}")
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, 3], h[i].velocity, atol=1e-9)


@pytest.mark.slow
def test_device_sim_multiagent_matches_host_batched():
    """Two-agent overtake (obstacle converted to an agent): statuses and
    per-step executed positions must match the batched host path."""
    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    from frenetix_tpu.parallel.device_sim import DeviceSimulation

    cfg = _cfg(**{"simulation.start_multiagent": True})
    ds = DeviceSimulation(Simulation(make_overtake(), cfg))
    res_d = ds.run()

    cfg_h = _cfg(**{"simulation.start_multiagent": True,
                    "simulation.batched_device_agents": True})
    sim_h = Simulation(make_overtake(), cfg_h)
    res_h = sim_h.run()

    assert res_d.steps == res_h.steps
    for col, aid in enumerate(res_d.agent_ids):
        assert res_h.agent_status[aid] == AgentStatus.COMPLETED_SUCCESS
        assert int(res_d.status[col]) == int(AgentStatus.COMPLETED_SUCCESS)
        h = res_h.histories[aid]
        for i in range(1, len(h)):
            np.testing.assert_allclose(
                res_d.trajectories[i - 1, col, :2], h[i].position, atol=1e-9,
                err_msg=f"agent {aid} step {i}")

    # the SimulationResult adapter (run_scenario --device-sim) must mirror
    # the host recording convention: same statuses, same history lengths,
    # same recorded positions
    adapted = ds.to_simulation_result(res_d)
    assert adapted.success
    for aid in res_d.agent_ids:
        ha, hh = adapted.histories[aid], res_h.histories[aid]
        assert len(ha) == len(hh), aid
        np.testing.assert_allclose(ha[-1].position, hh[-1].position, atol=1e-9)
        np.testing.assert_allclose(ha[3].velocity, hh[3].velocity, atol=1e-9)


def test_device_sim_guards():
    """Unsupported host-only features must fail loudly at construction."""
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation

    for kv in [
        {"prediction.mode": "bogus"},
        {"planning.emergency_mode": "bogus"},
    ]:
        cfg = _cfg(**kv)
        sim = Simulation(make_highway(), cfg)
        with pytest.raises(ValueError):
            DeviceSimulation(sim)


@pytest.mark.slow
def test_device_sim_min_risk_emergency_matches_host():
    """emergency_mode='min_risk' on device: when no candidate is selectable
    the fallback picks the feasible candidate with minimal ego+obstacle risk
    (host: ReactivePlanner min-risk fallback via _risk_totals).  The factory
    highway ego starts off-corridor, so cycle 0 exercises the fallback."""
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    cfg = _cfg(**{"planning.emergency_mode": "min_risk"})
    res_d = _run_device(make_highway(), cfg)
    res_h = Simulation(make_highway(),
                       _cfg(**{"planning.emergency_mode": "min_risk"})).run()

    assert res_h.agent_status[60000] == AgentStatus.COMPLETED_SUCCESS
    assert int(res_d.status[0]) == int(AgentStatus.COMPLETED_SUCCESS)
    assert res_d.steps == res_h.steps
    # cycle 0 really went through the fallback
    assert not res_d.found[0, 0] and res_d.found[1, 0]
    h = res_h.histories[60000]
    for i in range(1, len(h)):
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, :2], h[i].position, atol=1e-9,
            err_msg=f"step {i}")
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, 3], h[i].velocity, atol=1e-9)


@pytest.mark.slow
def test_device_sim_sharded_matches_vmap():
    """The mesh-sharded device sim (cycle stage shard_mapped over agents,
    selection dict all-gathered) must reproduce the single-device scan:
    identical selections, trajectories to float reassociation noise."""
    import jax

    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.parallel.mesh import make_agent_mesh
    from frenetix_tpu.sim import Simulation

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    cfg = _cfg(**{"simulation.start_multiagent": True})
    r_v = DeviceSimulation(Simulation(make_overtake(), cfg)).run()
    mesh = make_agent_mesh(jax.devices()[:2])
    r_s = DeviceSimulation(Simulation(make_overtake(), cfg), mesh=mesh).run()

    np.testing.assert_array_equal(r_v.status, r_s.status)
    assert r_v.steps == r_s.steps
    # selections agreed BITWISE before round 5; the peer plan bank now
    # feeds the all-gathered selected trajectories back into the next
    # cycle's predictions, so the mesh's reassociation noise (~1e-20 on
    # f64) propagates into the sampling matrix's d-grid values — same
    # candidates, sub-ulp parameter noise
    np.testing.assert_allclose(r_v.selections, r_s.selections,
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(r_v.trajectories, r_s.trajectories, atol=1e-9)

    with pytest.raises(ValueError):
        DeviceSimulation(Simulation(make_overtake(), cfg),
                         mesh=make_agent_mesh(jax.devices()[:3]))


@pytest.mark.slow
def test_device_sim_tjunction_six_agents():
    """The real reference scenario (T-junction, 6 agents): statuses, step
    count and every agent's executed trajectory must match the batched host
    loop — including the agent that brakes below the low-velocity threshold
    (the device sim evaluates both kinematics modes and selects per
    agent)."""
    import os

    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    path = "/root/reference/example_scenarios/ZAM_Tjunction-1_23_T-1.xml"
    if not os.path.isfile(path):
        pytest.skip("reference scenarios not present")

    cfg = _cfg(**{"simulation.start_multiagent": True})
    res_d = DeviceSimulation(Simulation(load_scenario(path), cfg)).run()

    cfg_h = _cfg(**{"simulation.start_multiagent": True,
                    "simulation.batched_device_agents": True})
    res_h = Simulation(load_scenario(path), cfg_h).run()

    assert res_d.steps == res_h.steps
    low_thr = cfg.planning.low_vel_mode_threshold
    saw_low_vel = False
    for col, aid in enumerate(res_d.agent_ids):
        assert res_h.agent_status[aid] == AgentStatus.COMPLETED_SUCCESS
        assert int(res_d.status[col]) == int(AgentStatus.COMPLETED_SUCCESS)
        h = res_h.histories[aid]
        saw_low_vel |= min(s.velocity for s in h) < low_thr
        for i in range(1, len(h)):
            np.testing.assert_allclose(
                res_d.trajectories[i - 1, col, :2], h[i].position, atol=1e-9,
                err_msg=f"agent {aid} step {i}")
    assert saw_low_vel, "scenario no longer exercises the low-vel branch"


@pytest.mark.slow
def test_device_fleet_matches_solo():
    """run_fleet: S scenarios as one vmapped scan + one fetch must reproduce
    each solo device run exactly (statuses, steps, trajectories) despite the
    padding to fleet maxima (different agent counts, path lengths, horizons,
    goal geometry)."""
    from frenetix_tpu.io.scenario_factory import (
        make_curve, make_highway, make_overtake,
    )
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.sim import Simulation

    def mk():
        return [
            DeviceSimulation(Simulation(make_highway(), _cfg())),
            DeviceSimulation(Simulation(
                make_overtake(), _cfg(**{"simulation.start_multiagent": True}))),
            DeviceSimulation(Simulation(make_curve(), _cfg())),
        ]

    fleet = run_fleet(mk())
    solo = [s.run() for s in mk()]
    for r, s in zip(fleet, solo):
        np.testing.assert_array_equal(r.status, s.status)
        assert r.steps == s.steps
        np.testing.assert_allclose(r.trajectories, s.trajectories, atol=1e-9)
        assert r.extras["fleet_size"] == 3

    # mismatched planning statics must fail loudly
    bad = DeviceSimulation(Simulation(
        make_highway(), _cfg(**{"planning.replanning_frequency": 2})))
    with pytest.raises(ValueError):
        run_fleet([DeviceSimulation(Simulation(make_highway(), _cfg())), bad])


@pytest.mark.slow
def test_device_fleet_five_reference_scenarios_match_goldens():
    """The five reference T-junction scenarios as ONE device fleet call:
    step counts, statuses and final positions must match the golden
    host-loop pins (the per-step parity is covered scenario-by-scenario in
    the tests above; the device sensor filter closes the last gap)."""
    import json
    import os

    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.sim import Simulation

    sdir = "/root/reference/example_scenarios"
    if not os.path.isdir(sdir):
        pytest.skip("reference scenarios not present")
    with open(os.path.join(os.path.dirname(__file__),
                           "golden_scenarios.json")) as f:
        golden = json.load(f)

    names = ["23", "24", "27", "36", "42"]
    sims = [DeviceSimulation(Simulation(
        load_scenario(f"{sdir}/ZAM_Tjunction-1_{n}_T-1.xml"), _cfg()))
        for n in names]
    results = run_fleet(sims)
    for n, r in zip(names, results):
        assert int(r.status[0]) == 2, (n, r.status)           # SUCCESS
        assert r.steps == golden[n]["steps"], n
        np.testing.assert_allclose(
            r.trajectories[r.steps - 1, 0, :2], golden[n]["final_position"],
            atol=0.05, err_msg=n)


def test_device_sim_walenet_matches_host():
    """Neural (Wale-Net) predictions in the device sim run in HYBRID
    prediction mode (round 5): the net consumes executed agent histories —
    the reference's update_scenario semantics make even single-agent runs
    live-state-dependent (the ego dummy is a neighbor of every obstacle's
    net input), so the host's own _agent_predictions builds each cycle's
    tensors from synced mirrors.  Host and device must agree bit-exactly.

    History: rounds 2-4 pinned a COLLISION here; it was an artifact of
    ego-less neighbor grids (the net never saw the ego).  With the
    reference-faithful WorldView preprocessing the planner clears the
    scenario (ROUND5.md)."""
    import os

    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    path = "/root/reference/example_scenarios/ZAM_Tjunction-1_36_T-1.xml"
    if not os.path.isfile(path):
        pytest.skip("reference scenarios not present")

    cfg = _cfg(**{"prediction.mode": "walenet"})
    res_d = DeviceSimulation(Simulation(load_scenario(path), cfg)).run()
    res_h = Simulation(load_scenario(path),
                       _cfg(**{"prediction.mode": "walenet"})).run()

    assert res_h.agent_status[60000] == AgentStatus.COMPLETED_SUCCESS
    assert int(res_d.status[0]) == int(res_h.agent_status[60000])
    assert res_d.steps == res_h.steps
    h = res_h.histories[60000]
    for i in range(1, len(h)):
        np.testing.assert_allclose(res_d.trajectories[i - 1, 0, :2],
                                   h[i].position, atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1])
def test_device_sim_fuzz_never_crashes(seed):
    """Randomized factory scenarios through the device scan: outcomes may be
    TIMELIMIT/ERROR, but the run must complete and return sane shapes (the
    containment contract, SURVEY §5.3)."""
    from frenetix_tpu.io import scenario_factory as fac
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation

    rng = np.random.default_rng(seed)
    if seed % 2 == 0:
        sc = fac.make_highway(ego_v=float(rng.uniform(5, 20)),
                              lead_v=float(rng.uniform(3, 15)),
                              lead_gap=float(rng.uniform(20, 120)),
                              n_steps=80)
    else:
        sc = fac.make_overtake(ego_v=float(rng.uniform(8, 16)),
                               lead_v=float(rng.uniform(2, 7)), n_steps=120)
    cfg = _cfg(**{"simulation.start_multiagent": bool(seed % 2)})
    res = DeviceSimulation(Simulation(sc, cfg)).run()
    a_n = len(res.agent_ids)
    assert res.trajectories.shape[1:] == (a_n, 5)
    assert np.isfinite(res.trajectories[: res.steps]).all()
    assert set(int(s) for s in res.status) <= {2, 3, 4, 5}


@pytest.mark.slow
def test_device_fleet_sharded_over_mesh():
    """run_fleet(mesh=...): scenarios shard over the device mesh with no
    collectives (independent sims); results must match the vmap fleet."""
    import jax

    from frenetix_tpu.io.scenario_factory import make_highway, make_overtake
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.parallel.mesh import make_agent_mesh
    from frenetix_tpu.sim import Simulation

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")

    def sims():
        return [
            DeviceSimulation(Simulation(make_highway(), _cfg())),
            DeviceSimulation(Simulation(
                make_overtake(), _cfg(**{"simulation.start_multiagent": True}))),
        ]

    f_v = run_fleet(sims())
    mesh = make_agent_mesh(jax.devices()[:2], axis_name="scenarios")
    f_s = run_fleet(sims(), mesh=mesh)
    for a, b in zip(f_v, f_s):
        np.testing.assert_array_equal(a.status, b.status)
        assert a.steps == b.steps
        np.testing.assert_allclose(a.trajectories, b.trajectories, atol=1e-9)

    with pytest.raises(ValueError):
        run_fleet(sims(), mesh=make_agent_mesh(jax.devices()[:3],
                                               axis_name="scenarios"))


@pytest.mark.slow
def test_device_sim_convoy_eight_agents():
    """Eight-agent single-lane platoon (make_convoy): all agents reach their
    goals through the device scan, matching the batched host path step count
    and trajectories."""
    from frenetix_tpu.io.scenario_factory import make_convoy
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    cfg = _cfg(**{"simulation.start_multiagent": True})
    res_d = DeviceSimulation(Simulation(make_convoy(), cfg)).run()

    cfg_h = _cfg(**{"simulation.start_multiagent": True,
                    "simulation.batched_device_agents": True})
    res_h = Simulation(make_convoy(), cfg_h).run()

    assert len(res_d.agent_ids) == 8
    assert res_d.steps == res_h.steps
    for col, aid in enumerate(res_d.agent_ids):
        assert res_h.agent_status[aid] == AgentStatus.COMPLETED_SUCCESS
        assert int(res_d.status[col]) == int(AgentStatus.COMPLETED_SUCCESS)
        h = res_h.histories[aid]
        for i in range(1, len(h)):
            np.testing.assert_allclose(
                res_d.trajectories[i - 1, col, :2], h[i].position, atol=1e-9,
                err_msg=f"agent {aid} step {i}")


@pytest.mark.slow
def test_device_sim_progressive_densification():
    """sampling_max > sampling_min + 1: every level evaluates on device and
    the first level that finds a candidate wins (host structure).  The
    default single-level path must stay bit-identical; the multi-level run
    must reach the same outcome with the same step count.  (Exact per-step
    parity through EMERGENCY cycles is not pinned: the fallback selects
    among decel-to-zero rows that sit ON the feasibility boundary, where
    program-fusion float noise legitimately flips classification — see the
    module docstring's knife-edge caveat.)"""
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    cfg = _cfg(**{"planning.sampling_max": 4})
    res_d = DeviceSimulation(Simulation(make_highway(), cfg)).run()
    res_h = Simulation(make_highway(),
                       _cfg(**{"planning.sampling_max": 4})).run()

    assert res_h.agent_status[60000] == AgentStatus.COMPLETED_SUCCESS
    assert int(res_d.status[0]) == int(AgentStatus.COMPLETED_SUCCESS)
    assert res_d.steps == res_h.steps
    h = res_h.histories[60000]
    np.testing.assert_allclose(res_d.trajectories[len(h) - 2, 0, :2],
                               h[-1].position, atol=0.5)
    # the emergency cycle exercised the multi-level merge (nothing found at
    # either level on cycle 0 — the factory ego starts off-corridor)
    assert not res_d.found[0, 0]


@pytest.mark.slow
def test_device_sim_responsibility_matches_host():
    """Responsibility weight ≠ 0 (single agent): reach-set grids built ON
    DEVICE inside the scan + the term/re-selection must reproduce the
    sequential host loop (host builder + ReactivePlanner._apply_responsibility)
    step by step on the T-junction scenario."""
    from frenetix_tpu.io.commonroad import load_scenario
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    xml = "/root/reference/example_scenarios/ZAM_Tjunction-1_23_T-1.xml"
    cfg = _cfg()
    cfg.cost_weights["responsibility"] = 0.2

    sim_h = Simulation(load_scenario(xml), cfg)
    res_h = sim_h.run()
    assert res_h.success
    aid = sim_h.agents[0].id
    assert sim_h.agents[0].planner.reach_grid is not None
    # the host grids are non-trivial (otherwise the parity below is vacuous)
    assert np.asarray(sim_h.agents[0].planner.reach_grid.occupancy).any()

    ds = DeviceSimulation(Simulation(load_scenario(xml), cfg))
    assert ds.lane_tensors is not None
    res_d = ds.run()

    assert int(res_d.status[0]) == int(AgentStatus.COMPLETED_SUCCESS)
    assert res_d.steps == res_h.steps
    h = res_h.histories[aid]
    for i in range(1, len(h)):
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, :2], h[i].position, atol=1e-9,
            err_msg=f"step {i}")
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, 3], h[i].velocity, atol=1e-9)


@pytest.mark.slow
def test_device_sim_responsibility_multiagent_matches_host_batched():
    """MULTI-agent responsibility on device (VERDICT r2 item 2): peer-agent
    reach grids are sim-state dependent, so the device scan builds them live
    (build_reach_set_grids_device).  Statuses, steps and executed
    trajectories must match the batched host path, which builds the same
    grids per agent on host (simulation.py reach-grid stacking)."""
    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    xml = "/root/reference/example_scenarios/ZAM_Tjunction-1_23_T-1.xml"
    cfg = _cfg(**{"simulation.start_multiagent": True})
    cfg.cost_weights["responsibility"] = 0.2
    res_d = DeviceSimulation(Simulation(load_scenario(xml), cfg)).run()

    cfg_h = _cfg(**{"simulation.start_multiagent": True,
                    "simulation.batched_device_agents": True})
    cfg_h.cost_weights["responsibility"] = 0.2
    res_h = Simulation(load_scenario(xml), cfg_h).run()

    assert res_d.steps == res_h.steps
    for col, aid in enumerate(res_d.agent_ids):
        assert int(res_d.status[col]) == int(res_h.agent_status[aid])
        h = res_h.histories[aid]
        for i in range(1, len(h)):
            np.testing.assert_allclose(
                res_d.trajectories[i - 1, col, :2], h[i].position, atol=1e-9,
                err_msg=f"agent {aid} step {i}")


@pytest.mark.slow
def _blind_spot_scenario():
    """make_highway + a parked truck shadowing the shoulder (the occlusion
    e2e scenario from tests/test_occlusion.py)."""
    from frenetix_tpu.io.commonroad import Obstacle, State
    from frenetix_tpu.io.scenario_factory import make_highway

    sc = make_highway(ego_v=13.0, lead_v=13.0, lead_gap=120.0, n_steps=150)
    sc.obstacles[200] = Obstacle(
        obstacle_id=200, obstacle_type="truck", role="static", length=9.0,
        width=2.5, initial_state=State(0, np.array([60.0, 2.6]), 0.0, 0.0),
    )
    return sc


def test_device_phantom_spawner_matches_host_module():
    """The device spawn locator + phantom rows (DeviceSimulation._phantom_fn)
    must reproduce OcclusionModule.find_spawn_points +
    phantom_prediction_rows exactly: same admitted spawn positions in the
    same rank order, same CV means/covariances."""
    import jax

    from frenetix_tpu.occlusion import OcclusionModule
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation

    sc = _blind_spot_scenario()
    cfg = _cfg(**{"occlusion.use_occlusion_module": True,
                  "occlusion.harm_threshold": 0.02})
    ds = DeviceSimulation(Simulation(sc, cfg))
    agent = ds.agents[0]
    assert agent.occlusion is not None

    ego = np.array([40.0, 0.3])
    host_specs = agent.occlusion.find_spawn_points(
        type("S", (), {"position": ego})(), 0)
    assert host_specs, "scenario must produce spawn points"
    horizon = int(ds.pred_windows["means"].shape[2])
    rows = agent.occlusion.phantom_prediction_rows(
        host_specs, horizon, ds.dt, np.float64)

    fn = ds._phantom_fn(horizon)
    g = ds.tensors

    def call(g, e, nf):
        return fn(g, 0, e, nf, g.turn_xy[0], g.turn_spawn[0],
                  g.turn_heading[0], g.turn_hot[0])

    ph, admitted, spawn_pos = jax.jit(call)(
        g, ds.jnp.asarray(ego), ds.jnp.asarray(8))
    admitted = np.asarray(admitted)
    assert admitted.sum() == len(host_specs)
    # spawn positions (occ_ve silhouette points) match the host specs
    np.testing.assert_allclose(
        np.asarray(spawn_pos)[admitted],
        np.stack([s.position for s in host_specs]), rtol=0, atol=1e-12)
    got_means = np.asarray(ph.means)[admitted]
    # XLA's sin/cos/atan2 differ from numpy's libm in the last ulp, so the
    # heading→CV-row round trip is near-exact, not bitwise (the only
    # tolerance in this differential; everything trig-free is exact)
    np.testing.assert_allclose(got_means, rows["means"][: admitted.sum()],
                               rtol=0, atol=1e-12)
    # LAPACK's getri is itself up to 1 ulp from the exact 1/var diagonal
    np.testing.assert_allclose(
        np.asarray(ph.inv_covs)[admitted], rows["inv_covs"][: admitted.sum()],
        rtol=1e-15)
    np.testing.assert_allclose(
        np.asarray(ph.orientations)[admitted],
        rows["orientations"][: admitted.sum()], rtol=0, atol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(ph.lengths)[admitted], rows["lengths"][: admitted.sum()])
    np.testing.assert_array_equal(
        np.asarray(ph.widths)[admitted], rows["widths"][: admitted.sum()])
    # free-slot cap: zero free slots → no phantoms (host augment semantics)
    _, adm0, _ = jax.jit(call)(g, ds.jnp.asarray(ego), ds.jnp.asarray(0))
    assert not np.asarray(adm0).any()


@pytest.mark.slow
def test_device_sim_occlusion_matches_host():
    """Occlusion module ON in the device scan (VERDICT r2 item 2): phantom
    spawner + safety gate on device must reproduce the sequential host loop
    step-exactly on the blind-spot scenario, including the slowdown the
    phantoms force."""
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    kw = {"occlusion.use_occlusion_module": True,
          "occlusion.harm_threshold": 0.02}
    res_d = _run_device(_blind_spot_scenario(), _cfg(**kw))
    res_h = Simulation(_blind_spot_scenario(), _cfg(**kw)).run()

    assert res_h.agent_status[60000] == AgentStatus.COMPLETED_SUCCESS
    assert int(res_d.status[0]) == int(AgentStatus.COMPLETED_SUCCESS)
    assert res_d.steps == res_h.steps
    h = res_h.histories[60000]
    for i in range(1, len(h)):
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, :2], h[i].position, atol=1e-9,
            err_msg=f"step {i}")
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, 3], h[i].velocity, atol=1e-9)
    # the gate actually bit: the pass is markedly slower than un-gated
    v_pass = [s.velocity for s in h if 45 < s.position[0] < 65]
    assert np.mean(v_pass) < 10.0


def test_polar_visibility_batch_matches_numpy():
    """The jnp polar-map twin (sim.visible_area.polar_visibility_batch, the
    occ_um input inside the device scan) must reproduce the host
    polar_visibility ray-cast on a random masked segment set."""
    import jax
    import jax.numpy as jnp

    from frenetix_tpu.sim.visible_area import (
        polar_visibility, polar_visibility_batch)

    rng = np.random.default_rng(7)
    segs = rng.uniform(-40.0, 40.0, size=(37, 2, 2))
    valid = rng.random(37) > 0.3
    ego = np.array([1.5, -2.0])
    _, r_host = polar_visibility(ego, segs[valid], radius=50.0, n_rays=720)
    r_dev = jax.jit(polar_visibility_batch, static_argnums=(4, 5))(
        jnp.asarray(ego), jnp.asarray(segs[:, 0]), jnp.asarray(segs[:, 1]),
        jnp.asarray(valid), 50.0, 720)
    # identical math in float64; only linspace/trig last-ulp noise remains
    np.testing.assert_allclose(np.asarray(r_dev), r_host, rtol=1e-9)


@pytest.mark.slow
def test_device_sim_occ_um_ve_matches_host():
    """occ_um/occ_ve external soft costs ON DEVICE (VERDICT r2 item 2 tail):
    the polar visibility map and phantom silhouette points are built inside
    the scan; the run must reproduce the sequential host loop (which gathers
    the same inputs via OcclusionModule.polar_map/occluder_points) step-
    exactly on the blind-spot scenario."""
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    kw = {"occlusion.use_occlusion_module": True,
          "occlusion.harm_threshold": 0.02}

    def cfg():
        c = _cfg(**kw)
        c.external_cost_weights["occ_um"] = 2.0
        c.external_cost_weights["occ_ve"] = 0.5
        return c

    res_d = _run_device(_blind_spot_scenario(), cfg())
    res_h = Simulation(_blind_spot_scenario(), cfg()).run()

    assert res_h.agent_status[60000] == AgentStatus.COMPLETED_SUCCESS
    assert int(res_d.status[0]) == int(AgentStatus.COMPLETED_SUCCESS)
    assert res_d.steps == res_h.steps
    h = res_h.histories[60000]
    for i in range(1, len(h)):
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, :2], h[i].position, atol=1e-9,
            err_msg=f"step {i}")
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, 3], h[i].velocity, atol=1e-9)


@pytest.mark.slow
def test_device_sim_responsibility_mesh_and_fleet():
    """Responsibility composes with the agent mesh (grids built inside the
    shard) and with run_fleet (lanelet tensors pad across members): both
    must match the plain vmap device run exactly."""
    import jax

    from frenetix_tpu.io.scenario_factory import make_highway, make_overtake
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.sim import Simulation

    def mk(scenario_fn, **kw):
        cfg = _cfg(**kw)
        cfg.cost_weights["responsibility"] = 0.2
        return DeviceSimulation(Simulation(scenario_fn(), cfg))

    solo = mk(make_overtake, **{"simulation.start_multiagent": True}).run()

    if len(jax.devices()) >= 2:
        from frenetix_tpu.parallel.mesh import make_agent_mesh

        cfg = _cfg(**{"simulation.start_multiagent": True})
        cfg.cost_weights["responsibility"] = 0.2
        r_mesh = DeviceSimulation(
            Simulation(make_overtake(), cfg),
            mesh=make_agent_mesh(jax.devices()[:2])).run()
        np.testing.assert_array_equal(solo.status, r_mesh.status)
        assert solo.steps == r_mesh.steps
        np.testing.assert_allclose(solo.trajectories, r_mesh.trajectories,
                                   atol=1e-9)

    fleet = run_fleet([
        mk(make_overtake, **{"simulation.start_multiagent": True}),
        mk(make_highway),
    ])
    np.testing.assert_array_equal(fleet[0].status, solo.status)
    assert fleet[0].steps == solo.steps
    np.testing.assert_allclose(fleet[0].trajectories, solo.trajectories,
                               atol=1e-9)
    solo_hw = mk(make_highway).run()
    np.testing.assert_array_equal(fleet[1].status, solo_hw.status)
    assert fleet[1].steps == solo_hw.steps

    # mixed responsibility settings across a fleet must fail loudly
    with pytest.raises(ValueError, match="statics"):
        run_fleet([mk(make_highway),
                   DeviceSimulation(Simulation(make_highway(), _cfg()))])


# ---------------------------------------------------------- behavior hybrid


def _hybrid_parity(maker, a_idx=0, **overrides):
    """Run host loop and device hybrid on the same behavior scenario and pin
    step-exact executed-state parity for agent `a_idx`."""
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation

    def cfg():
        return _cfg(**{"behavior.use_behavior_planner": True, **overrides})

    sim_h = Simulation(maker(), cfg())
    aid = sim_h.agents[a_idx].id
    res_h = sim_h.run()
    res_d = DeviceSimulation(Simulation(maker(), cfg())).run()
    assert res_d.steps == res_h.steps
    assert int(res_d.status[a_idx]) == int(res_h.agent_status[aid])
    h = res_h.histories[aid]
    for i in range(1, len(h)):
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, a_idx, :2], h[i].position, atol=1e-9,
            err_msg=f"step {i}")
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, a_idx, 3], h[i].velocity, atol=1e-9,
            err_msg=f"step {i}")
    return res_d, res_h


def test_device_sim_hybrid_behavior_red_light_matches_host():
    """Traffic-light stop: the behavior FSM arms a stop point, the device
    cycle switches to the host-built quintic stopping matrix
    (wants_stopping_mode), holds through red and proceeds on green — the
    full hybrid loop (host FSM between device cycles) must reproduce the
    host loop step-exactly, stopping mode included."""
    from frenetix_tpu.io.scenario_factory import make_traffic_light
    from frenetix_tpu.sim.agent import AgentStatus

    res_d, _ = _hybrid_parity(make_traffic_light)
    assert int(res_d.status[0]) == int(AgentStatus.COMPLETED_SUCCESS)
    # actually held at the line: several near-zero-velocity steps
    assert (res_d.trajectories[: res_d.steps, 0, 3] < 0.3).sum() >= 5


@pytest.mark.slow
def test_device_sim_hybrid_behavior_lane_change_matches_host():
    """Lane change: the FSM REBUILDS the reference path mid-run; the hybrid
    must restack the agent tables + recompute the curvilinear state on the
    new frame (the batched host path's rebuild) and stay step-exact."""
    from frenetix_tpu.io.scenario_factory import make_lane_change
    from frenetix_tpu.sim.agent import AgentStatus

    res_d, _ = _hybrid_parity(make_lane_change)
    assert int(res_d.status[0]) == int(AgentStatus.COMPLETED_SUCCESS)
    assert res_d.trajectories[res_d.steps - 1, 0, 1] > 3.0  # on the left lane


@pytest.mark.slow
def test_device_sim_hybrid_behavior_multiagent():
    """Behavior planners in a MULTI-agent device sim (beyond the reference,
    which forbids the combination): peers observe each other's executed
    records through the synced WorldView mirrors."""
    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet

    res_d, res_h = _hybrid_parity(
        make_overtake, **{"simulation.start_multiagent": True})
    for i, aid in enumerate(res_d.agent_ids):
        assert int(res_d.status[i]) == int(res_h.agent_status[aid])

    # mixed hybrid/non-hybrid members in one fleet — loud failure
    cfg = _cfg(**{"behavior.use_behavior_planner": True})
    ds = DeviceSimulation(Simulation(make_overtake(), cfg))
    with pytest.raises(ValueError, match="statics"):
        run_fleet([ds, DeviceSimulation(Simulation(make_overtake(), _cfg()))])


@pytest.mark.slow
def test_device_sim_hybrid_behavior_sharded_matches_vmap():
    """Hybrid behavior composes with the agent mesh: the per-cycle device
    step (regular ladder AND the quintic stopping program) runs shard_mapped
    and must reproduce the single-device hybrid exactly."""
    import jax

    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.parallel.mesh import make_agent_mesh
    from frenetix_tpu.sim import Simulation

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    cfg = _cfg(**{"behavior.use_behavior_planner": True,
                  "simulation.start_multiagent": True})
    r_v = DeviceSimulation(Simulation(make_overtake(), cfg)).run()
    r_s = DeviceSimulation(Simulation(make_overtake(), cfg),
                           mesh=make_agent_mesh(jax.devices()[:2])).run()
    np.testing.assert_array_equal(r_v.status, r_s.status)
    assert r_v.steps == r_s.steps
    # selections agreed BITWISE before round 5; the peer plan bank now
    # feeds the all-gathered selected trajectories back into the next
    # cycle's predictions, so the mesh's reassociation noise (~1e-20 on
    # f64) propagates into the sampling matrix's d-grid values — same
    # candidates, sub-ulp parameter noise
    np.testing.assert_allclose(r_v.selections, r_s.selections,
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(r_v.trajectories, r_s.trajectories, atol=1e-9)


@pytest.mark.slow
def test_device_sim_hybrid_fleet_matches_solo():
    """Behavior hybrid composes with the FLEET axis (beyond the reference
    twice over — it forbids behavior outside single-agent runs and has no
    scenario batch at all): S behavior scenarios run as ONE vmapped device
    step per cycle with the S host FSMs interleaved, and every member must
    reproduce its solo hybrid run exactly — heterogeneous agent counts
    (padding), stopping mode (traffic light) and a mid-run reference-path
    swap that restacks + re-pads the whole fleet (lane change) included."""
    from frenetix_tpu.io.scenario_factory import (
        make_lane_change, make_overtake, make_traffic_light)
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.sim import Simulation

    def mk(maker, **kw):
        # pin BOTH arms to the hybrid path: a mixed fleet (lane_change is
        # hybrid-only) downgrades to hybrid as a whole, while a solo
        # traffic light would default to the in-scan FSM — the two paths
        # agree on outcomes but can pick knife-edge-equivalent stopping
        # candidates on stationary cycles (identical executed
        # trajectories, different selection params).  This test pins the
        # hybrid fleet against hybrid solos; in-scan==hybrid is pinned by
        # tests/test_device_fsm.py, mixed-fleet downgrade by the sharded
        # variant below.
        cfg = _cfg(**{"behavior.use_behavior_planner": True,
                      "behavior.device_fsm": "hybrid", **kw})
        return DeviceSimulation(Simulation(maker(), cfg))

    makers = [(make_traffic_light, {}), (make_lane_change, {}),
              (make_overtake, {"simulation.start_multiagent": True})]
    solos = [mk(m, **kw).run() for m, kw in makers]
    fleet = run_fleet([mk(m, **kw) for m, kw in makers])
    for solo, fl in zip(solos, fleet):
        assert solo.steps == fl.steps
        np.testing.assert_array_equal(solo.status, fl.status)
        # the fleet-padded program fuses differently than each solo program
        # (different batch shapes), so float targets may differ in the last
        # ulp — same candidate choices, ulp-level values (the established
        # fleet-parity tolerance)
        np.testing.assert_allclose(solo.selections,
                                   fl.selections[:solo.selections.shape[0]],
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(solo.trajectories[:solo.steps],
                                   fl.trajectories[:fl.steps], atol=1e-9)


@pytest.mark.slow
def test_device_sim_hybrid_fleet_sharded_matches_vmap():
    """The hybrid fleet shards its scenario axis over a mesh with no
    collectives; results must equal the unmeshed hybrid fleet exactly."""
    import jax
    from jax.sharding import Mesh

    from frenetix_tpu.io.scenario_factory import (
        make_lane_change, make_traffic_light)
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.sim import Simulation

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")

    def mk(maker):
        cfg = _cfg(**{"behavior.use_behavior_planner": True})
        return DeviceSimulation(Simulation(maker(), cfg))

    makers = [make_traffic_light, make_lane_change]
    plain = run_fleet([mk(m) for m in makers])
    mesh = Mesh(np.array(jax.devices()[:2]), ("scenarios",))
    sharded = run_fleet([mk(m) for m in makers], mesh=mesh)
    for a, b in zip(plain, sharded):
        assert a.steps == b.steps
        np.testing.assert_array_equal(a.status, b.status)
        np.testing.assert_array_equal(a.selections, b.selections)
        np.testing.assert_allclose(a.trajectories, b.trajectories, atol=0)


@pytest.mark.slow
def test_device_sim_hybrid_behavior_reference_scenario():
    """Behavior planner + hybrid device sim on a REAL reference map
    (T-junction scenario 23): the full FSM stack (static route, velocity
    planner, stop points) drives the device cycles and must reproduce the
    host loop step-exactly."""
    import os

    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    path = os.path.join("/root/reference/example_scenarios",
                        "ZAM_Tjunction-1_23_T-1.xml")
    if not os.path.exists(path):
        pytest.skip("reference scenarios not available")

    def cfg():
        return _cfg(**{"behavior.use_behavior_planner": True})

    sim_h = Simulation(load_scenario(path), cfg())
    aid = sim_h.agents[0].id
    res_h = sim_h.run()
    res_d = DeviceSimulation(Simulation(load_scenario(path), cfg())).run()
    assert res_h.agent_status[aid] == AgentStatus.COMPLETED_SUCCESS
    assert int(res_d.status[0]) == int(AgentStatus.COMPLETED_SUCCESS)
    assert res_d.steps == res_h.steps
    h = res_h.histories[aid]
    for i in range(1, len(h)):
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, :2], h[i].position, atol=1e-9,
            err_msg=f"step {i}")
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, 3], h[i].velocity, atol=1e-9)


@pytest.mark.slow
def test_device_sim_collision_sweep_matches_host_order():
    """A mutually colliding agent pair (overtake, gap 58 in float64 class —
    the planner genuinely collides the rear agent into the lead here): the
    host's in-order sweep marks ONLY the first agent; the partner keeps
    driving to its goal.  The device scan reproduces that order dependence
    (sequential fori_loop sweep), the partner's post-collision trajectory
    included."""
    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    cfg = _cfg(**{"simulation.start_multiagent": True})
    sim_h = Simulation(make_overtake(lead_gap=58.0), cfg)
    res_h = sim_h.run()
    res_d = DeviceSimulation(
        Simulation(make_overtake(lead_gap=58.0), cfg)).run()

    statuses_h = [int(res_h.agent_status[aid]) for aid in res_d.agent_ids]
    assert statuses_h == [int(s) for s in res_d.status]
    # the scenario must actually exercise the sweep: one collision, one not
    if int(AgentStatus.COLLISION) in statuses_h:
        assert statuses_h.count(int(AgentStatus.COLLISION)) == 1
    assert res_d.steps == res_h.steps
    for col, aid in enumerate(res_d.agent_ids):
        h = res_h.histories[aid]
        for i in range(1, len(h)):
            np.testing.assert_allclose(
                res_d.trajectories[i - 1, col, :2], h[i].position,
                atol=1e-9, err_msg=f"agent {aid} step {i}")


def _occluded_pair_scenario():
    """Overtake scenario + a parked truck on the left lane with a parked car
    directly behind it: the car is radius-visible but occlusion-dropped while
    the ego approaches, then becomes visible as the sight line clears."""
    from frenetix_tpu.io.commonroad import Obstacle, State

    from frenetix_tpu.io.scenario_factory import make_overtake

    sc = make_overtake()
    sc.obstacles[200] = Obstacle(
        obstacle_id=200, obstacle_type="truck", role="static", length=9.0,
        width=2.5, initial_state=State(0, np.array([120.0, 3.6]), 0.0, 0.0),
    )
    sc.obstacles[201] = Obstacle(
        obstacle_id=201, obstacle_type="car", role="static", length=4.5,
        width=2.0, initial_state=State(0, np.array([131.0, 4.2]), 0.0, 0.0),
    )
    return sc


@pytest.mark.slow
def test_device_sim_visible_area_sensor_matches_host():
    """calc_occlusions on device: the visible-area occlusion stage of the
    sensor pipeline (road walls + obstacle shadows + live peers → polar map →
    silhouette membership probe) runs inside the scan and must reproduce the
    host loop step-exactly."""
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus
    from frenetix_tpu.sim.sensor_model import visible_obstacles

    # the scenario genuinely exercises the stage: behind the truck the parked
    # car is radius-visible but occluded; close in, the sight line clears
    sc = _occluded_pair_scenario()

    class _S:
        position = np.array([85.0, 0.0])
        orientation = 0.0

    assert 201 not in visible_obstacles(sc, 60000, _S, 0, sensor_radius=50.0)
    _S.position = np.array([115.0, 0.0])
    assert 201 in visible_obstacles(sc, 60000, _S, 0, sensor_radius=50.0)

    def cfg():
        return _cfg(**{"prediction.use_sensor_model": True,
                       "prediction.calc_occlusions": True})

    sim_h = Simulation(_occluded_pair_scenario(), cfg())
    aid = sim_h.agents[0].id
    res_h = sim_h.run()
    res_d = DeviceSimulation(
        Simulation(_occluded_pair_scenario(), cfg())).run()
    assert res_h.agent_status[aid] == AgentStatus.COMPLETED_SUCCESS
    assert int(res_d.status[0]) == int(AgentStatus.COMPLETED_SUCCESS)
    assert res_d.steps == res_h.steps
    h = res_h.histories[aid]
    for i in range(1, len(h)):
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, :2], h[i].position, atol=1e-9,
            err_msg=f"step {i}")
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, 3], h[i].velocity, atol=1e-9)


@pytest.mark.slow
def test_device_fleet_with_visible_area_sensor():
    """calc_occlusions composes with the fleet axis: heterogeneous road
    geometries pad their wall-segment sets to the fleet max with degenerate
    (inert) segments; each member reproduces its solo run."""
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.sim import Simulation

    def cfg():
        return _cfg(**{"prediction.use_sensor_model": True,
                       "prediction.calc_occlusions": True})

    def mk():
        return [
            DeviceSimulation(Simulation(_occluded_pair_scenario(), cfg())),
            DeviceSimulation(Simulation(make_highway(), cfg())),
        ]

    solo = [s.run() for s in mk()]
    fleet = run_fleet(mk())
    for r, s in zip(fleet, solo):
        np.testing.assert_array_equal(r.status, s.status)
        assert r.steps == s.steps
        np.testing.assert_allclose(r.trajectories, s.trajectories, atol=1e-9)


@pytest.mark.slow
def test_device_sim_hybrid_behavior_with_occlusion_module():
    """Behavior hybrid x occlusion module on device: the FSM drives desired
    velocity/stop points between device cycles while the in-scan occlusion
    module (spawn locator, phantom rows, safety gate) runs unchanged; turn
    spawns stay on the INITIAL route across swaps — the host's own semantics
    (OcclusionModule.route_xy is fixed at construction)."""
    from frenetix_tpu.io.commonroad import Obstacle, State
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    def scenario():
        sc = make_highway(ego_v=13.0, lead_v=13.0, lead_gap=120.0,
                          n_steps=150)
        sc.obstacles[200] = Obstacle(
            obstacle_id=200, obstacle_type="truck", role="static", length=9.0,
            width=2.5, initial_state=State(0, np.array([60.0, 2.6]), 0.0, 0.0),
        )
        return sc

    def cfg():
        return _cfg(**{"behavior.use_behavior_planner": True,
                       "occlusion.use_occlusion_module": True,
                       "occlusion.harm_threshold": 0.02})

    sim_h = Simulation(scenario(), cfg())
    aid = sim_h.agents[0].id
    res_h = sim_h.run()
    res_d = DeviceSimulation(Simulation(scenario(), cfg())).run()
    assert res_h.agent_status[aid] == AgentStatus.COMPLETED_SUCCESS
    assert int(res_d.status[0]) == int(AgentStatus.COMPLETED_SUCCESS)
    assert res_d.steps == res_h.steps
    h = res_h.histories[aid]
    for i in range(1, len(h)):
        np.testing.assert_allclose(
            res_d.trajectories[i - 1, 0, :2], h[i].position, atol=1e-9,
            err_msg=f"step {i}")
    # the phantom gate visibly shaped the run (blind-spot slowdown)
    v = [s.velocity for s in h if 45 < s.position[0] < 65]
    assert np.mean(v) < 10.0


def test_ds_linspace_matches_f64_linspace_bitwise(rng):
    """The Dekker double-single velocity grid (module-level ds_* helpers)
    must land bitwise on the host's f64-linspace-then-f32-cast values — on
    CPU, so CI catches regressions without TPU hardware (the f32 DS path
    only activates on TPU inside DeviceSimulation)."""
    import jax
    import jax.numpy as jnp

    from frenetix_tpu.parallel.device_sim import (
        ds_add_from, ds_const, ds_linspace, ds_max, ds_min, ds_sub_from)

    from functools import partial

    @partial(jax.jit, static_argnums=5)
    def device_grid(v32, amax_T, amax6_T, vmax_c, vfloor, n_v):
        vf = (jnp.full((), vfloor[0]), jnp.full((), vfloor[1]))
        vm = (jnp.full((), vmax_c[0]), jnp.full((), vmax_c[1]))
        lo_h, lo_l = ds_max(ds_sub_from(v32, amax_T), vf)
        hi_h, hi_l = ds_min(ds_add_from(v32, amax6_T), vm)
        return ds_linspace(lo_h, lo_l, hi_h, hi_l, n_v)

    n_checked = 0
    for trial in range(300):
        v32 = np.float32(rng.uniform(0.0, 40.0))
        a_max = float(rng.uniform(5.0, 15.0))
        horizon = float(rng.uniform(1.0, 4.0))
        v_max = float(rng.uniform(20.0, 60.0))
        n_v = int(rng.integers(2, 64))

        # host semantics (reactive.py _sampling_ranges): python-f64 bounds
        # from the f32 state, f64 linspace, one f32 cast
        v = float(v32)
        v_lo = max(0.001, v - a_max * horizon)
        v_hi = min(v + (a_max / 6.0) * horizon, v_max)
        host = np.linspace(v_lo, v_hi, n_v).astype(np.float32)

        dev = np.asarray(device_grid(
            jnp.float32(v32), ds_const(a_max * horizon),
            ds_const((a_max / 6.0) * horizon), ds_const(v_max),
            ds_const(0.001), n_v))
        assert dev.dtype == np.float32
        np.testing.assert_array_equal(
            dev, host,
            err_msg=f"trial {trial}: v={v} a_max={a_max} T={horizon} "
                    f"v_max={v_max} n_v={n_v}")
        n_checked += host.size
    assert n_checked > 5000


def test_device_sim_walenet_multiagent_matches_host():
    """walenet + multi-agent: the hybrid prediction path must reproduce the
    host loop exactly — peers are net-predicted from each other's EXECUTED
    histories (VERDICT r4 item 2), not CV-extrapolated."""
    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.parallel.device_sim import DeviceSimulation
    from frenetix_tpu.sim import Simulation

    kw = {"prediction.mode": "walenet",
          "simulation.start_multiagent": True}
    res_d = DeviceSimulation(Simulation(make_overtake(), _cfg(**kw))).run()
    sim_h = Simulation(make_overtake(), _cfg(**kw))
    res_h = sim_h.run()

    assert [int(s) for s in res_d.status] == \
        [int(a.status) for a in sim_h.agents]
    assert res_d.steps == res_h.steps
    for col, aid in enumerate(res_d.agent_ids):
        h = res_h.histories[aid]
        for i in range(1, len(h)):
            np.testing.assert_allclose(
                res_d.trajectories[i - 1, col, :2], h[i].position,
                atol=1e-9, err_msg=f"agent {aid} step {i}")
