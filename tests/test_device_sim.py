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

    for key, val in [
        ("prediction.mode", "bogus"),
        ("behavior.use_behavior_planner", True),
        ("planning.emergency_mode", "min_risk"),
    ]:
        cfg = _cfg(**{key: val})
        sim = Simulation(make_highway(), cfg)
        with pytest.raises(ValueError):
            DeviceSimulation(sim)


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
    np.testing.assert_array_equal(r_v.selections, r_s.selections)
    np.testing.assert_allclose(r_v.trajectories, r_s.trajectories, atol=1e-9)

    with pytest.raises(ValueError):
        DeviceSimulation(Simulation(make_overtake(), cfg),
                         mesh=make_agent_mesh(jax.devices()[:3]))


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


def test_device_sim_walenet_reproduces_host_collision():
    """Neural (Wale-Net) predictions in the device sim: the windows are
    precomputed through the host's own builder (scenario obstacles have
    known recorded trajectories, so inference is deterministic at init).
    Scenario 36's documented walenet collision (ROUND2.md §7) must reproduce
    bit-exactly: same COLLISION status, same step, same trajectory."""
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

    assert res_h.agent_status[60000] == AgentStatus.COLLISION
    assert int(res_d.status[0]) == int(AgentStatus.COLLISION)
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


def test_device_sim_responsibility_matches_host():
    """Responsibility weight ≠ 0 (single agent): per-cycle reach-set grids
    precomputed at init + the on-device term/re-selection must reproduce the
    sequential host loop (ReactivePlanner._apply_responsibility) step by
    step on the T-junction scenario."""
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

    ds = DeviceSimulation(Simulation(load_scenario(xml), cfg))
    assert ds.reach_grids is not None
    # grids were actually populated (an all-empty occupancy would make the
    # parity below vacuous for the term)
    assert np.asarray(ds.reach_grids.occupancy).any()
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


def test_device_sim_responsibility_guards():
    """Multi-agent / mesh / fleet + responsibility must fail loudly."""
    import jax

    from frenetix_tpu.io.scenario_factory import make_highway, make_overtake
    from frenetix_tpu.parallel.device_sim import DeviceSimulation, run_fleet
    from frenetix_tpu.sim import Simulation

    cfg = _cfg(**{"simulation.start_multiagent": True})
    cfg.cost_weights["responsibility"] = 0.2
    with pytest.raises(ValueError, match="single-agent"):
        DeviceSimulation(Simulation(make_overtake(), cfg))

    cfg1 = _cfg()
    cfg1.cost_weights["responsibility"] = 0.2
    if len(jax.devices()) >= 2:
        from frenetix_tpu.parallel.mesh import make_agent_mesh

        with pytest.raises(ValueError, match="mesh"):
            DeviceSimulation(Simulation(make_highway(), cfg1),
                             mesh=make_agent_mesh(jax.devices()[:1]))
    ds = DeviceSimulation(Simulation(make_highway(), cfg1))
    with pytest.raises(ValueError, match="responsibility"):
        run_fleet([ds, ds])
