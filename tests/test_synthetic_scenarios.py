"""Synthetic scenarios: generation, XML round-trip, end-to-end planning."""
import os

import numpy as np
import pytest


def _cfg():
    from frenetix_tpu.utils.config import load_config

    cfg = load_config()
    cfg.dtype = "float64"
    return cfg


@pytest.mark.parametrize("maker", ["make_highway", "make_curve", "make_s_curve"])
def test_synthetic_scenarios_plan_to_success(maker):
    from frenetix_tpu.io import scenario_factory
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    sc = getattr(scenario_factory, maker)()
    sim = Simulation(sc, _cfg())
    res = sim.run()
    assert res.agent_status[60000] == AgentStatus.COMPLETED_SUCCESS, (
        maker, res.agent_messages,
    )
    # the ego must overtake/follow without exceeding the corridor
    hist = res.histories[60000]
    assert len(hist) > 10


def test_xml_round_trip(tmp_path):
    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.io.commonroad_writer import write_scenario
    from frenetix_tpu.io.scenario_factory import make_highway

    sc = make_highway()
    path = os.path.join(tmp_path, "syn.xml")
    write_scenario(sc, path)
    back = load_scenario(path)

    assert back.scenario_id == sc.scenario_id
    assert set(back.lanelets) == set(sc.lanelets)
    assert set(back.obstacles) == set(sc.obstacles)
    ll_a = sc.lanelets[50000]
    ll_b = back.lanelets[50000]
    np.testing.assert_allclose(ll_a.left_vertices, ll_b.left_vertices, atol=1e-3)
    ob_a = sc.obstacles[100]
    ob_b = back.obstacles[100]
    assert len(ob_a.trajectory) == len(ob_b.trajectory)
    np.testing.assert_allclose(
        ob_a.trajectory[10].position, ob_b.trajectory[10].position, atol=1e-3
    )
    pp_b = list(back.planning_problems.values())[0]
    assert pp_b.goals[0].velocity_interval is not None
    assert pp_b.goals[0].position_shape is not None


def test_round_trip_scenario_plans_identically(tmp_path):
    """Planning the written-and-reread scenario matches the original."""
    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.io.commonroad_writer import write_scenario
    from frenetix_tpu.io.scenario_factory import make_curve
    from frenetix_tpu.sim import Simulation

    sc = make_curve()
    path = os.path.join(tmp_path, "curve.xml")
    write_scenario(sc, path)
    back = load_scenario(path)

    res_a = Simulation(sc, _cfg()).run()
    res_b = Simulation(back, _cfg()).run()
    assert res_a.steps == res_b.steps
    pa = res_a.histories[60000][-1].position
    pb = res_b.histories[60000][-1].position
    np.testing.assert_allclose(pa, pb, atol=0.1)


def test_overtake_passes_slow_lead():
    """Two-lane overtake: the ego must end up AHEAD of the slow lead vehicle
    (it starts behind it and cannot reach the goal in time by following)."""
    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    sc = make_overtake()
    sim = Simulation(sc, _cfg())
    res = sim.run()
    assert res.agent_status[60000] == AgentStatus.COMPLETED_SUCCESS, res.agent_messages
    t_end = res.histories[60000][-1].time_step
    ego_x = res.histories[60000][-1].position[0]
    lead = sc.obstacles[100].state_at_time(t_end)
    assert ego_x > lead.position[0] + 2.0, (ego_x, lead.position)
    # the maneuver used the lateral range (left of the lane center at some point)
    max_y = max(s.position[1] for s in res.histories[60000])
    assert max_y > 1.0, max_y


def test_writer_roundtrip_traffic_elements(tmp_path):
    """Traffic signs / lights / stop lines / intersections survive an XML
    write → parse round trip, so synthetic behavior scenarios can be
    persisted as valid CommonRoad 2020a files."""
    from frenetix_tpu.io.commonroad import load_scenario
    from frenetix_tpu.io.commonroad_writer import write_scenario
    from frenetix_tpu.io.scenario_factory import (
        make_intersection_crossing, make_stop_sign, make_traffic_light,
    )

    for maker in (make_traffic_light, make_stop_sign, make_intersection_crossing):
        sc = maker()
        p = str(tmp_path / f"{sc.scenario_id}.xml")
        write_scenario(sc, p)
        sc2 = load_scenario(p)
        assert len(sc2.traffic_signs) == len(sc.traffic_signs)
        assert len(sc2.traffic_lights) == len(sc.traffic_lights)
        assert len(sc2.intersections) == len(sc.intersections)
        for lid, ll in sc.lanelets.items():
            l2 = sc2.lanelets[lid]
            assert (ll.stop_line is None) == (l2.stop_line is None)
            if ll.stop_line is not None:
                assert l2.stop_line.traffic_sign_refs == ll.stop_line.traffic_sign_refs
                assert l2.stop_line.traffic_light_refs == ll.stop_line.traffic_light_refs
        for tid, tl in sc.traffic_lights.items():
            assert sc2.traffic_lights[tid].cycle == tl.cycle


def test_round_trip_behavior_junction(tmp_path):
    """A junction family survives the XML round trip with everything the
    behavior planner needs (intersection elements for conflict clearance),
    and the reloaded scenario drives the full FSM to goal success."""
    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.io.commonroad_writer import write_scenario
    from frenetix_tpu.io.scenario_factory import make_turn_right
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    sc = make_turn_right()
    path = os.path.join(tmp_path, "turn.xml")
    write_scenario(sc, path)
    back = load_scenario(path)
    assert back.intersections and len(back.intersections[0].incomings) == 2

    cfg = _cfg()
    cfg.behavior.use_behavior_planner = True
    res = Simulation(back, cfg).run()
    assert res.agent_status[60000] == AgentStatus.COMPLETED_SUCCESS, \
        res.agent_messages


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_fuzzed_scenarios_never_crash(seed):
    """Robustness fuzz: randomized scenario parameters across the families
    must never raise — agents may time out or yield forever, but the stack
    (route → behavior → planner → sim) must degrade gracefully (the
    containment contract, SURVEY §5.3)."""
    from frenetix_tpu.io import scenario_factory as fac
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.sim.agent import AgentStatus

    rng = np.random.default_rng(seed)
    makers = [
        lambda: fac.make_highway(ego_v=float(rng.uniform(5, 20)),
                                 lead_v=float(rng.uniform(3, 15)),
                                 lead_gap=float(rng.uniform(20, 120)),
                                 n_steps=80),
        lambda: fac.make_curve(radius=float(rng.uniform(40, 150)),
                               ego_v=float(rng.uniform(5, 14)), n_steps=120),
        lambda: fac.make_overtake(ego_v=float(rng.uniform(8, 16)),
                                  lead_v=float(rng.uniform(2, 7)),
                                  n_steps=120),
        lambda: fac.make_intersection_crossing(
            cross_v=float(rng.uniform(4, 12)),
            cross_delay=float(rng.uniform(-20, 50)), n_steps=120),
    ]
    maker = makers[seed % len(makers)]
    cfg = _cfg()
    cfg.behavior.use_behavior_planner = bool(seed % 2)
    res = Simulation(maker(), cfg).run()
    status = res.agent_status[60000]
    assert status != AgentStatus.ERROR, res.agent_messages


def test_replan_pack_header_consistency():
    """The single-fetch replan pack (planner/reactive._jitted_replan_pack)
    must carry exactly what the three fetches it replaced carried: stats and
    the infeasibility histogram must equal independently fetched per-field
    values, and the materialized plan must equal a from-scratch
    `_materialize` at the device best index."""
    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.sim import Simulation

    cfg = _cfg()
    cfg.debug.save_all_traj = True  # keep last_cycle for the cross-check
    sim = Simulation(make_highway(), cfg)
    a = sim.agents[0]
    pl = a.planner
    orig = pl.plan
    checked = []

    def wrapped(x0, x_cl):
        p = orig(x0, x_cl)
        if checked:
            return p
        res, matrix, mask = pl.last_cycle
        feasible = int((np.asarray(res.rollout.feasible) & mask).sum())
        collisions = int((np.asarray(res.collides) & mask).sum())
        off_road = int(((np.asarray(res.boundary_step) >= 0) & mask).sum())
        hist = np.asarray(res.histogram).astype(int)
        assert pl.stats["feasible"] == feasible
        assert pl.stats["collisions"] == collisions
        assert pl.stats["off_road"] == off_road
        assert pl.stats["total"] == int(mask.sum())
        np.testing.assert_array_equal(pl.infeasible_histogram, hist)
        if p is not None and p.mode == "optimal" and bool(np.asarray(res.found)):
            ref = pl._materialize(res, int(np.asarray(res.best_idx)),
                                  matrix, "optimal")
            np.testing.assert_array_equal(p.x, ref.x)
            np.testing.assert_array_equal(p.d, ref.d)
            np.testing.assert_array_equal(p.cost_terms, ref.cost_terms)
            assert p.cost == ref.cost
            checked.append(True)
        return p

    pl.plan = wrapped
    sim.run()
    assert checked, "no optimal cycle was cross-checked"
