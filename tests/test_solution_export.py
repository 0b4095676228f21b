"""CommonRoad solution XML export (VERDICT r3 item 8): a successful run's
solution file round-trips through the writer/reader and passes the KS
feasibility check; the WX1 benchmark cost evaluates on the same states.

Reference surface: CommonRoadSolutionWriter + PlanningProblemSolution(KS,
VehicleType(cr_vehicle_id), CostFunction.WX1) —
/root/reference/cr_scenario_handler/utils/evaluation.py:336-338,
evaluation/agent_evaluation.py:43-57."""
import numpy as np
import pytest

from frenetix_tpu.evaluation.solution_check import check_solution
from frenetix_tpu.evaluation.solution_cost import (
    benchmark_cost, partial_costs)
from frenetix_tpu.io.solution_writer import (
    benchmark_id, read_solution, write_solution)


@pytest.fixture(scope="module")
def sim_result():
    from frenetix_tpu.io.scenario_factory import make_overtake
    from frenetix_tpu.sim import Simulation
    from frenetix_tpu.utils.config import load_config

    cfg = load_config()
    cfg.simulation.start_multiagent = True
    cfg.debug.activate_logging = False
    sim = Simulation(make_overtake(), cfg)
    res = sim.run()
    return sim, res


@pytest.mark.slow
def test_solution_roundtrip_and_feasibility(tmp_path, sim_result):
    sim, res = sim_result
    aid = sim.agents[0].id
    states = res.histories[aid]
    path = write_solution(str(tmp_path / "solution.xml"),
                          res.scenario_id, {aid: states}, sim.scenario.dt)
    bid, trajs = read_solution(path, dt=sim.scenario.dt)
    assert bid == benchmark_id(res.scenario_id) \
        == f"KS2:WX1:{res.scenario_id}:2020a"
    back = trajs[aid]
    assert len(back) == len(states)
    for a, b in zip(states, back):
        assert a.time_step == b.time_step
        np.testing.assert_allclose(a.position, b.position, rtol=1e-9)
        assert a.orientation == pytest.approx(b.orientation, abs=1e-9)
        assert a.velocity == pytest.approx(b.velocity, abs=1e-9)
        assert a.steering_angle == pytest.approx(b.steering_angle, abs=1e-9)
    # the re-read trajectory passes the KS forward-sim feasibility check,
    # exactly like the original states (solution_check.py)
    chk_orig = check_solution(states, sim.config.vehicle, sim.scenario.dt)
    chk_back = check_solution(back, sim.config.vehicle, sim.scenario.dt)
    assert chk_back.feasible == chk_orig.feasible
    assert chk_back.max_position_error == pytest.approx(
        chk_orig.max_position_error, abs=1e-6)


@pytest.mark.slow
def test_benchmark_cost_evaluates(sim_result):
    sim, res = sim_result
    states = res.histories[sim.agents[0].id]
    cost = benchmark_cost(states, sim.scenario.dt)
    assert cost["cost_function"] == "WX1" and np.isfinite(cost["total"])
    assert cost["total"] > 0
    parts = partial_costs(states, sim.scenario.dt)
    assert parts["time"] == pytest.approx((len(states) - 1) * sim.scenario.dt)
    assert parts["path_length"] > 0
    # a straight constant-velocity trajectory costs only time +
    # velocity-offset-free terms
    from types import SimpleNamespace

    flat = [SimpleNamespace(position=(i * 1.0, 0.0), orientation=0.0,
                            velocity=10.0, steering_angle=0.0, time_step=i)
            for i in range(20)]
    p = partial_costs(flat, 0.1, desired_velocity=10.0)
    assert p["acceleration"] == pytest.approx(0.0, abs=1e-12)
    assert p["jerk"] == pytest.approx(0.0, abs=1e-12)
    assert p["velocity_offset"] == pytest.approx(0.0, abs=1e-12)
    assert benchmark_cost(flat, 0.1, "JB1",
                          desired_velocity=10.0)["total"] == pytest.approx(
        1.9, abs=1e-9)  # pure time term


def test_unknown_cost_function_raises():
    with pytest.raises(ValueError):
        benchmark_cost([], 0.1, "NOPE")


def test_each_cost_combination_hand_computed():
    """Every COST_COMBINATIONS entry evaluated against a hand-computed
    total on an analytically simple trajectory (VERDICT r4 item 8), and
    every output flags its weights as estimated until the transcription is
    pinned against the official catalog."""
    from types import SimpleNamespace

    from frenetix_tpu.evaluation.solution_cost import COST_COMBINATIONS

    dt, n, v = 0.1, 21, 8.0
    delta = 0.02
    states = [SimpleNamespace(position=(i * v * dt, 0.0), orientation=0.0,
                              velocity=v, steering_angle=delta, time_step=i)
              for i in range(n)]
    # constant v, constant steering angle, straight path:
    #   time = (n-1)·dt                  path_length = v·(n-1)·dt
    #   acceleration = jerk = steering_rate = yaw_rate = 0
    #   steering_angle = δ²·(n-1)·dt     velocity_offset = (v - v_des)²·T
    T = (n - 1) * dt
    hand = {"time": T, "path_length": v * T, "acceleration": 0.0,
            "jerk": 0.0, "steering_angle": delta ** 2 * T,
            "steering_rate": 0.0, "yaw_rate": 0.0}

    for name, w in COST_COMBINATIONS.items():
        v_des = 10.0
        expected = sum(
            wk * (hand[k] if k in hand else (v - v_des) ** 2 * T)
            for k, wk in w.items())
        out = benchmark_cost(states, dt, name, desired_velocity=v_des)
        assert out["total"] == pytest.approx(expected, rel=1e-12), name
        assert out["weights_estimated"] is True, name
    # explicit full weights → not estimated
    out = benchmark_cost(states, dt, "WX1", desired_velocity=v_des,
                         weights={"time": 10.0, "velocity_offset": 1.0,
                                  "acceleration": 0.1, "steering_rate": 0.1})
    assert out["weights_estimated"] is False


def test_solution_xml_stamps_cost_weights_and_date(tmp_path):
    """The solution XML records which (estimated) weight set produced any
    logged cost, and stamps the actual write date (ADVICE r4)."""
    import datetime
    import xml.etree.ElementTree as ET
    from types import SimpleNamespace

    from frenetix_tpu.evaluation.solution_cost import COST_COMBINATIONS

    states = [SimpleNamespace(position=(i * 1.0, 0.0), orientation=0.0,
                              velocity=10.0, steering_angle=0.0, time_step=i)
              for i in range(5)]
    path = write_solution(str(tmp_path / "s.xml"), "TEST-1", {7: states},
                          0.1, cost_weights=COST_COMBINATIONS["WX1"])
    root = ET.parse(path).getroot()
    assert root.get("date") == datetime.date.today().isoformat()
    stamped = dict(kv.split("=") for kv in root.get("cost_weights").split(";"))
    assert set(stamped) == set(COST_COMBINATIONS["WX1"])
    assert float(stamped["time"]) == 10.0
    # explicit date parameter wins
    p2 = write_solution(str(tmp_path / "s2.xml"), "TEST-1", {7: states},
                        0.1, date="2024-05-05")
    assert ET.parse(p2).getroot().get("date") == "2024-05-05"
