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
