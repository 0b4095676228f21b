"""Evaluation layer: criticality metrics, solution check, reach sets."""
import numpy as np
import pytest
import jax.numpy as jnp


class _S:
    def __init__(self, t, x, y, th, v, a=0.0, yr=0.0, sa=0.0):
        self.time_step = t
        self.position = np.array([x, y])
        self.orientation = th
        self.velocity = v
        self.acceleration = a
        self.yaw_rate = yr
        self.steering_angle = sa


def _straight_drive(n=40, v=10.0, dt=0.1):
    return [_S(i, v * dt * i, 0.0, 0.0, v) for i in range(n)]


def test_solution_check_feasible_straight():
    from frenetix_tpu.evaluation.solution_check import check_solution
    from frenetix_tpu.ops.kinematics import VehicleParams

    states = _straight_drive()
    chk = check_solution(states, VehicleParams(), 0.1)
    assert chk.feasible, chk
    assert chk.max_position_error < 0.01


def test_solution_check_detects_teleport():
    from frenetix_tpu.evaluation.solution_check import check_solution
    from frenetix_tpu.ops.kinematics import VehicleParams

    states = _straight_drive()
    states[20].position = states[20].position + np.array([0.0, 3.0])  # jump
    chk = check_solution(states, VehicleParams(), 0.1)
    assert not chk.feasible
    assert chk.max_position_error > 1.0


def test_solution_check_detects_input_violation():
    from frenetix_tpu.evaluation.solution_check import check_solution
    from frenetix_tpu.ops.kinematics import VehicleParams

    dt = 0.1
    states = _straight_drive()
    for i, s in enumerate(states):
        s.velocity = 10.0 + (20.0 * dt * i if i > 20 else 0.0)  # a=20 > a_max
    chk = check_solution(states, VehicleParams(), dt)
    assert chk.input_violations > 0


def test_metrics_ttc_headway():
    """Ego following a slower car: finite TTC and headway decreasing."""
    from frenetix_tpu.evaluation.metrics import Measures
    from frenetix_tpu.io.commonroad import Obstacle, Scenario, State

    dt = 0.1
    lead_states = [State(i, np.array([30.0 + 5.0 * dt * i, 0.0]), 0.0, 5.0)
                   for i in range(60)]
    ob = Obstacle(
        obstacle_id=7, obstacle_type="car", role="dynamic", length=4.5,
        width=2.0, initial_state=lead_states[0], trajectory=lead_states[1:],
    )
    sc = Scenario("t", dt, {}, {7: ob}, {})
    ego = _straight_drive(n=50, v=10.0)
    m = Measures(1, sc, ego, dt=dt)
    ttc = m.ttc()
    hw = m.hw()
    assert np.isfinite(ttc).any()
    fin = np.isfinite(hw)
    assert (np.diff(hw[fin]) < 0).all()  # closing in
    # required deceleration grows as the gap closes
    alr = np.abs(m.a_long_req())
    assert alr[fin][-1] > alr[fin][0]
    df = m.compute()
    assert set(df.columns) >= {"ttc", "hw", "btn", "pet", "v"}


def test_reach_set_responsibility():
    """Obstacle behind the ego trajectory → its reach set never contains the
    ego path → risk subtracted (negative responsibility cost)."""
    from frenetix_tpu.risk.reachable_set import responsibility_reach_set
    from frenetix_tpu.risk.costs import TrajectoryRisks

    class RO:
        pass

    m, n1, t = 2, 31, 30
    ro = RO()
    ro.x = jnp.asarray(np.linspace(50, 80, n1)[None, :].repeat(m, 0))
    ro.y = jnp.zeros((m, n1))

    from frenetix_tpu.ops.costs import PredictionTensors

    means = np.zeros((1, t, 2))
    means[0, :, 0] = 10.0  # far behind, heading away
    preds = PredictionTensors(
        means=jnp.asarray(means),
        inv_covs=jnp.asarray(np.tile(np.eye(2)[None, None], (1, t, 1, 1))),
        covs=jnp.asarray(np.tile(np.eye(2)[None, None], (1, t, 1, 1))),
        orientations=jnp.full((1, t), np.pi),  # driving away
        velocities=jnp.full((1, t), 5.0),
        lengths=jnp.asarray([4.5]), widths=jnp.asarray([2.0]),
        valid=jnp.ones((1, t), bool),
    )
    risks = TrajectoryRisks(
        ego_risk_per_obst=jnp.full((m, 1), 0.1),
        obst_risk_per_obst=jnp.full((m, 1), 0.2),
        ego_harm_per_obst=jnp.full((m, 1), 0.3),
        obst_harm_per_obst=jnp.full((m, 1), 0.3),
        ego_risk=jnp.full((m,), 0.1),
        obst_risk=jnp.full((m,), 0.2),
        obst_present=jnp.ones((1,), bool),
    )
    cost = np.asarray(responsibility_reach_set(ro, preds, risks))
    np.testing.assert_allclose(cost, -0.2, atol=1e-6)


# ------------------------------------- curvilinear lead search + exact ET/PET


def _straight_states(xs, v, dt=0.1):
    from frenetix_tpu.sim.agent import EgoState

    return [EgoState(i, np.array([x, 0.0]), 0.0, v) for i, x in enumerate(xs)]


def test_curvilinear_lead_search_straight_road():
    """On the straight factory highway the chain-projected headway equals the
    hand-computed bumper gap: Δx − L_obs/2 − L_ego/2."""
    from frenetix_tpu.evaluation.metrics import Measures
    from frenetix_tpu.io.scenario_factory import make_highway

    sc = make_highway(lead_v=10.0, lead_gap=40.0)
    ego_xs = np.arange(0.0, 10.0, 1.0)  # ego at 10 m/s from x=0
    m = Measures(60000, sc, _straight_states(ego_xs, 10.0),
                 veh_length=4.508, veh_width=1.61)
    hw = m.hw()
    # lead starts at s=40 moving at 10 m/s; ego at x=t; gap is constant
    expect = 40.0 - 4.5 / 2 - 4.508 / 2
    assert np.all(np.isfinite(hw))
    np.testing.assert_allclose(hw, expect, atol=0.6)


def test_lead_search_follows_curved_chain():
    """On the curve scenario the curvilinear headway uses arclength, so it
    exceeds the straight-line distance between ego and lead."""
    from frenetix_tpu.evaluation.metrics import Measures
    from frenetix_tpu.io.scenario_factory import make_curve
    from frenetix_tpu.sim.agent import EgoState

    sc = make_curve(radius=80.0, lead_v=8.0)
    lead = sc.obstacles[100]
    # ego sits at the curve start
    states = [EgoState(0, sc.lanelets[50000].center_vertices[0].copy(), 0.0, 8.0)]
    m = Measures(60000, sc, states)
    hw = m.hw()[0]
    d_euclid = np.linalg.norm(
        np.asarray(lead.initial_state.position) - states[0].position
    )
    assert np.isfinite(hw)
    assert hw > d_euclid - 4.6   # arclength ≥ chord (minus bumper terms)


def test_et_pet_conflict_area_hand_computed():
    """Crossing scenario with known kinematics: ET/PET from the lanelet
    conflict area match hand-computed enter/exit steps."""
    from frenetix_tpu.evaluation.metrics import Measures
    from frenetix_tpu.io.scenario_factory import make_intersection_crossing
    from frenetix_tpu.sim.agent import EgoState

    # ego crosses the junction at constant 10 m/s along +x starting at -60+2;
    # the crossing car starts 48 m behind its box and arrives ~4 steps after
    # the ego leaves it
    sc = make_intersection_crossing(ego_v=10.0, cross_v=8.0, cross_delay=48.0)
    dt = 0.1
    # keep every state on the road (x ≤ 60) — the lane-chain containment
    # check requires the full trajectory inside the merged lane (reference
    # `_obs_lane_poly` semantics)
    states = [EgoState(i, np.array([-58.0 + 10.0 * dt * i, 0.0]), 0.0, 10.0)
              for i in range(115)]
    m = Measures(60000, sc, states, dt=dt, veh_length=4.508, veh_width=1.61)

    et = m.et()
    pet = m.pet()
    # conflict area = A2 ∩ B2 = the lane-overlap square |x|,|y| ≤ 1.8.
    # ego front reaches x=-1.8 at x_c = -1.8-2.254 → step ≈ (58-4.054)/1 ≈ 54;
    # rear clears x=+1.8 at x_c = 1.8+2.254 → step ≈ 62 ⇒ ET ≈ 8±2 steps
    assert np.isfinite(et[0])
    assert 5 <= et[0] <= 11
    # crossing car reaches y=-4.05 at step ≈ (58-4.05)/0.8 ≈ 67; ego exits
    # at ≈ 63 ⇒ PET = obs_enter − ego_exit ≈ 4 steps
    assert np.isfinite(pet[0])
    assert 1 <= pet[0] <= 15
    # countdown while inside, inf after leaving
    inside = np.isfinite(et)
    assert not inside[-1]


def test_et_pet_inf_without_intersections():
    """Reference parity: no intersection elements → ET/PET are inf
    (metrics.py:661-664, 'No intersection as conflict area')."""
    from frenetix_tpu.evaluation.metrics import Measures
    from frenetix_tpu.io.scenario_factory import make_highway

    sc = make_highway()
    m = Measures(60000, sc, _straight_states(np.arange(5.0), 10.0))
    assert not np.isfinite(m.et()).any()
    assert not np.isfinite(m.pet()).any()


def test_dce_ttce_future_semantics():
    """DCE/TTCE look FORWARD: after the closest encounter has passed, DCE
    grows back and TTCE stays 0 at the encounter, not before
    (reference metrics.py:410-458 reversed-min semantics)."""
    from frenetix_tpu.evaluation.metrics import Measures
    from frenetix_tpu.io.commonroad import Obstacle, Scenario, State

    dt = 0.1
    # obstacle sits still at x=30 (dynamic with a standstill trajectory —
    # the proximity scan covers dynamic obstacles); ego drives past it
    still = [State(i, np.array([30.0, 3.0]), 0.0, 0.0) for i in range(70)]
    ob = Obstacle(
        obstacle_id=7, obstacle_type="car", role="dynamic", length=4.5,
        width=2.0, initial_state=still[0], trajectory=still[1:],
    )
    sc = Scenario("t", dt, {}, {7: ob}, {})
    ego = _straight_states(np.arange(0.0, 60.0, 1.0), 10.0)
    m = Measures(1, sc, ego, dt=dt)
    dce = m.dce()
    ttce = m.ttce()
    i_min = int(np.argmin([np.linalg.norm(s.position - np.array([30.0, 3.0]))
                           for s in ego]))
    # before the encounter: DCE equals the eventual minimum distance
    assert dce[0] == pytest.approx(dce[i_min])
    # after passing: the future minimum is the current (growing) distance
    assert dce[-1] > dce[i_min] + 5.0
    # TTCE counts down to zero at the encounter and stays 0 after
    assert ttce[0] == pytest.approx(i_min * dt)
    assert ttce[i_min] == 0.0
    assert ttce[-1] == 0.0


def test_tit_tet_future_cumulative():
    """TIT/TET are future-cumulative: monotonically non-increasing in time,
    with TIT using the (tau - TTC) integrand (metrics.py:460-488)."""
    from frenetix_tpu.evaluation.metrics import Measures
    from frenetix_tpu.io.commonroad import Obstacle, Scenario, State

    dt = 0.1
    lead = [State(i, np.array([20.0 + 2.0 * dt * i, 0.0]), 0.0, 2.0)
            for i in range(50)]
    ob = Obstacle(obstacle_id=7, obstacle_type="car", role="dynamic",
                  length=4.5, width=2.0, initial_state=lead[0],
                  trajectory=lead[1:])
    sc = Scenario("t", dt, {}, {7: ob}, {})
    m = Measures(1, sc, _straight_states(np.arange(0.0, 45.0, 1.0), 10.0), dt=dt)
    tit = m.tit()
    tet = m.tet()
    assert np.all(np.diff(tit) <= 1e-12)
    assert np.all(np.diff(tet) <= 1e-12)
    ttc = m.ttc()
    exposed = ttc <= m.tau
    if exposed.any():
        k = int(np.argmax(exposed))
        expect = np.sum((m.tau - ttc[exposed]) * dt)
        assert tit[0] == pytest.approx(expect)


def test_enabled_metrics_validates_names():
    from frenetix_tpu.evaluation.metrics import enabled_metrics

    assert "ttc" in enabled_metrics({})
    assert "tit" not in enabled_metrics({"tit": False})
    try:
        enabled_metrics({"ttcc": True})
        assert False, "typo'd metric name must raise"
    except ValueError as e:
        assert "ttcc" in str(e)
