"""Behavior planner: io parsing, static route plan, velocity planner, FSM
transitions, and end-to-end maneuvers (behavior-initiated lane change,
red-light stop, stop-sign full stop, overtake).

Reference analogs: behavior_planner/behavior_module.py, FSM_model.py,
FSM_logic_modules.py, path_planner.py, velocity_planner.py.
"""
import numpy as np
import pytest

REF_SCENARIO = "/root/reference/example_scenarios/ZAM_Tjunction-1_23_T-1.xml"


# --------------------------------------------------------------------- io


def test_traffic_sign_parsing_shipped_scenario():
    from frenetix_tpu.io.commonroad import load_scenario, speed_limit_for_lanelets

    sc = load_scenario(REF_SCENARIO)
    assert len(sc.traffic_signs) == 12
    assert sc.country == "ZAM"
    # every sign is a 274 (max speed) carrying 14 m/s
    assert speed_limit_for_lanelets(sc, sc.lanelets.keys()) == 14.0
    # signs attach through lanelet trafficSignRef
    assert any(ll.traffic_sign_refs for ll in sc.lanelets.values())


def test_traffic_light_cycle():
    from frenetix_tpu.io.commonroad import TrafficLight

    tl = TrafficLight(1, cycle=[("red", 10), ("green", 20)], time_offset=5)
    assert tl.state_at_time(5) == "red"
    assert tl.state_at_time(14) == "red"
    assert tl.state_at_time(15) == "green"
    assert tl.state_at_time(34) == "green"
    assert tl.state_at_time(35) == "red"      # cycle wraps
    assert tl.state_at_time(0) == "green"     # before offset wraps backwards


# ------------------------------------------------------------ static route


def _behavior_module(maker, **cfg_overrides):
    from frenetix_tpu.behavior import BehaviorModule
    from frenetix_tpu.planner.route import reference_path_for_problem
    from frenetix_tpu.utils.config import FrenetixConfig

    cfg = FrenetixConfig(dtype="float64")
    cfg.behavior.use_behavior_planner = True
    for k, v in cfg_overrides.items():
        setattr(cfg.behavior, k, v)
    sc = maker()
    pp = list(sc.planning_problems.values())[0]
    polyline, route = reference_path_for_problem(sc, pp)
    return BehaviorModule(sc, pp, cfg, polyline, route, ego_id=60000), sc


def test_static_route_plan_traffic_light():
    from frenetix_tpu.io.scenario_factory import make_traffic_light

    mod, sc = _behavior_module(make_traffic_light)
    plan = mod.bm.PP_state.static_route_plan
    types = [g.goal_type for g in plan]
    assert "TrafficLight" in types and "PrepareTrafficLight" in types
    # tiles [0, L] without gaps or overlaps
    assert plan[0].start_s == 0.0
    for a, b in zip(plan[:-1], plan[1:]):
        assert abs(a.end_s - b.start_s) < 1e-6
    # prep comes immediately before the goal
    i = types.index("TrafficLight")
    assert types[i - 1] == "PrepareTrafficLight"
    # stop point projects to the stop line (x = 90 in scenario coordinates)
    tl_goal = plan[i]
    stop_xy = mod.bm.PP_state.frame.to_cartesian(tl_goal.stop_point_s)
    assert abs(stop_xy[0] - 90.0) < 1.0


def test_static_route_plan_lane_merge_detection():
    from frenetix_tpu.io.scenario_factory import make_lane_merge

    mod, sc = _behavior_module(make_lane_merge)
    types = [g.goal_type for g in mod.bm.PP_state.static_route_plan]
    assert "LaneMerge" in types and "PrepareLaneMerge" in types


def test_nav_lane_changes_from_route():
    from frenetix_tpu.io.scenario_factory import make_lane_change

    mod, sc = _behavior_module(make_lane_change)
    assert mod.bm.nav_lane_changes_left == 1
    assert mod.bm.nav_lane_changes_right == 0


# -------------------------------------------------------- velocity planner


def _vp_fixture(v_ego=10.0, v_lead=None, gap=None):
    from frenetix_tpu.behavior.behavior_module import BMState
    from frenetix_tpu.behavior.velocity_planner import VelocityPlanner
    from frenetix_tpu.utils.config import FrenetixConfig

    class Ego:
        position = np.zeros(2)
        orientation = 0.0
        velocity = v_ego
        time_step = 0

    bm = BMState()
    bm.config = FrenetixConfig(dtype="float64")
    bm.vehicle_params = bm.config.vehicle
    bm.ego_state = Ego()
    bm.FSM_state.street_setting = "Urban"
    vp = VelocityPlanner(bm)
    bm.VP_state.dist_preceding_veh = gap
    bm.VP_state.vel_preceding_veh = v_lead
    return vp, bm


def test_velocity_planner_max_mode():
    vp, bm = _vp_fixture(v_ego=10.0)
    vp.execute()
    # urban default 50 km/h, condition factor 1
    assert bm.VP_state.MAX == pytest.approx(50 / 3.6)
    assert bm.VP_state.velocity_mode == "MAX"
    # clipped into the acceleration envelope around v_ego
    assert bm.VP_state.desired_velocity <= 10.0 + bm.vehicle_params.a_max * 0.3


def test_velocity_planner_ttc_mode():
    # close slow lead → TTC < MAX
    vp, bm = _vp_fixture(v_ego=12.0, v_lead=5.0, gap=15.0)
    vp.execute()
    assert bm.VP_state.velocity_mode == "TTC"
    assert bm.VP_state.TTC < 50 / 3.6
    # safety distance uses the "ego behind other" branch
    assert bm.VP_state.safety_dist > 0


def test_safety_distance_situations():
    from frenetix_tpu.behavior.velocity_planner import stop_distance

    # approaching head-on: safety distance includes both stopping distances
    vp, bm = _vp_fixture(v_ego=10.0, v_lead=-5.0, gap=50.0)
    relevant = vp._calc_safety_distance()
    assert relevant
    a_max = bm.vehicle_params.a_max
    assert bm.VP_state.min_safety_dist > (
        stop_distance(10.0, a_max) + stop_distance(5.0, a_max)
    )
    # driving away from each other: irrelevant
    vp2, bm2 = _vp_fixture(v_ego=-3.0, v_lead=5.0, gap=20.0)
    assert not vp2._calc_safety_distance()


# ------------------------------------------------------------------- FSM


class _Ego:
    def __init__(self, x, v, t=0, y=0.0):
        self.position = np.array([float(x), float(y)])
        self.orientation = 0.0
        self.velocity = float(v)
        self.time_step = t


def test_fsm_traffic_light_states():
    """Drive the FSM through Prepare → Stopping → Waiting → ContinueDriving
    by scripting ego positions against the light's cycle."""
    from frenetix_tpu.io.scenario_factory import make_traffic_light

    mod, sc = _behavior_module(make_traffic_light)
    fsm = mod.bm.FSM_state
    # far before the light at t=0 (red): StaticDefault or Prepare depending
    # on the prep-goal extent
    mod.execute(None, _Ego(30.0, 10.0, 0), 0)
    # inside the TrafficLight goal while red, slow → Stopping then Waiting
    mod.execute(None, _Ego(80.0, 5.0, 30), 30)
    assert fsm.behavior_state_static == "TrafficLight"
    assert fsm.situation_state_static == "Stopping"
    out = mod.execute(None, _Ego(85.0, 0.3, 33), 33)
    assert fsm.situation_state_static == "WaitingForGreenLight"
    # the stop point holds the vehicle; the envelope keeps desired velocity
    # near zero (exact 0 only below the zero-velocity threshold)
    assert out.desired_velocity < 2.5
    assert out.desired_velocity_stop_point == 0.0
    assert out.stop_point_s is not None
    # green (after step 90: 80 red + 10 redYellow) → ContinueDriving
    mod.execute(None, _Ego(85.0, 0.0, 93), 93)
    assert fsm.situation_state_static == "ContinueDriving"
    assert not fsm.waiting_for_green_light


def test_fsm_lane_change_preparation_blocked_then_free():
    """Free-space search fails while a vehicle sits next to the ego on the
    target lane, succeeds once it clears (FSM_model.py:1443-1512)."""
    from frenetix_tpu.io.scenario_factory import make_lane_change

    mod, sc = _behavior_module(lambda: make_lane_change(with_traffic=True))
    fsm = mod.bm.FSM_state
    # the left-lane vehicle starts at x=60: place the ego right next to it
    mod.execute(None, _Ego(60.0, 12.0, 3), 3)
    assert fsm.behavior_state_dynamic in (
        "PrepareLaneChangeLeft", "LaneChangeLeft"
    )
    mod.execute(None, _Ego(60.0, 12.0, 6), 6)
    if fsm.behavior_state_dynamic == "PrepareLaneChangeLeft":
        assert not fsm.free_space_on_target_lanelet


# ------------------------------------------------------------- end-to-end


def _run(maker, **cfg_overrides):
    from frenetix_tpu.sim.simulation import Simulation
    from frenetix_tpu.utils.config import FrenetixConfig

    cfg = FrenetixConfig(dtype="float64")
    cfg.behavior.use_behavior_planner = True
    for k, v in cfg_overrides.items():
        setattr(cfg.behavior, k, v)
    sim = Simulation(maker(), cfg)
    agent = sim.agents[0]
    ref_updates = []
    orig = agent.behavior.execute

    def wrapped(preds, st, t):
        out = orig(preds, st, t)
        if out.reference_path is not None:
            ref_updates.append(t)
        return out

    agent.behavior.execute = wrapped
    res = sim.run()
    xs = np.array([s.position[0] for s in agent.record.states])
    ys = np.array([s.position[1] for s in agent.record.states])
    vs = np.array([s.velocity for s in agent.record.states])
    return res, xs, ys, vs, ref_updates


def test_e2e_red_light_stop():
    """The ego must hold behind the stop line (x=90) for the whole red+yellow
    phase and still reach the goal after green."""
    from frenetix_tpu.io.scenario_factory import make_traffic_light

    res, xs, ys, vs, _ = _run(make_traffic_light)
    assert res.success
    assert xs[:81].max() < 90.0          # behind the line during red
    assert (vs < 0.3).sum() >= 5         # actually held
    assert xs[-1] > 130.0                # proceeded to the goal


def test_e2e_behavior_lane_change():
    """Goal on the left lane: the FSM initiates a lane change that REBUILDS
    the reference path (not just lateral sampling), and the ego ends on the
    left lane (VERDICT r1 item 1 'done' criterion)."""
    from frenetix_tpu.io.scenario_factory import make_lane_change

    res, xs, ys, vs, ref_updates = _run(make_lane_change)
    assert res.success
    assert len(ref_updates) >= 1         # behavior-initiated ref-path switch
    assert ys[-1] > 3.0                  # on the left lane (y=3.6)


def test_e2e_stop_sign_full_stop():
    """Stop sign demands a ≥1 s full stop behind the line before continuing."""
    from frenetix_tpu.io.scenario_factory import make_stop_sign

    res, xs, ys, vs, _ = _run(make_stop_sign)
    assert res.success
    full_stop = vs < 0.1
    assert full_stop.sum() >= 10         # ≥ 1 s at dt=0.1
    assert xs[full_stop].max() < 60.0    # behind the line (x=60)


def test_e2e_yield_sign_clear_no_stop():
    """A clear yield sign is passable without stopping."""
    from frenetix_tpu.io.scenario_factory import make_yield_sign

    res, xs, ys, vs, _ = _run(make_yield_sign)
    assert res.success
    assert vs.min() > 2.0


def test_e2e_overtake_via_lane_changes():
    """Slow lead + goal on the same lane: behavior-level overtake (lane
    change left → pass → lane change right), beyond the reference's TODO."""
    from frenetix_tpu.io.scenario_factory import make_behavior_overtake

    res, xs, ys, vs, ref_updates = _run(make_behavior_overtake)
    assert res.success
    assert ys.max() > 2.5                # used the left lane
    assert abs(ys[-1]) < 1.2             # merged back to the right lane
    assert len(ref_updates) >= 2         # out and back


def test_e2e_crosswalk_yield():
    """Pedestrian crossing at a crosswalk: the FSM enters the Crosswalk
    family (pedestrians-only clearance), the ego stays behind the crossing
    while the pedestrian is in the road, then completes."""
    from frenetix_tpu.io.scenario_factory import make_crosswalk

    res, xs, ys, vs, _ = _run(make_crosswalk)
    assert res.success
    assert vs.min() < 2.0                 # yielded hard
    # pedestrian occupies the road (|y| < 2.3) for t ≈ 39..62; the ego must
    # still be clearly before the crosswalk (x=60) then
    assert xs[39:63].max() < 55.0
    assert xs[-1] > 110.0


def test_intersection_stop_point_in_static_route():
    """Intersection static goals carry a junction-entry yield line — without
    it the Stopping/Waiting situations have no stop distance to arm."""
    from frenetix_tpu.io.scenario_factory import make_intersection_crossing

    mod, sc = _behavior_module(make_intersection_crossing)
    plan = mod.bm.PP_state.static_route_plan
    inter = [g for g in plan if g.goal_type == "Intersection"]
    prep = [g for g in plan if g.goal_type == "PrepareIntersection"]
    assert inter and prep
    assert inter[0].stop_point_s == pytest.approx(inter[0].start_s)
    assert prep[0].stop_point_s == pytest.approx(inter[0].start_s)


def test_intersection_conflict_clearance():
    """Lane-conflict clearance (EgoFSM._conflict_clear): crossing traffic
    approaching the junction blocks the ego; traffic that has already passed
    the ego's conflict lanelets does NOT — even right next to the yield
    line, where the old stop-point radius scan still blocks."""
    from frenetix_tpu.io.scenario_factory import make_intersection_crossing

    # crossing car ~33 m before the junction, closing at 8 m/s → blocked
    mod, sc = _behavior_module(make_intersection_crossing)
    fsm = mod.bm.FSM_state
    out = mod.execute(None, _Ego(-14.0, 2.0, 9), 9)
    assert fsm.behavior_state_static == "PrepareIntersection"
    assert fsm.intersection_clear is False
    assert fsm.situation_state_static == "SlowingDown"
    assert out.stop_point_s is not None

    # car already past the conflict area (inside the junction box, moving
    # away): conflict model is clear, the radius scan is not
    mod2, _ = _behavior_module(lambda: make_intersection_crossing(cross_delay=-15.0))
    mod2.execute(None, _Ego(-14.0, 2.0, 0), 0)
    assert mod2.bm.FSM_state.intersection_clear is True
    assert mod2.ego_fsm._stop_point_clear() is False  # the contrast


def test_conflict_clearance_respects_lane_direction():
    """A vehicle whose heading opposes its lanelet's direction cannot reach
    the conflict area along successor chains → no arrival time."""
    from frenetix_tpu.io.scenario_factory import make_intersection_crossing

    mod, sc = _behavior_module(make_intersection_crossing)
    mod.execute(None, _Ego(-14.0, 2.0, 0), 0)
    ob = sc.obstacles[100]
    st = ob.state_at_time(0)
    rings = [sc.lanelets[50001].polygon]
    fwd = mod.ego_fsm._arrival_time_in_rings(ob, st, rings, st.velocity, 20.0)
    assert fwd is not None and fwd > 0.0

    class Reversed:
        position = st.position
        orientation = st.orientation + np.pi  # against the lane
        velocity = st.velocity

    rev = mod.ego_fsm._arrival_time_in_rings(ob, Reversed(), rings,
                                             st.velocity, 20.0)
    assert rev is None


def test_e2e_intersection_yield():
    """Crossing traffic at the junction: the ego yields at the junction
    entry while the crossing vehicle traverses the conflict area (steps
    ~45-55), then crosses and reaches the goal."""
    from frenetix_tpu.io.scenario_factory import make_intersection_crossing

    res, xs, ys, vs, _ = _run(make_intersection_crossing)
    assert res.success
    # the crossing car is inside the conflict area about t∈[45, 55]; the
    # ego must still be before the junction entry (x = -10) through that
    # window (with approach margin before it)
    assert xs[40:56].max() < -10.0
    assert vs.min() < 1.0                 # actually yielded
    assert xs[-1] > 30.0                  # crossed and reached the goal


def test_turn_detection_static_route():
    """Reference-path curvature → TurnLeft goal with an entry yield line;
    the turn outranks the co-located Intersection goal in the overlap
    resolution (GOAL_PRIORITY).  The reference leaves turn detection as a
    TODO (path_planner.py:320) with this heuristic hinted at :663."""
    from frenetix_tpu.io.scenario_factory import make_turn_left

    mod, sc = _behavior_module(make_turn_left)
    plan = mod.bm.PP_state.static_route_plan
    types = [g.goal_type for g in plan]
    assert "TurnLeft" in types and "PrepareTurnLeft" in types
    assert "Intersection" not in types  # lost the overlap to the turn
    g = plan[types.index("TurnLeft")]
    assert g.stop_point_s == pytest.approx(g.start_s)


def test_turn_detection_ignores_gentle_curves_and_lane_changes():
    """No Turn goals on an 80 m-radius curve (κ=0.0125 < 0.03) nor from a
    lane-change route (two short counter-signed curvature lobes — the
    heading-change filter rejects them)."""
    from frenetix_tpu.io.scenario_factory import make_curve, make_lane_change

    for maker in (make_curve, make_lane_change):
        mod, _ = _behavior_module(maker)
        types = [g.goal_type for g in mod.bm.PP_state.static_route_plan]
        assert not any("Turn" in t for t in types), (maker.__name__, types)


def test_e2e_turn_left_across_oncoming():
    """Left turn across oncoming traffic: the ego yields before the turn
    entry while the oncoming car traverses the junction, then completes
    the turn northbound."""
    from frenetix_tpu.io.scenario_factory import make_turn_left

    res, xs, ys, vs, _ = _run(make_turn_left)
    assert res.success
    # the oncoming car occupies the junction roughly t∈[25, 50]
    assert xs[25:51].max() < -10.0
    assert vs.min() < 4.0          # actually yielded
    assert ys[-1] > 30.0           # completed the turn northbound


def test_turn_right_detection_static_route():
    """Mirror of the TurnLeft detection: negative sustained curvature →
    TurnRight goal with an entry yield line."""
    from frenetix_tpu.io.scenario_factory import make_turn_right

    mod, sc = _behavior_module(make_turn_right)
    plan = mod.bm.PP_state.static_route_plan
    types = [g.goal_type for g in plan]
    assert "TurnRight" in types and "PrepareTurnRight" in types
    g = plan[types.index("TurnRight")]
    assert g.stop_point_s == pytest.approx(g.start_s)


def test_e2e_turn_right_merge_behind_through_traffic():
    """Right turn merging into a through road: the ego holds before the
    junction while the southbound through car passes the arc (it enters the
    junction ~t=25 and clears the merge point ~t=50), then merges behind it
    and completes the turn southbound."""
    from frenetix_tpu.io.scenario_factory import make_turn_right

    res, xs, ys, vs, _ = _run(make_turn_right)
    assert res.success
    assert xs[25:51].max() < -10.0   # behind the junction entry while blocked
    assert vs.min() < 4.0            # actually yielded
    assert ys[-1] < -30.0            # completed the turn southbound


def test_route_blend_double_lane_change():
    """Two chained adjacency edges in the route produce a centerline that
    ramps smoothly across both lanes (no terminal kink, no Turn misfire)."""
    from frenetix_tpu.io.scenario_factory import make_double_lane_change
    from frenetix_tpu.planner.route import reference_path_for_problem

    sc = make_double_lane_change()
    pp = list(sc.planning_problems.values())[0]
    poly, route = reference_path_for_problem(sc, pp)
    assert route == [50000, 50001, 50002]
    assert poly[:, 1].min() >= -0.01 and poly[:, 1].max() <= 7.21

    mod, _ = _behavior_module(make_double_lane_change)
    types = [g.goal_type for g in mod.bm.PP_state.static_route_plan]
    assert not any("Turn" in t for t in types), types


def test_e2e_double_lane_change():
    """Goal two lanes over: the behavior FSM executes two sequential lane
    changes (two reference-path rebuilds) and reaches the leftmost lane."""
    from frenetix_tpu.io.scenario_factory import make_double_lane_change

    res, xs, ys, vs, ref_updates = _run(make_double_lane_change)
    assert res.success
    assert ys[-1] > 6.0                    # reached the third lane
    assert len(ref_updates) >= 2           # two behavior-initiated rebuilds


def test_conflict_zone_clamps_to_first_junction():
    """A route crossing TWO intersections must be gated one junction at a
    time: a car standing in the FAR junction must not block entry into the
    near, empty one (a merged 150 m mega-zone would see it 'in the zone'
    and stall the ego forever)."""
    from frenetix_tpu.io.scenario_factory import make_double_crossing

    standing = lambda: make_double_crossing(far_traffic="standing")
    mod, sc = _behavior_module(standing)
    mod.execute(None, _Ego(-14.0, 2.0, 0), 0)
    assert mod.bm.FSM_state.intersection_clear is True

    # contrast: approaching the SECOND junction while the car stands inside
    # it → blocked there (the clamp is per-junction, not a bypass)
    mod2, _ = _behavior_module(standing)
    mod2.execute(None, _Ego(46.0, 2.0, 0), 0)
    assert mod2.bm.FSM_state.intersection_clear is False

    # a car CROSSING the far junction must not gate the near one either
    # (pre-clamp, the inflated d_clear made t_protect span both junctions
    # and the far arrival time fell inside it)
    mod3, _ = _behavior_module(make_double_crossing)
    mod3.execute(None, _Ego(-14.0, 2.0, 0), 0)
    assert mod3.bm.FSM_state.intersection_clear is True


def test_e2e_double_crossing():
    """End-to-end: traffic crossing the FAR junction only — the ego drives
    through the empty near junction without any spurious yield (a merged
    two-junction conflict zone would stop it at the near entry), and the far
    crossing clears before the ego arrives there."""
    from frenetix_tpu.io.scenario_factory import make_double_crossing

    res, xs, ys, vs, _ = _run(make_double_crossing)
    assert res.success
    assert xs[80] > 10.0      # past the near junction without waiting
    assert vs.min() > 2.0     # never yielded anywhere
    assert xs[-1] > 90.0


def test_conflict_clearance_sees_crossing_pedestrian():
    """A pedestrian walking toward the junction from a sidewalk (on NO
    lanelet) must block clearance via the radial propagation fallback — the
    lanelet successor walk cannot see it.  A standing pedestrian at the same
    spot does not block (standing traffic rule)."""
    from frenetix_tpu.io.commonroad import Obstacle, State
    from frenetix_tpu.io.scenario_factory import make_intersection_crossing

    def _with_ped(v):
        def maker():
            sc = make_intersection_crossing()
            sc.obstacles.clear()
            states = [
                State(t, np.array([5.0, -8.0 + v * 0.1 * t]), np.pi / 2, v)
                for t in range(251)
            ]
            sc.obstacles[200] = Obstacle(
                obstacle_id=200, obstacle_type="pedestrian", role="dynamic",
                length=0.36, width=0.65, initial_state=states[0],
                trajectory=states[1:],
            )
            return sc
        return maker

    mod, sc = _behavior_module(_with_ped(1.5))
    # (5, -8) lies on no lanelet: the successor walk is blind to it
    assert not sc.find_lanelets_by_position(np.array([5.0, -8.0]))
    mod.execute(None, _Ego(-14.0, 2.0, 0), 0)
    assert mod.bm.FSM_state.intersection_clear is False

    mod2, _ = _behavior_module(_with_ped(0.0))
    mod2.execute(None, _Ego(-14.0, 2.0, 0), 0)
    assert mod2.bm.FSM_state.intersection_clear is True


def test_route_blend_sparse_vertex_lanelets():
    """_blend_lane_change must project onto the neighbor POLYLINE, not its
    nearest vertex: on legal 2-vertex lanelets, vertex matching snaps every
    blend sample to an endpoint and folds the centerline back on itself."""
    from frenetix_tpu.planner.route import _blend_lane_change

    tail = np.array([[0.0, 0.0], [150.0, 0.0]])
    verts = np.array([[0.0, 3.6], [300.0, 3.6]])
    kept, blend, rest = _blend_lane_change(tail, verts)
    path = np.concatenate([p for p in (kept, blend, rest) if len(p)])
    assert (np.diff(path[:, 0]) > -1e-9).all()      # monotone forward
    assert abs(blend[-1, 1] - 3.6) < 0.2            # lands on the neighbor
    assert abs(blend[0, 1]) < 0.2                   # starts on the old lane


def test_crosswalk_in_static_route_plan():
    from frenetix_tpu.io.scenario_factory import make_crosswalk

    mod, sc = _behavior_module(make_crosswalk)
    types = [g.goal_type for g in mod.bm.PP_state.static_route_plan]
    assert "Crosswalk" in types and "PrepareCrosswalk" in types


@pytest.mark.slow
@pytest.mark.slow
def test_multiagent_behavior_planners():
    """Behavior planner + multi-agent — the combination the reference
    explicitly does not support (behavior.yaml:2 'works only without
    multiagent'): all six T-junction agents run their own behavior planner
    over a live world view (sim.world_view) and reach their goals."""
    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.sim.simulation import Simulation
    from frenetix_tpu.utils.config import load_config

    sc = load_scenario(REF_SCENARIO)
    cfg = load_config()
    cfg.dtype = "float64"
    cfg.simulation.start_multiagent = True
    cfg.behavior.use_behavior_planner = True
    sim = Simulation(sc, cfg)
    assert len(sim.agents) == 6
    assert all(a.behavior is not None for a in sim.agents)
    # the world view substitutes live peers for agent-converted obstacles
    from frenetix_tpu.sim.world_view import WorldView

    assert all(isinstance(a.behavior.bm.world, WorldView) for a in sim.agents)
    res = sim.run()
    assert res.success, res.agent_messages


def test_world_view_live_states():
    """WorldView exposes agents' executed states instead of the scenario's
    stale recorded trajectories."""
    import numpy as np

    from frenetix_tpu.io.scenario_factory import make_highway
    from frenetix_tpu.sim.simulation import Simulation
    from frenetix_tpu.sim.world_view import WorldView
    from frenetix_tpu.utils.config import FrenetixConfig

    cfg = FrenetixConfig(dtype="float64")
    cfg.simulation.start_multiagent = True
    sim = Simulation(make_highway(n_steps=40), cfg)
    ego, lead = sim.agents
    wv = WorldView(sim.scenario, sim.agents, exclude_id=ego.id)
    # the lead agent (converted from obstacle 100) appears as itself...
    assert lead.id in wv.obstacles
    # ...and its state comes from the agent record, not the recording
    st = wv.obstacles[lead.id].state_at_time(0)
    np.testing.assert_allclose(st.position, lead.record.states[0].position)
    # no future states exist for live agents
    assert wv.obstacles[lead.id].state_at_time(5) is None
    # the ego itself is excluded
    assert ego.id not in wv.obstacles


def test_behavior_log_written(tmp_path):
    """Per-agent behavior data log (the reference's BehaviorLogger.log_data)
    is written when logging is active."""
    import os

    from frenetix_tpu.io.scenario_factory import make_traffic_light
    from frenetix_tpu.sim.simulation import Simulation
    from frenetix_tpu.utils.config import FrenetixConfig

    cfg = FrenetixConfig(dtype="float64")
    cfg.behavior.use_behavior_planner = True
    sim = Simulation(make_traffic_light(), cfg, log_dir=str(tmp_path))
    sim.run()
    p = tmp_path / "60000" / "behavior_log.csv"
    assert p.is_file()
    lines = p.read_text().splitlines()
    assert len(lines) > 10
    assert lines[0].startswith("time_step;street_setting;behavior_state_static")
    # the red-light hold shows up in the log
    assert any("WaitingForGreenLight" in ln for ln in lines)


@pytest.mark.slow
def test_multiagent_behavior_batched():
    """Behavior planners + multi-agent + the fused device batch: behavior
    logic runs on host ahead of the batch (stopping-mode agents fall back to
    the host path; reference-path changes rebuild the stacked tables) and all
    six T-junction agents still succeed."""
    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.sim.simulation import Simulation
    from frenetix_tpu.utils.config import load_config

    sc = load_scenario(REF_SCENARIO)
    cfg = load_config()
    cfg.dtype = "float64"
    cfg.simulation.start_multiagent = True
    cfg.simulation.batched_device_agents = True
    cfg.behavior.use_behavior_planner = True
    res = Simulation(sc, cfg).run()
    assert res.success, res.agent_messages


def test_batched_behavior_lane_change_rebuilds_tables():
    """A behavior-initiated lane change inside the fused batch invalidates
    the stacked reference tables (the stepper is rebuilt) and the maneuver
    still completes with a second agent in the batch."""
    from frenetix_tpu.io.scenario_factory import make_lane_change
    from frenetix_tpu.sim.simulation import Simulation
    from frenetix_tpu.utils.config import FrenetixConfig
    import frenetix_tpu.parallel.batched_sim as bs

    cfg = FrenetixConfig(dtype="float64")
    cfg.behavior.use_behavior_planner = True
    cfg.simulation.start_multiagent = True
    cfg.simulation.batched_device_agents = True
    sim = Simulation(make_lane_change(with_traffic=True), cfg)

    builds = []
    orig = bs.BatchedAgentStepper.__init__

    def traced(self, *a, **k):
        builds.append(1)
        return orig(self, *a, **k)

    bs.BatchedAgentStepper.__init__ = traced
    try:
        res = sim.run()
    finally:
        bs.BatchedAgentStepper.__init__ = orig
    assert res.success, res.agent_messages
    assert len(builds) >= 2        # initial build + ref-path invalidation
    ys = np.array([s.position[1] for s in sim.agents[0].record.states])
    assert ys[-1] > 3.0            # ego finished on the left lane


def test_road_exit_in_static_route_plan():
    """An off-ramp fork produces (Prepare)RoadExit goals before the fork —
    and no Turn misfire (the ramp's curvature is far below the threshold)."""
    from frenetix_tpu.io.scenario_factory import make_road_exit

    mod, sc = _behavior_module(make_road_exit)
    plan = mod.bm.PP_state.static_route_plan
    types = [g.goal_type for g in plan]
    assert "RoadExit" in types and "PrepareRoadExit" in types
    assert not any("Turn" in t for t in types), types
    # the exit goal ends at the fork (ramp start projects to s ≈ 100 + pad)
    g = plan[types.index("RoadExit")]
    fork_s = mod.bm.PP_state.frame.project([100.0, 0.0])[0]
    assert abs(g.end_s - fork_s) < 5.0

    # a plain highway (no fork on the route) yields no RoadExit
    from frenetix_tpu.io.scenario_factory import make_highway

    mod2, _ = _behavior_module(make_highway)
    assert not any("RoadExit" in g.goal_type
                   for g in mod2.bm.PP_state.static_route_plan)


def test_e2e_road_exit():
    """End-to-end: the ego takes the off-ramp (enters the RoadExit FSM state
    on the way), ignores the car continuing on the through lane, and reaches
    the ramp goal."""
    from frenetix_tpu.io.scenario_factory import make_road_exit
    from frenetix_tpu.sim.simulation import Simulation
    from frenetix_tpu.utils.config import FrenetixConfig

    cfg = FrenetixConfig(dtype="float64")
    cfg.behavior.use_behavior_planner = True
    sim = Simulation(make_road_exit(through_v=10.0), cfg)
    agent = sim.agents[0]
    visited = set()
    orig = agent.behavior.execute

    def wrapped(preds, st, t):
        out = orig(preds, st, t)
        visited.add(agent.behavior.bm.FSM_state.behavior_state_static)
        return out

    agent.behavior.execute = wrapped
    res = sim.run()
    assert list(res.agent_status.values())[0].name == "COMPLETED_SUCCESS"
    assert {"PrepareRoadExit", "RoadExit"} <= visited, visited
    final = agent.record.states[-1].position
    assert final[1] < -4.0            # left the through road onto the ramp
