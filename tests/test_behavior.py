"""Behavior planner: FSM transitions, TTC following, stop points."""
import numpy as np


class _Ego:
    def __init__(self, x, v, t=0):
        self.position = np.array([x, 0.0])
        self.orientation = 0.0
        self.velocity = v
        self.time_step = t


def _module(scenario, goal_s=200.0):
    from frenetix_tpu.behavior import BehaviorModule
    from frenetix_tpu.geometry.refpath import polyline_pathlength

    xy = np.stack([np.linspace(0, 250, 250), np.zeros(250)], axis=1)
    pp = list(scenario.planning_problems.values())[0]
    return BehaviorModule(scenario, pp, polyline_pathlength(xy), xy, goal_s)


def test_vehicle_following_reduces_speed():
    from frenetix_tpu.behavior.behavior_module import BehaviorState
    from frenetix_tpu.io.scenario_factory import make_highway

    sc = make_highway(lead_v=6.0, lead_gap=15.0)  # close slow lead
    mod = _module(sc)
    out = mod.execute({}, _Ego(0.0, 14.0), 0)
    assert mod.state == BehaviorState.VEHICLE_FOLLOWING
    assert out.desired_velocity < 10.0  # pulled toward the lead's speed

    # far lead → free lane following at the limit envelope
    sc2 = make_highway(lead_v=6.0, lead_gap=150.0)
    mod2 = _module(sc2, goal_s=1000.0)
    out2 = mod2.execute({}, _Ego(0.0, 14.0), 0)
    assert out2.desired_velocity > out.desired_velocity


def test_goal_approach_and_stop_point():
    from frenetix_tpu.behavior.behavior_module import BehaviorState
    from frenetix_tpu.io.scenario_factory import make_highway

    sc = make_highway(lead_gap=500.0)
    # goal with a near-zero velocity interval close ahead → STOPPING
    pp = list(sc.planning_problems.values())[0]
    pp.goals[0].velocity_interval = (0.0, 1.0)
    mod = _module(sc, goal_s=30.0)
    out = mod.execute({}, _Ego(15.0, 10.0), 0)
    assert mod.state == BehaviorState.STOPPING
    assert out.stop_point_s is not None
    assert out.desired_velocity < 10.0  # comfortable-deceleration envelope
