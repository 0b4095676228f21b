"""Behavior planning: hierarchical FSM, path planner (reference-path
modification for lane changes), static route plan, TTC/MAX velocity planning,
stop points.  Mirrors /root/reference/behavior_planner/."""

from frenetix_tpu.behavior.behavior_module import (  # noqa: F401
    BehaviorModule, BehaviorOutput, BMState,
)
from frenetix_tpu.behavior.fsm import EgoFSM, FSMState  # noqa: F401
from frenetix_tpu.behavior.static_route import (  # noqa: F401
    StaticGoal, build_static_route_plan,
)
from frenetix_tpu.behavior.velocity_planner import VelocityPlanner  # noqa: F401
from frenetix_tpu.behavior.path_planner import PathPlanner  # noqa: F401
