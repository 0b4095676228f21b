"""Behavior planning: maneuver FSM, TTC velocity planning, stop points."""

from frenetix_tpu.behavior.behavior_module import (  # noqa: F401
    BehaviorModule, BehaviorOutput, BehaviorState,
)
