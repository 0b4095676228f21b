"""Planner-interface plugin registry.

Parity with the reference's extension point
(`cr_scenario_handler/planner_interfaces/planner_interface.py:13-88` +
`__init__.py` glob-import discovery): any registered `PlannerInterface`
subclass is selectable by class name through
`config.simulation.used_planner_interface` (simulation.yaml:9), so third-party
planners can drop in without touching the Agent lifecycle.

`FrenetPlannerInterface` is the default: it owns the per-replan planner
feeding (predictions/obstacles/velocity/stop points → `ReactivePlanner.plan`).
"""
from __future__ import annotations

from abc import ABC, abstractmethod

__all__ = [
    "PlannerInterface",
    "FrenetPlannerInterface",
    "register_planner_interface",
    "get_planner_interface",
    "PLANNER_INTERFACES",
]

PLANNER_INTERFACES: dict = {}


def register_planner_interface(cls):
    """Class decorator: registers by class name (the reference discovers
    subclasses by reflection over the package, agent.py:104-114)."""
    PLANNER_INTERFACES[cls.__name__] = cls
    return cls


def get_planner_interface(name: str):
    if name not in PLANNER_INTERFACES:
        raise KeyError(
            f"unknown planner interface {name!r}; registered: "
            f"{sorted(PLANNER_INTERFACES)}"
        )
    return PLANNER_INTERFACES[name]


class PlannerInterface(ABC):
    """Adapter between the Agent lifecycle and a planner implementation
    (planner_interface.py:13-88)."""

    def __init__(self, agent):
        self.agent = agent

    @abstractmethod
    def update_planner(self, predictions, obstacle_xy, obstacle_valid):
        """Feed per-cycle external information into the planner."""

    @abstractmethod
    def step_interface(self):
        """Run one replanning cycle; returns the selected plan or None."""


@register_planner_interface
class FrenetPlannerInterface(PlannerInterface):
    """Default interface: binds the TPU ReactivePlanner to the simulation
    (the reference's FrenetPlannerInterface, frenet_interface.py:35-287)."""

    def update_planner(self, predictions, obstacle_xy, obstacle_valid):
        a = self.agent
        a.ensure_x_cl()  # desired_velocity() projects the goal against x_cl
        a.planner.set_predictions(predictions)
        a.planner.set_obstacles(obstacle_xy, obstacle_valid)
        if a.behavior is not None:
            b_out = a.behavior.execute(predictions, a.state, a.state.time_step)
            a.planner.set_desired_velocity(
                min(b_out.desired_velocity, a.desired_velocity())
            )
            a.planner.set_stop_point(
                b_out.stop_point_s, b_out.desired_velocity_stop_point
            )
        else:
            a.planner.set_desired_velocity(a.desired_velocity())

    def step_interface(self):
        a = self.agent
        ra = a._rear_axle_state()
        a.ensure_x_cl()
        return a.planner.plan(ra, a.x_cl)
