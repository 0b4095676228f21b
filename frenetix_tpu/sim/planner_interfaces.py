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


def apply_behavior_output(agent, b_out) -> bool:
    """Apply one BehaviorOutput to an agent's planner — the SINGLE site for
    the reference-path swap, curvilinear reset, rear-axle stop-point shift
    and desired velocity (used by the sequential interface AND the batched
    stepper; two hand-maintained copies would silently diverge).

    Returns True if the reference path was (re)installed this call.
    """
    a = agent
    swapped = False
    if b_out.reference_path is not None \
            and b_out.reference_path is not getattr(a, "_applied_ref_path", None):
        # lane change: swap the planner's coordinate system and recompute the
        # curvilinear state on the new path (planner.py:232-237
        # set_new_ref_path).  The identity guard skips the expensive rebuild
        # when the cached per-step output is re-applied (host fallback after
        # the batched pre-pass already installed it).
        a.planner.set_reference_path(
            b_out.reference_path, a.scenario.drivable_polygons(),
            lanelets=list(a.scenario.lanelets.values())
            if a.config.cost_weights.get("lane_center_offset", 0) != 0
            else None,
        )
        a._applied_ref_path = b_out.reference_path
        a.x_cl = None
        a._goal_s = a._compute_goal_s()
        swapped = True
    a.ensure_x_cl()
    a.planner.set_desired_velocity(b_out.desired_velocity)
    # behavior stop points are vehicle-center s; the planner's curvilinear
    # state is rear-axle s — shift, or every stop ends wb_rear_axle short of
    # intent (a creeping hold at stop lines)
    a.planner.set_stop_point(
        None if b_out.stop_point_s is None
        else b_out.stop_point_s - a.veh.wb_rear_axle,
        b_out.desired_velocity_stop_point,
    )
    return swapped


@register_planner_interface
class FrenetPlannerInterface(PlannerInterface):
    """Default interface: binds the TPU ReactivePlanner to the simulation
    (the reference's FrenetPlannerInterface, frenet_interface.py:35-287)."""

    def update_planner(self, predictions, obstacle_xy, obstacle_valid):
        import numpy as np

        a = self.agent
        a.planner.set_predictions(predictions)
        a.planner.set_obstacles(obstacle_xy, obstacle_valid)
        if a.config.cost_weights.get("responsibility", 0.0) != 0.0 \
                and predictions is not None:
            # lanelet-following reach sets per obstacle (reachable_set.py)
            from frenetix_tpu.risk.reachable_set import build_reach_set_grids

            a.planner.set_reach_grid(build_reach_set_grids(
                a.scenario,
                np.asarray(predictions.means[:, 0]),
                np.asarray(predictions.orientations[:, 0]),
                np.asarray(predictions.velocities[:, 0]),
                np.asarray(predictions.lengths),
                np.asarray(predictions.widths),
                np.asarray(predictions.valid[:, 0]),
            ))
        if a.behavior is not None:
            # behavior module drives velocity, stop point AND reference path
            # (frenet_interface.py:188-205)
            b_out = a.behavior.execute(predictions, a.state, a.state.time_step)
            apply_behavior_output(a, b_out)
        else:
            a.ensure_x_cl()  # desired_velocity() projects the goal against x_cl
            a.planner.set_desired_velocity(a.desired_velocity())

    def step_interface(self):
        a = self.agent
        ra = a._rear_axle_state()
        a.ensure_x_cl()
        return a.planner.plan(ra, a.x_cl)
