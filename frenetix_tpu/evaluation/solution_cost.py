"""CommonRoad benchmark cost evaluation for solution trajectories.

The reference submits solutions under `CostFunction.WX1`
(`/root/reference/cr_scenario_handler/evaluation/agent_evaluation.py:52`)
and the CommonRoad benchmark catalog defines each cost function as a
weighted sum of partial costs over the executed trajectory.  The partial
costs below are the standard published integrals (trapezoid-discretized
over the state sequence); the combination weights are transcribed from the
public cost-function catalog to the best fidelity available in this
offline environment and are overridable per call for exact competition
submission.

Partial costs (states: position/orientation/velocity/steering_angle at dt):
  time             t_f − t_0
  path_length      ∫ v dt
  acceleration     ∫ a² dt          (a from finite-differenced v)
  jerk             ∫ j² dt          (j from finite-differenced a)
  steering_angle   ∫ δ² dt
  steering_rate    ∫ δ̇² dt
  yaw_rate         ∫ ψ̇² dt
  velocity_offset  ∫ (v − v_des)² dt
"""
from __future__ import annotations

import numpy as np

__all__ = ["partial_costs", "benchmark_cost", "COST_COMBINATIONS"]

# transcribed combination weights (see module docstring).  ESTIMATED: the
# official CommonRoad cost catalog (commonroad-drivability-checker
# `costs/evaluation.py`) is not available in this offline environment, so
# these transcriptions cannot be pinned against it — every output of
# `benchmark_cost` carries `weights_estimated=True` and the solution XML
# stamps the weight set used (io/solution_writer.py `cost_weights` attr).
# Exact competition weights can be passed via the `weights=` override.
COST_COMBINATIONS = {
    "JB1": {"jerk": 1.0, "time": 1.0},
    "WX1": {"time": 10.0, "velocity_offset": 1.0,
            "acceleration": 0.1, "steering_rate": 0.1},
    "SA1": {"steering_angle": 0.1, "steering_rate": 0.1, "path_length": 1.0},
    "SM1": {"acceleration": 50.0, "velocity_offset": 20.0,
            "steering_rate": 50.0, "time": 1.0},
}

# True until the transcription is verified against the published catalog
COST_WEIGHTS_ESTIMATED = True


def partial_costs(states, dt: float, desired_velocity: float | None = None
                  ) -> dict:
    """All partial costs of one executed trajectory (center-frame states)."""
    n = len(states)
    if n < 2:
        return {k: 0.0 for k in ("time", "path_length", "acceleration",
                                 "jerk", "steering_angle", "steering_rate",
                                 "yaw_rate", "velocity_offset")}
    v = np.array([s.velocity for s in states], float)
    th = np.array([s.orientation for s in states], float)
    delta = np.array([getattr(s, "steering_angle", 0.0) for s in states],
                     float)
    a = np.gradient(v, dt)
    j = np.gradient(a, dt)
    dth = np.diff(th)
    dth = (dth + np.pi) % (2 * np.pi) - np.pi
    yaw_rate = dth / dt
    delta_rate = np.diff(delta) / dt
    if desired_velocity is None:
        desired_velocity = float(v[-1])

    def integ(x2):
        return float(np.trapezoid(x2, dx=dt))

    return {
        "time": (n - 1) * dt,
        "path_length": integ(np.abs(v)),
        "acceleration": integ(a ** 2),
        "jerk": integ(j ** 2),
        "steering_angle": integ(delta ** 2),
        "steering_rate": float(np.sum(delta_rate ** 2) * dt),
        "yaw_rate": float(np.sum(yaw_rate ** 2) * dt),
        "velocity_offset": integ((v - desired_velocity) ** 2),
    }


def benchmark_cost(states, dt: float, cost_function: str = "WX1", *,
                   desired_velocity: float | None = None,
                   weights: dict | None = None) -> dict:
    """Total benchmark cost + its partial breakdown.

    `weights` overrides the transcribed combination (exact submission
    weights can be supplied without code changes)."""
    w = dict(COST_COMBINATIONS.get(cost_function, {}))
    if weights:
        w.update(weights)
    if not w:
        raise ValueError(f"unknown cost function {cost_function!r} and no "
                         f"explicit weights given")
    parts = partial_costs(states, dt, desired_velocity)
    total = sum(wk * parts[k] for k, wk in w.items())
    return {"cost_function": cost_function, "total": float(total),
            "weights": w, "partial": parts,
            # False only when every active weight was supplied explicitly
            "weights_estimated": COST_WEIGHTS_ESTIMATED and any(
                k not in (weights or {}) for k in w)}
