"""The fused replanning cycle: (M, 13) sampling matrix → selected trajectory.

One jit-compiled array program per cycle, replacing the reference's
`handler.evaluate_all_current_functions_concurrent(True)` OpenMP loop plus the
*serial* sorted-order collision walk (reactive_planner_cpp.py:345-374,
planner.py:329-392):

    rollout (polynomials + Frenet→Cartesian + feasibility)   ops.kinematics
    → cost stack                                             ops.costs
    → prediction collisions + road-boundary departure        ops.collision
    → masked argmin selection                                here

Selection equivalence: the reference sorts by cost and returns the first
feasible trajectory with no prediction collision and boundary_harm == 0; that
is exactly argmin(cost) over {feasible ∧ valid ∧ ¬collision ∧ on-road}, so no
sort is materialized on device.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from frenetix_tpu.ops import collision as coll
from frenetix_tpu.ops import costs as costs_mod
from frenetix_tpu.ops.costs import PredictionTensors
from frenetix_tpu.ops.kinematics import Rollout, VehicleParams, rollout_candidates

__all__ = ["CycleContext", "CycleResult", "evaluate_cycle"]

_BIG = 1e15


class CycleContext(NamedTuple):
    """Everything device-side that a cycle needs besides the sampling matrix.

    A pytree — pass straight through jit.  Scalars are traced (no re-compile on
    change); only shapes and the static flags in `evaluate_cycle` specialize
    the compilation.
    """

    ref: object                       # RefPathTable (arrays)
    veh: VehicleParams
    weights: jnp.ndarray              # (K,) in costs.COST_TERM_ORDER
    preds: PredictionTensors
    obstacle_xy: jnp.ndarray          # (O, 2) current obstacle positions
    obstacle_valid: jnp.ndarray       # (O,) bool
    corridor: jnp.ndarray             # (R, 2) drivable d_min/d_max per ref vertex
    lane_segments: jnp.ndarray        # (S, 2, 2) lanelet centerline segments
    lane_valid: jnp.ndarray           # (S,) bool
    x0_orientation: jnp.ndarray       # scalar
    desired_velocity: jnp.ndarray     # scalar
    desired_avg_velocity: jnp.ndarray  # scalar (velocity cost target)


class CycleResult(NamedTuple):
    rollout: Rollout
    cost_terms: jnp.ndarray       # (M, K)
    cost: jnp.ndarray             # (M,) weighted total
    collides: jnp.ndarray         # (M,) bool — prediction collision
    boundary_step: jnp.ndarray    # (M,) int32 — first off-road step, -1 if none
    boundary_harm: jnp.ndarray    # (M,) — log-reg harm if leaving road
    selectable: jnp.ndarray       # (M,) bool — feasible ∧ valid ∧ ¬coll ∧ on-road
    best_idx: jnp.ndarray         # () int32 — argmin cost over selectable
    found: jnp.ndarray            # () bool — any selectable candidate
    histogram: jnp.ndarray        # (11,) int32 infeasibility histogram


def _boundary_harm(v, coeff_const, coeff_speed):
    """Logistic-regression injury probability for road departure:
    p = 1/(1+exp(-(c0 + c1·Δv))) — get_protected_inj_prob_log_reg_ignore_angle
    (risk_assessment/utils/logistic_regression_symmetrical.py, used at
    planner.py:373-375)."""
    return 1.0 / (1.0 + jnp.exp(-(coeff_const + coeff_speed * v)))


@functools.partial(
    jax.jit,
    static_argnames=("dt", "n_steps", "low_vel_mode", "quintic_lon", "check_boundary",
                     "table_window", "compensated_sum"),
)
def evaluate_cycle(
    matrix: jnp.ndarray,
    valid_mask: jnp.ndarray,
    ctx: CycleContext,
    *,
    dt: float,
    n_steps: int,
    low_vel_mode: bool,
    quintic_lon: bool = False,
    check_boundary: bool = True,
    table_window: int = 768,
    compensated_sum: bool = False,
    harm_coeffs=(-7.5, 0.0815),  # log_reg complete_sym_reg defaults (harm_parameters.json)
) -> CycleResult:
    """Evaluate and select over one padded sampling matrix.

    `valid_mask` excludes padding rows (ops.sampling.pad_matrix).
    """
    ro = rollout_candidates(
        matrix,
        ctx.ref,
        ctx.veh,
        dt=dt,
        n_steps=n_steps,
        low_vel_mode=low_vel_mode,
        x0_orientation=ctx.x0_orientation,
        quintic_lon=quintic_lon,
        extra_ref_tables=ctx.corridor if check_boundary else None,
        table_window=table_window,
    )

    cost_terms = costs_mod.compute_cost_terms(
        ro,
        dt=dt,
        desired_velocity=ctx.desired_velocity,
        preds=ctx.preds,
        obstacle_xy=ctx.obstacle_xy,
        obstacle_valid=ctx.obstacle_valid,
        desired_avg_velocity=ctx.desired_avg_velocity,
        lane_segments=ctx.lane_segments if ctx.lane_segments.shape[0] else None,
        lane_valid=ctx.lane_valid,
    )
    cost = costs_mod.weighted_total(cost_terms, ctx.weights,
                                    compensated=compensated_sum)

    collides = coll.prediction_collisions(ro, ctx.preds, ctx.veh)
    if check_boundary:
        boundary_step, v_at = coll.road_departure_corridor(ro, ctx.veh)
        off_road = boundary_step >= 0
        boundary_harm = jnp.where(
            off_road, _boundary_harm(v_at, harm_coeffs[0], harm_coeffs[1]), 0.0
        )
    else:
        boundary_step = jnp.full(matrix.shape[0], -1, jnp.int32)
        boundary_harm = jnp.zeros(matrix.shape[0], matrix.dtype)
        off_road = jnp.zeros(matrix.shape[0], bool)

    selectable = ro.feasible & ro.valid & ~collides & ~off_road & valid_mask
    masked_cost = jnp.where(selectable, cost, _BIG)
    # jnp.argmin returns the FIRST minimal index — exact ties resolve to the
    # lowest candidate index deterministically (matches np.argmin and the
    # reference's stable sort order); with compensated_sum, mathematically
    # equal totals ARE exact ties (see ops.costs.weighted_total)
    best_idx = jnp.argmin(masked_cost).astype(jnp.int32)
    found = jnp.any(selectable)

    histogram = jnp.sum(ro.inf_slots & valid_mask[:, None], axis=0).astype(jnp.int32)

    return CycleResult(
        rollout=ro,
        cost_terms=cost_terms,
        cost=cost,
        collides=collides,
        boundary_step=boundary_step,
        boundary_harm=boundary_harm,
        selectable=selectable,
        best_idx=best_idx,
        found=found,
        histogram=histogram,
    )

# NOTE: round 1 carried an experimental `evaluate_cycle_from_ranges` that
# built the (M, 13) sampling matrix ON DEVICE from ~100 range scalars to
# avoid the ~2 MB matrix H2D per replan.  Removed in round 2 after
# re-measurement on the current toolchain: the fused device-side
# repeat/tile construction still compiles the downstream interp into a
# 3-4x slower configuration (262 us vs 72 us per cycle at M=34816,
# best-of-3), and the H2D it saves costs ~10 us over PCIe.  See PERF.md.
