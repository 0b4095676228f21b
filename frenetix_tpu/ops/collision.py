"""Batched collision checking: OBB–OBB vs. predicted obstacles and
drivable-area (road-boundary) containment for all candidates at once.

Replaces the C++ `pycrcc` query path of the reference:
  - `collision_check_prediction` — per-candidate TimeVariantCollisionObject
    grid queries against predicted obstacle boxes
    (/root/reference/cr_scenario_handler/utils/collision_check.py:110-200),
    with the reference's time alignment: ego step i ↔ prediction step i-1
    (the prediction TVO starts at time_step+1, collision_check.py:175).
  - `trajectories_collision_static_obstacles(..., road_boundary)` — the
    road-departure check (planner.py:362-378), whose triangulated-complement
    representation becomes a point-in-drivable-area test against per-segment
    lanelet quads.

TPU-native design: the reference walks candidates *serially* in cost order and
stops at the first non-colliding one (planner.py:329-392).  Here every
(candidate × timestep × obstacle) pair is checked in one fused computation and
selection becomes a masked argmin — same result, no serial loop.
Ego boxes are placed at the vehicle *center* (positions shifted from the rear
axle by wb_rear_axle, cf. state.shift_positions_to_center / planner.py:495-498).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "obb_overlap",
    "prediction_collisions",
    "points_in_quads",
    "road_boundary_departure",
]


def _axes(theta):
    """Unit axes of a box with heading theta: (..., 2, 2) [long axis, lat axis]."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, s], axis=-1), jnp.stack([-s, c], axis=-1)], axis=-2
    )


def obb_overlap(ca, theta_a, ha, cb, theta_b, hb):
    """Separating-axis OBB–OBB overlap test, fully broadcast.

    ca/cb: (..., 2) centers; theta: (...,) headings; ha/hb: (..., 2) half-sizes
    (half_length, half_width).  Returns (...,) bool.

    Written fully ELEMENTWISE on purpose: the natural einsum formulation
    (axes (..., 4, 2) dotted with extents) makes XLA:TPU lower a huge batch
    of 4x2 dots onto the MXU with catastrophic tile padding — profiled at
    ~70% of the device-resident sim's scan cycle (round 4).  The axis dot
    products of two axis-aligned-in-their-own-frame boxes reduce to the
    relative-rotation entries |cos dtheta| / |sin dtheta|, computed below as
    the exact same two-term products the einsum evaluated.
    """
    dx = cb[..., 0] - ca[..., 0]
    dy = cb[..., 1] - ca[..., 1]
    ac, as_ = jnp.cos(theta_a), jnp.sin(theta_a)
    bc, bs = jnp.cos(theta_b), jnp.sin(theta_b)
    al, aw = ha[..., 0], ha[..., 1]
    bl, bw = hb[..., 0], hb[..., 1]
    # |a_i . b_j| SAT entries: cd = |a1.b1| = |a2.b2|, sd = |a1.b2| = |a2.b1|
    cd = jnp.abs(ac * bc + as_ * bs)
    sd = jnp.abs(as_ * bc - ac * bs)
    separated = (
        (jnp.abs(dx * ac + dy * as_) > al + bl * cd + bw * sd)
        | (jnp.abs(dy * ac - dx * as_) > aw + bl * sd + bw * cd)
        | (jnp.abs(dx * bc + dy * bs) > bl + al * cd + aw * sd)
        | (jnp.abs(dy * bc - dx * bs) > bw + al * sd + aw * cd)
    )
    return ~separated


def ego_centers(ro, wb_rear_axle):
    """Vehicle-center positions of all candidates: planner states are at the
    rear axle; collision boxes at the center (planner.py:495-498)."""
    cx = ro.x + wb_rear_axle * jnp.cos(ro.theta_gl)
    cy = ro.y + wb_rear_axle * jnp.sin(ro.theta_gl)
    return jnp.stack([cx, cy], axis=-1)  # (M, N+1, 2)


def prediction_collisions(ro, preds, veh):
    """(M,) bool — candidate collides with any predicted obstacle box.

    Ego box at step i (i ≥ 1) vs. obstacle box at prediction step i-1, the
    alignment used by the reference's TVO construction (collision_check.py:175).
    """
    if preds.num_obstacles == 0:
        return jnp.zeros(ro.x.shape[0], bool)
    n1 = ro.x.shape[1]
    t = min(n1 - 1, preds.horizon)

    ego_c = ego_centers(ro, veh.wb_rear_axle)[:, 1 : t + 1]      # (M, t, 2)
    ego_th = ro.theta_gl[:, 1 : t + 1]
    ego_h = jnp.array([veh.length / 2.0, veh.width / 2.0], ro.x.dtype)

    obs_c = preds.means[:, :t]                                    # (O, t, 2)
    obs_th = preds.orientations[:, :t]
    obs_h = jnp.stack([preds.lengths / 2.0, preds.widths / 2.0], axis=-1)  # (O, 2)

    hit = obb_overlap(
        ego_c[:, None],                 # (M, 1, t, 2)
        ego_th[:, None],
        ego_h[None, None, None, :],
        obs_c[None],                    # (1, O, t, 2)
        obs_th[None],
        obs_h[None, :, None, :],
    )  # (M, O, t)
    hit = hit & preds.valid[None, :, :t]
    return jnp.any(hit, axis=(1, 2))


def points_in_quads(points, quads):
    """(..., 2) points × (Q, 4, 2) convex quads → (...,) bool "inside any quad".

    The quads are the per-segment cells of the lanelet strips (left/right vertex
    pairs), the TPU-side stand-in for the reference's triangulated road boundary
    (commonroad_dc create_road_boundary_obstacle, planner.py:554-565).
    """
    p = points[..., None, None, :]                     # (..., 1, 1, 2)
    a = quads                                          # (Q, 4, 2)
    b = jnp.roll(quads, -1, axis=1)
    edge = b - a                                       # (Q, 4, 2)
    rel = p - a                                        # (..., Q, 4, 2)
    cross = edge[..., 0] * rel[..., 1] - edge[..., 1] * rel[..., 0]  # (..., Q, 4)
    inside_ccw = jnp.all(cross >= 0.0, axis=-1)
    inside_cw = jnp.all(cross <= 0.0, axis=-1)
    return jnp.any(inside_ccw | inside_cw, axis=-1)


def road_departure_corridor(ro, veh):
    """Road-departure check against the drivable corridor d_min(s), d_max(s)
    (see geometry.corridor) — O(M·N) comparisons, corridor bounds already
    interpolated into `ro.extras` (tuple of two (M, N+1) arrays) by the rollout's fused table matmul.

    The ego footprint's lateral extent around its Frenet d is
    |wb_rear_axle·sin θ_cl| offset (rear-axle → center shift) ±
    (l/2·|sin θ_cl| + w/2·|cos θ_cl|).

    Returns (first_step (M,) int32, -1 if never; v_at (M,)).
    """
    m, n1 = ro.x.shape
    d_lo = ro.extras[0]
    d_hi = ro.extras[1]
    sin_t = jnp.sin(ro.theta_cl)
    cos_t = jnp.cos(ro.theta_cl)
    d_center = ro.d + veh.wb_rear_axle * sin_t
    ext = 0.5 * veh.length * jnp.abs(sin_t) + 0.5 * veh.width * jnp.abs(cos_t)
    off_road = (d_center - ext < d_lo) | (d_center + ext > d_hi)
    step = jnp.arange(n1)[None, :]
    first = jnp.min(jnp.where(off_road, step, n1), axis=1)
    never = first == n1
    first_step = jnp.where(never, -1, first).astype(jnp.int32)
    v_at = jnp.take_along_axis(ro.v, jnp.where(never, 0, first)[:, None], axis=1)[:, 0]
    return first_step, jnp.where(never, 0.0, v_at)


def road_boundary_departure(ro, veh, quads):
    """First step at which any ego-box corner leaves the drivable area.

    Returns (first_step (M,) int32 — -1 if never, v_at (M,) velocity at that
    step) — the inputs of the reference's boundary-harm computation
    (planner.py:369-378).
    """
    m, n1 = ro.x.shape
    if quads.shape[0] == 0:
        return jnp.full((m,), -1, jnp.int32), jnp.zeros((m,), ro.x.dtype)
    centers = ego_centers(ro, veh.wb_rear_axle)        # (M, N+1, 2)
    hl, hw = veh.length / 2.0, veh.width / 2.0
    signs = jnp.array([[1, 1], [1, -1], [-1, 1], [-1, -1]], ro.x.dtype)  # (4, 2)
    # elementwise corner offsets (see obb_overlap for why no einsum):
    # corner (sx, sy): sx*hl*(cos,sin) + sy*hw*(-sin,cos)
    c = jnp.cos(ro.theta_gl)[:, :, None]               # (M, N+1, 1)
    s = jnp.sin(ro.theta_gl)[:, :, None]
    sx = signs[None, None, :, 0] * hl
    sy = signs[None, None, :, 1] * hw
    offsets = jnp.stack([sx * c - sy * s, sx * s + sy * c], axis=-1)
    corners = centers[:, :, None, :] + offsets         # (M, N+1, 4, 2)
    inside = points_in_quads(corners, quads)           # (M, N+1, 4)
    off_road = jnp.any(~inside, axis=-1)               # (M, N+1)
    step = jnp.arange(n1)[None, :]
    first = jnp.min(jnp.where(off_road, step, n1), axis=1)
    never = first == n1
    first_step = jnp.where(never, -1, first).astype(jnp.int32)
    v_at = jnp.take_along_axis(ro.v, jnp.where(never, 0, first)[:, None], axis=1)[:, 0]
    return first_step, jnp.where(never, 0.0, v_at)
