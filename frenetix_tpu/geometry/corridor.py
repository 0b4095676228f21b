"""Drivable-area corridor: lateral free-space bounds along the reference path.

The reference checks road departure by querying candidate OBB trajectories
against a *triangulated complement* of the road surface in C++
(`create_road_boundary_obstacle` + `trajectories_collision_static_obstacles`,
planner.py:362-378, 554-565).  A direct TPU translation (point-in-quad tests
against every road cell) costs O(M·N·Q) — measured ~88 ms per replan on v5e.

TPU-native design: the drivable area is precomputed ON HOST as a *corridor* in
Frenet space — two tables d_min(s), d_max(s) on the reference path's uniform
s-grid (the lateral extent of the drivable-area union along each normal,
scanned outward from the path).  On device the road check then rides the same
fused table-interpolation matmul as everything else and costs O(M·N)
comparisons.  Limitation (documented): along a normal the drivable set is
approximated by the contiguous free interval containing the path point —
disconnected drivable intervals (e.g. across a median strip) are truncated,
which is conservative.
"""
from __future__ import annotations

import numpy as np

__all__ = ["strip_corridor", "corridor_from_polygons", "corridor_from_lanelets"]


def strip_corridor(ref, half_width: float) -> np.ndarray:
    """Constant ±half_width corridor (synthetic roads / benchmarks). (R, 2)."""
    r = np.asarray(ref.s).shape[0]
    out = np.empty((r, 2), dtype=np.asarray(ref.s).dtype)
    out[:, 0] = -half_width
    out[:, 1] = half_width
    return out


def _points_in_polygons(points: np.ndarray, polygons: list[np.ndarray]) -> np.ndarray:
    """Vectorized even-odd point-in-polygon union test (host, NumPy).

    points (P, 2); polygons: list of (V_i, 2) rings.  Returns (P,) bool —
    inside any polygon.
    """
    inside = np.zeros(len(points), dtype=bool)
    px = points[:, 0][:, None]
    py = points[:, 1][:, None]
    for poly in polygons:
        a = poly
        b = np.roll(poly, -1, axis=0)
        ax, ay = a[:, 0][None, :], a[:, 1][None, :]
        bx, by = b[:, 0][None, :], b[:, 1][None, :]
        cond = (ay > py) != (by > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = ax + (py - ay) * (bx - ax) / (by - ay)
        crossings = cond & (px < x_int)
        inside |= (np.sum(crossings, axis=1) % 2) == 1
    return inside


def corridor_from_polygons(
    ref,
    polygons: list[np.ndarray],
    *,
    d_max: float = 8.0,
    d_step: float = 0.25,
) -> np.ndarray:
    """Scan the drivable-area union along each reference-path normal.

    For every table vertex, samples d ∈ [-d_max, d_max] at `d_step` and takes
    the contiguous free interval around d=0 (expanded by d_step/2 so the bound
    sits between the last free and first blocked sample).  Returns (R, 2)
    [d_min, d_max] per vertex; vertices whose path point is itself off the
    drivable area get a degenerate [0, 0] corridor.
    """
    xy = np.asarray(ref.xy, dtype=np.float64)
    theta = np.asarray(ref.theta, dtype=np.float64)

    # native fast path (~200x; see native/host_geometry.cc)
    from frenetix_tpu import native

    out_native = native.corridor_scan(xy, theta, polygons, d_max=d_max, d_step=d_step)
    if out_native is not None:
        return out_native.astype(np.asarray(ref.s).dtype)

    r = xy.shape[0]
    normals = np.stack([-np.sin(theta), np.cos(theta)], axis=1)  # (R, 2)

    d_samples = np.arange(-d_max, d_max + d_step / 2, d_step)  # (K,)
    k = len(d_samples)
    pts = xy[:, None, :] + d_samples[None, :, None] * normals[:, None, :]
    inside = _points_in_polygons(pts.reshape(-1, 2), polygons).reshape(r, k)

    zero_idx = int(np.argmin(np.abs(d_samples)))
    out = np.zeros((r, 2), dtype=np.asarray(ref.s).dtype)
    for i in range(r):
        row = inside[i]
        if not row[zero_idx]:
            continue  # path point off-road → degenerate corridor
        lo = zero_idx
        while lo > 0 and row[lo - 1]:
            lo -= 1
        hi = zero_idx
        while hi < k - 1 and row[hi + 1]:
            hi += 1
        out[i, 0] = d_samples[lo] - d_step / 2
        out[i, 1] = d_samples[hi] + d_step / 2
    return out


def corridor_from_lanelets(ref, lanelets, **kw) -> np.ndarray:
    """Corridor from lanelet strips: each lanelet polygon is its left-vertex
    chain + reversed right-vertex chain."""
    polys = []
    for ll in lanelets:
        left = np.asarray(ll.left_vertices, dtype=np.float64)
        right = np.asarray(ll.right_vertices, dtype=np.float64)
        polys.append(np.concatenate([left, right[::-1]], axis=0))
    return corridor_from_polygons(ref, polys, **kw)
