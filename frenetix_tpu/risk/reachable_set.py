"""Reachable sets for responsibility assessment.

Behavioral spec: `ReachSet` + `ReachSetSimple` / `simple_reachable_set`
(/root/reference/frenetix_motion_planner/utility/reachable_set.py:13-528,
reachable_set_simple.py:9-555) + the reach-set responsibility check
(`calc_responsibility_reach_set`, responsibility.py:6-54): per obstacle and
future time t, an over-approximating occupancy — the SPOT hexagon (Koschi &
Althoff) in the obstacle's heading frame, intersected with the lanelets the
obstacle can follow (laterally adjacent lanes + successor recursion to a
depth, reachable_set.py:201-305).  If the ego's planned position at t lies
OUTSIDE every obstacle's reach set, that obstacle cannot cause the conflict
and its risk is subtracted from the responsibility cost.

TPU-native design: the reference intersects pygeos polygon unions per
obstacle per step.  Here each obstacle's reach set is rasterized ONCE per
cycle on host into a small occupancy grid (O, T, G, G) — hexagon membership
is closed-form, lanelet membership is a vectorized point-in-polygon over the
successor-closure lanelets — and the per-candidate test on device is a pure
gather over (M × O × N) points: no polygon booleans anywhere near the hot
path.  The sector-annulus fallback (`reach_set_params`/`point_in_reach_set`)
is retained for scenarios without lanelet context.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "reach_set_params",
    "point_in_reach_set",
    "responsibility_reach_set",
    "spot_hexagon_params",
    "hexagon_contains",
    "reachable_lanelet_ids",
    "point_in_lanelet_reach_set",
    "ReachSetGrid",
    "build_reach_set_grids",
    "points_in_reach_grids",
    "responsibility_reach_grid",
    "LaneletTensors",
    "lanelet_tensors",
    "build_reach_set_grids_device",
]


# ---------------------------------------------------------------------------
# SPOT hexagon (reachable_set_simple.py:220-292, 421-555)
# ---------------------------------------------------------------------------


def spot_hexagon_params(v0: float, dt_rs: float, t_max: float, a_max: float):
    """Per-step hexagon parameters: (c, bx, r, rear) each (T+1,).

    c   = v·t                      (cv_model, :220-238)
    bx  = v·t − a²t³/(2v), capped  (bx_boundary, Althoff Eq. 4, :241-274)
    r   = a·t²/2                   (calc_acc_rad, :277-291)
    rear= running max of c_t − r_t (the no-driving-backwards clamp,
                                    calc_vertices :529-538)
    """
    v = max(float(v0), 0.01)
    t = np.arange(0.0, t_max + dt_rs / 2, dt_rs)
    c = v * t
    t_bmax = np.sqrt(2.0 / 3.0) * v / a_max
    bx_max = v * t_bmax - a_max**2 * t_bmax**3 / (2 * v)
    bx = v * t - a_max**2 * np.power(t, 3) / (2 * v)
    bx[t > t_bmax] = bx_max
    r = 0.5 * a_max * t**2
    rear = np.maximum.accumulate(c - r)
    return c, bx, r, rear


def hexagon_contains(points_local: np.ndarray, j: int, params, length: float,
                     width: float) -> np.ndarray:
    """(P,) bool — membership in the step-j hexagon (+ vehicle half-dims).

    Vertices (calc_vertices, reachable_set_simple.py:504-555): between the
    rear (c_t − r_t, clamped) and b_t the half-width ramps from r_t to r_t1;
    between b_t and the front (c_t1 + r_t1) it is r_t1.
    """
    c, bx, r, rear_run = params
    if j > 0:
        r_t, c_t, b_t = r[j - 1], c[j - 1], bx[j - 1]
    else:
        r_t = c_t = b_t = 0.0
    r_t1, c_t1 = r[j], c[j]
    rear = rear_run[j - 1] if j > 0 else c_t - r_t

    L, W = length / 2.0, width / 2.0
    x = points_local[:, 0]
    y = np.abs(points_local[:, 1])

    x_lo = rear - L
    x_hi = c_t1 + r_t1 + L
    # lateral half-width profile: ramp (rear → b_t), then flat r_t1
    denom = max(b_t - rear, 1e-9)
    ramp = r_t + (r_t1 - r_t) * np.clip((x - rear) / denom, 0.0, 1.0)
    half_w = np.where(x >= b_t, r_t1, ramp) + W
    return (x >= x_lo) & (x <= x_hi) & (y <= half_w)


# ---------------------------------------------------------------------------
# lanelet closure (reachable_set.py:201-305)
# ---------------------------------------------------------------------------


def _parallel_lanelets(scenario, lanelet_id: int) -> list[int]:
    """Laterally adjacent same-direction lanelets (reachable_set.py:250-288)."""
    out = [lanelet_id]
    cur = scenario.lanelets.get(lanelet_id)
    while cur is not None and cur.adj_left is not None and cur.adj_left_same_direction:
        out.append(cur.adj_left)
        cur = scenario.lanelets.get(cur.adj_left)
    cur = scenario.lanelets.get(lanelet_id)
    while cur is not None and cur.adj_right is not None and cur.adj_right_same_direction:
        out.append(cur.adj_right)
        cur = scenario.lanelets.get(cur.adj_right)
    return [l for l in out if l in scenario.lanelets]


def reachable_lanelet_ids(scenario, start_ids, depth: int = 3) -> set:
    """Closure of parallels + successors up to `depth` levels
    (_calc_bounds_rec with lateral=True, reachable_set.py:201-248)."""
    frontier = set()
    for lid in start_ids:
        frontier.update(_parallel_lanelets(scenario, lid))
    seen = set(frontier)
    for _ in range(depth):
        nxt = set()
        for lid in frontier:
            ll = scenario.lanelets.get(lid)
            if ll is None:
                continue
            for suc in ll.successors:
                for p in _parallel_lanelets(scenario, suc):
                    if p not in seen:
                        nxt.add(p)
        seen |= nxt
        frontier = nxt
        if not frontier:
            break
    return seen


def _points_in_rings(points: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """(P,) bool — even-odd membership in ANY of the polygon rings.

    Hot on the grid-raster path (4096 cells × the lanelet closure's rings per
    obstacle per step — ~80% of build_reach_set_grids); the native C++ kernel
    (native/host_geometry.cc points_in_polygons) does it ~25× faster, with
    this vectorized NumPy fallback when the .so isn't built."""
    from frenetix_tpu import native

    if native.available():
        return native.points_in_polygons(points, rings)
    inside = np.zeros(len(points), bool)
    px, py = points[:, 0], points[:, 1]
    for ring in rings:
        a = ring
        b = np.roll(ring, -1, axis=0)
        cond = (a[None, :, 1] > py[:, None]) != (b[None, :, 1] > py[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            x_int = a[None, :, 0] + (py[:, None] - a[None, :, 1]) * (
                (b[None, :, 0] - a[None, :, 0]) / (b[None, :, 1] - a[None, :, 1])
            )
        hits = np.sum(cond & (px[:, None] < x_int), axis=1)
        inside |= (hits % 2).astype(bool)
    return inside


def point_in_lanelet_reach_set(points: np.ndarray, j: int, *, position,
                               orientation, velocity, length, width,
                               lanelet_rings, dt_rs=0.2, t_max=2.0, a_max=8.0,
                               params=None) -> np.ndarray:
    """HOST reference implementation (the differential-test oracle): exact
    hexagon ∩ lanelet-union membership for arbitrary points at step j —
    semantically `pygeos.intersection(srs_t, patch)` + containment
    (reachable_set_simple.py:88-101)."""
    if params is None:
        params = spot_hexagon_params(velocity, dt_rs, t_max, a_max)
    d = np.atleast_2d(points) - np.asarray(position)[None]
    c, s = np.cos(-orientation), np.sin(-orientation)
    local = np.stack([c * d[:, 0] - s * d[:, 1], s * d[:, 0] + c * d[:, 1]], axis=1)
    in_hex = hexagon_contains(local, j, params, length, width)
    if lanelet_rings:
        in_lane = _points_in_rings(np.atleast_2d(points), lanelet_rings)
    else:
        in_lane = np.ones(len(local), bool)
    return in_hex & in_lane


# ---------------------------------------------------------------------------
# rasterized grids + device gather
# ---------------------------------------------------------------------------


class ReachSetGrid(NamedTuple):
    """Per-obstacle occupancy grids, device-shippable.

    occupancy[o, t, i, j] — cell (i, j) of obstacle o's grid is reachable at
    reach-set step t.  Grid cell (i, j) covers world position
    origin[o] + (i − G/2 + 0.5, j − G/2 + 0.5) · cell[o].  The cell size is
    per-obstacle: it grows with the obstacle's speed so the grid always
    covers the full t_max reach (a fixed extent would silently truncate fast
    obstacles' reach sets and wrongly subtract their risk).
    """

    origin: jnp.ndarray      # (O, 2) grid centers (obstacle positions)
    occupancy: jnp.ndarray   # (O, T_rs, G, G) bool
    valid: jnp.ndarray       # (O,) bool
    cell: jnp.ndarray        # (O,) meters per cell
    dt_rs: float


def build_reach_set_grids(
    scenario,
    positions,
    orientations,
    velocities,
    lengths,
    widths,
    valid,
    *,
    dt_rs: float = 0.2,
    t_max: float = 2.0,
    a_max: float = 8.0,
    depth: int = 3,
    grid_n: int = 64,
    cell: float = 1.5,
) -> ReachSetGrid:
    """Rasterize every obstacle's lanelet-following reach set (host NumPy).

    Defaults mirror reachable_set.json / the fallback params
    (reachable_set.py:46-52: dt 0.2, t_max 2, a_max 8, depth 3).
    """
    o = len(positions)
    t_steps = len(np.arange(0.0, t_max + dt_rs / 2, dt_rs))
    occ = np.zeros((o, t_steps, grid_n, grid_n), bool)
    cells = np.full(o, float(cell))

    # unit cell centers in grid-local coordinates, (G*G, 2)
    axis = np.arange(grid_n) - grid_n / 2 + 0.5
    gx, gy = np.meshgrid(axis, axis, indexing="ij")
    unit_cells = np.stack([gx.ravel(), gy.ravel()], axis=1)

    for k in range(o):
        if not valid[k]:
            continue
        pos = np.asarray(positions[k], dtype=np.float64)
        # per-obstacle cell size: the grid half-extent must cover the full
        # t_max reach (v·t + a·t²/2 + vehicle length + margin)
        reach = (max(float(velocities[k]), 0.0) * t_max
                 + 0.5 * a_max * t_max**2 + float(lengths[k]) + 2.0)
        cells[k] = max(float(cell), 2.0 * reach / grid_n)
        cells_world = unit_cells * cells[k] + pos[None]

        # lanelet closure of the obstacle's current lanelet(s)
        start_ids = scenario.find_lanelets_by_position(pos) if scenario else []
        if start_ids:
            ids = reachable_lanelet_ids(scenario, start_ids, depth)
            rings = [scenario.lanelets[l].polygon for l in ids]
            in_lane = _points_in_rings(cells_world, rings)
        else:
            in_lane = np.ones(len(cells_world), bool)  # off-network: hexagon only

        params = spot_hexagon_params(velocities[k], dt_rs, t_max, a_max)
        th = float(orientations[k])
        c, s = np.cos(-th), np.sin(-th)
        d = cells_world - pos[None]
        local = np.stack([c * d[:, 0] - s * d[:, 1], s * d[:, 0] + c * d[:, 1]], axis=1)
        # hexagon test only on the in-lane cells (typically ~15% of the grid)
        idx = np.where(in_lane)[0]
        loc = local[idx]
        for j in range(t_steps):
            plane = occ[k, j].reshape(-1)
            plane[idx] = hexagon_contains(loc, j, params, lengths[k], widths[k])

    return ReachSetGrid(
        origin=jnp.asarray(np.asarray(positions, dtype=np.float64)),
        occupancy=jnp.asarray(occ),
        valid=jnp.asarray(np.asarray(valid, bool)),
        cell=jnp.asarray(cells),
        dt_rs=float(dt_rs),
    )


def points_in_reach_grids(points, step_idx, grid: ReachSetGrid):
    """Device gather: points (..., N, 2) + step_idx (N,) → (..., O, N) bool.

    Out-of-grid points are unreachable.  Pure gathers — batched over
    candidates × obstacles × timesteps.
    """
    g = grid.occupancy.shape[-1]
    t_rs = grid.occupancy.shape[1]
    step_idx = jnp.clip(step_idx, 0, t_rs - 1)
    rel = points[..., None, :, :] - grid.origin[:, None, :]      # (..., O, N, 2)
    cell = jnp.asarray(grid.cell).reshape(-1)[:, None, None]     # (O, 1, 1)
    ij = jnp.floor(rel / cell + g / 2.0).astype(jnp.int32)       # (..., O, N, 2)
    inb = jnp.all((ij >= 0) & (ij < g), axis=-1)
    i = jnp.clip(ij[..., 0], 0, g - 1)
    j = jnp.clip(ij[..., 1], 0, g - 1)
    # flat gather over (O, T, G·G): vals[..., o, n] =
    # occupancy[o, step_idx[n], i, j] via broadcasted advanced indexing
    o_idx = jnp.arange(grid.origin.shape[0])
    flat = grid.occupancy.reshape(grid.origin.shape[0], t_rs, g * g)
    cell_flat = i * g + j                                        # (..., O, N)
    vals = flat[o_idx[:, None], step_idx[None, :], cell_flat]
    return vals & inb & grid.valid[:, None]


def responsibility_reach_grid(ro, grid: ReachSetGrid, risks, dt: float):
    """(M,) responsibility cost via lanelet reach sets: obstacles whose reach
    set never contains the ego trajectory carry their own risk
    (responsibility.py:36-53 semantics; replaces the sector-annulus
    `responsibility_reach_set` when lanelet context is available)."""
    m, n1 = ro.x.shape
    o = grid.origin.shape[0]
    if o == 0:
        return jnp.zeros(m, ro.x.dtype)
    n = n1 - 1
    ego = jnp.stack([ro.x[:, 1:], ro.y[:, 1:]], axis=-1)         # (M, N, 2)
    step_idx = jnp.round(jnp.arange(1, n + 1) * dt / grid.dt_rs).astype(jnp.int32)
    inside = points_in_reach_grids(ego, step_idx, grid)           # (M, O, N)
    ever_inside = jnp.any(inside, axis=2)                         # (M, O)
    resp = jnp.where(ever_inside, 0.0, 1.0) * risks.obst_present[None, :]
    return -jnp.sum(resp * risks.obst_risk_per_obst, axis=1)


# ---------------------------------------------------------------------------
# device-side grid builder (live peer-agent reach sets inside lax.scan)
# ---------------------------------------------------------------------------


class LaneletTensors(NamedTuple):
    """Static per-scenario lanelet geometry, device-shippable — the inputs the
    reach-grid builder needs to run ON DEVICE (so peer-agent grids can be
    built from live poses inside the simulation scan).

    rings are padded to a common vertex count by repeating the last vertex
    (degenerate edges add no even-odd crossings; the roll-closure edge stays
    last→first).  `closure[l]` is the boolean row of lanelets reachable from
    start lanelet l (parallels + successor recursion, `reachable_lanelet_ids`
    with a single start) — the closure of a multi-lanelet position is the OR
    of its start rows (BFS from a union of sources ≡ union of BFSs at equal
    depth)."""

    rings: jnp.ndarray       # (L, E, 2)
    ring_valid: jnp.ndarray  # (L,)
    closure: jnp.ndarray     # (L, L) bool — closure[start, member]


def lanelet_tensors(scenario, depth: int = 3, dtype=np.float64) -> LaneletTensors:
    """Host precompute of `LaneletTensors` (cached per scenario+depth)."""
    key = ("_lanelet_tensors_cache", depth, np.dtype(dtype).str)
    cached = getattr(scenario, "_lanelet_tensors_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    ids = list(scenario.lanelets) if scenario is not None else []
    l_n = len(ids) or 1
    e_max = max((len(scenario.lanelets[i].polygon) for i in ids), default=3) or 3
    rings = np.zeros((l_n, e_max, 2), dtype)
    ring_valid = np.zeros(l_n, bool)
    closure = np.zeros((l_n, l_n), bool)
    index = {lid: k for k, lid in enumerate(ids)}
    for k, lid in enumerate(ids):
        ring = np.asarray(scenario.lanelets[lid].polygon, dtype)
        rings[k, : len(ring)] = ring
        rings[k, len(ring):] = ring[-1]
        ring_valid[k] = True
        for member in reachable_lanelet_ids(scenario, [lid], depth):
            closure[k, index[member]] = True
    out = LaneletTensors(
        rings=jnp.asarray(rings),
        ring_valid=jnp.asarray(ring_valid),
        closure=jnp.asarray(closure),
    )
    if scenario is not None:
        try:
            scenario._lanelet_tensors_cache = (key, out)
        except Exception:
            pass
    return out


def _one_reach_grid_device(pos, th, v, length, width, valid, lane: LaneletTensors,
                           *, dt_rs, t_max, a_max, grid_n, cell, t_steps):
    """One obstacle's rasterized reach grid, pure jnp — the device twin of
    the host loop body in `build_reach_set_grids` (bit-matching formulas and
    evaluation order at equal dtype; the differential test pins exact
    equality on float64).  Returns (origin (2,), occupancy (T, G, G),
    cell ())."""
    import jax

    dtype = pos.dtype
    reach = (jnp.maximum(v, 0.0) * t_max + 0.5 * a_max * t_max ** 2
             + length + 2.0)
    cell_o = jnp.maximum(jnp.asarray(cell, dtype), 2.0 * reach / grid_n)
    # invalid rows keep the default cell size (the host builder skips them)
    cell_o = jnp.where(valid, cell_o, jnp.asarray(cell, dtype))

    axis = jnp.arange(grid_n, dtype=dtype) - grid_n / 2 + 0.5
    gx, gy = jnp.meshgrid(axis, axis, indexing="ij")
    unit = jnp.stack([gx.ravel(), gy.ravel()], axis=1)           # (P, 2)
    cells_world = unit * cell_o + pos[None]

    # ---- start lanelets: io.commonroad._point_in_ring semantics ----------
    a = lane.rings                                               # (L, E, 2)
    b = jnp.roll(lane.rings, -1, axis=1)
    cond0 = (a[..., 1] > pos[1]) != (b[..., 1] > pos[1])
    x0 = a[..., 0] + (pos[1] - a[..., 1]) * (b[..., 0] - a[..., 0]) / (
        b[..., 1] - a[..., 1])
    start = ((jnp.sum(cond0 & (pos[0] < x0), axis=1) % 2).astype(bool)
             & lane.ring_valid)
    any_start = jnp.any(start)
    closure_lanes = jnp.any(lane.closure & start[:, None], axis=0)  # (L,)

    # ---- cell membership in the closure union: _points_in_rings grouping --
    px = cells_world[:, 0][:, None, None]                        # (P, 1, 1)
    py = cells_world[:, 1][:, None, None]
    cond = (a[None, ..., 1] > py) != (b[None, ..., 1] > py)      # (P, L, E)
    x_int = a[None, ..., 0] + (py - a[None, ..., 1]) * (
        (b[..., 0] - a[..., 0]) / (b[..., 1] - a[..., 1]))[None]
    hits = jnp.sum(cond & (px < x_int), axis=-1)                 # (P, L)
    in_ring = (hits % 2).astype(bool) & closure_lanes[None]
    in_lane = jnp.where(any_start, jnp.any(in_ring, axis=1), True)  # (P,)

    # ---- SPOT hexagon, all steps at once (spot_hexagon_params +
    #      hexagon_contains, vectorized over j) --------------------------
    vv = jnp.maximum(v, 0.01)
    t = jnp.arange(t_steps, dtype=dtype) * dt_rs
    c_arr = vv * t
    t_bmax = jnp.sqrt(jnp.asarray(2.0 / 3.0, dtype)) * vv / a_max
    bx_max = vv * t_bmax - a_max ** 2 * t_bmax ** 3 / (2 * vv)
    bx = vv * t - a_max ** 2 * t ** 3 / (2 * vv)
    bx = jnp.where(t > t_bmax, bx_max, bx)
    r = 0.5 * a_max * t ** 2
    rear_run = jax.lax.cummax(c_arr - r)

    def prev(arr):
        return jnp.concatenate([jnp.zeros(1, dtype), arr[:-1]])

    r_prev, b_prev, rear_prev = prev(r), prev(bx), prev(rear_run)

    cth, sth = jnp.cos(-th), jnp.sin(-th)
    d = cells_world - pos[None]
    x = cth * d[:, 0] - sth * d[:, 1]                            # (P,)
    y = jnp.abs(sth * d[:, 0] + cth * d[:, 1])

    l2, w2 = length / 2.0, width / 2.0
    x_lo = (rear_prev - l2)[:, None]                             # (T, 1)
    x_hi = (c_arr + r + l2)[:, None]
    denom = jnp.maximum(b_prev - rear_prev, 1e-9)[:, None]
    ramp = r_prev[:, None] + (r - r_prev)[:, None] * jnp.clip(
        (x[None, :] - rear_prev[:, None]) / denom, 0.0, 1.0)
    half_w = jnp.where(x[None, :] >= b_prev[:, None], r[:, None], ramp) + w2
    in_hex = ((x[None, :] >= x_lo) & (x[None, :] <= x_hi)
              & (y[None, :] <= half_w))                          # (T, P)

    occ = (in_hex & in_lane[None] & valid).reshape(t_steps, grid_n, grid_n)
    return pos, occ, cell_o


def build_reach_set_grids_device(
    positions, orientations, velocities, lengths, widths, valid,
    lane: LaneletTensors,
    *,
    dt_rs: float = 0.2,
    t_max: float = 2.0,
    a_max: float = 8.0,
    grid_n: int = 64,
    cell: float = 1.5,
) -> ReachSetGrid:
    """`build_reach_set_grids` ON DEVICE — pure jnp, jit/vmap/scan-safe.

    This is what makes multi-agent responsibility possible inside the
    device-resident simulation: peer-agent reach grids depend on LIVE sim
    state, so they must be built where that state lives.  Differentially
    pinned against the host builder (tests/test_risk.py): identical
    occupancy/cell/valid on float64.

    Inputs are (O, ...) stacked obstacle states (prediction window index-0
    rows, like the host builder's call sites); `lane` comes from
    `lanelet_tensors(scenario)` (static, precomputed once per scenario).
    """
    import functools

    import jax

    t_steps = len(np.arange(0.0, t_max + dt_rs / 2, dt_rs))
    one = functools.partial(
        _one_reach_grid_device, dt_rs=dt_rs, t_max=t_max, a_max=a_max,
        grid_n=grid_n, cell=cell, t_steps=t_steps,
    )
    origin, occ, cells = jax.vmap(
        lambda p, th, v, ln, w, va: one(p, th, v, ln, w, va, lane)
    )(positions, orientations, velocities, lengths, widths, valid)
    return ReachSetGrid(
        origin=origin, occupancy=occ, valid=valid, cell=cells, dt_rs=dt_rs,
    )


# ---------------------------------------------------------------------------
# sector-annulus fallback (round-1 model; kept for scenarios without lanelet
# context — e.g. pure-tensor benchmarks)
# ---------------------------------------------------------------------------


def reach_set_params(preds, *, a_max=7.0, yaw_spread_rate=0.35, dt=0.1):
    """Per-(obstacle, timestep) reach-set parameters from current obstacle
    states: radius interval [r_min, r_max] and heading spread at each future
    step.  preds: PredictionTensors (uses step-0 pose/velocity only — reach
    sets bound what the obstacle COULD do, not the prediction).  `dt` is the
    prediction step length (the planner's dt)."""
    o, t_pred = preds.orientations.shape
    dt_steps = jnp.arange(1, t_pred + 1, dtype=preds.means.dtype)
    v0 = preds.velocities[:, 0][:, None]           # (O, 1)
    tt = dt_steps[None, :] * dt                    # (1, T) horizon seconds
    r_max = v0 * tt + 0.5 * a_max * tt**2
    r_min = jnp.maximum(v0 * tt - 0.5 * a_max * tt**2, 0.0)
    spread = jnp.minimum(yaw_spread_rate * tt, jnp.pi / 2)
    return dict(
        origin=preds.means[:, 0],                  # (O, 2)
        heading=preds.orientations[:, 0],          # (O,)
        r_min=r_min, r_max=r_max, spread=spread,   # (O, T)
    )


def point_in_reach_set(points, rs):
    """points (..., T, 2) → (..., O, T) bool: inside the sector annulus."""
    d = points[..., None, :, :] - rs["origin"][None, :, None, :]  # (..., O, T, 2)
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ang = jnp.arctan2(d[..., 1], d[..., 0])
    dang = jnp.abs(jnp.mod(ang - rs["heading"][None, :, None] + jnp.pi, 2 * jnp.pi) - jnp.pi)
    inside = (
        (dist >= rs["r_min"][None] - 1e-6)
        & (dist <= rs["r_max"][None] + 1e-6)
        & (dang <= rs["spread"][None])
    )
    # standstill-capable: near the origin is always reachable
    inside = inside | (dist <= 2.0)
    return inside


def responsibility_reach_set(ro, preds, risks, dt=0.1):
    """(M,) responsibility cost via sector-annulus reach sets."""
    o = preds.num_obstacles
    m = ro.x.shape[0]
    if o == 0:
        return jnp.zeros(m, ro.x.dtype)
    t = min(ro.x.shape[1] - 1, preds.horizon)
    rs = reach_set_params(preds, dt=dt)
    ego = jnp.stack([ro.x[:, 1 : t + 1], ro.y[:, 1 : t + 1]], axis=-1)  # (M, t, 2)
    inside = point_in_reach_set(ego, {
        k: (v[:, :t] if getattr(v, "ndim", 0) == 2 else v) for k, v in rs.items()
    })  # (M, O, t)
    inside = inside & preds.valid[None, :, :t]
    ever_inside = jnp.any(inside, axis=2)  # (M, O)
    resp = jnp.where(ever_inside, 0.0, 1.0) * risks.obst_present[None, :]
    return -jnp.sum(resp * risks.obst_risk_per_obst, axis=1)
