"""Fully device-resident multi-agent simulation: one fetch per RUN.

The lockstep host loop (sim/simulation.py) pays one device round trip per
global step — over a remote-TPU tunnel that round trip, not device compute,
is the entire wall time (PERF.md "Tunnel round-trip fusion").  This module
moves the WHOLE simulation into one `lax.scan` over replanning cycles:

    carry: per-agent curvilinear state, pose, status
    body:  on-device sampling matrix → full `evaluate_cycle` (vmapped over
           agents) → execute `replanning_frequency` sub-steps with per-step
           goal/collision status ladder → CV obstacle tensors from the
           executed poses for the next cycle
    fetch: ONE `jax.device_get` of statuses + trajectories at the end.

Multi-chip: pass a `jax.sharding.Mesh` — the expensive stage (the fused
cycle) runs shard_mapped over the agent axis with the small selection dict
all-gathered over ICI; the O(A) status/goal/collision bookkeeping stays
replicated (trivially cheap next to candidate evaluation).  Sharded ==
single-device to selection equality (tests/test_device_sim.py).

Behavioral spec is the host loop itself (sim/simulation.py:668-749,
sim/agent.py:282-376, the reference's simulation.py:497-741); the parity test
(tests/test_device_sim.py) pins statuses, step-by-step executed trajectories
and per-cycle selections against the batched host path.

Restrictions of this headless mode (all deliberate, all checked at
construction where possible):

- predictions: scenario-obstacle windows (ground_truth /
  constant_velocity) are precomputed per replan cycle by the host's own
  `_predictions_for_step` — exact input parity (recorded trajectories are
  known up front).  Peer agents are MODE-FAITHFUL (VERDICT r4 #2, the
  reference's update_scenario semantics): in ground-truth mode each peer's
  row is the remainder of its currently-executing plan, gathered from a
  plan bank carried through the scan (`agent_plan_predictions`; the cycle-0
  seed holds the converted obstacle's recorded trajectory, or a CV
  pseudo-plan when none exists) — in constant-velocity mode peers stay CV
  pose extrapolations.  walenet runs in HYBRID-PREDICTION mode: the net
  consumes executed histories (even single-agent — the ego dummy is a
  neighbor of every obstacle's net input), so each cycle the host syncs
  executed mirrors (`_sync_exec_mirrors`) and builds the full per-agent
  tensors through its own `_agent_predictions` (`_hybrid_pred_cycle`) —
  one small fetch + upload per cycle instead of one fetch per run.
- the FULL sensor pipeline runs on device (host parity): radius + rear-cone
  filter, and — with `calc_occlusions` — the visible-area occlusion stage
  (the host's membership test is a pure polar query, so the in-scan twin is
  exact: road walls + recorded obstacles + live peers build the polar map,
  nearest-ray lookup over each window row's silhouette corners + center).
- the occlusion module runs ON DEVICE: the spawn locator (silhouette-edge
  points behind recorded obstacles + turn spawns from static route
  curvature) evaluates from the live ego pose inside the scan, phantom CV
  rows concat into the cycle's prediction tensors with the host's free-slot
  cap, and the shared `phantom_safety_mask` gate + occ_pm soft cost apply
  before selection; occ_um/occ_ve soft costs build their per-step polar
  visibility map + silhouette points on device too (`sim.visible_area`
  jnp twins).
- the behavior planner runs IN-SCAN where its scope is device-supported
  (behavior/device_fsm.py: TL/stop/yield/crosswalk static families, the
  TTC/MAX velocity planner, stop-point calculator and quintic stopping
  matrix as pure scan logic — one fetch per behavior run; unsupported
  scopes fall back to HYBRID at construction and a runtime overtake
  initiation bails to hybrid transparently).  In hybrid mode the FSM is
  host control logic (exactly as in the reference) and the run switches
  to one jitted device cycle per replan with the FSM on host between
  cycles — one O(A)-floats fetch per cycle instead of one per run; matrix
  build, cycle evaluation, stopping-mode quintic sampling, emergency ladder,
  execute sub-steps and status ladder all stay on device (`_run_hybrid`).
  Composes with the occlusion module (turn-spawn tensors stay on the
  INITIAL route across behavior reference-path swaps — exactly the host's
  semantics, OcclusionModule.route_xy is fixed at construction) AND with
  the fleet axis (`_run_hybrid_fleet`: one vmapped device step for all S
  scenarios per cycle, the S host FSM loops interleaved between cycles).
- the responsibility (reach-set) term runs FULLY on device, multi-agent
  included: each agent's reach grids are built inside the scan by
  `risk.reachable_set.build_reach_set_grids_device` (bit-pinned against the
  host builder) from the cycle's prediction tensors — live peer-agent rows
  and sensor filtering included — then the term + re-selection apply
  (planner/reactive.py:448-462 semantics).  Works with the mesh and the
  fleet (lanelet tensors pad across members).
- progressive densification matches the host: every configured level
  (`sampling_min` .. `sampling_max`−1) evaluates each replan and the first
  level that finds a candidate wins per agent (the host stops early; the
  values are identical).  The emergency ladder IS implemented on device
  (standstill at v ≤ 0.1, then the configured `emergency_mode` fallback on
  the LAST level — "stopping" ordered fallback or "min_risk" risk-stack
  argmin — host parity).  An agent failing the whole ladder freezes with
  status ERROR.
- low-velocity kinematics match the host: both cycle programs run each
  replan and a per-agent `where` picks by `v < low_vel_mode_threshold`
  (nearly free in the launch-bound regime).
- road-departure failsafe of executed poses is skipped — selected plans are
  already corridor-checked inside the cycle.
- agent-agent collision reproduces the host's in-order sweep exactly
  (sequential fori_loop): a marked agent leaves the world for later agents'
  checks, so in a mutually overlapping pair only the first-in-order agent
  is marked and the partner keeps driving.

Parity caveat: outcomes can differ from the host on genuine knife-edge
configurations — e.g. scenario 36 with the opt-in
`prediction.uncertainty_margin_sigma`, where the emergency ladder rides the
feasibility boundary (a quartic decelerating to ~0 whose minimum velocity
flips sign on ±1e-15 input noise) for many consecutive cycles; the two
compiled programs accumulate last-ulp differences and resolve the edge
differently.  The same class appears when an emergency FALLBACK selects on
the feasibility boundary (round-4 example: overtake at sampling_max=4 —
the min-velocity-rank fallback candidate (t=1.1, v=7.41) is feasible in
one compiled program and infeasible by an ulp in the other, so host picks
t=1.3; terminal statuses still agree).  On non-degenerate configurations
(all five reference scenarios, default settings; walenet default-mode
collision reproduction; the round-4 regression matrix's base cells)
parity is step-exact.
"""
from __future__ import annotations

import numpy as np

__all__ = ["DeviceSimulation", "DeviceSimResult", "run_fleet"]

from dataclasses import dataclass, field
from typing import NamedTuple

# AgentStatus integer values (sim/agent.py:32-40) — kept as plain ints so the
# scan carry is a simple int32 array
_RUNNING, _SUCCESS, _TIMELIMIT, _COLLISION, _ERROR = 1, 2, 3, 4, 5


# --------------------------------------------------------------------------
# Dekker double-single (DS) arithmetic — f32 pairs carrying ~f64 precision.
# Module-level (not nested in the matrix builder) so the CPU suite can pin
# them bitwise against NumPy f64 (tests/test_device_sim.py); a regression in
# this host/device-parity-critical kernel would otherwise only surface on
# real TPU hardware.
# --------------------------------------------------------------------------

def ds_two_sum(a, b):
    """Knuth TwoSum: a + b as (fl(a+b), exact rounding error)."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _ds_split(a):
    c = a * 4097.0          # Dekker split, f32: 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def ds_two_prod(a, b):
    """Dekker TwoProduct: a · b as (fl(a·b), exact rounding error)."""
    p = a * b
    ah, al = _ds_split(a)
    bh, bl = _ds_split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def ds_linspace(ah, al, bh, bl, n):
    """np.linspace(a, b, n) computed in FLOAT64 then cast to f32 —
    emulated in f32 double-single (Dekker) arithmetic, since TPUs
    have no f64.  The host builds its velocity grid this way
    (reactive.py _sampling_ranges: python-f64 bounds, f64 linspace,
    f32 cast at build_sampling_matrix); a plain f32 arange·step+start
    differs in the 7th digit at dense levels (measured 1.1e-6 at
    level 3) and flips feasibility-boundary candidates.  Endpoints
    arrive as (hi, lo) pairs carrying the exact f64 bound; DS keeps
    ~1e-14 relative error through the interpolation — far inside the
    f32 rounding step, so the final collapse lands on the host's
    exact f32 values."""
    import jax.numpy as jnp

    d_hi, d_lo = ds_two_sum(bh, -ah)
    d_lo = d_lo + (bl - al)
    div = jnp.float32(n - 1)
    q = d_hi / div
    p, e = ds_two_prod(q, div)
    q_lo = (((d_hi - p) - e) + d_lo) / div
    i = jnp.arange(n, dtype=jnp.float32)
    p, e = ds_two_prod(i, q)
    e = e + i * q_lo
    s, e2 = ds_two_sum(p, ah)
    vs = s + (e + (e2 + al))
    return vs.at[-1].set(bh + bl)


def ds_const(x):
    """Exact f64 constant as an (f32 hi, f32 lo) pair (python-f64 math at
    trace time; the lo part carries what the f32 cast drops)."""
    hi = np.float32(x)
    return hi, np.float32(x - float(hi))


def ds_sub_from(v, c):
    """(v - c) for f32 v and DS constant c, exact (hi, lo)."""
    s, e = ds_two_sum(v, -c[0])
    return ds_two_sum(s, e - c[1])


def ds_add_from(v, c):
    s, e = ds_two_sum(v, c[0])
    return ds_two_sum(s, e + c[1])


def ds_max(a, b):
    import jax.numpy as jnp

    take_a = (a[0] > b[0]) | ((a[0] == b[0]) & (a[1] >= b[1]))
    return (jnp.where(take_a, a[0], b[0]),
            jnp.where(take_a, a[1], b[1]))


def ds_min(a, b):
    import jax.numpy as jnp

    take_a = (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] <= b[1]))
    return (jnp.where(take_a, a[0], b[0]),
            jnp.where(take_a, a[1], b[1]))


class SimTensors(NamedTuple):
    """Every per-scenario device input of the scan — a pytree, so the whole
    run function vmaps over a leading SCENARIO axis (`run_fleet`)."""

    ref: object                # RefPathTable, (A, R, ...) leaves
    corridors: object          # (A, R, 2)
    lane_segments: object      # (A, S, 2, 2)
    lane_valid: object         # (A, S)
    pred_windows: dict         # per-cycle scenario-obstacle windows (C, O, ...)
    cur_obst: object           # (C, O, 3) row-aligned CURRENT obstacle poses
    cur_obst_valid: object     # (C, O) — rows present at that cycle's step
    obst_poses: object         # (T+1, O, 3)
    obst_valid: object         # (T+1, O)
    obst_half: object          # (O, 2)
    g_rings: object            # (A, G, E, 2)
    g_ring_valid: object       # (A, G)
    g_ring_v: object           # (A, G, 2)
    g_vo_has: object           # (A,)
    g_vo_int: object           # (A, 2)
    goal_s: object             # (A,)
    has_goal_s: object         # (A,)
    goal_t_hi: object          # (A,)
    has_goal_t: object         # (A,)
    goal_v_mean: object        # (A,)
    max_steps: object          # () int32 — per-scenario step budget
    active0: object            # (A,) bool — False rows are fleet padding
    x_cl0: object              # (A, 6)
    pose0: object              # (A, 4) center x, y, theta, v
    acc0: object               # (A,)
    lane: object = None        # LaneletTensors (responsibility on) or None
    # visible-area occlusion sensor stage (prediction.calc_occlusions)
    road_segs: object = None       # (Sr, 2, 2) static road-boundary walls
    cur_half: object = None        # (C, O, 2) raw half dims per window row
    # occlusion-module tensors (None unless use_occlusion_module)
    occ_obst: object = None        # (C, Oc, 3) recorded obstacle poses
    occ_obst_valid: object = None  # (C, Oc)
    occ_is_dyn: object = None      # (Oc,)
    occ_half: object = None       # (Oc,) max(l, w)/2
    occ_cat_ok: object = None      # (Oc,) spawn category enabled
    turn_xy: object = None         # (A, R2, 2) route vertices
    turn_spawn: object = None      # (A, R2, 2) precomputed turn spawn points
    turn_heading: object = None    # (A, R2)
    turn_hot: object = None        # (A, R2) |kappa| > threshold
    # peer plan-bank seed (ground-truth peer predictions, VERDICT r4 #2):
    # bank0[i, j] = agent i's CENTER (x, y, theta, v) at global step j from
    # its converted obstacle's recorded trajectory (the reference's
    # not-yet-updated dummy at step 0), or a CV pseudo-plan when none exists
    bank0: object = None           # (A, W, 4)
    bank_len0: object = None       # (A,) int32 readable entries
    # in-scan behavior FSM (behavior/device_fsm.py) — None unless the
    # scenario's behavior scope is device-supported
    fsm: object = None             # FSMTensors pytree
    fsm_carry0: object = None      # FSMCarry pytree (initial blackboard)


@dataclass
class DeviceSimResult:
    """Host-side result of one device-resident run (single fetch)."""

    agent_ids: list
    status: np.ndarray            # (A,) AgentStatus ints (TIMELIMIT applied)
    steps: int                    # executed global steps (host loop parity)
    trajectories: np.ndarray      # (T, A, 5): center x, y, theta, v, a
    status_per_step: np.ndarray   # (T, A)
    selections: np.ndarray        # (C, A, 3): chosen (t1, ss1_target, d1)
    found: np.ndarray             # (C, A) bool
    wall_time: float = 0.0
    extras: dict = field(default_factory=dict)


def _goal_tensors(agents, dtype):
    """Stack every agent's goal test into fixed-shape tensors.

    Host spec: Agent.goal_reached (sim/agent.py:218-242) — per goal,
    (position ∈ any ring) ∧ (velocity ∈ interval); rings are goal-lanelet
    polygons + the goal position shape; a goal with no rings is a
    velocity-only goal.
    """
    ring_lists = []     # per agent: list[(ring (E,2), vlo, vhi)]
    velonly = []        # per agent: (has, lo, hi)
    for a in agents:
        rows = []
        vo = (False, -np.inf, np.inf)
        for g in a.problem.goals:
            vlo, vhi = (-np.inf, np.inf)
            if g.velocity_interval is not None:
                vlo, vhi = g.velocity_interval
            rings = []
            for lid in g.position_lanelets:
                if lid in a.scenario.lanelets:
                    rings.append(a.scenario.lanelets[lid].polygon)
            if g.position_shape is not None:
                rings.append(g.position_shape)
            if rings:
                rows.extend((np.asarray(r, float), vlo, vhi) for r in rings)
            else:
                vo = (True, vlo, vhi)
        ring_lists.append(rows)
        velonly.append(vo)

    g_max = max((len(r) for r in ring_lists), default=0) or 1
    e_max = max((len(ring) for rows in ring_lists for ring, _, _ in rows),
                default=0) or 3
    a_n = len(agents)
    rings = np.zeros((a_n, g_max, e_max, 2), dtype)
    ring_valid = np.zeros((a_n, g_max), bool)
    ring_v = np.zeros((a_n, g_max, 2), dtype)
    ring_v[..., 0], ring_v[..., 1] = -1e30, 1e30
    for i, rows in enumerate(ring_lists):
        for j, (ring, vlo, vhi) in enumerate(rows):
            # pad by repeating the last vertex: degenerate edges add no
            # crossings, the roll-closure edge stays last→first
            e = len(ring)
            rings[i, j, :e] = ring
            rings[i, j, e:] = ring[-1]
            ring_valid[i, j] = True
            ring_v[i, j] = (max(vlo, -1e30), min(vhi, 1e30))
    vo_has = np.array([v[0] for v in velonly])
    vo_int = np.array([[max(v[1], -1e30), min(v[2], 1e30)] for v in velonly],
                      dtype)
    return rings, ring_valid, ring_v, vo_has, vo_int


def _velocity_goal_tensors(agents, dtype):
    """Static inputs of the sim-level velocity planner
    (Agent.desired_velocity, sim/agent.py:245-267)."""
    a_n = len(agents)
    goal_s = np.zeros(a_n, dtype)
    has_goal_s = np.zeros(a_n, bool)
    goal_t_hi = np.zeros(a_n, dtype)
    has_goal_t = np.zeros(a_n, bool)
    goal_v_mean = np.zeros(a_n, dtype)
    for i, a in enumerate(agents):
        if a._goal_s is not None:
            goal_s[i] = a._goal_s
            has_goal_s[i] = True
        if a._goal_time is not None:
            goal_t_hi[i] = a._goal_time[1]
            has_goal_t[i] = True
        for g in a.problem.goals:
            if g.velocity_interval is not None:
                lo, hi = g.velocity_interval
                goal_v_mean[i] = max(0.0, (lo + hi) / 2.0)
                break
    return goal_s, has_goal_s, goal_t_hi, has_goal_t, goal_v_mean


def _occlusion_spawn_tensors(sim, agents, n_cycles, k_replan, dtype):
    """Static/per-cycle inputs of the device occlusion spawn locator.

    Host spec: OcclusionModule.find_spawn_points iterates ALL scenario
    obstacles at the replan step (recorded states — agent-converted obstacles
    included, with their recorded trajectories, exactly like the host), so
    the per-cycle poses are precomputable; only the ego position is live.
    Turn spawn candidates (_turn_spawn_points) are fully static per agent
    (route geometry) except the ego-distance selection."""
    occ_cfg = sim.config.occlusion
    obs = list(sim.scenario.obstacles.values())
    oc_n = len(obs) or 1
    poses = np.zeros((n_cycles, oc_n, 3), dtype)
    valid = np.zeros((n_cycles, oc_n), bool)
    for c in range(n_cycles):
        t_c = c * k_replan
        for j, ob in enumerate(obs):
            st = ob.state_at_time(t_c)
            if st is None:
                continue
            poses[c, j, :2] = st.position
            poses[c, j, 2] = st.orientation
            valid[c, j] = True
    is_dyn = np.array([getattr(ob, "role", "dynamic") == "dynamic"
                       for ob in obs] or [False])
    half = np.array([max(ob.length, ob.width) / 2.0 for ob in obs] or [1.0],
                    dtype)
    # spawn_locator category flags fold into a per-row enable
    cat_ok = np.where(is_dyn, bool(occ_cfg.spawn_point_behind_dynamic_obstacle),
                      bool(occ_cfg.spawn_point_behind_static_obstacle))

    # per-agent turn-spawn candidates (static route geometry; the host
    # selects the nearest high-curvature point ahead at plan time)
    r2_max = 1
    rows = []
    for a in agents:
        xy = None
        if a.occlusion is not None and occ_cfg.spawn_points_behind_turn:
            xy = a.occlusion.route_xy
        if xy is None or len(xy) < 5:
            rows.append(None)
            continue
        xy = np.asarray(xy, dtype=float)
        seg = np.linalg.norm(np.diff(xy, axis=0), axis=1)
        s = np.concatenate([[0.0], np.cumsum(seg)])
        dx, dy = np.gradient(xy[:, 0], s), np.gradient(xy[:, 1], s)
        ddx, ddy = np.gradient(dx, s), np.gradient(dy, s)
        kappa = (dx * ddy - dy * ddx) / np.maximum(
            (dx * dx + dy * dy) ** 1.5, 1e-12)
        hot = np.abs(kappa) > 0.03          # kappa_threshold
        spawn = np.zeros_like(xy)
        heading = np.zeros(len(xy))
        for i in np.where(hot)[0]:
            normal = np.array([-dy[i], dx[i]])
            normal /= max(np.linalg.norm(normal), 1e-9)
            inside = normal * np.sign(kappa[i])
            spawn[i] = xy[i] + 3.6 * inside
            heading[i] = float(np.arctan2(-inside[1], -inside[0]))
        rows.append((xy, spawn, heading, hot))
        r2_max = max(r2_max, len(xy))
    a_n = len(agents)
    turn_xy = np.zeros((a_n, r2_max, 2), dtype)
    turn_spawn = np.zeros((a_n, r2_max, 2), dtype)
    turn_heading = np.zeros((a_n, r2_max), dtype)
    turn_hot = np.zeros((a_n, r2_max), bool)
    for i, row in enumerate(rows):
        if row is None:
            continue
        xy, spawn, heading, hot = row
        n = len(xy)
        turn_xy[i, :n] = xy
        # inert padding: repeat the last vertex with hot=False
        turn_xy[i, n:] = xy[-1]
        turn_spawn[i, :n] = spawn
        turn_heading[i, :n] = heading
        turn_hot[i, :n] = hot
    return dict(
        occ_obst=poses, occ_obst_valid=valid, occ_is_dyn=is_dyn,
        occ_half=half, occ_cat_ok=cat_ok, turn_xy=turn_xy,
        turn_spawn=turn_spawn, turn_heading=turn_heading, turn_hot=turn_hot,
    )


def _obstacle_step_poses(scenario, agent_obstacle_ids, n_steps_total, dtype):
    """(T+1, O, 3) pose + (T+1, O) valid + (O, 2) half-dims of every
    scenario obstacle (the collision-check side, _check_collisions)."""
    obs = [ob for ob in scenario.obstacles.values()
           if ob.obstacle_id not in agent_obstacle_ids]
    o_n = len(obs) or 1
    poses = np.zeros((n_steps_total + 1, o_n, 3), dtype)
    valid = np.zeros((n_steps_total + 1, o_n), bool)
    half = np.zeros((o_n, 2), dtype)
    for j, ob in enumerate(obs):
        half[j] = (ob.length / 2.0, ob.width / 2.0)
        for t in range(n_steps_total + 1):
            st = ob.state_at_time(t)
            if st is None:
                continue
            poses[t, j, :2] = st.position
            poses[t, j, 2] = st.orientation
            valid[t, j] = True
    return poses, valid, half


class DeviceSimulation:
    """Device-resident run of an (already constructed) host `Simulation`.

    Usage:
        sim = Simulation(scenario, config)      # host setup only — don't run
        dres = DeviceSimulation(sim).run()

    The host Simulation provides agents (routes, reference paths, corridors),
    which are stacked once; everything per-step happens on device.
    """

    def __init__(self, sim, mesh=None, axis_name: str = "agents"):
        import jax
        import jax.numpy as jnp

        from frenetix_tpu.parallel.batched_sim import BatchedAgentStepper
        from frenetix_tpu.sim.agent import AgentStatus

        config = sim.config
        if mesh is not None and len(sim.agents) % mesh.size != 0:
            raise ValueError(
                f"agent count {len(sim.agents)} must divide evenly over the "
                f"{mesh.size}-device mesh")
        self.mesh = mesh
        self.axis_name = axis_name
        if config.prediction.mode not in ("ground_truth", "constant_velocity",
                                          "walenet"):
            raise ValueError(
                f"unknown prediction mode {config.prediction.mode!r}")
        # behavior planner → HYBRID mode: the FSM is host control logic (as
        # in the reference, behavior_module.py:113-193), so the run switches
        # from one whole-run lax.scan to one jitted device step per replan
        # cycle with the FSM on host in between — one small fetch per CYCLE
        # (carry + the cycle's executed sub-steps) instead of one per run.
        self.hybrid_behavior = bool(config.behavior.use_behavior_planner)
        # walenet → HYBRID PREDICTIONS: the net consumes executed agent
        # histories (host loop: WorldView-backed neighbor grids + peer rows,
        # the reference's update_scenario semantics), which are not
        # precomputable — each cycle the host builds the full per-agent
        # prediction tensors (sensor filter + peers included, the host's own
        # _agent_predictions) from synced mirrors and uploads them.
        self.hybrid_pred = config.prediction.mode == "walenet"
        if self.hybrid_pred and config.occlusion.use_occlusion_module:
            raise NotImplementedError(
                "walenet + occlusion module is host-loop only (the device "
                "hybrid-prediction path does not thread host phantom "
                "geometry); run sim.run() instead")
        self.use_occlusion = bool(config.occlusion.use_occlusion_module)
        ew = config.external_cost_weights
        self.occ_pm_weight = (float(ew.get("occ_pm", 0.0))
                              if self.use_occlusion else 0.0)
        # occ_um/occ_ve soft costs: the per-step polar visibility map and
        # phantom silhouette points are built ON DEVICE inside the scan
        # (sim.visible_area.polar_visibility_batch — jnp twin of the host's
        # polar_map/occluder_points inputs, reactive.py:412-443)
        self.occ_um_weight = (float(ew.get("occ_um", 0.0))
                              if self.use_occlusion else 0.0)
        self.occ_ve_weight = (float(ew.get("occ_ve", 0.0))
                              if self.use_occlusion else 0.0)
        occ_cfg = config.occlusion
        if self.use_occlusion:
            from frenetix_tpu.occlusion import PhantomThresholds

            self._occ_statics = (
                True, self.occ_pm_weight, self.occ_um_weight,
                self.occ_ve_weight, occ_cfg.phantom_type,
                int(occ_cfg.max_phantoms),
                int(occ_cfg.max_dynamic_spawn_points),
                int(occ_cfg.max_static_spawn_points),
                bool(occ_cfg.spawn_points_behind_turn),
                bool(occ_cfg.spawn_point_behind_dynamic_obstacle),
                bool(occ_cfg.spawn_point_behind_static_obstacle),
                float(occ_cfg.variance_factor),
                float(occ_cfg.size_factor_length),
                float(occ_cfg.size_factor_width),
                tuple(PhantomThresholds.from_config(occ_cfg)),
            )
        else:
            self._occ_statics = (False,)
        self.resp_weight = float(config.cost_weights.get("responsibility", 0.0))
        if config.planning.emergency_mode not in ("stopping", "min_risk"):
            raise ValueError(
                f"unknown emergency_mode {config.planning.emergency_mode!r}")

        self.sim = sim
        self.config = config
        self.jnp = jnp
        self.agents = sim.agents
        self.dt = config.planning.dt
        self.n_steps = config.planning.n_steps
        self.k_replan = int(config.planning.replanning_frequency)
        self.max_steps = int(sim.max_steps)
        self.n_cycles = (self.max_steps + self.k_replan - 1) // self.k_replan
        dtype = np.float64 if config.dtype == "float64" else np.float32
        self.np_dtype = dtype

        # stacked per-agent tables (reference paths, corridors, lane
        # segments) — same stacking as the batched host path
        self.stepper = BatchedAgentStepper(config, self.agents)
        self.veh = config.vehicle

        from frenetix_tpu.ops.costs import COST_TERM_ORDER

        self.weights = jnp.asarray(np.array(
            [config.cost_weights.get(k, 0.0) for k in COST_TERM_ORDER], dtype))

        # ---- static sampling grids per densification level ----------------
        # (ReactivePlanner._sampling_ranges; the host loop evaluates levels
        # sampling_min .. sampling_max-1 until one finds a candidate)
        from frenetix_tpu.ops import sampling as smp

        p = config.planning
        self.horizon = p.planning_horizon
        self.d_ego_pos = bool(p.d_ego_pos)
        self.levels = []          # [(t_grid, n_v, d_grid, m_total)]
        for level in range(p.sampling_min, max(p.sampling_max,
                                               p.sampling_min + 1)):
            t1 = smp.time_samples(p.t_min, self.horizon, self.dt, level)
            t1 = np.unique(np.concatenate([t1, [self.n_steps * self.dt]]))
            n_v = len(smp.linspace_samples(0.0, 1.0, level))
            d_np = smp.linspace_samples(p.d_min, p.d_max, level)
            self.levels.append((
                jnp.asarray(t1.astype(dtype)), n_v,
                jnp.asarray(d_np.astype(dtype)),
                len(t1) * (n_v + 1) * (len(d_np) + 1),
            ))

        # hybrid behavior: worst-case stopping-matrix row count.  The host
        # only ever tries stopping sampling at the FIRST level — one stopping
        # failure flips use_stopping off for the rest of the cycle
        # (planner/reactive.py:318-321), so level == sampling_min bounds it.
        self._stop_bucket = 0
        if self.hybrid_behavior:
            lvl = p.sampling_min
            nt = len(smp.time_samples(p.t_min, self.horizon, self.dt, lvl)) + 1
            ns = len(smp.linspace_samples(0.0, 1.0, lvl))
            nd = len(smp.linspace_samples(0.0, 1.0, max(lvl - 1, 0))) + 1
            self._stop_bucket = nt * ns * nd

        # ---- in-scan behavior FSM (VERDICT r4 #1) -------------------------
        # when the scenario's behavior scope is device-supported, the FSM
        # runs INSIDE the scan (one fetch per run); otherwise the hybrid
        # per-cycle host path applies.  An unsupported transition at
        # runtime (overtake initiation) raises the scan's bail flag and
        # run() transparently re-executes on the hybrid path.
        self.fsm_in_scan = False
        self.fsm_tensors = None
        self.fsm_carry_start = None
        self._fsm_reason = "behavior planner off"
        if self.hybrid_behavior and not self.hybrid_pred \
                and getattr(config.behavior, "device_fsm", "auto") != "hybrid":
            from frenetix_tpu.behavior.device_fsm import (
                build_fsm_tensors, fsm_carry0)

            ft, ok, reason = build_fsm_tensors(sim, dtype)
            self._fsm_reason = reason
            if ok:
                self.fsm_tensors = ft
                self.fsm_carry_start = fsm_carry0(self.agents, sim.scenario,
                                                  dtype)
                self.fsm_in_scan = True

        # ---- initial per-agent state -------------------------------------
        a_n = len(self.agents)
        x_cl0 = np.zeros((a_n, 6), dtype)
        pose0 = np.zeros((a_n, 4), dtype)   # center x, y, theta, v
        acc0 = np.zeros(a_n, dtype)
        for i, a in enumerate(self.agents):
            a.ensure_x_cl()
            lon, lat = a.x_cl
            x_cl0[i] = np.concatenate([np.asarray(lon), np.asarray(lat)])
            pose0[i] = (*a.state.position, a.state.orientation,
                        a.state.velocity)
            acc0[i] = a.state.acceleration
        self.x_cl0, self.pose0, self.acc0 = x_cl0, pose0, acc0

        # ---- peer plan-bank seed (ground-truth peer predictions) ---------
        # Host spec: Simulation._peer_future — before the first plan exists
        # the recorded trajectory of the converted obstacle is the peer's
        # future (update_scenario returns early at step 0); CV pseudo-plan
        # when neither exists.  bank[j] = center state at global step j;
        # readable entries are 1..bank_len-1 (index 0 is never read — the
        # prediction offset starts at the NEXT step).
        self.bank_w = w_bank = max(self.n_steps + 1,
                                   int(config.prediction.horizon_steps) + 1)
        bank0 = np.zeros((a_n, w_bank, 4), dtype)
        bank_len0 = np.zeros(a_n, np.int32)
        for i, a in enumerate(self.agents):
            ob = sim.scenario.obstacles.get(a.id)
            n_rec = 0
            if ob is not None:
                for j in range(w_bank):
                    st = ob.state_at_time(j)
                    if st is None:
                        break
                    bank0[i, j] = (*st.position, st.orientation, st.velocity)
                    n_rec += 1
            if n_rec > 1:
                bank0[i, n_rec:] = bank0[i, n_rec - 1]
                bank_len0[i] = n_rec
            else:
                # CV pseudo-plan from the initial pose (host fallback)
                x, y, th, v0 = pose0[i]
                steps = np.arange(w_bank, dtype=dtype)
                bank0[i, :, 0] = x + v0 * self.dt * steps * np.cos(th)
                bank0[i, :, 1] = y + v0 * self.dt * steps * np.sin(th)
                bank0[i, :, 2] = th
                bank0[i, :, 3] = v0
                bank_len0[i] = w_bank
        self.bank0, self.bank_len0 = bank0, bank_len0

        # ---- goal / velocity-planner tensors ------------------------------
        (self.g_rings, self.g_ring_valid, self.g_ring_v, self.g_vo_has,
         self.g_vo_int) = _goal_tensors(self.agents, dtype)
        (self.goal_s, self.has_goal_s, self.goal_t_hi, self.has_goal_t,
         self.goal_v_mean) = _velocity_goal_tensors(self.agents, dtype)

        # ---- scenario-obstacle tensors ------------------------------------
        # prediction windows per cycle, via the host's own builder (input
        # parity with the host replan)
        pds, cur_obst, cur_valid, cur_half = [], [], [], []
        for c in range(self.n_cycles):
            t_c = c * self.k_replan
            pd, ids = sim._predictions_for_step(t_c)
            pds.append(pd)
            # row-aligned CURRENT obstacle poses for the device sensor
            # filter (the host filter reads st.position at the replan step)
            o_slots = pd["valid"].shape[0]
            cur = np.zeros((o_slots, 3), dtype)
            cv = np.zeros(o_slots, bool)
            ch = np.zeros((o_slots, 2), dtype)
            for row, oid in enumerate(ids[:o_slots]):
                ob = sim.scenario.obstacles[oid]
                # RAW obstacle dims: the visible-area membership probe uses
                # ob.length/width, NOT the margin-enriched prediction dims
                ch[row] = (ob.length / 2.0, ob.width / 2.0)
                st = ob.state_at_time(t_c)
                if st is None:
                    continue
                cur[row, :2] = st.position
                cur[row, 2] = st.orientation
                cv[row] = True
            cur_obst.append(cur)
            cur_valid.append(cv)
            cur_half.append(ch)
        self.pred_windows = {
            k: jnp.asarray(np.stack([pd[k] for pd in pds]))
            for k in pds[0]
        }
        self.cur_obst = jnp.asarray(np.stack(cur_obst))
        self.cur_obst_valid = jnp.asarray(np.stack(cur_valid))
        self.cur_half = jnp.asarray(np.stack(cur_half))

        # ---- lanelet tensors (responsibility term) -------------------------
        # reach-set grids are built ON DEVICE inside the scan, per agent per
        # cycle, from the cycle's prediction tensors' index-0 rows — the same
        # builder inputs as the host's update_planner
        # (sim/planner_interfaces.py:116-124), but with LIVE peer-agent rows
        # (multi-agent responsibility needs sim-state-dependent peer grids,
        # which is exactly why the builder must live where the state lives).
        # build_reach_set_grids_device is bit-pinned against the host
        # builder (tests/test_risk.py).
        self.lane_tensors = None
        if self.resp_weight != 0.0:
            from frenetix_tpu.risk.reachable_set import lanelet_tensors

            self.lane_tensors = lanelet_tensors(sim.scenario, dtype=dtype)
        # visible-area occlusion sensor stage ON DEVICE: the host's
        # membership test is a pure polar query (VisibleArea.points_visible —
        # nearest-ray lookup + 0.3 m tolerance), so the in-scan twin is
        # exact: static road-boundary walls + recorded obstacles at the
        # replan step + live peers occlude, window rows whose silhouette
        # corners/center all fall beyond their ray's clipped range drop out
        # (sensor_model.visible_obstacles / compute_visible_area semantics).
        self.use_vis_occl = bool(config.prediction.use_sensor_model
                                 and config.prediction.calc_occlusions)
        self.road_segs = None
        if self.use_vis_occl:
            from frenetix_tpu.sim.visible_area import road_boundary_segments

            self.road_segs = jnp.asarray(
                np.asarray(road_boundary_segments(sim.scenario),
                           dtype=dtype).reshape(-1, 2, 2))
        op, ov, oh = _obstacle_step_poses(
            sim.scenario, sim.agent_obstacle_ids,
            self.max_steps + self.k_replan, dtype)
        self.obst_poses = jnp.asarray(op)
        self.obst_valid = jnp.asarray(ov)
        self.obst_half = jnp.asarray(oh)

        occ_tensors = {}
        if self.use_occlusion:
            occ_tensors = {
                k: jnp.asarray(v)
                for k, v in _occlusion_spawn_tensors(
                    sim, self.agents, self.n_cycles, self.k_replan, dtype
                ).items()
            }

        self.tensors = SimTensors(
            **occ_tensors,
            ref=self.stepper.ref,
            corridors=self.stepper.corridors,
            lane_segments=self.stepper.lane_segments,
            lane_valid=self.stepper.lane_valid,
            pred_windows=self.pred_windows,
            cur_obst=self.cur_obst,
            cur_obst_valid=self.cur_obst_valid,
            road_segs=self.road_segs,
            cur_half=self.cur_half if self.use_vis_occl else None,
            obst_poses=self.obst_poses,
            obst_valid=self.obst_valid,
            obst_half=self.obst_half,
            g_rings=jnp.asarray(self.g_rings),
            g_ring_valid=jnp.asarray(self.g_ring_valid),
            g_ring_v=jnp.asarray(self.g_ring_v),
            g_vo_has=jnp.asarray(self.g_vo_has),
            g_vo_int=jnp.asarray(self.g_vo_int),
            goal_s=jnp.asarray(self.goal_s),
            has_goal_s=jnp.asarray(self.has_goal_s),
            goal_t_hi=jnp.asarray(self.goal_t_hi),
            has_goal_t=jnp.asarray(self.has_goal_t),
            goal_v_mean=jnp.asarray(self.goal_v_mean),
            max_steps=jnp.asarray(self.max_steps, jnp.int32),
            active0=jnp.ones(a_n, bool),
            x_cl0=jnp.asarray(x_cl0),
            pose0=jnp.asarray(pose0),
            acc0=jnp.asarray(acc0),
            lane=self.lane_tensors,
            bank0=jnp.asarray(bank0),
            bank_len0=jnp.asarray(bank_len0),
            fsm=(None if self.fsm_tensors is None
                 else jax.tree.map(jnp.asarray, self.fsm_tensors)),
            fsm_carry0=(None if self.fsm_carry_start is None
                        else jax.tree.map(jnp.asarray,
                                          self.fsm_carry_start)),
        )

        self._run_fn = None
        self._hybrid_fn = None
        self._status_enum = AgentStatus

    # ------------------------------------------------------------ device fns
    def _build_matrix_fn(self, level_idx: int = 0):
        """Per-agent on-device sampling matrix (ReactivePlanner.
        _sampling_ranges + ops.sampling.build_sampling_matrix): static t/d
        grids of the given densification level, velocity grid from the
        current state, current ṡ and d appended (the host unions them in;
        duplicates are harmless identical candidates)."""
        jnp = self.jnp
        veh, horizon = self.veh, self.horizon
        t_grid, n_v, d_grid, _ = self.levels[level_idx]
        d_ego = self.d_ego_pos

        _amax_T = ds_const(veh.a_max * horizon)
        _amax6_T = ds_const((veh.a_max / 6.0) * horizon)
        _vmax_c = ds_const(veh.v_max)
        _vfloor = ds_const(0.001)

        use_ds = self.np_dtype == np.float32

        def one(x_cl, v_cur):
            s0, ss0, sss0, d0, dd0, ddd0 = (x_cl[i] for i in range(6))
            if use_ds:
                # f32: host computes v_min = max(0.001, v − a_max·T),
                # v_max' = min(v + (a_max/6)·T, v_max) and the linspace in
                # python/NumPy FLOAT64 and casts once — emulate with DS pairs
                vf = (jnp.full((), _vfloor[0]), jnp.full((), _vfloor[1]))
                vm = (jnp.full((), _vmax_c[0]), jnp.full((), _vmax_c[1]))
                lo_h, lo_l = ds_max(ds_sub_from(v_cur, _amax_T), vf)
                hi_h, hi_l = ds_min(ds_add_from(v_cur, _amax6_T), vm)
                vs = ds_linspace(lo_h, lo_l, hi_h, hi_l, n_v)
            else:
                # f64 (CPU test dtype): EXACTLY np.linspace's algorithm —
                # arange·step + start, endpoint pinned — is already bitwise
                # host-identical in f64; DS would round differently in the
                # last ulp
                v_lo = jnp.maximum(0.001, v_cur - veh.a_max * horizon)
                v_hi = jnp.minimum(v_cur + (veh.a_max / 6.0) * horizon,
                                   veh.v_max)
                step = (v_hi - v_lo) / (n_v - 1)
                vs = v_lo + jnp.arange(n_v, dtype=x_cl.dtype) * step
                vs = vs.at[-1].set(v_hi)
            vs = jnp.concatenate([vs, ss0[None]])
            base_d = d_grid + (d0 if d_ego else 0.0)
            ds = jnp.concatenate([base_d, d0[None]])
            t_n, v_n, d_n = t_grid.shape[0], vs.shape[0], ds.shape[0]
            m = t_n * v_n * d_n
            mat = jnp.zeros((m, 13), x_cl.dtype)
            mat = mat.at[:, 1].set(jnp.repeat(t_grid, v_n * d_n))
            mat = mat.at[:, 5].set(jnp.tile(jnp.repeat(vs, d_n), t_n))
            mat = mat.at[:, 10].set(jnp.tile(ds, t_n * v_n))
            mat = mat.at[:, 2].set(s0).at[:, 3].set(ss0).at[:, 4].set(sss0)
            mat = mat.at[:, 7].set(d0).at[:, 8].set(dd0).at[:, 9].set(ddd0)
            return mat

        return one

    def _phantom_fn(self, horizon):
        """Device spawn locator + phantom prediction rows.

        Host spec: OcclusionModule.find_spawn_points (silhouette-edge spawn
        points behind obstacles within sensor range, per-category caps,
        nearest-first overall cap) + _turn_spawn_points (nearest
        high-curvature route point) + phantom_prediction_rows (CV rows with
        inflated variance) + augment_predictions' free-slot cap.  The host
        sorts with Python's stable sort: ties resolve by insertion order
        (dynamic block, then static, then turn; obstacles in scenario dict
        order, side +1 before −1) — reproduced here as lexicographic ranks.

        Returns fn(g, c, ego (2,), n_free (), turn_xy (R2, 2),
        turn_spawn (R2, 2), turn_heading (R2,), turn_hot (R2,)) →
        (PredictionTensors with (P, horizon, ...) leaves, admitted (P,)
        bool, spawn positions (P, 2)); the turn tensors are the calling
        agent's rows.  The spawn positions are the phantom silhouette
        points consumed by the occ_ve external cost (host:
        OcclusionModule.occluder_points)."""
        jnp = self.jnp
        occ_cfg = self.config.occlusion
        from frenetix_tpu.occlusion.occlusion_module import PHANTOM_TYPES

        params = PHANTOM_TYPES[occ_cfg.phantom_type]
        p_max = int(occ_cfg.max_phantoms)
        max_dyn = int(occ_cfg.max_dynamic_spawn_points)
        max_stat = int(occ_cfg.max_static_spawn_points)
        sensor_radius = float(self.config.prediction.sensor_radius)
        var_factor = float(occ_cfg.variance_factor)
        length = params["length"] * float(occ_cfg.size_factor_length)
        width = params["width"] * float(occ_cfg.size_factor_width)
        vel = float(params["velocity"])
        use_turn = bool(occ_cfg.spawn_points_behind_turn)
        dt = self.dt

        def one(g: SimTensors, c, ego, n_free, turn_xy, turn_spawn,
                turn_heading, turn_hot):
            dtype = ego.dtype
            pos = g.occ_obst[c][:, :2]                        # (Oc, 2)
            d_vec = pos - ego[None]
            dist_o = jnp.hypot(d_vec[:, 0], d_vec[:, 1])
            ok_o = (g.occ_obst_valid[c] & g.occ_cat_ok
                    & (dist_o >= 2.0) & (dist_o <= sensor_radius))
            safe_d = jnp.maximum(dist_o, 1e-9)
            ray = d_vec / safe_d[:, None]
            perp = jnp.stack([-ray[:, 1], ray[:, 0]], axis=1)  # (Oc, 2)
            sides = jnp.asarray([1.0, -1.0], dtype)            # host order
            sp_pos = (pos[:, None]
                      + sides[None, :, None] * perp[:, None]
                      * (g.occ_half + 0.5)[:, None, None]
                      + ray[:, None] * 1.0)                    # (Oc, 2, 2)
            sp_head = jnp.arctan2(-sides[None, :] * perp[:, 1:2],
                                  -sides[None, :] * perp[:, 0:1])  # (Oc, 2)
            oc = pos.shape[0]
            cand_pos = sp_pos.reshape(2 * oc, 2)
            cand_head = sp_head.reshape(2 * oc)
            cand_dist = jnp.repeat(dist_o, 2)
            cand_ok = jnp.repeat(ok_o, 2)
            cand_dyn = jnp.repeat(g.occ_is_dyn, 2)

            # turn candidate (at most one, appended last like the host)
            dist_t = jnp.hypot(turn_xy[:, 0] - ego[0],
                               turn_xy[:, 1] - ego[1])         # (R2,)
            cand_t = ((dist_t > 5.0) & (dist_t < sensor_radius)
                      & turn_hot)
            has_t = jnp.any(cand_t) if use_turn else jnp.asarray(False)
            i_t = jnp.argmin(jnp.where(cand_t, dist_t, jnp.inf))

            n = 2 * oc + 1
            pos_all = jnp.concatenate([cand_pos, turn_spawn[i_t][None]])
            head_all = jnp.concatenate([cand_head, turn_heading[i_t][None]])
            dist_all = jnp.concatenate([cand_dist, dist_t[i_t][None]])
            ok_all = jnp.concatenate([cand_ok, has_t[None]])
            grp = jnp.concatenate([
                jnp.where(cand_dyn, 0, 1), jnp.asarray([2])]).astype(jnp.int32)
            ins = jnp.arange(n)

            def lex_less(mask_j):
                """(N, N) bool: candidate j (axis 1) precedes candidate i
                (axis 0) under (dist, grp, ins), restricted to mask_j."""
                dj, di = dist_all[None, :], dist_all[:, None]
                gj, gi = grp[None, :], grp[:, None]
                ij, ii = ins[None, :], ins[:, None]
                less = (dj < di) | ((dj == di) & (
                    (gj < gi) | ((gj == gi) & (ij < ii))))
                return less & mask_j[None, :]

            is_dyn_c = grp == 0
            is_stat_c = grp == 1
            rank_dyn = jnp.sum(lex_less(ok_all & is_dyn_c), axis=1)
            rank_stat = jnp.sum(lex_less(ok_all & is_stat_c), axis=1)
            kept = ok_all & (
                (is_dyn_c & (rank_dyn < max_dyn))
                | (is_stat_c & (rank_stat < max_stat))
                | (grp == 2))
            rank_all = jnp.sum(lex_less(kept), axis=1)
            n_adm = jnp.minimum(p_max, jnp.maximum(n_free, 0))
            admitted = kept & (rank_all < n_adm)

            # gather the first P admitted candidates in rank order
            p_idx = jnp.arange(p_max)
            match = admitted[None, :] & (rank_all[None, :] == p_idx[:, None])
            row_i = jnp.argmax(match, axis=1)                  # (P,)
            row_ok = jnp.any(match, axis=1)
            row_pos = pos_all[row_i]                           # (P, 2)
            row_head = head_all[row_i]

            # phantom_prediction_rows: CV toward heading, inflated variance
            steps = jnp.arange(1, horizon + 1, dtype=dtype)
            hvec = jnp.stack([jnp.cos(row_head), jnp.sin(row_head)], axis=1)
            means = row_pos[:, None] + (vel * dt * steps)[None, :, None] * hvec[:, None]
            var = (0.3 + 0.2 * steps * dt) * var_factor        # (T,)
            eye = jnp.eye(2, dtype=dtype)
            covs = jnp.broadcast_to(eye, (p_max, horizon, 2, 2)) * var[None, :, None, None]
            inv = jnp.broadcast_to(eye, (p_max, horizon, 2, 2)) * (1.0 / var)[None, :, None, None]
            from frenetix_tpu.ops.costs import PredictionTensors

            ph = PredictionTensors(
                means=means, inv_covs=inv, covs=covs,
                orientations=jnp.broadcast_to(row_head[:, None],
                                              (p_max, horizon)),
                velocities=jnp.full((p_max, horizon), vel, dtype),
                lengths=jnp.full((p_max,), length, dtype),
                widths=jnp.full((p_max,), width, dtype),
                valid=jnp.broadcast_to(row_ok[:, None], (p_max, horizon)),
            )
            return ph, row_ok, row_pos

        return one

    def _goal_check_fn(self):
        """Vectorized Agent.goal_reached: (A,) bool from centers/velocities."""
        jnp = self.jnp

        def check(g: SimTensors, center, vel):
            # crossing-number ring test (io.commonroad._point_in_ring)
            a = g.g_rings                                # (A, G, E, 2)
            b = jnp.roll(g.g_rings, -1, axis=2)
            p = center[:, None, None, :]                 # (A, 1, 1, 2)
            cond = (a[..., 1] > p[..., 1]) != (b[..., 1] > p[..., 1])
            den = b[..., 1] - a[..., 1]
            den = jnp.where(den == 0.0, 1.0, den)
            x_int = a[..., 0] + (p[..., 1] - a[..., 1]) * (b[..., 0] - a[..., 0]) / den
            crossings = jnp.sum(cond & (p[..., 0] < x_int), axis=-1)  # (A, G)
            inside = (crossings % 2).astype(bool) & g.g_ring_valid
            vel_ok = ((vel[:, None] >= g.g_ring_v[..., 0])
                      & (vel[:, None] <= g.g_ring_v[..., 1]))
            pos_goal = jnp.any(inside & vel_ok, axis=1)
            vo_ok = (g.g_vo_has & (vel >= g.g_vo_int[:, 0])
                     & (vel <= g.g_vo_int[:, 1]))
            return pos_goal | vo_ok

        return check

    def _desired_velocity_fn(self):
        """Vectorized Agent.desired_velocity (sim/agent.py:245-267)."""
        jnp = self.jnp
        dt = self.dt

        def v_des(g: SimTensors, x_cl, v_cur, t_step):
            s_cur = x_cl[:, 0]
            dist = g.goal_s - s_cur
            rem_t = (g.goal_t_hi - t_step) * dt
            rem_d = jnp.maximum(dist, 0.0) / jnp.maximum(v_cur, 1.0)
            remaining = jnp.where(g.has_goal_t, rem_t, rem_d)
            safe_rem = jnp.where(remaining == 0.0, 1.0, remaining)
            v = jnp.clip(dist / safe_rem,
                         jnp.maximum(v_cur - 5.0, 0.0), v_cur + 5.0)
            v = jnp.where(remaining <= 0.0, jnp.maximum(v_cur, 1.0), v)
            v = jnp.where(dist <= 2.0, g.goal_v_mean, v)
            return jnp.where(g.has_goal_s, v, v_cur)

        return v_des

    # ------------------------------------------------------------------- run
    def _build_run(self, a_n=None, n_cycles=None, hybrid=False,
                   hybrid_pred=False, fsm_mode=False, emit_margins=False):
        """Build the jitted whole-run function run(tensors) → out dict.

        `a_n` / `n_cycles` default to this scenario's values; `run_fleet`
        passes the padded fleet maxima and vmaps the returned function over
        a leading scenario axis of SimTensors.

        `hybrid=True` (behavior mode) returns a jitted SINGLE-CYCLE step
        `step(g, carry, c, v_des, stop_mat, stop_mask, wants_stop) →
        (carry, ys)` instead of the whole-run scan: desired velocity comes
        from the host FSM, and agents whose behavior stop point qualifies
        for stopping mode (reactive.wants_stopping_mode) additionally
        evaluate the host-built quintic stopping matrix, picked when it
        finds a candidate (reactive.py:256-321 ladder semantics)."""
        import jax
        import jax.numpy as jnp

        from frenetix_tpu.ops.collision import obb_overlap
        from frenetix_tpu.ops.costs import PredictionTensors
        from frenetix_tpu.parallel.mesh import (
            _SEL_FIELDS, CTX_IN_AXES, agent_plan_predictions,
            agent_pose_predictions, concat_obstacles,
        )
        from frenetix_tpu.planner.core import CycleContext, evaluate_cycle

        veh = self.veh
        dtype = self.np_dtype
        a_n = len(self.agents) if a_n is None else a_n
        n_cycles = self.n_cycles if n_cycles is None else n_cycles
        k = self.k_replan
        h_agent = jnp.asarray([veh.length / 2.0, veh.width / 2.0], dtype)
        wb = veh.wb_rear_axle
        pcfg = self.config.prediction

        matrix_fns = [jax.vmap(self._build_matrix_fn(i))
                      for i in range(len(self.levels))]
        goal_fn = self._goal_check_fn()
        vdes_fn = self._desired_velocity_fn()
        dt, n_steps = self.dt, self.n_steps

        fsm_step_fn = stop_mat_fn = None
        if fsm_mode:
            from frenetix_tpu.behavior.device_fsm import make_fsm_step

            fsm_step_fn = make_fsm_step(self.config, veh, dt, k)
            stop_mat_fn = jax.vmap(self._build_stop_matrix_fn())
            stop_thr = self.config.behavior.stopping_mode_threshold

        low_thr = self.config.planning.low_vel_mode_threshold
        comp_sum = bool(self.config.planning.compensated_cost_sum)

        emergency = str(self.config.planning.emergency_mode)

        def _select_from(res, matrix, mask, d0, risks=None):
            """Host emergency ladder fallback (ReactivePlanner.plan fallback,
            planner/reactive.py:341-357) when no candidate is selectable.

            emergency_mode='stopping': pick among feasible∧valid by (v asc,
            t asc, |d − d0| asc) — `_select_stopping_index` as one
            integer-rank lexicographic argmin.  Ranks (count of
            strictly-smaller values, ties share a rank like the host's
            unique-value ranking) keep the key EXACT in int32 — a float
            composite loses the d tie-break to float32 rounding on TPU.

            emergency_mode='min_risk': argmin of ego_risk + obst_risk over
            feasible∧valid (reactive_planner_cpp.py:409-413 →
            risk_costs.calc_risk; host: ReactivePlanner._risk_totals)."""
            ro = res.rollout
            feas = ro.feasible & ro.valid & mask
            if emergency == "min_risk":
                total = risks.ego_risk + risks.obst_risk
                key = jnp.where(feas, total, jnp.inf)
                fb_idx = jnp.argmin(key).astype(jnp.int32)
            else:
                v, t, d = matrix[:, 5], matrix[:, 1], jnp.abs(matrix[:, 10] - d0)
                rank = lambda col: jnp.sum(
                    col[None, :] < col[:, None], axis=1).astype(jnp.int32)
                m = matrix.shape[0]
                key = (rank(v) * m + rank(t)) * m + rank(d)
                key = jnp.where(feas, key, jnp.iinfo(jnp.int32).max)
                fb_idx = jnp.argmin(key).astype(jnp.int32)
            fb_ok = jnp.any(feas)
            idx = jnp.where(res.found, res.best_idx, fb_idx)
            out = {k_: getattr(ro, attr)[idx] for attr, k_ in _SEL_FIELDS}
            out.update(found=res.found, fb_ok=fb_ok, best=idx,
                       sel=jnp.stack([matrix[idx, 1], matrix[idx, 5],
                                      matrix[idx, 10]]))
            if emit_margins:
                # knife-edge diagnostics (tools/tie_margins.py --device):
                # the (second best − best) gap of the DEVICE program's own
                # masked cost vector — the margin that decides whether a
                # ±1-ulp difference can flip this cycle's selection
                masked = jnp.where(res.selectable, res.cost, jnp.inf)
                top2 = -jax.lax.top_k(-masked, 2)[0]
                gap = jnp.where(jnp.isfinite(top2[1]), top2[1] - top2[0],
                                jnp.inf)
                out["margin_gap"] = gap
                out["margin_rel"] = gap / jnp.maximum(
                    jnp.abs(top2[0]), 1e-12)
            return out

        resp_w = self.resp_weight
        need_risks = (resp_w != 0.0 or emergency == "min_risk"
                      or self.use_occlusion)

        def _risks_of(res, ctx):
            """Risk stack of one cycle (ReactivePlanner._risk_totals inputs:
            the agent's prediction tensors + footprint-inferred crash meta)."""
            from frenetix_tpu.parallel.mesh import _default_obstacle_meta
            from frenetix_tpu.risk.costs import trajectory_risks

            return trajectory_risks(res.rollout, ctx.preds,
                                    _default_obstacle_meta(ctx.preds),
                                    veh.mass)

        use_occ = self.use_occlusion
        occ_pm_w = self.occ_pm_weight
        occ_um_w = self.occ_um_weight
        occ_ve_w = self.occ_ve_weight
        # occ_um/occ_ve need the per-cycle occluder geometry (polar map +
        # phantom silhouette points) threaded into the per-agent select
        use_occ_geom = use_occ and (occ_um_w != 0.0 or occ_ve_w != 0.0)
        phantom_fn = None
        if use_occ:
            from frenetix_tpu.occlusion import PhantomThresholds

            thresholds = PhantomThresholds.from_config(self.config.occlusion)
            phantom_fn = self._phantom_fn(
                int(self.pred_windows["means"].shape[2]))

        def _post(res, ctx, risks, grid, pm, occ_geom=None):
            """Post-cycle selection adjustments, the exact in-batch order of
            mesh._one_agent_select: responsibility term (reach grids built ON
            DEVICE from this cycle's prediction tensors — live peer-agent
            rows included, host builder inputs sim/planner_interfaces.py:
            116-124) → occlusion phantom gate + occ_pm/um/ve soft costs →
            one re-argmin over the adjusted selectable set."""
            cost, selectable = res.cost, res.selectable
            if resp_w != 0.0:
                from frenetix_tpu.risk.reachable_set import (
                    responsibility_reach_grid)

                term = responsibility_reach_grid(res.rollout, grid, risks, dt)
                cost = cost + resp_w * term
            if use_occ:
                from frenetix_tpu.occlusion import (
                    external_occlusion_costs, phantom_safety_mask)

                safe = phantom_safety_mask(risks, pm, thresholds,
                                           rollout=res.rollout,
                                           preds=ctx.preds, veh=veh, dt=dt)
                selectable = selectable & safe
                if occ_pm_w or use_occ_geom:
                    ego = r_vis = pts = pts_valid = None
                    if occ_geom is not None:
                        ego, r_vis, pts, pts_valid = occ_geom
                    cost = cost + external_occlusion_costs(
                        res.rollout, w_pm=occ_pm_w, w_um=occ_um_w,
                        w_ve=occ_ve_w, risks=risks, phantom_mask=pm,
                        ego=ego, r_vis=r_vis, occluder_pts=pts,
                        occluder_valid=pts_valid)
            masked = jnp.where(selectable, cost, jnp.inf)
            found = jnp.any(selectable)
            best = jnp.where(found, jnp.argmin(masked),
                             res.best_idx).astype(jnp.int32)
            return res._replace(cost=cost, best_idx=best, found=found,
                                selectable=selectable)

        def make_one_select(quintic: bool, low_vel: bool):
            """One agent's cycle in ONE kinematics mode (low_vel_mode is a
            static flag of evaluate_cycle).  The host picks kinematics per
            agent by v < low_vel_mode_threshold; the scan body runs the
            high-velocity program always and the low-velocity program under
            a runtime `lax.cond` only when some agent is actually below the
            threshold (value-identical: with no low-vel agent the per-agent
            where would pick the hi result everywhere anyway) — in the solo
            scan this halves the dominant cycle cost in the common case
            (under the fleet vmap the cond lowers to a select and both
            programs run, as before).

            `quintic` (hybrid behavior mode): end-position-constrained
            longitudinal sampling over the host-built stopping matrix
            (reactive.py:265-267 quintic_lon)."""

            def one_select(matrix, mask, ctx, d0, v_cur, *extras):
                # extras, fixed order: lane tensors? phantom-row mask?
                # occluder geometry (ego, r_vis, phantom pts, pts valid)?
                e_i = 0
                lane = pm = occ_geom = None
                if resp_w != 0.0:
                    lane, e_i = extras[0], 1
                if use_occ:
                    pm, e_i = extras[e_i], e_i + 1
                    if use_occ_geom:
                        occ_geom = tuple(extras[e_i:e_i + 4])
                return _one_select_body(matrix, mask, ctx, d0, v_cur,
                                        lane, pm, occ_geom, quintic, low_vel)

            return one_select

        def _one_select_body(matrix, mask, ctx, d0, v_cur, lane, pm,
                             occ_geom, quintic, low_vel):
            res = evaluate_cycle(matrix, mask, ctx, dt=dt, n_steps=n_steps,
                                 low_vel_mode=low_vel, quintic_lon=quintic,
                                 table_window=768,
                                 compensated_sum=comp_sum)
            risks = _risks_of(res, ctx) if need_risks else None
            if resp_w != 0.0 or use_occ:
                grid = None
                if resp_w != 0.0:
                    from frenetix_tpu.risk.reachable_set import (
                        build_reach_set_grids_device)

                    grid = build_reach_set_grids_device(
                        ctx.preds.means[:, 0], ctx.preds.orientations[:, 0],
                        ctx.preds.velocities[:, 0], ctx.preds.lengths,
                        ctx.preds.widths, ctx.preds.valid[:, 0], lane)
                res = _post(res, ctx, risks, grid, pm, occ_geom)
            return _select_from(res, matrix, mask, d0, risks)

        use_lane = resp_w != 0.0
        # extras, fixed order: lanelet tensors (scenario-level → broadcast
        # over agents), the (A, O) phantom-row mask (per agent), then the
        # per-agent occluder geometry for occ_um/occ_ve
        extra_axes = (*((None,) if use_lane else ()),
                      *((0,) if use_occ else ()),
                      *((0, 0, 0, 0) if use_occ_geom else ()))
        def _wrap_cycle(one_sel):
            vb = jax.vmap(one_sel,
                          in_axes=(0, 0, CTX_IN_AXES, 0, 0, *extra_axes))
            if self.mesh is None:
                return vb
            # multi-chip: shard the expensive stage — the fused cycle — over
            # the agent mesh and all_gather the small selection dict; the
            # O(A) status/goal/collision bookkeeping in the scan body stays
            # replicated (it is trivially cheap next to candidate
            # evaluation).  Same pattern as mesh.sharded_full_cycle.
            from frenetix_tpu.parallel.mesh import _ctx_pspecs
            from jax.sharding import PartitionSpec as P

            axis = self.axis_name
            sh = P(axis)
            extra_specs = (*((P(),) if use_lane else ()),
                           *((sh,) if use_occ else ()),
                           *((sh, sh, sh, sh) if use_occ_geom else ()))

            def sharded(mats, msks, ctx, d0, v_cur, *extras):
                out = vb(mats, msks, ctx, d0, v_cur, *extras)
                return jax.tree.map(
                    lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
                    out)

            return jax.shard_map(
                sharded, mesh=self.mesh,
                in_specs=(sh, sh, _ctx_pspecs(axis), sh, sh, *extra_specs),
                out_specs=P(),
                check_vma=False,   # all_gather output is replicated
            )

        cycle_hi = _wrap_cycle(make_one_select(False, False))
        cycle_lo = _wrap_cycle(make_one_select(False, True))
        cycle_stop_hi = (_wrap_cycle(make_one_select(True, False))
                         if (hybrid or fsm_mode) else None)
        cycle_stop_lo = (_wrap_cycle(make_one_select(True, True))
                         if (hybrid or fsm_mode) else None)

        def run_cycle(mats, msks, ctx, d0, v_cur, extra, stop=False):
            """Both kinematics merged by the host's per-agent low-velocity
            rule, with the low-velocity program behind a runtime branch."""
            fhi = cycle_stop_hi if stop else cycle_hi
            flo = cycle_stop_lo if stop else cycle_lo
            out_hi = fhi(mats, msks, ctx, d0, v_cur, *extra)
            lv = v_cur < low_thr

            def with_lo(_):
                out_lo = flo(mats, msks, ctx, d0, v_cur, *extra)
                return jax.tree.map(
                    lambda a, b: jnp.where(
                        lv.reshape(lv.shape + (1,) * (a.ndim - 1)), b, a),
                    out_hi, out_lo)

            return jax.lax.cond(jnp.any(lv), with_lo, lambda _: out_hi, None)

        masks_l = [jnp.ones((a_n, lvl[3]), bool) for lvl in self.levels]
        weights = self.weights
        eye = jnp.eye(a_n, dtype=bool)
        use_sensor = bool(pcfg.use_sensor_model)
        use_vis_occl = self.use_vis_occl
        sensor_radius = float(pcfg.sensor_radius)
        cone_half = float(pcfg.cone_angle) * np.pi / 180.0 / 2.0
        cone_safety = float(pcfg.cone_safety_dist)

        def body(g, carry, c, behavior=None, pred_override=None):
            # pred_override: host-built PredictionTensors for this cycle
            # (walenet hybrid — _run_hybrid/_hybrid_pred_cycle)
            # hybrid carry additionally tracks the executed curvature and the
            # previous executed orientation: the host FSM mirror needs the
            # recorded state's steering angle (arctan(L·κ)) and yaw rate
            # ((θ_j − θ_{j−1})/dt) — sim/agent.py:369-370 — because both feed
            # compute_initial_state on a reference-path swap.
            # Both variants end with the peer plan bank (bank, bank_len):
            # each agent's currently-executing plan, read by the NEXT
            # cycle's ground-truth peer predictions (agent_plan_predictions).
            if fsm_mode:
                (x_cl, center, theta, v, acc, status, bank, bank_len,
                 last_exec, fsm_c) = carry
                kap = th_prev = None
            elif behavior is None:
                x_cl, center, theta, v, acc, status, bank, bank_len = carry
                kap = th_prev = None
                last_exec = fsm_c = None
            else:
                (x_cl, center, theta, v, acc, kap, th_prev, status, bank,
                 bank_len) = carry
                last_exec = fsm_c = None
            t0 = c * k

            # --- pre_step goal check at the cycle-start state -------------
            # all status transitions are gated on the member's OWN horizon
            # (t0 < g.max_steps): in a fleet, members whose n_cycles < the
            # padded c_max freeze status exactly like pose — a member that
            # ends TIMELIMIT solo must not flip to SUCCESS/ERROR in the
            # padding cycles (its solo run never evaluates them)
            in_horizon = t0 < g.max_steps
            running = status == _RUNNING
            # peer-visibility snapshot: the host builds every agent's
            # predictions (and the visible-area walls) from statuses BEFORE
            # the pre-step goal check of this step (simulation.py run loop:
            # the running list + _augment_with_agents read the pre-step
            # snapshot; the goal check happens inside a.step afterwards) —
            # a peer reaching its goal this cycle is still visible for ONE
            # more replan.  Caught by the round-4 regression matrix: the
            # curve/highway trailing agent diverged from the host at exactly
            # the ego's success step.
            running_pre = running
            reached = goal_fn(g, center, v) & running & in_horizon
            status = jnp.where(reached, _SUCCESS, status)
            running = status == _RUNNING

            # --- replan (one fused vmapped cycle over all agents) ---------
            x_cl_replan = x_cl
            if fsm_mode:
                # in-scan behavior FSM (behavior/device_fsm.py): computes
                # v_des + the planner stop point exactly as the hybrid
                # host cycle would, then the quintic stopping matrix for
                # qualifying agents (reactive.wants_stopping_mode)
                peer_present = (last_exec == t0) & g.active0
                fsm_c, v_des_b, stop_s_b, stop_v_b = fsm_step_fn(
                    g.fsm, fsm_c, c, t0, center, theta, v, running,
                    peer_present)
                wants_b = (running
                           & (stop_v_b < stop_thr)
                           & (stop_s_b > x_cl[:, 0])
                           & (stop_v_b < jnp.maximum(x_cl[:, 1], 1.0) + 2.0))
                stop_mat_b, stop_mask_b = stop_mat_fn(
                    x_cl, stop_s_b, stop_v_b, wants_b)
                behavior = (v_des_b, stop_mat_b, stop_mask_b, wants_b)
            if behavior is None:
                v_des = vdes_fn(g, x_cl, v, t0.astype(dtype))
            else:
                # hybrid: the host FSM's desired velocity
                # (apply_behavior_output → set_desired_velocity)
                v_des = behavior[0]
            if pred_override is not None:
                # host-built per-agent tensors (walenet hybrid):
                # sensor filter, peer rows and eviction already applied
                # by the host's own _agent_predictions — maximal parity
                # by construction (one upload per cycle)
                preds, pm_extra = pred_override, ()
            else:
                # scenario-obstacle window of this cycle, broadcast to the agent
                # axis (every agent sees the same ground-truth rows — host
                # parity: pd_base is shared, sensor filtering is off here)
                window = PredictionTensors(*(
                    jnp.broadcast_to(g.pred_windows[k_][c][None],
                                     (a_n,) + g.pred_windows[k_].shape[1:])
                    for k_ in PredictionTensors._fields))
                if use_sensor:
                    # per-agent radius + rear-cone sensor filter on the
                    # scenario-obstacle rows (sensor_model.obstacles_in_radius +
                    # filter_cone_angle, applied by the host BEFORE peers are
                    # appended — _filter_for_agent, sim/simulation.py)
                    rel = g.cur_obst[c][None, :, :2] - center[:, None, :]  # (A,O,2)
                    in_radius = (jnp.linalg.norm(rel, axis=-1)
                                 < sensor_radius) & g.cur_obst_valid[c][None]
                    c0 = jnp.cos(-theta)[:, None]
                    s0 = jnp.sin(-theta)[:, None]
                    loc_x = c0 * rel[..., 0] - s0 * rel[..., 1] - veh.length / 2.0
                    loc_y = s0 * rel[..., 0] + c0 * rel[..., 1]
                    dist = jnp.sqrt(loc_x ** 2 + loc_y ** 2)
                    ang = jnp.arctan2(loc_y, loc_x)
                    dropped = ((loc_x < 0) & (dist > cone_safety)
                               & (jnp.abs(jnp.abs(ang) - jnp.pi) < cone_half))
                    sensor_ok = in_radius & ~dropped
                    if use_vis_occl:
                        # visible-area occlusion stage (host: visible_obstacles →
                        # compute_visible_area + obstacle_visible): polar map per
                        # agent from road walls + recorded obstacles at t0 + live
                        # peers, then the nearest-ray membership probe over each
                        # window row's 4 silhouette corners + center with the
                        # host's 0.3 m on-edge tolerance
                        from frenetix_tpu.sim.visible_area import (
                            obb_segments_batch, polar_visibility_batch)

                        op0 = g.obst_poses[t0]                        # (O, 3)
                        segs_o = obb_segments_batch(
                            op0[:, :2], op0[:, 2], g.obst_half)       # (O,4,2,2)
                        segs_p = obb_segments_batch(
                            center, theta,
                            jnp.broadcast_to(h_agent, center.shape))  # (A,4,2,2)
                        seg_pts = jnp.concatenate(
                            [g.road_segs, segs_o.reshape(-1, 2, 2),
                             segs_p.reshape(-1, 2, 2)])
                        o4 = jnp.repeat(g.obst_valid[t0], 4)
                        peer_ok = running_pre[None, :] & ~eye         # (A, A)
                        n_road = g.road_segs.shape[0]
                        seg_valid = jnp.concatenate([
                            jnp.ones((a_n, n_road), bool),
                            jnp.broadcast_to(o4[None], (a_n, o4.shape[0])),
                            jnp.repeat(peer_ok, 4, axis=1)], axis=1)  # (A, S)
                        r_vis = jax.vmap(
                            polar_visibility_batch,
                            in_axes=(0, None, None, 0, None))(
                            center, seg_pts[:, 0], seg_pts[:, 1], seg_valid,
                            sensor_radius)                            # (A, K)
                        cur = g.cur_obst[c]                           # (O', 3)
                        corners = obb_segments_batch(
                            cur[:, :2], cur[:, 2], g.cur_half[c])[:, :, 0]
                        probes = jnp.concatenate(
                            [corners, cur[:, None, :2]], axis=1)      # (O', 5, 2)
                        rel_p = probes[None] - center[:, None, None]  # (A,O',5,2)
                        rr = jnp.linalg.norm(rel_p, axis=-1)
                        ang_p = jnp.arctan2(rel_p[..., 1], rel_p[..., 0])
                        k_rays = r_vis.shape[1]
                        idx = jnp.round(
                            (ang_p + jnp.pi) / (2 * jnp.pi) * k_rays
                        ).astype(jnp.int32) % k_rays                  # (A,O',5)
                        r_at = jnp.take_along_axis(
                            r_vis[:, None].repeat(idx.shape[1], 1),
                            idx, axis=2)                              # (A,O',5)
                        vis = jnp.any(rr <= r_at + 0.3, axis=-1)      # (A, O')
                        sensor_ok = sensor_ok & vis
                    window = window._replace(
                        valid=window.valid & sensor_ok[:, :, None])
                if pcfg.mode == "ground_truth":
                    # mode-faithful peers (host: Simulation._peer_future): the
                    # remainder of each peer's executing plan from the carried
                    # bank; offset 1 at cycle 0 (the seed holds recorded/CV
                    # states of the current step), k+1 after (plans were
                    # selected one cycle ago, k sub-steps executed since)
                    agent_preds = agent_plan_predictions(
                        bank, bank_len, jnp.where(c == 0, 1, k + 1),
                        horizon=window.means.shape[2],
                        length=veh.length + 0.5, width=veh.width + 0.2,
                        cov_pos=pcfg.cov_pos, active=running_pre,
                    )
                else:
                    poses_all = jnp.concatenate(
                        [center, theta[:, None], v[:, None]], axis=1)
                    agent_preds = agent_pose_predictions(
                        poses_all, horizon=window.means.shape[2], dt=self.dt,
                        length=veh.length + 0.5, width=veh.width + 0.2,
                        cov_pos=pcfg.cov_pos, active=running_pre,
                    )
                preds = concat_obstacles(window, agent_preds)
                pm_extra = ()
                if use_occ:
                    # occlusion phantom injection (host: _agent_predictions →
                    # augment_predictions): spawn locator on device from the
                    # recorded obstacle poses + live ego, free-slot cap computed
                    # exactly as the host's post-augment free count
                    n_present = jnp.sum(jnp.any(window.valid, axis=2), axis=1)
                    n_peers = (jnp.sum(running_pre)
                               - running_pre.astype(jnp.int32))
                    n_free = window.valid.shape[1] - n_present - n_peers
                    ph, ph_mask, ph_pos = jax.vmap(
                        phantom_fn, in_axes=(None, None, 0, 0, 0, 0, 0, 0))(
                        g, c, center, n_free, g.turn_xy, g.turn_spawn,
                        g.turn_heading, g.turn_hot)
                    preds = concat_obstacles(preds, ph)
                    pm_full = jnp.concatenate([
                        jnp.zeros((a_n, window.valid.shape[1] + a_n), bool),
                        ph_mask], axis=1)
                    pm_extra = (pm_full,)
                    if use_occ_geom:
                        # on-device polar visibility map (occ_um) + phantom
                        # silhouette points (occ_ve) — host inputs gathered at
                        # reactive.py:412-443 via OcclusionModule.polar_map /
                        # occluder_points: scenario obstacles at the replan step
                        # plus LIVE peers occlude; road walls excluded
                        from frenetix_tpu.sim.visible_area import (
                            obb_segments_batch, polar_visibility_batch)

                        op0 = g.obst_poses[t0]                        # (O, 3)
                        segs_o = obb_segments_batch(
                            op0[:, :2], op0[:, 2], g.obst_half)       # (O,4,2,2)
                        segs_p = obb_segments_batch(
                            center, theta,
                            jnp.broadcast_to(h_agent, center.shape))  # (A,4,2,2)
                        seg_pts = jnp.concatenate(
                            [segs_o.reshape(-1, 2, 2), segs_p.reshape(-1, 2, 2)])
                        o4 = jnp.repeat(g.obst_valid[t0], 4)
                        peer_ok = running_pre[None, :] & ~eye         # (A, A)
                        seg_valid = jnp.concatenate([
                            jnp.broadcast_to(o4[None], (a_n, o4.shape[0])),
                            jnp.repeat(peer_ok, 4, axis=1)], axis=1)  # (A, S)
                        r_vis = jax.vmap(
                            polar_visibility_batch,
                            in_axes=(0, None, None, 0, None))(
                            center, seg_pts[:, 0], seg_pts[:, 1], seg_valid,
                            sensor_radius)                            # (A, K)
                        pm_extra = pm_extra + (center, r_vis, ph_pos, ph_mask)
            ctx = CycleContext(
                ref=g.ref, veh=veh, weights=weights, preds=preds,
                obstacle_xy=preds.means[:, :, 0],
                obstacle_valid=preds.valid[:, :, 0],
                corridor=g.corridors,
                lane_segments=g.lane_segments,
                lane_valid=g.lane_valid,
                x0_orientation=theta, desired_velocity=v_des,
                desired_avg_velocity=v_des,
            )
            # progressive densification (reactive_planner_cpp.py:329-377):
            # every configured level evaluates; the first level that finds a
            # candidate wins per agent, and when none does the LAST level's
            # stopping fallback applies (the host falls back on last_res)
            extra = (*((g.lane,) if resp_w != 0.0 else ()), *pm_extra)
            out = run_cycle(matrix_fns[0](x_cl, v), masks_l[0], ctx,
                            x_cl[:, 3], v, extra)
            for li in range(1, len(matrix_fns)):
                # densification level li evaluates only when some agent is
                # still without a candidate (runtime branch — the host stops
                # at the first level that finds one; with every agent found,
                # the merge below keeps the previous result everywhere, so
                # skipping is value-identical)
                prev_found = out["found"]

                def eval_level(_, li=li, out=out, prev_found=prev_found):
                    out_l = run_cycle(matrix_fns[li](x_cl, v), masks_l[li],
                                      ctx, x_cl[:, 3], v, extra)

                    def pick(a, b, f=prev_found):
                        return jnp.where(
                            f.reshape(f.shape + (1,) * (a.ndim - 1)), a, b)

                    return jax.tree.map(pick, out, out_l)

                out = jax.lax.cond(jnp.all(prev_found),
                                   lambda _, out=out: out, eval_level, None)
            if behavior is not None:
                # hybrid stopping mode: the host tries the quintic stopping
                # matrix FIRST (only ever at the first level — one stopping
                # miss flips use_stopping off, reactive.py:318-321) and falls
                # back to the regular ladder, so the merged result is
                # "stopping when it found a candidate, regular otherwise".
                # Runtime-branched: no agent wants stopping → skip the whole
                # stopping program (take would be all-false anyway).
                _, stop_mat, stop_mask, wants_stop = behavior

                def eval_stop(_, out=out):
                    out_stop = run_cycle(stop_mat, stop_mask, ctx,
                                         x_cl[:, 3], v, extra, stop=True)
                    take = wants_stop & out_stop["found"]

                    def pick_stop(a, b, f=take):
                        return jnp.where(
                            f.reshape(f.shape + (1,) * (a.ndim - 1)), b, a)

                    return jax.tree.map(pick_stop, out, out_stop)

                out = jax.lax.cond(jnp.any(wants_stop),
                                   eval_stop, lambda _, out=out: out, None)
            found = out["found"]
            # host emergency ladder (plan() fallback): standstill at v ≤ 0.1
            # takes precedence, then the stopping fallback, then failure
            std = running & ~found & (v <= 0.1)
            fail = running & ~found & ~std & ~out["fb_ok"] & in_horizon
            status = jnp.where(fail, _ERROR, status)
            running = status == _RUNNING
            sel = out["sel"]

            # --- publish this cycle's plan into the peer bank -------------
            # (host: a.current_plan becomes the peers' GT prediction source;
            # standstill agents publish the host's standstill plan —
            # constant center pose, v = 0, reactive._standstill_trajectory)
            plan_th = out["theta"]                              # (A, N+1)
            bank_plan = jnp.stack([
                out["x"] + wb * jnp.cos(plan_th),
                out["y"] + wb * jnp.sin(plan_th),
                plan_th, out["v"]], axis=-1)                    # (A, N+1, 4)
            w_bank = bank.shape[1]
            if w_bank > bank_plan.shape[1]:
                pad = jnp.repeat(bank_plan[:, -1:],
                                 w_bank - bank_plan.shape[1], axis=1)
                bank_plan = jnp.concatenate([bank_plan, pad], axis=1)
            std_row = jnp.concatenate(
                [center, theta[:, None], jnp.zeros_like(v)[:, None]],
                axis=1)                                         # (A, 4)
            bank = jnp.where(
                std[:, None, None],
                jnp.broadcast_to(std_row[:, None, :], bank.shape),
                bank_plan[:, :w_bank])
            bank_len = jnp.full_like(bank_len, n_steps + 1)

            # --- execute k sub-steps with the status ladder ---------------
            traj_steps, status_steps = [], []
            for j in range(1, k + 1):
                t_glob = t0 + j
                if j > 1:
                    reached = (goal_fn(g, center, v) & running
                               & (t_glob <= g.max_steps))
                    status = jnp.where(reached, _SUCCESS, status)
                    running = status == _RUNNING
                step_ok = running & (t_glob <= g.max_steps)
                if fsm_mode:
                    # the WorldView presence rule: an agent "has a state at
                    # t" iff it executed step t (colliding state included)
                    last_exec = jnp.where(step_ok, t_glob, last_exec)
                mov = step_ok & ~std
                rear = jnp.stack([out["x"][:, j], out["y"][:, j]], axis=1)
                th_j = out["theta"][:, j]
                c_j = rear + wb * jnp.stack(
                    [jnp.cos(th_j), jnp.sin(th_j)], axis=1)
                if kap is not None:
                    # θ before this sub-step's update (std agents hold θ →
                    # yaw 0, matching the host's constant-pose standstill);
                    # κ holds for std/frozen agents (standstill keeps κ₀,
                    # reactive.py:516-537)
                    th_prev = jnp.where(step_ok, theta, th_prev)
                    kap = jnp.where(mov, out["kappa"][:, j], kap)
                center = jnp.where(mov[:, None], c_j, center)
                theta = jnp.where(mov, th_j, theta)
                # standstill agents hold pose and brake to zero (host
                # _standstill_trajectory: constant pose, braking pulse)
                v = jnp.where(mov, out["v"][:, j],
                              jnp.where(step_ok & std, 0.0, v))
                acc = jnp.where(mov, out["a"][:, j],
                                jnp.where(step_ok & std, 0.0, acc))
                hold_cl = x_cl.at[:, 1].set(0.0).at[:, 2].set(0.0) \
                              .at[:, 4].set(0.0).at[:, 5].set(0.0)
                x_cl = jnp.where(mov[:, None], jnp.stack(
                    [out["s"][:, j], out["s_dot"][:, j], out["s_ddot"][:, j],
                     out["d"][:, j], out["d_dot"][:, j], out["d_ddot"][:, j]],
                    axis=1), jnp.where((step_ok & std)[:, None], hold_cl, x_cl))

                # collision ladder at the new poses — the host's EXACT
                # in-order sweep (_check_collisions): each agent first checks
                # obstacles, then live peers; an agent marked COLLISION
                # immediately "leaves the world" for later agents' checks, so
                # in a mutually overlapping pair only the first-in-order
                # agent is marked and the partner keeps driving (the
                # reference's ended-trajectory semantics).  A sequential
                # fori_loop reproduces the order dependence.
                op = g.obst_poses[t_glob]                 # (O, 3)
                ov = g.obst_valid[t_glob]                 # (O,)
                hit_obs = jnp.any(
                    obb_overlap(center[:, None], theta[:, None],
                                h_agent[None, None], op[None, :, :2],
                                op[None, :, 2], g.obst_half[None]) & ov[None],
                    axis=1)
                live = step_ok
                pair = obb_overlap(center[:, None], theta[:, None],
                                   h_agent[None, None], center[None, :],
                                   theta[None, :], h_agent[None, None]) & ~eye

                def _sweep(i, marked):
                    peers = live & ~marked
                    hit = hit_obs[i] | jnp.any(pair[i] & peers)
                    return marked.at[i].set(hit & live[i])

                collided = jax.lax.fori_loop(
                    0, pair.shape[0], _sweep,
                    jnp.zeros(pair.shape[0], bool))
                status = jnp.where(collided, _COLLISION, status)
                running = status == _RUNNING

                traj_steps.append(jnp.concatenate(
                    [center, theta[:, None], v[:, None], acc[:, None]],
                    axis=1))
                status_steps.append(status)

            if fsm_mode:
                carry = (x_cl, center, theta, v, acc, status, bank, bank_len,
                         last_exec, fsm_c)
            elif behavior is None:
                carry = (x_cl, center, theta, v, acc, status, bank, bank_len)
            else:
                carry = (x_cl, center, theta, v, acc, kap, th_prev, status,
                         bank, bank_len)
            # x_cl0_cycle: the curvilinear state each agent REPLANNED from
            # this cycle (exposed for debugging/regression)
            ys = (jnp.stack(traj_steps), jnp.stack(status_steps), sel, found,
                  x_cl_replan)
            if emit_margins:
                ys = ys + (out["margin_gap"], out["margin_rel"])
            return carry, ys

        if hybrid and hybrid_pred:
            def step(g, carry, c, v_des, stop_mat, stop_mask, wants_stop,
                     preds):
                return body(g, carry, c,
                            behavior=(v_des, stop_mat, stop_mask, wants_stop),
                            pred_override=preds)

            return jax.jit(step)

        if hybrid:
            def step(g, carry, c, v_des, stop_mat, stop_mask, wants_stop):
                return body(g, carry, c,
                            behavior=(v_des, stop_mat, stop_mask, wants_stop))

            return jax.jit(step)

        if hybrid_pred:
            def step(g, carry, c, preds):
                return body(g, carry, c, pred_override=preds)

            return jax.jit(step)

        def run(g: SimTensors):
            center0 = g.pose0[:, :2]
            theta0, v0 = g.pose0[:, 2], g.pose0[:, 3]
            status0 = jnp.where(g.active0, _RUNNING, _ERROR).astype(jnp.int32)
            if fsm_mode:
                carry0 = (g.x_cl0, center0, theta0, v0, g.acc0, status0,
                          g.bank0, g.bank_len0,
                          jnp.zeros(a_n, jnp.int32), g.fsm_carry0)
            else:
                carry0 = (g.x_cl0, center0, theta0, v0, g.acc0, status0,
                          g.bank0, g.bank_len0)
            carry, ys = jax.lax.scan(
                lambda carry, c: body(g, carry, c), carry0,
                jnp.arange(n_cycles, dtype=jnp.int32))
            traj, status_steps, sel, found, x_cl_cycles = ys[:5]
            t_tot = n_cycles * k
            out = {
                "final_status": carry[5],
                "trajectories": traj.reshape(t_tot, a_n, 5),
                "status_per_step": status_steps.reshape(t_tot, a_n),
                "selections": sel,
                "found": found,
                "x_cl_cycles": x_cl_cycles,
            }
            if fsm_mode:
                out["fsm_bail"] = carry[9].bail
            if emit_margins:
                out["margin_gap"], out["margin_rel"] = ys[5], ys[6]
            return out

        return jax.jit(run)

    def _finalize(self, out) -> DeviceSimResult:
        """Host epilogue on the fetched dict of ONE scenario (host loop
        parity): clip to max_steps; agents still RUNNING at the end get
        TIMELIMIT (simulation.py:724-726)."""
        a_n = len(self.agents)
        status = np.asarray(out["final_status"][:a_n]).copy()
        status[status == _RUNNING] = _TIMELIMIT
        traj = np.asarray(out["trajectories"])[: self.max_steps, :a_n]
        sps = np.asarray(out["status_per_step"])[: self.max_steps, :a_n]
        # executed steps: the host loop breaks once no agent is RUNNING
        # after a step (sps[i] is the status after executed step i+1)
        alive = (sps == _RUNNING).any(axis=1)
        steps = self.max_steps if alive.all() else int(np.argmin(alive)) + 1
        return DeviceSimResult(
            agent_ids=[a.id for a in self.agents],
            status=status,
            steps=steps,
            trajectories=traj,
            status_per_step=sps,
            selections=np.asarray(out["selections"])[:, :a_n],
            found=np.asarray(out["found"])[:, :a_n],
            extras={"x_cl_cycles": np.asarray(out["x_cl_cycles"])[:, :a_n]},
        )

    def run(self) -> DeviceSimResult:
        import time

        import jax

        if (self.hybrid_behavior and not self.fsm_in_scan) \
                or self.hybrid_pred:
            return self._run_hybrid()
        t_start = time.perf_counter()
        if self._run_fn is None:
            if self.mesh is None:
                # AOT warm start (utils/aot_cache): a later process with the
                # same code+config+shapes skips Python re-tracing entirely
                from frenetix_tpu.utils.aot_cache import cached_program

                self._run_fn = cached_program(
                    "devsim", (repr(self.config), len(self.agents),
                               self.n_cycles, self.fsm_in_scan),
                    self.tensors,
                    lambda: self._build_run(fsm_mode=self.fsm_in_scan))
            else:
                self._run_fn = self._build_run(fsm_mode=self.fsm_in_scan)
        out = self._run_fn(self.tensors)
        out = jax.device_get(out)     # THE one fetch
        if self.fsm_in_scan and bool(np.asarray(out.get("fsm_bail"))):
            # the in-scan FSM hit an unsupported transition (overtake
            # initiation) — re-run transparently on the hybrid host-FSM
            # path (mirrors untouched; outcomes never diverge from host)
            return self._run_hybrid()
        res = self._finalize(out)
        res.wall_time = time.perf_counter() - t_start
        return res

    def _build_stop_matrix_fn(self):
        """Per-agent in-scan quintic stopping matrix — device twin of
        ReactivePlanner._stopping_matrix at level sampling_min (the only
        level the host ever tries, reactive.py:318-321).  Fixed rows: the
        static t1 grid x ns end positions x (nd+1) end offsets, padded with
        benign masked rows up to the hybrid stop bucket.  A duplicate d1
        row (the host's union1d dedups when x0_lat[0] hits a linspace value
        exactly) is an identical candidate — same selection outcome."""
        import jax.numpy as jnp

        from frenetix_tpu.ops import sampling as smp

        p = self.config.planning
        lvl = p.sampling_min
        dtype = self.np_dtype
        t1_np = smp.time_samples(p.t_min, self.horizon, self.dt, lvl)
        t1_np = np.unique(np.concatenate([t1_np, [self.n_steps * self.dt]]))
        t1 = jnp.asarray(t1_np.astype(dtype))
        ns = len(smp.linspace_samples(0.0, 1.0, lvl))
        nd_lin = len(smp.linspace_samples(0.0, 1.0, max(lvl - 1, 0)))
        m_stop = self._stop_bucket
        horizon, n_steps, dt = self.horizon, self.n_steps, self.dt

        def linspace(lo, hi, n):
            # np.linspace twin: lo + i*step, endpoint pinned
            step = (hi - lo) / (n - 1)
            vals = lo + jnp.arange(n, dtype=dtype) * step
            return vals.at[-1].set(hi)

        def one(x_cl, stop_s, stop_v, wants):
            s0, ss0, sss0 = x_cl[0], x_cl[1], x_cl[2]
            d0, dd0, ddd0 = x_cl[3], x_cl[4], x_cl[5]
            ref_vel = (ss0 + stop_v) / 2.0
            d_delta = jnp.where(ref_vel < 5.0,
                                jnp.maximum((ss0 / 5.0) * 0.4, 0.01), 0.4)
            s1 = linspace((s0 + stop_s) / 2.0, stop_s, ns)
            d1 = jnp.sort(jnp.concatenate(
                [linspace(d0 - d_delta, d0 + d_delta, nd_lin), d0[None]]))
            nt = t1.shape[0]
            nd = nd_lin + 1
            m = nt * ns * nd
            mat = jnp.zeros((m, 13), x_cl.dtype)
            mat = mat.at[:, 1].set(jnp.repeat(t1, ns * nd))
            mat = mat.at[:, 5].set(jnp.tile(jnp.repeat(s1, nd), nt))
            mat = mat.at[:, 10].set(jnp.tile(d1, nt * ns))
            mat = mat.at[:, 2].set(s0).at[:, 3].set(ss0).at[:, 4].set(sss0)
            mat = mat.at[:, 7].set(d0).at[:, 8].set(dd0).at[:, 9].set(ddd0)
            mask = jnp.broadcast_to(wants, (m,))
            benign = jnp.zeros((1, 13), x_cl.dtype)
            benign = benign.at[0, 1].set(n_steps * dt)
            benign = benign.at[0, 2:5].set(x_cl[:3])
            benign = benign.at[0, 5].set(
                s0 + jnp.maximum(ss0, 1.0) * horizon)
            benign = benign.at[0, 7:10].set(x_cl[3:])
            benign = benign.at[0, 10].set(d0)
            mat = jnp.where(wants, mat, jnp.broadcast_to(benign, mat.shape))
            if m < m_stop:
                pad = jnp.broadcast_to(benign, (m_stop - m, 13))
                mat = jnp.concatenate([mat, pad])
                mask = jnp.concatenate([mask, jnp.zeros(m_stop - m, bool)])
            return mat, mask

        return one

    def _benign_stop_rows(self, x_cl_row):
        """A well-conditioned masked-out stopping matrix for agents not in
        stopping mode this cycle: the rows still flow through the quintic
        coefficient solve, so they must be numerically sane (no t1=0)."""
        m = np.zeros((1, 13), self.np_dtype)
        m[0, 1] = self.n_steps * self.dt
        m[0, 2:5] = x_cl_row[:3]
        m[0, 5] = x_cl_row[0] + max(float(x_cl_row[1]), 1.0) * self.horizon
        m[0, 7:10] = x_cl_row[3:]
        m[0, 10] = x_cl_row[3]
        return np.repeat(m, self._stop_bucket, axis=0)

    def _run_hybrid(self) -> DeviceSimResult:
        """Hybrid driver: device cycles with host work in between.

        Two independent host stages compose here: the behavior FSM
        (`hybrid_behavior`) and the walenet prediction build
        (`hybrid_pred`) — either or both.

        The FSM is data-dependent host control logic (as in the reference —
        behavior_module.py:113-193 runs per replan step on host), so the run
        trades the whole-run `lax.scan` for one jitted device cycle per
        replan with the FSM between cycles.  Per cycle: ONE small fetch (the
        six carry leaves — O(A) floats), host `BehaviorModule.execute` per
        running agent at the host loop's cadence (replan steps only,
        sim/agent.py:310-321), reference-path swaps restack the agent tables
        exactly like the batched host path (sim/simulation.py:422-437, with
        the curvilinear state recomputed on the new frame by
        `apply_behavior_output` → `ensure_x_cl`), qualifying stop points
        build the host's own quintic stopping matrix
        (ReactivePlanner._stopping_matrix at level sampling_min — the only
        level the host ever tries, reactive.py:318-321), then one device
        cycle runs matrix build, full evaluation, emergency ladder, the k
        execute sub-steps and the status ladder unchanged.
        """
        import time

        import jax

        t_start = time.perf_counter()
        jnp = self.jnp
        behavior_on, pred_on = self.hybrid_behavior, self.hybrid_pred
        if self._hybrid_fn is None:
            self._hybrid_fn = self._build_run(hybrid=behavior_on,
                                              hybrid_pred=pred_on)
        step_fn = self._hybrid_fn
        g = self.tensors
        if behavior_on:
            carry = self._hybrid_carry0(g)
        else:
            # pred-only hybrid runs on the non-behavior carry layout
            pose0 = jnp.asarray(g.pose0)
            status0 = jnp.where(jnp.asarray(g.active0), _RUNNING,
                                _ERROR).astype(jnp.int32)
            carry = (jnp.asarray(g.x_cl0), pose0[:, :2], pose0[:, 2],
                     pose0[:, 3], jnp.asarray(g.acc0), status0,
                     jnp.asarray(g.bank0), jnp.asarray(g.bank_len0))
        status_idx = 7 if behavior_on else 5

        ys_list = []
        for c in range(self.n_cycles):
            carry_h = jax.device_get(carry)
            if pred_on:
                ys_prev = jax.device_get(ys_list[-1]) if ys_list else None
                self._sync_exec_mirrors(c, carry_h, ys_prev, status_idx)
            args = ()
            if behavior_on:
                v_des, wants, stop_mat, stop_mask, x_cl_new, swapped = (
                    self._hybrid_host_cycle(c, carry_h, synced=pred_on))

                if swapped:
                    self._hybrid_restack()
                    g = self.tensors
                    carry = (jnp.asarray(x_cl_new), *carry[1:])
                args = (jnp.asarray(v_des), jnp.asarray(stop_mat),
                        jnp.asarray(stop_mask), jnp.asarray(wants))
            if pred_on:
                args = args + (self._hybrid_pred_cycle(c),)

            carry, ys = step_fn(g, carry, jnp.asarray(c, jnp.int32), *args)
            ys_list.append(ys)

        ys_h = jax.device_get(ys_list)
        out = {
            "final_status": np.asarray(jax.device_get(carry[status_idx])),
            "trajectories": np.concatenate([y[0] for y in ys_h]),
            "status_per_step": np.concatenate([y[1] for y in ys_h]),
            "selections": np.stack([y[2] for y in ys_h]),
            "found": np.stack([y[3] for y in ys_h]),
            "x_cl_cycles": np.stack([y[4] for y in ys_h]),
        }
        res = self._finalize(out)
        res.wall_time = time.perf_counter() - t_start
        return res

    def _sync_exec_mirrors(self, c: int, carry_h, ys_prev, status_idx):
        """Sync the host agent mirrors with the device state for the hybrid
        prediction path (walenet): current EgoState, status, and the
        previous cycle's executed sub-step states appended to each agent's
        record — walenet consumes 30-step executed histories
        (wale_net.py:236-259), so unlike the behavior hybrid's
        replan-step-only sync, every executed state must land in
        `a.record.states` (the host appends one per executed step, plus the
        single colliding state)."""
        from frenetix_tpu.sim.agent import AgentStatus, EgoState

        if c == 0:
            # construction mirrors are already exact (initial states)
            self._mirror_prev_running = [True] * len(self.agents)
            return
        k = self.k_replan
        t0 = c * k
        (x_cl_h, center_h, theta_h, v_h, acc_h) = (
            np.asarray(x) for x in carry_h[:5])
        status_h = np.asarray(carry_h[status_idx])
        traj = np.asarray(ys_prev[0])     # (k, A_pad, 5)
        sps = np.asarray(ys_prev[1])      # (k, A_pad)
        prev_running = self._mirror_prev_running
        for i, a in enumerate(self.agents):
            was_running = prev_running[i]
            for j in range(traj.shape[0]):
                s_j = int(sps[j, i])
                executed = (s_j == _RUNNING) or (
                    s_j == _COLLISION and was_running)
                was_running = s_j == _RUNNING
                if not executed:
                    continue
                x, y, th, vv, aa = (float(f) for f in traj[j, i])
                t_j = (c - 1) * k + j + 1
                if a.record.states and                         a.record.states[-1].time_step >= t_j:
                    continue
                prev_th = (a.record.states[-1].orientation
                           if a.record.states else th)
                yaw = (th - prev_th) / self.dt
                a.record.states.append(EgoState(
                    time_step=t_j, position=np.array([x, y]),
                    orientation=th, velocity=vv, acceleration=aa,
                    yaw_rate=yaw,
                    steering_angle=float(np.arctan2(
                        self.veh.wheelbase * yaw, max(vv, 1e-3)))))
            prev_running[i] = was_running
            a.status = AgentStatus(int(status_h[i]))
            if int(status_h[i]) == _RUNNING:
                a.state = EgoState(
                    time_step=t0, position=np.asarray(center_h[i]).copy(),
                    orientation=float(theta_h[i]), velocity=float(v_h[i]),
                    acceleration=float(acc_h[i]))
                a.x_cl = (x_cl_h[i, :3].copy(), x_cl_h[i, 3:].copy())
            elif a.record.states:
                a.state = a.record.states[-1]

    def _hybrid_pred_cycle(self, c: int):
        """Host prediction build for one hybrid cycle (walenet): the host's
        own `_predictions_for_step` + `_agent_predictions` over the synced
        mirrors — sensor filtering, WorldView-backed net inference and peer
        rows included, then stacked to (A, O, ...) device tensors."""
        import jax.numpy as jnp

        from frenetix_tpu.ops.costs import PredictionTensors
        from frenetix_tpu.sim.agent import AgentStatus

        sim = self.sim
        sim._peer_rows_cache = None
        t0 = c * self.k_replan
        pd_base, ids = sim._predictions_for_step(t0)
        a_n = len(self.agents)
        o = pd_base["valid"].shape[0]
        h = pd_base["valid"].shape[1]
        dtype = self.np_dtype
        f = dict(
            means=np.zeros((a_n, o, h, 2), dtype),
            covs=np.tile(np.eye(2, dtype=dtype)[None, None, None],
                         (a_n, o, h, 1, 1)),
            inv_covs=np.tile(np.eye(2, dtype=dtype)[None, None, None],
                             (a_n, o, h, 1, 1)),
            orientations=np.zeros((a_n, o, h), dtype),
            velocities=np.zeros((a_n, o, h), dtype),
            lengths=np.full((a_n, o), 4.5, dtype),
            widths=np.full((a_n, o), 2.0, dtype),
            valid=np.zeros((a_n, o, h), bool),
        )
        for i, a in enumerate(self.agents):
            if a.status not in (AgentStatus.IDLE, AgentStatus.RUNNING):
                continue
            pd = sim._agent_predictions(pd_base, ids, a)[0]
            for k_ in f:
                f[k_][i] = pd[k_]
        return PredictionTensors(**{k_: jnp.asarray(v)
                                    for k_, v in f.items()})

    def _hybrid_carry0(self, g: SimTensors):
        """Initial hybrid carry from (possibly fleet-padded) SimTensors:
        (x_cl, center, theta, v, acc, kappa, theta_prev, status, bank,
        bank_len).  Padded agent rows replicate agent 0's kappa (numerically
        sane, inert via status ERROR)."""
        jnp = self.jnp
        status0 = jnp.where(jnp.asarray(g.active0), _RUNNING,
                            _ERROR).astype(jnp.int32)
        kap = np.array([np.tan(float(a.state.steering_angle))
                        / self.veh.wheelbase for a in self.agents],
                       self.np_dtype)
        a_pad = int(np.asarray(g.active0).shape[0])
        if a_pad > kap.shape[0]:
            kap = np.concatenate(
                [kap, np.repeat(kap[:1], a_pad - kap.shape[0])])
        pose0 = jnp.asarray(g.pose0)
        return (jnp.asarray(g.x_cl0), pose0[:, :2], pose0[:, 2], pose0[:, 3],
                jnp.asarray(g.acc0), jnp.asarray(kap), pose0[:, 2], status0,
                jnp.asarray(g.bank0), jnp.asarray(g.bank_len0))

    def _hybrid_restack(self):
        """Rebuild the per-agent tables after a behavior reference-path swap
        — the same rebuild the batched host path performs
        (sim/simulation.py:422-437).  A longer new path grows the common R
        bucket and retraces the device step (jit handles it)."""
        from frenetix_tpu.parallel.batched_sim import BatchedAgentStepper

        self.stepper = BatchedAgentStepper(self.config, self.agents)
        self.tensors = self.tensors._replace(
            ref=self.stepper.ref, corridors=self.stepper.corridors,
            lane_segments=self.stepper.lane_segments,
            lane_valid=self.stepper.lane_valid)

    def _hybrid_host_cycle(self, c: int, carry_h, inert: bool = False,
                           synced: bool = False):
        """Host side of one hybrid cycle: sync mirrors, run the FSM, build
        the stopping program inputs.

        `carry_h` is the fetched 8-tuple of np arrays, whose agent axis may
        be fleet-padded (a_pad ≥ len(self.agents)); padded rows get benign
        stop rows and v_des = current v (they are inert — status ERROR).
        `inert=True` (a fleet member past its own cycle horizon) skips the
        mirror sync and FSM entirely.  Returns
        (v_des, wants, stop_mat, stop_mask, x_cl_new, swapped)."""
        from frenetix_tpu.planner.reactive import wants_stopping_mode
        from frenetix_tpu.sim.agent import EgoState
        from frenetix_tpu.sim.planner_interfaces import apply_behavior_output

        dtype = self.np_dtype
        k = self.k_replan
        stop_thr = self.config.behavior.stopping_mode_threshold
        lvl0 = self.config.planning.sampling_min
        m_stop = self._stop_bucket
        wb = self.veh.wheelbase

        (x_cl_h, center_h, theta_h, v_h, acc_h, kap_h, th_prev_h,
         status_h) = carry_h[:8]
        x_cl_h = np.asarray(x_cl_h)
        a_pad = x_cl_h.shape[0]
        t0 = c * k
        v_des = np.asarray(v_h, dtype).copy()
        wants = np.zeros(a_pad, bool)
        stop_mat = np.zeros((a_pad, m_stop, 13), dtype)
        stop_mask = np.zeros((a_pad, m_stop), bool)
        for i in range(a_pad):
            stop_mat[i] = self._benign_stop_rows(x_cl_h[i])
        x_cl_new = x_cl_h.copy()
        if inert:
            return v_des, wants, stop_mat, stop_mask, x_cl_new, False

        # ---- sync host mirrors (behavior peers observe executed records
        # through WorldView — sim/world_view.py).  Cycle 0 skips the sync:
        # a fresh host Simulation's mirrors (initial state, x_cl, record)
        # are already exact, including the scenario's initial yaw rate the
        # carry does not track.  `synced=True` (walenet hybrid) skips it
        # too — _sync_exec_mirrors already wrote richer mirrors. ----------
        for i, a in enumerate(self.agents if (c > 0 and not synced) else ()):
            a.state = EgoState(
                time_step=t0, position=np.asarray(center_h[i]).copy(),
                orientation=float(theta_h[i]), velocity=float(v_h[i]),
                acceleration=float(acc_h[i]),
                yaw_rate=float(theta_h[i] - th_prev_h[i]) / self.dt,
                steering_angle=float(
                    np.arctan2(wb * float(kap_h[i]), 1.0)))
            a.x_cl = (x_cl_h[i, :3].copy(), x_cl_h[i, 3:].copy())
            if status_h[i] == _RUNNING and (
                    not a.record.states
                    or a.record.states[-1].time_step < t0):
                a.record.states.append(a.state)

        # ---- host FSM per running agent ---------------------------------
        swapped = False
        for i, a in enumerate(self.agents):
            if int(status_h[i]) != _RUNNING:
                continue
            if a.behavior is None:
                v_des[i] = a.desired_velocity()
                continue
            b_out = a.behavior.execute(None, a.state, t0)
            if apply_behavior_output(a, b_out):
                swapped = True
                lon, lat = a.x_cl
                x_cl_new[i] = np.concatenate(
                    [np.asarray(lon), np.asarray(lat)]).astype(dtype)
            v_des[i] = b_out.desired_velocity
            sp = a.planner.stop_point
            x_cl_t = (x_cl_new[i, :3], x_cl_new[i, 3:])
            if sp is not None and wants_stopping_mode(sp, x_cl_t, stop_thr):
                m = a.planner._stopping_matrix(lvl0, x_cl_t)
                assert m.shape[0] <= m_stop, (m.shape, m_stop)
                stop_mat[i, :m.shape[0]] = m.astype(dtype)
                stop_mask[i, :m.shape[0]] = True
                wants[i] = True
        return v_des, wants, stop_mat, stop_mask, x_cl_new, swapped

    def _padded_tensors(self, a_max, c_max, r_max, s_max, o_max, t1_max,
                        g_max, e_max, l_max=None, le_max=None, oc_max=None,
                        r2_max=None, sr_max=None,
                        fsm_dims=None) -> SimTensors:
        """This scenario's SimTensors padded to the fleet maxima.

        Padding is inert by construction: extra agents carry active0=False
        (status ERROR from step 0, excluded from predictions/collisions) and
        replicate agent 0's state/tables so their dead computation is
        numerically sane; extra obstacle/goal rows carry valid=False; extra
        cycles repeat the last prediction window (agents are frozen by their
        per-scenario max_steps long before)."""
        from frenetix_tpu.parallel.mesh import _pad_table

        g = self.tensors
        np_ = np

        def pad_a(x, axis=0):
            """Pad the agent axis by replicating index 0."""
            x = np_.asarray(x)
            k = a_max - x.shape[axis]
            if k <= 0:
                return x
            rep = np_.repeat(np_.take(x, [0], axis=axis), k, axis=axis)
            return np_.concatenate([x, rep], axis=axis)

        def pad_zero(x, size, axis):
            x = np_.asarray(x)
            k = size - x.shape[axis]
            if k <= 0:
                return x
            shape = list(x.shape)
            shape[axis] = k
            return np_.concatenate(
                [x, np_.zeros(shape, x.dtype)], axis=axis)

        def pad_repeat(x, size, axis):
            x = np_.asarray(x)
            k = size - x.shape[axis]
            if k <= 0:
                return x
            rep = np_.repeat(np_.take(x, [x.shape[axis] - 1], axis=axis),
                             k, axis=axis)
            return np_.concatenate([x, rep], axis=axis)

        ref = type(g.ref)(**{
            name: pad_a(np_.stack([
                _pad_table(row, r_max, is_pathlength=(name == "s"))
                for row in np_.asarray(getattr(g.ref, name))
            ]))
            for name in type(g.ref)._fields
        })
        pred_windows = {
            k_: pad_repeat(v, c_max, axis=0)
            for k_, v in g.pred_windows.items()
        }
        occ_fields = {}
        if g.occ_obst is not None:
            occ_fields = dict(
                occ_obst=pad_zero(pad_repeat(g.occ_obst, c_max, 0), oc_max, 1),
                occ_obst_valid=pad_zero(
                    pad_repeat(g.occ_obst_valid, c_max, 0), oc_max, 1),
                occ_is_dyn=pad_zero(g.occ_is_dyn, oc_max, 0),
                occ_half=pad_zero(g.occ_half, oc_max, 0),
                occ_cat_ok=pad_zero(g.occ_cat_ok, oc_max, 0),
                # padded route vertices carry turn_hot=False, so their
                # positions never become candidates
                turn_xy=pad_a(pad_zero(g.turn_xy, r2_max, 1)),
                turn_spawn=pad_a(pad_zero(g.turn_spawn, r2_max, 1)),
                turn_heading=pad_a(pad_zero(g.turn_heading, r2_max, 1)),
                turn_hot=pad_a(pad_zero(g.turn_hot, r2_max, 1)),
            )
        lane = g.lane
        if lane is not None:
            # pad the vertex axis by REPEATING the last vertex (degenerate
            # edges add no even-odd crossings); padded lanelet rows carry
            # ring_valid=False and all-False closure rows/cols, so they can
            # neither start nor join a closure
            rings = pad_repeat(lane.rings, le_max, axis=1)
            rings = pad_zero(rings, l_max, axis=0)
            closure = pad_zero(pad_zero(lane.closure, l_max, 0), l_max, 1)
            lane = type(lane)(
                rings=rings,
                ring_valid=pad_zero(lane.ring_valid, l_max, 0),
                closure=closure,
            )
        vis_fields = {}
        if g.road_segs is not None:
            # zero-padded road segments are degenerate (a = b ⇒ denom 0) and
            # never intersect a ray; cur_half pads on the cycle axis only
            # (the window O dim is config-static across a fleet)
            vis_fields = dict(
                road_segs=pad_zero(g.road_segs, sr_max, 0),
                cur_half=pad_repeat(g.cur_half, c_max, 0),
            )
        return SimTensors(
            **occ_fields,
            **vis_fields,
            cur_obst=pad_repeat(g.cur_obst, c_max, 0),
            cur_obst_valid=pad_repeat(g.cur_obst_valid, c_max, 0),
            ref=ref,
            corridors=pad_a(np_.stack([
                _pad_table(row, r_max) for row in np_.asarray(g.corridors)
            ])),
            lane_segments=pad_a(pad_zero(g.lane_segments, s_max, 1)),
            lane_valid=pad_a(pad_zero(g.lane_valid, s_max, 1)),
            pred_windows=pred_windows,
            obst_poses=pad_zero(pad_zero(g.obst_poses, t1_max, 0), o_max, 1),
            obst_valid=pad_zero(pad_zero(g.obst_valid, t1_max, 0), o_max, 1),
            obst_half=pad_zero(g.obst_half, o_max, 0),
            g_rings=pad_a(pad_zero(pad_zero(g.g_rings, e_max, 2), g_max, 1)),
            g_ring_valid=pad_a(pad_zero(g.g_ring_valid, g_max, 1)),
            g_ring_v=pad_a(pad_zero(g.g_ring_v, g_max, 1)),
            g_vo_has=pad_a(g.g_vo_has),
            g_vo_int=pad_a(g.g_vo_int),
            goal_s=pad_a(g.goal_s),
            has_goal_s=pad_a(g.has_goal_s),
            goal_t_hi=pad_a(g.goal_t_hi),
            has_goal_t=pad_a(g.has_goal_t),
            goal_v_mean=pad_a(g.goal_v_mean),
            max_steps=np_.asarray(g.max_steps),
            active0=np_.concatenate([
                np_.ones(len(self.agents), bool),
                np_.zeros(a_max - len(self.agents), bool),
            ]),
            x_cl0=pad_a(g.x_cl0),
            pose0=pad_a(g.pose0),
            acc0=pad_a(g.acc0),
            lane=lane,
            bank0=pad_a(g.bank0),
            bank_len0=pad_a(g.bank_len0),
            **_pad_fsm_fields(self, a_max, fsm_dims),
        )

    def to_simulation_result(self, dres: DeviceSimResult):
        """Adapt a device run into the host `SimulationResult` shape so the
        downstream pipeline (score CSV, plots, criticality metrics) consumes
        it unchanged.  Histories follow the host recording convention: the
        initial state, then every state executed while RUNNING, including
        the colliding state (the host appends it before the post-step
        collision check flags the agent)."""
        from frenetix_tpu.sim.agent import AgentStatus, EgoState
        from frenetix_tpu.sim.simulation import SimulationResult

        wb = self.veh.wheelbase
        messages = {
            int(AgentStatus.COMPLETED_SUCCESS): "success",
            int(AgentStatus.TIMELIMIT): "timelimit",
            int(AgentStatus.COLLISION): "collision",
            int(AgentStatus.ERROR): "no feasible trajectory",
        }
        histories, statuses, msgs = {}, {}, {}
        for col, (aid, agent) in enumerate(zip(dres.agent_ids, self.agents)):
            states = [agent.record.states[0]]
            prev_theta = float(self.pose0[col, 2])
            for i in range(dres.steps):
                s_i = int(dres.status_per_step[i, col])
                executed = (s_i == int(AgentStatus.RUNNING)) or (
                    s_i == int(AgentStatus.COLLISION)
                    and (i == 0 or int(dres.status_per_step[i - 1, col])
                         == int(AgentStatus.RUNNING)))
                if not executed:
                    break
                x, y, th, v, a = (float(f) for f in dres.trajectories[i, col])
                yaw_rate = (th - prev_theta) / self.dt
                prev_theta = th
                states.append(EgoState(
                    time_step=i + 1, position=np.array([x, y]),
                    orientation=th, velocity=v, acceleration=a,
                    yaw_rate=yaw_rate,
                    steering_angle=float(np.arctan2(
                        wb * yaw_rate, max(v, 1e-3))),
                ))
            histories[aid] = states
            st = AgentStatus(int(dres.status[col]))
            statuses[aid] = st
            msgs[aid] = messages.get(int(st), "")
        return SimulationResult(
            scenario_id=self.sim.scenario.scenario_id,
            agent_status=statuses,
            agent_messages=msgs,
            steps=dres.steps,
            wall_time=dres.wall_time,
            planning_times=[],
            histories=histories,
        )


def _pad_fsm_fields(sim_dev, a_max, fsm_dims) -> dict:
    """FSM leaves of _padded_tensors (empty when the fleet runs without the
    in-scan FSM)."""
    if fsm_dims is None:
        return {}
    from frenetix_tpu.behavior.device_fsm import pad_fsm_tensors

    ft, c0 = pad_fsm_tensors(sim_dev.fsm_tensors, sim_dev.fsm_carry_start,
                             a_max, **fsm_dims)
    return {"fsm": ft, "fsm_carry0": c0}


def run_fleet(sims: list, mesh=None, axis_name: str = "scenarios",
              chunk: int = None) -> list:
    """Run S device simulations as ONE vmapped scan with ONE fetch — the
    scenario axis (SURVEY §2.3 P3) as a device batch dimension instead of
    host worker processes.

    `chunk`: compile ONE fleet program of `chunk` members and run the S
    simulations as ceil(S/chunk) sequential calls of it (the last group
    padded with repeats of its first member, extra results dropped).
    Compile+first at S=256 was 561 s as one giant vmapped scan (r4,
    PERF.md) — chunked, every group reuses the first group's executable
    when the padded bucket shapes match (homogeneous suites always do),
    so compile+first collapses to the S=chunk cost at a few percent of
    steady-state throughput.

    All members must share the planning/prediction statics (dt, horizon,
    replanning frequency, sampling level, max_obstacles, dtype — i.e. the
    same config family); heterogeneous sizes (agent count, reference length,
    cycle count, obstacles, goal geometry) are padded to fleet maxima with
    inert rows (`DeviceSimulation._padded_tensors`).  Returns one
    DeviceSimResult per simulation, identical to running each alone (the
    fleet parity test pins this).

    `mesh`: optional jax.sharding.Mesh — scenarios shard over it with no
    collectives at all (independent sims; fleet size must divide the mesh).
    """
    import time

    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    if chunk is not None and len(sims) > chunk:
        out = []
        for i in range(0, len(sims), chunk):
            group = sims[i:i + chunk]
            n_real = len(group)
            if n_real < chunk:
                group = group + [group[0]] * (chunk - n_real)
            out.extend(run_fleet(group, mesh=mesh,
                                 axis_name=axis_name)[:n_real])
        return out

    base = sims[0]
    for s in sims:
        if s.mesh is not None:
            raise ValueError("run_fleet composes with vmap only (per-member "
                             "meshes are not supported; pass mesh= to "
                             "run_fleet to shard the scenario axis)")
        if (s.dt, s.n_steps, s.k_replan, tuple(l[3] for l in s.levels),
                s.np_dtype, s.config.planning.emergency_mode,
                s.config.planning.compensated_cost_sum, s.resp_weight,
                s._occ_statics, s.config.prediction.use_sensor_model,
                s.use_vis_occl, s.hybrid_behavior, s._stop_bucket,
                s.config.prediction.mode, s.bank_w) != (
                base.dt, base.n_steps, base.k_replan,
                tuple(l[3] for l in base.levels), base.np_dtype,
                base.config.planning.emergency_mode,
                base.config.planning.compensated_cost_sum, base.resp_weight,
                base._occ_statics, base.config.prediction.use_sensor_model,
                base.use_vis_occl, base.hybrid_behavior, base._stop_bucket,
                base.config.prediction.mode, base.bank_w):
            raise ValueError(
                "fleet members must share planning statics (dt, horizon, "
                "replanning frequency, sampling level, dtype, emergency "
                "mode, compensated-sum flag, responsibility weight, "
                "occlusion settings, behavior-planner flag, prediction "
                "mode)")
    if mesh is not None and len(sims) % mesh.size != 0:
        raise ValueError(f"fleet size {len(sims)} must divide evenly over "
                         f"the {mesh.size}-device mesh")

    if base.hybrid_pred:
        # walenet hybrid: the per-cycle host prediction build (net inference
        # over executed histories) is inherently per-member host work — run
        # members sequentially instead of pretending to batch them
        results = [s.run() for s in sims]
        for r in results:
            r.extras["fleet_size"] = len(sims)
        return results

    # a behavior fleet runs the in-scan FSM only when EVERY member's scope
    # is device-supported; mixed fleets downgrade to the hybrid path (the
    # host FSM drives all members — always correct, just slower)
    fleet_fsm = base.hybrid_behavior and all(s.fsm_in_scan for s in sims)
    if base.hybrid_behavior and not fleet_fsm:
        return _run_hybrid_fleet(sims, mesh, axis_name, t0)

    # cache the stacked+padded fleet tensors across calls: every member's
    # SimTensors is fixed at construction, but stacking pulls each device
    # leaf to host (np.asarray = a D2H round trip over the tunnel) and pads
    # + re-uploads it — measured 1.1 s of transfer time vs 0.19 s of device
    # compute per S=8 fleet call (round-4 profile).  Keyed on member
    # identity (strong refs held, so ids stay valid).
    st_cache = getattr(base, "_fleet_stacked_cache", None)
    if (st_cache is not None and len(st_cache[0]) == len(sims)
            and all(a is b for a, b in zip(st_cache[0], sims))):
        _, stacked, a_max, c_max = st_cache
    else:
        stacked, _, a_max, c_max = _fleet_stack(sims, use_fsm=fleet_fsm)
        base._fleet_stacked_cache = (tuple(sims), stacked, a_max, c_max)
    # cache the compiled fleet program on the base member (a fresh
    # jit(vmap(...)) closure per call would re-trace every time)
    cache = getattr(base, "_fleet_cache", None)
    if cache is None:
        cache = base._fleet_cache = {}
    key = (a_max, c_max, fleet_fsm, None if mesh is None else id(mesh))
    fleet_fn = cache.get(key)
    if fleet_fn is None:
        def build():
            vrun = jax.vmap(base._build_run(a_n=a_max, n_cycles=c_max,
                                            fsm_mode=fleet_fsm))
            if mesh is not None:
                # scenarios are independent — shard the scenario axis over
                # the mesh with no collectives at all (P3 over devices, the
                # ICI-free embarrassingly-parallel case)
                from jax.sharding import PartitionSpec as P

                sh_tree = jax.tree.map(lambda _: P(axis_name), stacked)
                vrun = jax.shard_map(vrun, mesh=mesh, in_specs=(sh_tree,),
                                     out_specs=P(axis_name), check_vma=False)
            return vrun

        if mesh is None:
            # AOT warm start: skip Python re-tracing of the whole-fleet scan
            # in later processes (utils/aot_cache; code/config changes miss
            # the cache via the package-hash + statics key)
            from frenetix_tpu.utils.aot_cache import cached_program

            fleet_fn = cached_program(
                "fleet", (repr(base.config), a_max, c_max, len(sims),
                          fleet_fsm),
                stacked, build)
        else:
            fleet_fn = jax.jit(build())
        cache[key] = fleet_fn
    out = jax.device_get(fleet_fn(stacked))      # THE one fetch for S sims

    wall = time.perf_counter() - t0
    bail = np.asarray(out.pop("fsm_bail")) if "fsm_bail" in out \
        else np.zeros(len(sims), bool)
    results = []
    for i, s in enumerate(sims):
        if bail[i]:
            # this member's in-scan FSM hit an unsupported transition
            # (overtake initiation) — rerun it alone on the hybrid path
            res = s._run_hybrid()
        else:
            res = s._finalize({k_: v[i] for k_, v in out.items()})
            res.wall_time = wall
        res.extras["fleet_size"] = len(sims)
        results.append(res)
    return results


def _fleet_stack(sims, use_fsm=None):
    """Pad every member's SimTensors to the fleet maxima and stack them on a
    leading scenario axis.  Returns (stacked, padded, a_max, c_max).
    `use_fsm`: stack the in-scan-FSM tensors (defaults to the base member's
    own fsm_in_scan — run_fleet passes the all-members decision)."""
    import jax
    import jax.numpy as jnp

    base = sims[0]
    a_max = max(len(s.agents) for s in sims)
    c_max = max(s.n_cycles for s in sims)
    r_max = max(np.asarray(s.tensors.ref.s).shape[1] for s in sims)
    s_max = max(np.asarray(s.tensors.lane_segments).shape[1] for s in sims)
    o_max = max(np.asarray(s.tensors.obst_half).shape[0] for s in sims)
    t1_max = max(np.asarray(s.tensors.obst_poses).shape[0] for s in sims)
    g_max = max(np.asarray(s.tensors.g_rings).shape[1] for s in sims)
    e_max = max(np.asarray(s.tensors.g_rings).shape[2] for s in sims)
    l_max = le_max = oc_max = r2_max = sr_max = None
    if base.resp_weight != 0.0:
        l_max = max(np.asarray(s.tensors.lane.rings).shape[0] for s in sims)
        le_max = max(np.asarray(s.tensors.lane.rings).shape[1] for s in sims)
    if base.use_occlusion:
        oc_max = max(np.asarray(s.tensors.occ_half).shape[0] for s in sims)
        r2_max = max(np.asarray(s.tensors.turn_hot).shape[1] for s in sims)
    if base.use_vis_occl:
        sr_max = max(np.asarray(s.tensors.road_segs).shape[0] for s in sims)
    fsm_dims = None
    if base.fsm_in_scan if use_fsm is None else use_fsm:
        f = lambda fn: max(fn(s.fsm_tensors) for s in sims)
        fsm_dims = dict(
            r_max=f(lambda t: t.f_xy.shape[1]),
            g_max=f(lambda t: t.g_valid.shape[1]),
            l_max=f(lambda t: t.ll_valid.shape[0]),
            e_max=f(lambda t: t.ll_rings.shape[1]),
            ob_max=f(lambda t: t.ob_len.shape[0]),
            t1_max=f(lambda t: t.ob_pos.shape[0]),
            c_max=c_max,
        )

    padded = [s._padded_tensors(a_max, c_max, r_max, s_max, o_max, t1_max,
                                g_max, e_max, l_max, le_max, oc_max, r2_max,
                                sr_max, fsm_dims)
              for s in sims]
    # stack on HOST and upload ONE array per leaf: the padded leaves are
    # already NumPy, and jnp.stack(list-of-S-arrays) would device_put each
    # member separately — S× the H2D round trips over the tunnel
    stacked = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack([np.asarray(x) for x in xs])),
        *padded)
    return stacked, padded, a_max, c_max


def _run_hybrid_fleet(sims, mesh, axis_name, t0):
    """Behavior-hybrid fleet: S scenarios' device cycles as ONE vmapped
    jitted step, the S host FSM loops interleaved between cycles.

    Beyond the reference twice over: the reference forbids the behavior
    planner outside single-agent runs (simulation.py + behavior_module.py
    guards) and has no scenario-batch axis at all.  Per cycle this does ONE
    batched carry fetch (S·A·O(1) floats), runs every member's host FSM at
    the host loop's cadence (`_hybrid_host_cycle` — members past their own
    cycle horizon go inert), restacks + re-pads all members when any
    behavior reference-path swap changes a member's tables (the R bucket may
    grow; jit retraces), then runs one vmapped device step over the stacked
    tensors.  ys stay on device until ONE final fetch.

    `mesh`: scenarios shard over it with no collectives (the per-cycle step
    is shard_mapped; FSMs still run on host for all members).
    """
    import time

    import jax
    import jax.numpy as jnp

    base = sims[0]
    n_s = len(sims)
    dtype = base.np_dtype
    stacked, padded_g, a_max, c_max = _fleet_stack(sims, use_fsm=False)

    cache = getattr(base, "_fleet_cache", None)
    if cache is None:
        cache = base._fleet_cache = {}

    def step_fn_for(a_max):
        key = ("hybrid", a_max, None if mesh is None else id(mesh))
        fn = cache.get(key)
        if fn is None:
            vstep = jax.vmap(base._build_run(a_n=a_max, hybrid=True),
                             in_axes=(0, 0, None, 0, 0, 0, 0))
            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                sh = P(axis_name)
                vstep = jax.shard_map(
                    vstep, mesh=mesh,
                    in_specs=(sh, sh, P(), sh, sh, sh, sh),
                    out_specs=sh, check_vma=False)
            fn = cache[key] = jax.jit(vstep)
        return fn

    step_fn = step_fn_for(a_max)
    carry = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[s._hybrid_carry0(g) for s, g in zip(sims, padded_g)])

    ys_list = []
    for c in range(c_max):
        carry_h = jax.device_get(carry)
        v_des = np.zeros((n_s, a_max), dtype)
        wants = np.zeros((n_s, a_max), bool)
        stop_mat = np.zeros((n_s, a_max, base._stop_bucket, 13), dtype)
        stop_mask = np.zeros((n_s, a_max, base._stop_bucket), bool)
        x_cl_all = np.asarray(carry_h[0]).copy()
        swapped_members = []
        for i, s in enumerate(sims):
            member = tuple(np.asarray(x[i]) for x in carry_h)
            (v_des[i], wants[i], stop_mat[i], stop_mask[i], x_cl_new,
             swapped) = s._hybrid_host_cycle(c, member,
                                             inert=(c >= s.n_cycles))
            x_cl_all[i] = x_cl_new
            if swapped:
                swapped_members.append(s)
        if swapped_members:
            # restack ONLY the members whose planners changed (a restack
            # rebuilds the whole BatchedAgentStepper host tables — O(S) per
            # swap cycle if done for everyone); the full re-pad below is
            # still needed because a longer new path can grow the R bucket
            for s in swapped_members:
                s._hybrid_restack()
            stacked, _, a_max2, _ = _fleet_stack(sims, use_fsm=False)
            if a_max2 != a_max:
                # the agent-axis bucket is fixed at construction; a change
                # would silently break the vmapped step's in_axes
                raise RuntimeError(
                    f"fleet agent bucket changed mid-run ({a_max} -> "
                    f"{a_max2}) after a reference-path swap")
            carry = (jnp.asarray(x_cl_all), *carry[1:])
        carry, ys = step_fn(stacked, carry, jnp.asarray(c, jnp.int32),
                            jnp.asarray(v_des), jnp.asarray(stop_mat),
                            jnp.asarray(stop_mask), jnp.asarray(wants))
        ys_list.append(ys)

    ys_h = jax.device_get(ys_list)
    status_f = np.asarray(jax.device_get(carry[7]))
    wall = time.perf_counter() - t0
    results = []
    for i, s in enumerate(sims):
        out = {
            "final_status": status_f[i],
            "trajectories": np.concatenate([y[0][i] for y in ys_h]),
            "status_per_step": np.concatenate([y[1][i] for y in ys_h]),
            "selections": np.stack([y[2][i] for y in ys_h]),
            "found": np.stack([y[3][i] for y in ys_h]),
            "x_cl_cycles": np.stack([y[4][i] for y in ys_h]),
        }
        res = s._finalize(out)
        res.wall_time = wall
        res.extras["fleet_size"] = n_s
        results.append(res)
    return results
