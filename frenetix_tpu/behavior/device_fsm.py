"""In-scan behavior FSM: the behavior planner's per-cycle host logic as a
pure JAX function inside the device simulation's `lax.scan` (VERDICT r4 #1).

The hybrid device path pays one device→host round trip per replanning cycle
(~330 ms over the remote-TPU tunnel) because the FSM is host control logic.
This module moves the supported FSM subset ON DEVICE: states are int32
codes, transitions are `jnp.where` cascades evaluated per agent, and every
world query the host FSM makes (current lanelet, preceding vehicle,
stop-line clearance, traffic-light state) becomes either a precomputed
table (recorded obstacles, TL schedules, static route goals) or an in-scan
tensor computation (live peer agents).  One fetch per RUN, behavior
included.

Host spec (the differential oracle — tests/test_device_fsm.py pins in-scan
== hybrid-host on the behavior scenarios):
  - behavior/behavior_module.py  BehaviorModule.execute + stop-point calc
  - behavior/velocity_planner.py VelocityPlanner (TTC/MAX)
  - behavior/fsm.py              EgoFSM static layer (TL + sign families)
Reference spec: behavior_planner/behavior_module.py:113-193 + FSM_model.py.

Supported scope (v1) — checked at construction (`build_fsm_tensors` returns
supported=False otherwise, and DeviceSimulation falls back to the hybrid
path):
  - static-route goal families: StaticDefault, (Prepare)TrafficLight,
    (Prepare)StopSign, (Prepare)YieldSign, (Prepare)Crosswalk.  Turns,
    intersections, lane merges and road exits use the lane-conflict
    clearance walk (host fsm.py:447-605) — hybrid only.
  - no navigation lane changes (nav_lane_changes == 0) and a street
    setting constant over the scenario's lanelets.
  - dynamic layer: DynamicDefault / NoLaneChanges.  An overtake initiation
    (`EgoFSM._should_overtake`) is DETECTED in-scan and raises the `bail`
    flag — the run transparently re-executes on the hybrid path (host
    FSM), so outcomes never diverge from the host.

Precision: tables are f64 on host (HostFrame is f64 even in f32 sims) and
cast to the sim dtype; on CPU/f64 the in-scan FSM matches the host FSM to
f64 rounding, on TPU/f32 it is float32-rounded (same class of difference
as the rest of the device scan — measured by the regression matrix).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = ["FSMTensors", "FSMCarry", "build_fsm_tensors", "fsm_carry0",
           "make_fsm_step"]

# goal-type codes (behavior_state_static vocabulary subset)
T_DEFAULT, T_TL_PREP, T_TL, T_STOP_PREP, T_STOP, T_YIELD_PREP, T_YIELD, \
    T_CROSS_PREP, T_CROSS = 0, 1, 2, 3, 4, 5, 6, 7, 8

_TYPE_CODE = {
    "StaticDefault": T_DEFAULT,
    "PrepareTrafficLight": T_TL_PREP, "TrafficLight": T_TL,
    "PrepareStopSign": T_STOP_PREP, "StopSign": T_STOP,
    "PrepareYieldSign": T_YIELD_PREP, "YieldSign": T_YIELD,
    "PrepareCrosswalk": T_CROSS_PREP, "Crosswalk": T_CROSS,
}
_SUPPORTED_TYPES = set(_TYPE_CODE)

# situation codes (situation_state_static vocabulary, family-generic)
S_NONE, S_OBSERVE, S_SLOWING, S_GREEN, S_STOPPING, S_WAITING, S_CONTINUE, \
    S_CLEAR = 0, 1, 2, 3, 4, 5, 6, 7

# traffic-light state codes
TL_OTHER, TL_GREEN, TL_REDYELLOW = 0, 1, 2

_DEFAULT_SPEED_LIMIT = {
    "Highway": 130 / 3.6, "Country": 100 / 3.6, "Urban": 50 / 3.6,
}


class FSMTensors(NamedTuple):
    """Static per-scenario tensors of the in-scan FSM (a pytree — vmaps
    over a leading scenario axis in `run_fleet`)."""

    # behavior frame per agent (HostFrame tables, padded to a common R)
    f_xy: object          # (A, R, 2)
    f_s: object           # (A, R)
    f_seg_valid: object   # (A, R-1) — padded segments excluded

    # static route goals per agent (padded to G rows)
    g_valid: object       # (A, G)
    g_start: object       # (A, G)
    g_end: object         # (A, G)
    g_type: object        # (A, G) int32 codes
    g_has_stop: object    # (A, G)
    g_stop_s: object      # (A, G)
    g_stop_xy: object     # (A, G, 2)
    tl_code: object       # (C, A, G) int32 — TL state per cycle per goal

    # lanelets (scenario dict order)
    ll_rings: object      # (L, E, 2) polygon rings (padded w/ last vertex)
    ll_valid: object      # (L,)
    ll_in_ref: object     # (A, L) — lanelet in the agent's reference ids
    ll_speed: object      # (L,) speed limit, +inf if none
    chain_mat: object     # (L, L) — chain_mat[c, l]: l in chain(c)
    ll_left_ok: object    # (L,) adj-left legal for overtaking

    # recorded (non-agent) dynamic obstacles
    ob_pos: object        # (T+1, Ob, 2)
    ob_vel: object        # (T+1, Ob)
    ob_valid: object      # (T+1, Ob)
    ob_len: object        # (Ob,)
    ob_ped: object        # (Ob,) pedestrian flag
    ob_member: object     # (T+1, Ob, L) lanelet membership
    ob_sd: object         # (A, T+1, Ob, 2) s/d on each agent's frame

    # final-goal stop data per agent
    fin_has: object       # (A,) s-interval present
    fin_lo: object        # (A,)
    fin_hi: object        # (A,)
    fin_v_has: object     # (A,)
    fin_v: object         # (A,)
    fin_t_has: object     # (A,)
    fin_t_lo: object      # (A,)
    fin_t_hi: object      # (A,)

    speed_limit_default: object   # () street-setting default (constant)
    is_hc: object         # () bool — Highway/Country (no_auto_lane_change)


class FSMCarry(NamedTuple):
    """Mutable FSM state carried through the scan (per agent)."""

    sit: object           # (A,) int32 situation code
    goal_idx: object      # (A,) int32 current static-goal row (-1 none yet)
    prev_type: object     # (A,) int32 previous behavior_state_static code
    slowing: object       # (A,) bool slowing_car_for_traffic_light
    waiting: object       # (A,) bool waiting_for_green_light
    wait_counter: object  # (A,) int32
    hold_has: object      # (A,) bool — latched Waiting* hold
    hold_s: object        # (A,)
    stopdist_has: object  # (A,) bool VP_state.stop_distance armed
    stopdist: object      # (A,)
    mode_final: object    # (A,) bool stop_point_mode ends 'final goal'
    dvsp_prev: object     # (A,) desired_velocity_stop_point of last cycle
    dvsp_has: object      # (A,) bool (host: None until first calc)
    cur_ll: object        # (A,) int32 current-lanelet index (-1 unknown)
    bail: object          # () bool — unsupported transition wanted


def fsm_carry0(agents, scenario, dtype):
    """Initial FSM carry mirroring a fresh BehaviorModule (construction
    state: current lanelet resolved from the initial pose, everything else
    at defaults)."""
    a_n = len(agents)
    ll_index = {lid: i for i, lid in enumerate(scenario.lanelets)}
    cur = np.full(a_n, -1, np.int32)
    for i, a in enumerate(agents):
        if a.behavior is not None:
            lid = a.behavior.bm.current_lanelet_id
            cur[i] = ll_index.get(lid, -1)
    z = np.zeros(a_n, dtype)
    f = np.zeros(a_n, bool)
    return FSMCarry(
        sit=np.zeros(a_n, np.int32),
        goal_idx=np.full(a_n, -1, np.int32),
        prev_type=np.zeros(a_n, np.int32),
        slowing=f.copy(), waiting=f.copy(),
        wait_counter=np.zeros(a_n, np.int32),
        hold_has=f.copy(), hold_s=z.copy(),
        stopdist_has=f.copy(), stopdist=z.copy(),
        mode_final=f.copy(), dvsp_prev=z.copy(), dvsp_has=f.copy(),
        cur_ll=cur,
        bail=np.zeros((), bool),
    )


def build_fsm_tensors(sim, dtype):
    """(FSMTensors, supported, reason) for one host Simulation whose agents
    carry BehaviorModules.  supported=False → the caller must use the
    hybrid path."""
    agents = sim.agents
    scenario = sim.scenario
    config = sim.config

    if any(a.behavior is None for a in agents):
        return None, False, "agent without behavior module"
    if config.occlusion.use_occlusion_module:
        return None, False, "occlusion module (hybrid only)"

    # ---- capability checks ------------------------------------------------
    settings = set()
    for a in agents:
        bm = a.behavior.bm
        if bm.nav_lane_changes_left or bm.nav_lane_changes_right:
            return None, False, "navigation lane changes"
        settings.add(bm.street_setting)
        for g in bm.PP_state.static_route_plan:
            if g.goal_type not in _SUPPORTED_TYPES:
                return None, False, f"goal type {g.goal_type}"
    if len(settings) != 1:
        return None, False, "mixed street settings"
    setting = settings.pop()
    # a street-setting change mid-run would reset the FSM — require every
    # lanelet to map to the same setting (the setting is re-derived from
    # the CURRENT lanelet each step, behavior_module._street_setting)
    tags = [t.lower() for t in getattr(scenario, "tags", [])]
    tag_setting = "Highway" if ("interstate" in tags or "highway" in tags) \
        else "Urban"
    for ll in scenario.lanelets.values():
        ltype = (getattr(ll, "lanelet_type", "") or "").lower()
        if any(t in ltype for t in ("highway", "interstate")):
            s = "Highway"
        elif "country" in ltype:
            s = "Country"
        elif "urban" in ltype:
            s = "Urban"
        else:
            s = tag_setting
        if s != setting:
            return None, False, "street setting varies across lanelets"

    a_n = len(agents)
    k = int(config.planning.replanning_frequency)
    n_cycles = (int(sim.max_steps) + k - 1) // k

    # ---- frames -----------------------------------------------------------
    frames = [a.behavior.bm.PP_state.frame for a in agents]
    r_max = max(len(fr.xy) for fr in frames)
    f_xy = np.zeros((a_n, r_max, 2))
    f_s = np.zeros((a_n, r_max))
    f_seg_valid = np.zeros((a_n, r_max - 1), bool)
    for i, fr in enumerate(frames):
        r = len(fr.xy)
        f_xy[i, :r] = fr.xy
        f_xy[i, r:] = fr.xy[-1]
        f_s[i, :r] = fr.s
        f_s[i, r:] = fr.s[-1]
        f_seg_valid[i, : r - 1] = True

    # ---- static route goals ----------------------------------------------
    g_rows = max(max(len(a.behavior.bm.PP_state.static_route_plan)
                     for a in agents), 1)
    g_valid = np.zeros((a_n, g_rows), bool)
    g_start = np.zeros((a_n, g_rows))
    g_end = np.zeros((a_n, g_rows))
    g_type = np.zeros((a_n, g_rows), np.int32)
    g_has_stop = np.zeros((a_n, g_rows), bool)
    g_stop_s = np.zeros((a_n, g_rows))
    g_stop_xy = np.zeros((a_n, g_rows, 2))
    tl_code = np.zeros((n_cycles, a_n, g_rows), np.int32)
    for i, a in enumerate(agents):
        for j, g in enumerate(a.behavior.bm.PP_state.static_route_plan):
            g_valid[i, j] = True
            g_start[i, j] = g.start_s
            g_end[i, j] = g.end_s
            g_type[i, j] = _TYPE_CODE[g.goal_type]
            if g.stop_point_s is not None:
                g_has_stop[i, j] = True
                g_stop_s[i, j] = g.stop_point_s
                g_stop_xy[i, j] = frames[i].to_cartesian(g.stop_point_s)
            if g.goal_object is not None and hasattr(g.goal_object,
                                                     "state_at_time"):
                for c in range(n_cycles):
                    st = g.goal_object.state_at_time(c * k)
                    tl_code[c, i, j] = (
                        TL_GREEN if st == "green"
                        else TL_REDYELLOW if st == "redYellow" else TL_OTHER)

    # ---- lanelets ---------------------------------------------------------
    from frenetix_tpu.behavior.fsm import _NO_CROSS
    from frenetix_tpu.behavior.path_planner import consecutive_lanelet_chain
    from frenetix_tpu.io.commonroad import speed_limit_for_lanelets

    ll_ids = list(scenario.lanelets)
    l_n = len(ll_ids)
    e_max = max(len(scenario.lanelets[lid].polygon) for lid in ll_ids)
    ll_rings = np.zeros((l_n, e_max, 2))
    ll_speed = np.full(l_n, np.inf)
    ll_left_ok = np.zeros(l_n, bool)
    for li, lid in enumerate(ll_ids):
        ll = scenario.lanelets[lid]
        ring = np.asarray(ll.polygon, float)
        ll_rings[li, : len(ring)] = ring
        ll_rings[li, len(ring):] = ring[-1]   # degenerate edges: no crossing
        v = speed_limit_for_lanelets(scenario, [lid])
        if v is not None:
            ll_speed[li] = v
        ll_left_ok[li] = (
            ll.adj_left is not None and ll.adj_left_same_direction
            and ll.line_marking_left not in _NO_CROSS)
    chain_mat = np.zeros((l_n, l_n), bool)
    ll_index = {lid: i for i, lid in enumerate(ll_ids)}
    for li, lid in enumerate(ll_ids):
        for cid in consecutive_lanelet_chain(scenario, lid):
            chain_mat[li, ll_index[cid]] = True
    ll_in_ref = np.zeros((a_n, l_n), bool)
    for i, a in enumerate(agents):
        for lid in a.behavior.bm.PP_state.reference_path_ids:
            if lid in ll_index:
                ll_in_ref[i, ll_index[lid]] = True

    # ---- recorded (non-agent) dynamic obstacles ---------------------------
    agent_ids = {a.id for a in agents}
    obs = [ob for oid, ob in scenario.obstacles.items()
           if oid not in agent_ids and ob.role == "dynamic"]
    t1 = int(sim.max_steps) + 1
    ob_n = max(len(obs), 1)
    ob_pos = np.zeros((t1, ob_n, 2))
    ob_vel = np.zeros((t1, ob_n))
    ob_valid = np.zeros((t1, ob_n), bool)
    ob_len = np.full(ob_n, 4.5)
    ob_ped = np.zeros(ob_n, bool)
    ob_member = np.zeros((t1, ob_n, l_n), bool)
    ob_sd = np.zeros((a_n, t1, ob_n, 2))
    for j, ob in enumerate(obs):
        ob_len[j] = ob.length
        ob_ped[j] = ob.obstacle_type == "pedestrian"
        for t in range(t1):
            st = ob.state_at_time(t)
            if st is None:
                continue
            ob_pos[t, j] = st.position
            ob_vel[t, j] = st.velocity
            ob_valid[t, j] = True
            for lid in scenario.find_lanelets_by_position(st.position):
                ob_member[t, j, ll_index[lid]] = True
            for i in range(a_n):
                s, d = frames[i].project(np.asarray(st.position))
                ob_sd[i, t, j] = (s, d)

    # ---- final-goal stop data ---------------------------------------------
    fin_has = np.zeros(a_n, bool)
    fin_lo = np.zeros(a_n)
    fin_hi = np.zeros(a_n)
    fin_v_has = np.zeros(a_n, bool)
    fin_v = np.zeros(a_n)
    fin_t_has = np.zeros(a_n, bool)
    fin_t_lo = np.zeros(a_n)
    fin_t_hi = np.zeros(a_n)
    for i, a in enumerate(agents):
        bm = a.behavior.bm
        iv = bm.PP_state.final_s_position_interval
        if iv is not None:
            fin_has[i] = True
            fin_lo[i], fin_hi[i] = iv
        if bm.VP_state.final_velocity_center is not None:
            fin_v_has[i] = True
            fin_v[i] = bm.VP_state.final_velocity_center
        g = (bm.planning_problem.goals[bm.goal_index]
             if bm.goal_index is not None else None)
        t_int = getattr(g, "time_interval", None) if g is not None else None
        if t_int is not None:
            fin_t_has[i] = True
            fin_t_lo[i], fin_t_hi[i] = t_int

    def c(x):
        x = np.asarray(x)
        return x.astype(dtype) if x.dtype.kind == "f" else x

    ft = FSMTensors(
        f_xy=c(f_xy), f_s=c(f_s), f_seg_valid=f_seg_valid,
        g_valid=g_valid, g_start=c(g_start), g_end=c(g_end), g_type=g_type,
        g_has_stop=g_has_stop, g_stop_s=c(g_stop_s), g_stop_xy=c(g_stop_xy),
        tl_code=tl_code,
        ll_rings=c(ll_rings), ll_valid=np.ones(l_n, bool),
        ll_in_ref=ll_in_ref, ll_speed=c(ll_speed),
        chain_mat=chain_mat, ll_left_ok=ll_left_ok,
        ob_pos=c(ob_pos), ob_vel=c(ob_vel), ob_valid=ob_valid,
        ob_len=c(ob_len), ob_ped=ob_ped, ob_member=ob_member,
        ob_sd=c(ob_sd),
        fin_has=fin_has, fin_lo=c(fin_lo), fin_hi=c(fin_hi),
        fin_v_has=fin_v_has, fin_v=c(fin_v),
        fin_t_has=fin_t_has, fin_t_lo=c(fin_t_lo), fin_t_hi=c(fin_t_hi),
        speed_limit_default=c(_DEFAULT_SPEED_LIMIT.get(setting, 30 / 3.6)),
        is_hc=np.asarray(setting in ("Highway", "Country")),
    )
    return ft, True, ""


def make_fsm_step(config, veh, dt, k_replan):
    """Build the pure in-scan FSM step.

    fsm_step(ft, carry, c, t0, center, theta, v, running, peer_present)
        → (carry', v_des, stop_s_planner, stop_v)

    host-order semantics of BehaviorModule.execute for the supported scope:
    project → lanelet info → preceding vehicle → static-layer FSM →
    (overtake bail detection) → velocity planner → stop point → braking
    envelope.  `peer_present[j]`: agent j has a recorded state at t0 (the
    WorldView visibility rule)."""
    import jax
    import jax.numpy as jnp

    cfg = config.behavior

    # per-goal-type constant predicates, indexed by the type code
    stopline = jnp.asarray(
        [False, True, True, True, True, True, True, True, True])
    main_sign = jnp.asarray(  # TrafficLight/Crosswalk/StopSign/YieldSign
        [False, False, True, False, True, False, True, False, True])
    require_full = jnp.asarray(
        [False, False, False, True, True, False, False, False, False])
    ped_only = jnp.asarray(
        [False, False, False, False, False, False, False, True, True])

    def _project_on(f_xy, f_s, f_valid, pts):
        """HostFrame.project twin for one frame: (P, 2) → (s, d)."""
        a = f_xy[:-1]
        b = f_xy[1:]
        ab = b - a
        seg2 = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)
        ap = pts[:, None, :] - a[None]
        t = jnp.clip(jnp.sum(ap * ab[None], axis=-1) / seg2[None], 0.0, 1.0)
        closest = a[None] + t[..., None] * ab[None]
        d2 = jnp.sum((pts[:, None, :] - closest) ** 2, axis=-1)
        d2 = jnp.where(f_valid[None], d2, jnp.inf)
        i = jnp.argmin(d2, axis=1)
        rows = jnp.arange(pts.shape[0])
        t_i = t[rows, i]
        s = f_s[i] + t_i * (f_s[i + 1] - f_s[i])
        ab_i = ab[i]
        ap_i = pts - a[i]
        crossz = ab_i[:, 0] * ap_i[:, 1] - ab_i[:, 1] * ap_i[:, 0]
        d = jnp.sqrt(d2[rows, i]) * jnp.where(crossz >= 0.0, 1.0, -1.0)
        return s, d

    def _point_in_lanelets(ft, pts):
        """(P, 2) → (P, L) even-odd membership (io.commonroad._point_in_ring
        twin; padded ring vertices repeat the last point → degenerate edges
        add no crossings)."""
        a = ft.ll_rings                              # (L, E, 2)
        b = jnp.roll(ft.ll_rings, -1, axis=1)
        ax, ay = a[..., 0], a[..., 1]
        bx, by = b[..., 0], b[..., 1]
        px = pts[:, None, None, 0]
        py = pts[:, None, None, 1]
        cond = (ay[None] > py) != (by[None] > py)
        denom = (by - ay)[None]
        x_int = ax[None] + (py - ay[None]) * (bx - ax)[None] / \
            jnp.where(denom == 0.0, 1.0, denom)
        hits = cond & (px < x_int)
        inside = (jnp.sum(hits, axis=2) % 2).astype(bool)   # (P, L)
        return inside & ft.ll_valid[None]

    def _stop_dist(v, decel):
        return jnp.abs(v ** 2 / (-2.0 * decel))

    def fsm_step(ft, carry, c, t0, center, theta, v, running, peer_present):
        dtype = center.dtype
        a_n = center.shape[0]
        rows = jnp.arange(a_n)
        t0f = t0.astype(dtype)
        big = jnp.asarray(np.finfo(np.float32).max / 4, dtype)

        # 1. ref position + every-peer-on-every-frame projection ----------
        peer_s, peer_d = jax.vmap(
            _project_on, in_axes=(0, 0, 0, None))(
            ft.f_xy, ft.f_s, ft.f_seg_valid, center)   # (A_obs, A_pt)
        ref_s = peer_s[rows, rows]

        # 2. current lanelet + speed limit --------------------------------
        member = _point_in_lanelets(ft, center)             # (A, L)
        n_member = jnp.sum(member, axis=1)
        order = jnp.arange(member.shape[1])
        first_m = jnp.argmax(member, axis=1)
        in_ref = member & ft.ll_in_ref
        last_ref = member.shape[1] - 1 - jnp.argmax(in_ref[:, ::-1], axis=1)
        has_ref = jnp.any(in_ref, axis=1)
        cur = jnp.where(
            n_member == 1, first_m,
            jnp.where(n_member > 1,
                      jnp.where(has_ref, last_ref, first_m),
                      carry.cur_ll))
        mem_or_cur = jnp.where(
            (n_member > 0)[:, None], member,
            (order[None] == cur[:, None]) & (cur[:, None] >= 0))
        sl = jnp.min(jnp.where(mem_or_cur, ft.ll_speed[None], jnp.inf),
                     axis=1)
        has_limit = jnp.isfinite(sl)
        limit = jnp.where(has_limit, sl, ft.speed_limit_default)

        # 3. preceding vehicle --------------------------------------------
        chain = jnp.where((cur >= 0)[:, None, None],
                          ft.chain_mat[jnp.maximum(cur, 0)][:, None, :],
                          False)                            # (A, 1, L)
        ob_m = ft.ob_member[t0]                             # (Ob, L)
        ob_on_chain = jnp.any(chain & ob_m[None], axis=2)   # (A, Ob)
        ob_s = ft.ob_sd[rows, t0][:, :, 0]                  # (A, Ob)
        ob_d = ft.ob_sd[rows, t0][:, :, 1]
        ob_ok = (ob_on_chain & ft.ob_valid[t0][None]
                 & (ob_s > ref_s[:, None]) & (jnp.abs(ob_d) <= 4.0))
        peer_on_chain = jnp.any(chain & member[None], axis=2)  # (A, A)
        eye = jnp.eye(a_n, dtype=bool)
        peer_ok = (peer_present[None] & ~eye & peer_on_chain
                   & (peer_s > ref_s[:, None]) & (jnp.abs(peer_d) <= 4.0))

        all_s = jnp.concatenate([jnp.where(ob_ok, ob_s, big),
                                 jnp.where(peer_ok, peer_s, big)], axis=1)
        lead = jnp.argmin(all_s, axis=1)   # first minimum = world order
        has_lead = jnp.take_along_axis(
            jnp.concatenate([ob_ok, peer_ok], axis=1), lead[:, None],
            axis=1)[:, 0]
        ob_n = ob_s.shape[1]
        lead_is_ob = lead < ob_n
        ob_i = jnp.clip(lead, 0, ob_n - 1)
        pe_i = jnp.clip(lead - ob_n, 0, a_n - 1)
        lead_pos = jnp.where(lead_is_ob[:, None],
                             ft.ob_pos[t0][ob_i], center[pe_i])
        lead_vel = jnp.where(lead_is_ob, ft.ob_vel[t0][ob_i], v[pe_i])
        lead_len = jnp.where(lead_is_ob, ft.ob_len[ob_i],
                             jnp.asarray(veh.length, dtype))
        dist_prec = (jnp.linalg.norm(lead_pos - center, axis=1)
                     - lead_len / 2.0)

        # 4. static layer: goal select + type-change reset ----------------
        in_range = (ft.g_valid & (ft.g_start <= ref_s[:, None])
                    & (ref_s[:, None] < ft.g_end))
        any_goal = jnp.any(in_range, axis=1)
        goal_idx = jnp.where(any_goal, jnp.argmax(in_range, axis=1),
                             carry.goal_idx)
        has_goal = goal_idx >= 0
        gi = jnp.maximum(goal_idx, 0)
        gtype = jnp.where(has_goal, ft.g_type[rows, gi], T_DEFAULT)

        changed = gtype != carry.prev_type
        sit = jnp.where(changed, S_NONE, carry.sit)
        wait_counter = jnp.where(changed, 0, carry.wait_counter)
        leaving_stopline = changed & ~stopline[gtype]
        slowing = jnp.where(leaving_stopline, False, carry.slowing)
        waiting = jnp.where(leaving_stopline, False, carry.waiting)
        stopdist_has = jnp.where(leaving_stopline, False, carry.stopdist_has)
        stopdist = carry.stopdist

        g_has_stop = has_goal & ft.g_has_stop[rows, gi]
        g_stop_s = ft.g_stop_s[rows, gi]
        g_stop_xy = ft.g_stop_xy[rows, gi]

        # 5. situation transitions ----------------------------------------
        # stop-line clearance (fsm._stop_point_clear): a moving foreign
        # obstacle within 12 m of the stop point blocks
        obs_block = (
            (jnp.linalg.norm(ft.ob_pos[t0][None] - g_stop_xy[:, None, :],
                             axis=-1) < 12.0)
            & ft.ob_valid[t0][None] & (ft.ob_vel[t0][None] > 0.3))
        p_block = (
            (jnp.linalg.norm(center[None] - g_stop_xy[:, None, :],
                             axis=-1) < 12.0)
            & peer_present[None] & ~eye & (v[None] > 0.3))
        blocked_any = jnp.any(obs_block, axis=1) | jnp.any(p_block, axis=1)
        blocked_ped = jnp.any(obs_block & ft.ob_ped[None], axis=1)
        clear = jnp.where(
            g_has_stop,
            ~jnp.where(ped_only[gtype], blocked_ped, blocked_any),
            True)

        tl = ft.tl_code[c][rows, gi]
        tl_green = tl == TL_GREEN
        tl_go = (tl == TL_GREEN) | (tl == TL_REDYELLOW)

        is_tl_prep = gtype == T_TL_PREP
        is_tl = gtype == T_TL
        is_sign_prep = (gtype == T_STOP_PREP) | (gtype == T_YIELD_PREP) \
            | (gtype == T_CROSS_PREP)
        is_sign = (gtype == T_STOP) | (gtype == T_YIELD) | (gtype == T_CROSS)
        family = is_tl_prep | is_tl | is_sign_prep | is_sign
        full_stop = require_full[gtype]

        # --- PrepareTrafficLight (fsm._situation_prepare_light) — the
        # host's if/elif chain branches on the POST-INIT state, one branch
        # per step (redYellow: Observing stays→Slowing via !green, but
        # Slowing releases via go — entry-state based)
        st1 = jnp.where(sit == S_NONE, S_OBSERVE, sit)
        e_o1 = st1 == S_OBSERVE
        e_s1 = st1 == S_SLOWING
        st1 = jnp.where(e_o1 & ~tl_green, S_SLOWING, st1)
        st1 = jnp.where(e_s1 & tl_go, S_OBSERVE, st1)
        arm1 = st1 == S_SLOWING

        # --- TrafficLight (fsm._situation_light) — branch on the
        # post-init state, single branch taken (if/elif)
        st2 = jnp.where(sit == S_NONE,
                        jnp.where(tl_green, S_GREEN, S_STOPPING), sit)
        e_g = st2 == S_GREEN
        e_s2 = st2 == S_STOPPING
        e_w2 = st2 == S_WAITING
        st2 = jnp.where(e_g & ~tl_green, S_STOPPING, st2)
        st2 = jnp.where(e_s2 & tl_go, S_GREEN, st2)
        to_w2 = e_s2 & ~tl_go & (v <= 0.5)
        st2 = jnp.where(to_w2, S_WAITING, st2)
        st2 = jnp.where(e_w2 & tl_go, S_CONTINUE, st2)
        arm2 = (st2 == S_STOPPING) | (st2 == S_WAITING)
        waiting2 = jnp.where(to_w2, True,
                             jnp.where((e_w2 & tl_go)
                                       | (st2 == S_CONTINUE),
                                       False, waiting))

        # --- sign prepare (fsm._make_sign_situation prepare)
        st3 = jnp.where(sit == S_NONE, S_OBSERVE, sit)
        e_o3 = st3 == S_OBSERVE
        e_s3 = st3 == S_SLOWING
        st3 = jnp.where(e_o3 & ~clear, S_SLOWING, st3)
        st3 = jnp.where(e_s3 & clear, S_OBSERVE, st3)
        arm3 = st3 == S_SLOWING

        # --- sign main (fsm._make_sign_situation main) — arms on branch
        # ENTRY (Stopping/Waiting), not on the final state
        st4 = jnp.where(
            sit == S_NONE,
            jnp.where(full_stop | ~clear, S_STOPPING, S_CLEAR), sit)
        e_c4 = st4 == S_CLEAR
        e_s4 = st4 == S_STOPPING
        e_w4 = st4 == S_WAITING
        st4 = jnp.where(e_c4 & ~clear, S_STOPPING, st4)
        to_w4 = e_s4 & (v <= 0.5)
        st4 = jnp.where(to_w4, S_WAITING, st4)
        wc4 = jnp.where(to_w4, 0, wait_counter)
        st4 = jnp.where(e_s4 & ~to_w4 & clear & ~full_stop, S_CLEAR, st4)
        wc4 = jnp.where(e_w4, wc4 + 1, wc4)
        min_wait = jnp.where(full_stop,
                             jnp.asarray(int(1.0 / dt), jnp.int32), 0)
        st4 = jnp.where(e_w4 & clear & (wc4 >= min_wait), S_CONTINUE, st4)
        arm4 = e_s4 | e_w4
        slow4 = arm4 & ~(st4 == S_CONTINUE)

        # merge families
        sit_new = jnp.where(
            is_tl_prep, st1,
            jnp.where(is_tl, st2,
                      jnp.where(is_sign_prep, st3,
                                jnp.where(is_sign, st4, S_NONE))))
        arm = jnp.where(
            is_tl_prep, arm1,
            jnp.where(is_tl, arm2,
                      jnp.where(is_sign_prep, arm3,
                                jnp.where(is_sign, arm4, False))))
        slowing = jnp.where(
            is_tl_prep, arm1,
            jnp.where(is_tl, arm2,
                      jnp.where(is_sign_prep, arm3,
                                jnp.where(is_sign, slow4, slowing))))
        waiting = jnp.where(is_tl, waiting2,
                            jnp.where(is_sign & (st4 == S_CONTINUE), False,
                                      waiting))
        wait_counter = jnp.where(is_sign, wc4, wait_counter)

        # _arm_stop side effects (stop-line distance + queueing)
        dist_to_tl = g_stop_s - ref_s - veh.length
        queue_dist = dist_prec - veh.length - lead_len
        armed_sd = jnp.where(has_lead & (queue_dist <= dist_to_tl),
                             queue_dist, dist_to_tl)
        fire = arm & g_has_stop
        stopdist = jnp.where(fire, armed_sd, stopdist)
        stopdist_has = jnp.where(fire, True, stopdist_has)

        # 6. dynamic layer: overtake initiation → bail --------------------
        no_auto = jnp.where(ft.is_hc, gtype != T_DEFAULT, False)
        left_ok = jnp.where(cur >= 0, ft.ll_left_ok[jnp.maximum(cur, 0)],
                            False)
        wants_ot = (running & (t0 > 0) & ~no_auto & has_lead & left_ok
                    & (lead_vel < 0.6 * limit)
                    & (dist_prec < jnp.maximum(3.0 * v, 25.0)))
        bail = carry.bail | jnp.any(wants_ot)

        # 7. velocity planner ---------------------------------------------
        comfort_dist = (v * dt * k_replan
                        + _stop_dist(v, cfg.comfortable_deceleration_rate))
        vmax_ = limit                              # condition factor 1.0
        delta = dt * k_replan
        buf = cfg.safety_distance_buffer
        ego_stop = _stop_dist(v, veh.a_max)
        other_stop = _stop_dist(lead_vel, veh.a_max)
        base_safe = veh.length / 2 + 0.5
        # the four relative-motion situations, exactly as the host pairs
        # them with the sign of the distance (velocity_planner.py:143-163)
        dpos = dist_prec >= 0.0
        towards = jnp.where(dpos, (v >= 0) & (lead_vel < 0),
                            (v < 0) & (lead_vel >= 0))
        ego_behind = jnp.where(dpos, (v >= 0) & (lead_vel >= 0),
                               (v < 0) & (lead_vel < 0))
        ego_front = jnp.where(dpos, (v < 0) & (lead_vel < 0),
                              (v >= 0) & (lead_vel >= 0))
        min_safety = jnp.where(
            towards,
            base_safe + jnp.abs(v * delta) + ego_stop + other_stop,
            jnp.where(
                ego_behind,
                base_safe + jnp.abs(v * delta) + ego_stop - other_stop,
                jnp.where(
                    ego_front,
                    base_safe + jnp.abs(lead_vel * delta) + other_stop
                    - ego_stop,
                    base_safe - jnp.inf)))
        safety = jnp.where(
            towards,
            min_safety + jnp.maximum(v * buf, lead_vel * buf),
            min_safety + (lead_vel + v) / 2 * buf)
        ttc = lead_vel + (dist_prec - safety) / cfg.ttc_norm
        has_ttc = has_lead

        goal_v = jnp.where(has_ttc & (ttc < vmax_), ttc, vmax_)
        override = carry.mode_final & (
            ~has_ttc | (carry.dvsp_has & (carry.dvsp_prev < ttc)))
        goal_v = jnp.where(override, carry.dvsp_prev, goal_v)

        a_max, v_max = veh.a_max, veh.v_max
        d_amx = cfg.a_max_delta
        lo1 = jnp.where(v > 0, v - 2 * a_max * d_amx, v - a_max * d_amx)
        lo2 = jnp.where(v >= 0.0, 0.0, v + a_max * d_amx)
        hi1 = jnp.where(v >= 0, v + a_max * d_amx, v + 2 * a_max * d_amx)
        hi2 = jnp.where(v_max >= v, v_max, v - 2 * a_max * d_amx)
        v_des = jnp.minimum(jnp.minimum(
            jnp.maximum(jnp.maximum(goal_v, lo1), lo2), hi1), hi2)
        v_des = jnp.where(v_des <= cfg.zero_velocity_threshold, 0.0, v_des)

        # 8. stop point (behavior_module._calculate_stopping_point) -------
        comfort_s = ref_s + comfort_dist
        min_dist = jnp.maximum(cfg.min_stop_point_dist,
                               cfg.min_stop_point_time * v)
        default_time_s = ref_s + v * cfg.default_time_horizon
        armed_goal = stopline[gtype] & g_has_stop

        obs_sit = sit_new == S_OBSERVE
        slow_sit = sit_new == S_SLOWING
        go_sit = (sit_new == S_GREEN) | (sit_new == S_CLEAR)
        stop_sit = sit_new == S_STOPPING
        wait_sit = sit_new == S_WAITING

        sp_armed = jnp.where(
            obs_sit | slow_sit | stop_sit,
            jnp.minimum(g_stop_s, comfort_s),
            jnp.where(go_sit,
                      jnp.maximum(jnp.maximum(g_stop_s, comfort_s),
                                  default_time_s),
                      jnp.maximum(comfort_s, default_time_s)))
        dv_armed = jnp.where(slow_sit | stop_sit, 0.0, goal_v)
        sp = jnp.where(armed_goal, sp_armed,
                       jnp.maximum(comfort_s, default_time_s))
        dvsp = jnp.where(armed_goal, dv_armed, goal_v)

        # Waiting hold (early-return branch; latch released by any armed
        # non-waiting step — host behavior_module.py:464-480)
        waiting_early = armed_goal & wait_sit
        latch = waiting_early & ~carry.hold_has
        hold_s = jnp.where(latch, ref_s, carry.hold_s)
        hold_has = jnp.where(latch, True, carry.hold_has)
        hold_has = jnp.where(armed_goal & ~wait_sit, False, hold_has)

        # TTC stop point (standing-obstacle branch is an early return)
        ttc_stop_s = ref_s + dist_prec + other_stop - min_safety
        standing = has_ttc & (lead_vel < cfg.standing_obstacle_vel)
        use_ttc = has_ttc & ~standing
        ttc_lt = (main_sign[gtype] & stop_sit & armed_goal
                  & (ttc_stop_s < g_stop_s))
        sp = jnp.where(use_ttc, jnp.minimum(ttc_stop_s, comfort_s), sp)
        dvsp = jnp.where(
            use_ttc,
            jnp.where(ttc_lt, jnp.minimum(lead_vel, v), lead_vel), dvsp)

        # nose offset + clamps (skipped by the early returns)
        sp2 = sp - veh.length / 2
        sp2 = jnp.maximum(jnp.maximum(ref_s + min_dist, sp2), 0.0)
        sp2 = jnp.where((slow_sit | stop_sit) & armed_goal,
                        jnp.minimum(sp2, g_stop_s - veh.length / 2), sp2)

        # final-goal stop (behavior_module._final_goal_stop)
        final_s_val = jnp.maximum(ft.fin_hi - veh.length / 2, ft.fin_lo)
        decel_dist = (_stop_dist(v, cfg.comfortable_deceleration_rate)
                      - _stop_dist(ft.fin_v,
                                   cfg.comfortable_deceleration_rate))
        in_iv = (ft.fin_lo <= ref_s) & (ref_s <= ft.fin_hi)
        v_adapt_iv = jnp.where(
            in_iv, ref_s, jnp.maximum(ft.fin_lo - decel_dist, ref_s))
        in_t = ft.fin_t_has & (ft.fin_t_lo <= t0f) & (t0f <= ft.fin_t_hi)
        avg_v = (v + ft.fin_v) / 2
        decel_time = decel_dist / jnp.maximum(avg_v, 1e-6)
        v_adapt_t = ref_s + jnp.maximum(
            ft.fin_t_lo - decel_time - t0f, 0.0) * v
        v_adapt = jnp.where(ft.fin_has, v_adapt_iv,
                            jnp.where(in_t, ref_s, v_adapt_t))
        has_adapt = ft.fin_v_has & (ft.fin_has | ft.fin_t_has)
        sp2 = jnp.where(ft.fin_has, jnp.minimum(final_s_val, sp2), sp2)
        approx_next = ref_s + v * dt * k_replan
        adapt_now = has_adapt & (v_adapt <= approx_next)
        dvsp = jnp.where(adapt_now, ft.fin_v, dvsp)

        # merge early-return branches
        standing_sp = jnp.minimum(
            comfort_s, ref_s + dist_prec - veh.length / 2 - 0.5)
        sp_final = jnp.where(waiting_early, hold_s,
                             jnp.where(standing, standing_sp, sp2))
        dvsp_final = jnp.where(waiting_early | standing, 0.0, dvsp)
        mode_final_new = (~waiting_early & ~standing
                          & (dvsp_final != 0.0) & ft.fin_v_has
                          & (dvsp_final == ft.fin_v))

        # 9. braking envelope toward the armed stop line ------------------
        v_env = jnp.sqrt(2.0 * cfg.comfortable_deceleration_rate
                         * jnp.maximum(stopdist, 0.0))
        v_des = jnp.where(slowing & stopdist_has & (v_env < v_des),
                          v_env, v_des)

        # 10. planner stop point (apply_behavior_output: center → rear s)
        stop_s_planner = sp_final - veh.wb_rear_axle
        stop_v = dvsp_final

        # frozen agents: keep every carried field (the host never runs
        # their FSM again) and hand back their current velocity
        keep = lambda new, old: jnp.where(running, new, old)
        carry_new = FSMCarry(
            sit=keep(sit_new.astype(jnp.int32), carry.sit),
            goal_idx=keep(goal_idx.astype(jnp.int32), carry.goal_idx),
            prev_type=keep(gtype.astype(jnp.int32), carry.prev_type),
            slowing=keep(slowing, carry.slowing),
            waiting=keep(waiting, carry.waiting),
            wait_counter=keep(wait_counter.astype(jnp.int32),
                              carry.wait_counter),
            hold_has=keep(hold_has, carry.hold_has),
            hold_s=keep(hold_s, carry.hold_s),
            stopdist_has=keep(stopdist_has, carry.stopdist_has),
            stopdist=keep(stopdist, carry.stopdist),
            mode_final=keep(mode_final_new, carry.mode_final),
            dvsp_prev=keep(dvsp_final, carry.dvsp_prev),
            dvsp_has=keep(jnp.ones_like(carry.dvsp_has), carry.dvsp_has),
            cur_ll=keep(cur.astype(jnp.int32), carry.cur_ll),
            bail=bail,
        )
        v_des = jnp.where(running, v_des, v)
        return carry_new, v_des, stop_s_planner, stop_v

    return fsm_step


def pad_fsm_tensors(ft: FSMTensors, carry0: FSMCarry, a_max, r_max, g_max,
                    l_max, e_max, ob_max, t1_max, c_max):
    """Pad one member's FSM tensors to the fleet maxima (run_fleet).

    Padding is inert: extra agents replicate agent 0 (frozen via
    active0=False in the main scan), extra goal/lanelet/obstacle rows carry
    valid=False, extra cycles repeat the last TL window, extra frame
    vertices repeat the last point with seg_valid=False."""
    def pad_a(x, axis=0):
        x = np.asarray(x)
        kk = a_max - x.shape[axis]
        if kk <= 0:
            return x
        rep = np.repeat(np.take(x, [0], axis=axis), kk, axis=axis)
        return np.concatenate([x, rep], axis=axis)

    def pad_zero(x, size, axis):
        x = np.asarray(x)
        kk = size - x.shape[axis]
        if kk <= 0:
            return x
        shape = list(x.shape)
        shape[axis] = kk
        return np.concatenate([x, np.zeros(shape, x.dtype)], axis=axis)

    def pad_repeat(x, size, axis):
        x = np.asarray(x)
        kk = size - x.shape[axis]
        if kk <= 0:
            return x
        rep = np.repeat(np.take(x, [x.shape[axis] - 1], axis=axis), kk,
                        axis=axis)
        return np.concatenate([x, rep], axis=axis)

    def pad_full(x, size, axis, value):
        x = np.asarray(x)
        kk = size - x.shape[axis]
        if kk <= 0:
            return x
        shape = list(x.shape)
        shape[axis] = kk
        return np.concatenate([x, np.full(shape, value, x.dtype)],
                              axis=axis)

    ft2 = FSMTensors(
        f_xy=pad_a(pad_repeat(ft.f_xy, r_max, 1)),
        f_s=pad_a(pad_repeat(ft.f_s, r_max, 1)),
        f_seg_valid=pad_a(pad_zero(ft.f_seg_valid, r_max - 1, 1)),
        g_valid=pad_a(pad_zero(ft.g_valid, g_max, 1)),
        g_start=pad_a(pad_zero(ft.g_start, g_max, 1)),
        g_end=pad_a(pad_zero(ft.g_end, g_max, 1)),
        g_type=pad_a(pad_zero(ft.g_type, g_max, 1)),
        g_has_stop=pad_a(pad_zero(ft.g_has_stop, g_max, 1)),
        g_stop_s=pad_a(pad_zero(ft.g_stop_s, g_max, 1)),
        g_stop_xy=pad_a(pad_zero(ft.g_stop_xy, g_max, 1)),
        tl_code=pad_zero(pad_a(pad_repeat(ft.tl_code, c_max, 0), axis=1),
                         g_max, 2),
        ll_rings=pad_zero(pad_repeat(ft.ll_rings, e_max, 1), l_max, 0),
        ll_valid=pad_zero(ft.ll_valid, l_max, 0),
        ll_in_ref=pad_a(pad_zero(ft.ll_in_ref, l_max, 1)),
        ll_speed=pad_full(ft.ll_speed, l_max, 0, np.inf),
        chain_mat=pad_zero(pad_zero(ft.chain_mat, l_max, 0), l_max, 1),
        ll_left_ok=pad_zero(ft.ll_left_ok, l_max, 0),
        ob_pos=pad_zero(pad_zero(ft.ob_pos, t1_max, 0), ob_max, 1),
        ob_vel=pad_zero(pad_zero(ft.ob_vel, t1_max, 0), ob_max, 1),
        ob_valid=pad_zero(pad_zero(ft.ob_valid, t1_max, 0), ob_max, 1),
        ob_len=pad_full(ft.ob_len, ob_max, 0, 4.5),
        ob_ped=pad_zero(ft.ob_ped, ob_max, 0),
        ob_member=pad_zero(pad_zero(pad_zero(
            ft.ob_member, t1_max, 0), ob_max, 1), l_max, 2),
        ob_sd=pad_a(pad_zero(pad_zero(ft.ob_sd, t1_max, 1), ob_max, 2)),
        fin_has=pad_a(ft.fin_has), fin_lo=pad_a(ft.fin_lo),
        fin_hi=pad_a(ft.fin_hi),
        fin_v_has=pad_a(ft.fin_v_has), fin_v=pad_a(ft.fin_v),
        fin_t_has=pad_a(ft.fin_t_has), fin_t_lo=pad_a(ft.fin_t_lo),
        fin_t_hi=pad_a(ft.fin_t_hi),
        speed_limit_default=np.asarray(ft.speed_limit_default),
        is_hc=np.asarray(ft.is_hc),
    )
    c2 = FSMCarry(*[
        (pad_a(leaf) if np.asarray(leaf).ndim > 0 else np.asarray(leaf))
        for leaf in carry0])
    return ft2, c2
