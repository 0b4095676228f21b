"""ReactivePlanner: host orchestration of the fused TPU planning cycle.

The TPU-native counterpart of the reference's `ReactivePlannerCpp`
(/root/reference/frenetix_motion_planner/reactive_planner_cpp.py) +
the shared `Planner` base (planner.py): per replanning cycle it

  1. assembles the sampling matrix for the current sampling level
     (progressive densification loop, reactive_planner_cpp.py:329-377),
  2. runs ONE fused device computation (`planner.core.evaluate_cycle`) instead
     of `evaluate_all_current_functions_concurrent` + serial collision walk,
  3. applies the fallback ladder when nothing is selectable:
     standstill (v ≤ 0.1, :394-398) → emergency stopping selection
     (:403-407, _select_stopping_trajectory :443-466) → minimum-risk
     selection (:409-413),
  4. materializes only the selected trajectory to host.

All device shapes are bucketed (ops.sampling.pad_matrix) so the jit cache
stays small across cycles and levels.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import numpy as np

from frenetix_tpu.geometry.refpath import prepare_reference_path
from frenetix_tpu.ops import sampling as smp
from frenetix_tpu.ops.costs import COST_TERM_ORDER, empty_predictions
from frenetix_tpu.planner.core import CycleContext, evaluate_cycle
from frenetix_tpu.utils.config import FrenetixConfig

__all__ = ["PlannedTrajectory", "ReactivePlanner", "wants_stopping_mode"]


def wants_stopping_mode(stop_point, x_cl, threshold: float) -> bool:
    """Should the planner switch to end-state-constrained (quintic stopping)
    longitudinal sampling for this cycle?

    Mirrors `reactive_planner_cpp.py:332-343` (stop point armed, target
    velocity below the stopping-mode threshold, point ahead of the ego) with
    one deliberate deviation: the target velocity must also be a
    DECELERATION demand (below the current velocity + 2 m/s).  A "stop"
    point whose target velocity is above the current one is an acceleration
    request; quintic sampling toward a point that the behavior planner's
    min-distance clamp keeps ~1.4 m ahead of the nose would otherwise pin a
    slow vehicle in a permanent crawl.  The reference never exercises this
    case — its turn/intersection states are TODO stubs and never arm
    nose-adjacent stop points paired with moderate target velocities.

    The single predicate is shared by the sequential planner and the batched
    stepper's host-fallback routing (sim/simulation.py) so the two paths
    cannot diverge on which agents run the stopping sampler.
    """
    return (
        stop_point is not None
        and stop_point[1] < threshold
        and stop_point[0] > x_cl[0][0]
        and stop_point[1] < max(float(x_cl[0][1]), 1.0) + 2.0
    )


@dataclass
class PlannedTrajectory:
    """The selected trajectory, materialized to host (NumPy).

    The analog of the reference's trajectory pair
    (`Planner._compute_trajectory_pair`, planner.py:394-447): Cartesian states
    + curvilinear states + the sampling parameters that produced it.
    """

    x: np.ndarray
    y: np.ndarray
    theta: np.ndarray
    v: np.ndarray
    a: np.ndarray
    kappa: np.ndarray
    s: np.ndarray
    s_dot: np.ndarray
    s_ddot: np.ndarray
    d: np.ndarray
    d_dot: np.ndarray
    d_ddot: np.ndarray
    cost: float
    sampling_parameters: np.ndarray  # (13,)
    mode: str = "optimal"  # optimal | standstill | stopping | min_risk
    cost_terms: Optional[np.ndarray] = None
    # populated when debug.log_risk is on (reference log_risk, debug.yaml:4)
    ego_risk: Optional[float] = None
    obst_risk: Optional[float] = None

    @property
    def steering_angle(self) -> np.ndarray:
        return self._steering

    def compute_steering(self, wheelbase: float):
        self._steering = np.arctan2(wheelbase * self.kappa, 1.0)
        return self

    def yaw_rate(self, dt: float, yaw_rate0: float = 0.0) -> np.ndarray:
        yr = np.gradient(self.theta) / dt
        yr[0] = yaw_rate0
        return yr


class ReactivePlanner:
    def __init__(self, config: FrenetixConfig, msg_logger=None):
        import jax.numpy as jnp

        self.config = config
        if config.planning.sampling_min >= config.planning.sampling_max:
            # the densification loop bound is exclusive (reference
            # planning.yaml levels 2→3); an empty range would dereference a
            # never-run cycle — fail loudly at construction instead
            raise ValueError(
                f"planning.sampling_min ({config.planning.sampling_min}) must "
                f"be < planning.sampling_max ({config.planning.sampling_max}) "
                "— the max bound is exclusive"
            )
        self.jnp = jnp
        self.dtype = jnp.float64 if config.dtype == "float64" else jnp.float32
        self.np_dtype = np.float64 if config.dtype == "float64" else np.float32
        self.veh = config.vehicle
        self.dt = config.planning.dt
        self.n_steps = config.planning.n_steps
        self.horizon = config.planning.planning_horizon
        self.msg_logger = msg_logger

        self.weights = jnp.asarray(
            np.array([config.cost_weights.get(k, 0.0) for k in COST_TERM_ORDER],
                     self.np_dtype)
        )
        self.ref = None
        self.ref_np = None
        self.corridor = None
        self.preds = None
        self.obstacle_meta = None
        self.obstacle_xy = np.zeros((0, 2), self.np_dtype)
        self.obstacle_valid = np.zeros((0,), bool)
        self.desired_velocity = 0.0
        self.desired_avg_velocity = 0.0
        self.stop_point: Optional[tuple[float, float]] = None  # (s, v) from behavior
        self.occlusion_module = None
        self.phantom_mask = None
        self.reach_grid = None   # lanelet reach sets (responsibility cost)
        self.infeasible_histogram = np.zeros(11, int)
        self.stats = {}
        self.last_cycle = None  # (CycleResult, matrix, mask) when save_all_traj

    # ------------------------------------------------------------------ setup
    def set_reference_path(self, polyline: np.ndarray, drivable_polygons=None,
                           lanelets=None):
        """Build device tables + drivable corridor + lane-center segments from
        a raw route polyline (replaces set_reference_and_coordinate_system,
        reactive_planner_cpp.py:180-195)."""
        from frenetix_tpu.geometry.corridor import (
            corridor_from_polygons, strip_corridor,
        )

        ref = prepare_reference_path(polyline, smooth=True, dtype=self.np_dtype)
        self.ref_np = ref
        if drivable_polygons:
            corridor = corridor_from_polygons(ref, drivable_polygons)
        else:
            corridor = strip_corridor(ref, 3.5 + self.veh.width)
        self.corridor = self.jnp.asarray(corridor.astype(self.np_dtype))
        self.ref = type(ref)(*(self.jnp.asarray(f) for f in ref))

        # lanelet centerline segments for the lane_center_offset cost
        segs = []
        for ll in (lanelets or []):
            cv = np.asarray(ll.center_vertices, self.np_dtype)
            segs.append(np.stack([cv[:-1], cv[1:]], axis=1))
        if segs:
            seg_arr = np.concatenate(segs, axis=0)
            self.lane_segments = self.jnp.asarray(seg_arr)
            self.lane_valid = self.jnp.ones(len(seg_arr), bool)
        else:
            self.lane_segments = self.jnp.zeros((0, 2, 2), self.dtype)
            self.lane_valid = self.jnp.zeros((0,), bool)

    def set_predictions(self, preds, obstacle_meta=None):
        self.preds = preds
        self.obstacle_meta = obstacle_meta

    def set_obstacles(self, obstacle_xy: np.ndarray, obstacle_valid: np.ndarray):
        self.obstacle_xy = obstacle_xy.astype(self.np_dtype)
        self.obstacle_valid = obstacle_valid

    def set_desired_velocity(self, v_des: float, v_avg: float = None):
        self.desired_velocity = float(v_des)
        self.desired_avg_velocity = float(v_avg if v_avg is not None else v_des)

    # ------------------------------------------------------ curvilinear state
    def compute_initial_state(self, x0):
        """Cartesian → curvilinear initial state (host NumPy mirror of
        planner.py:567-635; cheap scalar math, no device round-trip)."""
        from frenetix_tpu.planner.initial_state import compute_initial_state_np

        low_vel = float(x0.velocity) < self.config.planning.low_vel_mode_threshold
        return compute_initial_state_np(self.ref_np, x0, self.veh.wheelbase, low_vel)

    # ---------------------------------------------------------------- planning
    def _sampling_ranges(self, level: int, x_cl):
        p = self.config.planning
        x0_lon, x0_lat = x_cl
        t1 = smp.time_samples(p.t_min, self.horizon, self.dt, level)
        t1 = np.unique(np.concatenate([t1, [self.n_steps * self.dt]]))
        v_min = max(0.001, self.current_velocity - self.veh.a_max * self.horizon)
        v_max = min(self.current_velocity + (self.veh.a_max / 6.0) * self.horizon,
                    self.veh.v_max)
        ss1 = np.union1d(smp.linspace_samples(v_min, v_max, level), [x0_lon[1]])
        if p.d_ego_pos:
            d_lo, d_hi = x0_lat[0] + p.d_min, x0_lat[0] + p.d_max
        else:
            d_lo, d_hi = p.d_min, p.d_max
        d1 = np.union1d(smp.linspace_samples(d_lo, d_hi, level), [x0_lat[0]])
        return t1, ss1, d1

    def _make_context(self, x0_orientation):
        jnp = self.jnp
        preds = self.preds
        if preds is None:
            preds = empty_predictions(self.n_steps, self.dtype)
        return CycleContext(
            ref=self.ref,
            veh=self.veh,
            weights=self.weights,
            preds=preds,
            obstacle_xy=jnp.asarray(self.obstacle_xy),
            obstacle_valid=jnp.asarray(self.obstacle_valid),
            corridor=self.corridor,
            lane_segments=self.lane_segments,
            lane_valid=self.lane_valid,
            x0_orientation=jnp.asarray(x0_orientation, self.dtype),
            desired_velocity=jnp.asarray(self.desired_velocity, self.dtype),
            desired_avg_velocity=jnp.asarray(self.desired_avg_velocity, self.dtype),
        )

    def plan(self, x0, x_cl) -> Optional[PlannedTrajectory]:
        """One replanning cycle.

        x0: planner.initial_state.CartesianState-like (rear-axle Cartesian).
        x_cl: ((s, s_dot, s_ddot), (d, d_dot, d_ddot)) curvilinear state.
        Returns the selected PlannedTrajectory or None (total failure).
        """
        p = self.config.planning
        self.current_velocity = float(x0.velocity)
        low_vel = self.current_velocity < p.low_vel_mode_threshold
        ctx = self._make_context(float(x0.orientation))

        optimal = None
        last_res, last_matrix, last_mask = None, None, None
        level = p.sampling_min
        # stopping mode: behavior planner provided a stop point with low target
        # velocity → end-position-constrained (quintic) longitudinal sampling
        # (reactive_planner_cpp.py:332-343, 258-290)
        use_stopping = wants_stopping_mode(
            self.stop_point, x_cl, self.config.behavior.stopping_mode_threshold
        )
        # progressive densification (reactive_planner_cpp.py:329-377)
        while optimal is None and level < p.sampling_max:
            quintic_lon = False
            if use_stopping:
                matrix = self._stopping_matrix(level, x_cl)
                quintic_lon = True
            else:
                t1, ss1, d1 = self._sampling_ranges(level, x_cl)
                matrix = smp.build_sampling_matrix(
                    t1_vals=t1, ss1_vals=ss1, d1_vals=d1,
                    x0_lon=x_cl[0], x0_lat=x_cl[1], dtype=self.np_dtype,
                )
            matrix, mask = smp.pad_matrix(matrix, self.config.debug.matrix_bucket)
            res = evaluate_cycle(
                self.jnp.asarray(matrix), self.jnp.asarray(mask), ctx,
                dt=self.dt, n_steps=self.n_steps, low_vel_mode=low_vel,
                quintic_lon=quintic_lon,
                compensated_sum=p.compensated_cost_sum,
            )
            res = self._apply_responsibility(res)
            last_res, last_matrix, last_mask = res, matrix, mask
            # ONE device→host round trip per level: found/best + the summary
            # header + the selected candidate's rows (_jitted_replan_pack) —
            # over the remote-TPU tunnel every separate fetch is a full
            # network round trip and the fetch count IS the replan wall time
            pack = np.asarray(self._replan_pack_fn()(
                res.rollout, res.cost, res.cost_terms, res.collides,
                res.boundary_step, res.histogram, res.found, res.best_idx,
                self.jnp.asarray(mask),
            ), dtype=self.np_dtype)
            last_pack = pack
            found = bool(pack[0, 0])
            occ_ok = True
            if (self.occlusion_module is not None and self.phantom_mask is not None
                    and found):
                # occlusion safety gate: re-select among candidates whose
                # phantom risk stays under the thresholds — risk stack, the
                # shared gate, external soft costs, argmin and the selected
                # rows all in ONE device fetch (_jitted_occlusion_pack); the
                # header records the SELECTION cost (incl. external terms)
                # so host and in-batch paths log comparable numbers
                pack_o = self._occlusion_pack(res, ctx)
                if bool(pack_o[0, 0]):
                    mode = "stopping_plan" if quintic_lon else "optimal"
                    optimal = self._plan_from_rows(
                        pack_o[1:], res, int(pack_o[0, 1]), matrix, mode,
                        cost_override=float(pack_o[0, 2]),
                        risk_scalars=(float(pack_o[0, 3]),
                                      float(pack_o[0, 4])),
                    )
                else:
                    occ_ok = False
            if optimal is None and occ_ok and found:
                mode = "stopping_plan" if quintic_lon else "optimal"
                optimal = self._plan_from_rows(
                    pack[1:], res, int(pack[0, 1]), matrix, mode)
            if optimal is None and use_stopping:
                # stopping sampling found nothing → fall back to regular
                # sampling at the same level (reactive_planner_cpp.py:336-341)
                use_stopping = False
                continue
            level += 1

        # histogram + stat counters ride the last level's pack header — no
        # extra device fetch
        h = int(last_res.histogram.shape[0])
        header = last_pack[0]
        self.infeasible_histogram = header[5:5 + h].astype(np.int64)
        if self.config.debug.save_all_traj:
            self.last_cycle = (last_res, last_matrix, last_mask)
        self.stats = {
            "feasible": int(header[2]),
            "total": int(last_mask.sum()),
            "collisions": int(header[3]),
            "off_road": int(header[4]),
        }

        if optimal is not None:
            return optimal

        # ---- fallback ladder ------------------------------------------------
        if self.current_velocity <= 0.1:
            return self._standstill_trajectory(x0, x_cl)

        feas = np.asarray(last_res.rollout.feasible & last_res.rollout.valid & last_mask)
        if feas.any():
            if p.emergency_mode == "stopping":
                idx = self._select_stopping_index(last_matrix, feas, x_cl[1][0])
                return self._materialize(last_res, idx, last_matrix, "stopping")
            # minimum-risk selection (reactive_planner_cpp.py:409-413 →
            # risk_costs.calc_risk): lowest ego_risk + obst_risk over the full
            # harm × collision-probability model, batched for all candidates
            total, risks = self._risk_totals(last_res.rollout, return_risks=True)
            total = np.where(feas, np.asarray(total), np.inf)
            return self._materialize(last_res, int(np.argmin(total)),
                                     last_matrix, "min_risk", risks=risks)
        return None

    def _risk_fn(self):
        """Jitted risk computation (eager per-op dispatch of the bivariate-CDF
        stack costs seconds per replan)."""
        if not hasattr(self, "_risk_fn_cached"):
            import jax

            from frenetix_tpu.risk.costs import trajectory_risks

            mass = self.veh.mass
            self._risk_fn_cached = jax.jit(
                lambda ro, preds, meta: trajectory_risks(ro, preds, meta, mass)
            )
        return self._risk_fn_cached

    def _default_meta(self, preds):
        from frenetix_tpu.risk.harm import meta_from_footprint

        meta = self.obstacle_meta
        if meta is None:
            # crash class + mass inferred from footprint (pedestrian-sized
            # rows are unprotected 75 kg bodies, not negative-mass cars)
            meta = meta_from_footprint(
                np.asarray(preds.lengths), np.asarray(preds.widths),
                xp=np, dtype=self.np_dtype,
            )
        return meta

    def _risk_totals(self, ro, return_risks=False):
        """(M,) ego_risk + obst_risk via the full risk stack (risk/).
        With return_risks, also hands back the full TrajectoryRisks so
        callers (min-risk fallback → _materialize log_risk) don't recompute
        the batch."""
        preds = self.preds
        if preds is None or preds.num_obstacles == 0:
            z = np.zeros(ro.x.shape[0], self.np_dtype)
            return (z, None) if return_risks else z
        risks = self._risk_fn()(ro, preds, self._default_meta(preds))
        total = risks.ego_risk + risks.obst_risk
        return (total, risks) if return_risks else total

    def set_occlusion_module(self, module, phantom_mask=None, ego_state=None,
                             time_step=None):
        """Occlusion-aware safety gating (reference set_occlusion_module,
        planner.py:271-273; assessment applied at :385-389).  `ego_state` /
        `time_step` feed the external soft-cost terms (occ_um needs the polar
        visibility map around the current pose)."""
        self.occlusion_module = module
        self.phantom_mask = phantom_mask
        self._occ_ego_state = ego_state
        self._occ_time_step = time_step

    def _occlusion_pack(self, res, ctx):
        """Run the fused occlusion-gated re-selection (_jitted_occlusion_pack)
        and fetch its (14, L) pack — the host work is only gathering the
        polar-map inputs for the external soft costs."""
        mod = self.occlusion_module
        ew = self.config.external_cost_weights
        w_pm = float(ew.get("occ_pm", 0.0))
        w_um = float(ew.get("occ_um", 0.0))
        w_ve = float(ew.get("occ_ve", 0.0))
        ego_state = getattr(self, "_occ_ego_state", None)
        if ego_state is not None and w_um != 0.0:
            r_vis, ego = mod.polar_map(ego_state, self._occ_time_step)
        else:
            r_vis = np.full(720, float(mod.sensor_radius))
            ego = (np.asarray(ego_state.position, dtype=np.float64)
                   if ego_state is not None else np.zeros(2))
        if w_ve != 0.0 or w_um != 0.0 or w_pm != 0.0:
            pts, pts_valid = mod.occluder_points()
        else:
            pts, pts_valid = np.zeros((1, 2)), np.zeros(1, bool)
        fn = _jitted_occlusion_pack(
            self.dt, tuple(self.veh), tuple(mod.thresholds), w_pm, w_um, w_ve)
        jnp = self.jnp
        return np.asarray(fn(
            res.rollout, ctx.preds, self._default_meta(ctx.preds),
            jnp.asarray(self.phantom_mask), res.selectable, res.cost,
            res.cost_terms,
            jnp.asarray(ego, self.np_dtype),
            jnp.asarray(r_vis, self.np_dtype),
            jnp.asarray(pts, self.np_dtype),
            jnp.asarray(pts_valid),
        ), dtype=self.np_dtype)

    def set_reach_grid(self, grid):
        """Lanelet-following reach sets for the responsibility cost
        (set_reach_set, planner.py:219; risk_assessment/responsibility.py)."""
        self.reach_grid = grid

    def _apply_responsibility(self, res):
        """Add the reach-set responsibility term to the cycle's costs and
        re-select (the reference evaluates it inside the per-trajectory cost
        loop, partial_cost_functions.py responsibility; here it runs as one
        batched post-pass over the rollout — active only when the weight is
        non-zero, like cost.yaml's 0 default)."""
        w = self.config.cost_weights.get("responsibility", 0.0)
        if w == 0.0 or self.reach_grid is None or self.preds is None \
                or self.preds.num_obstacles == 0:
            return res
        cost2, best = _jitted_responsibility(w, self.dt, self.veh.mass)(
            res.rollout, self.preds, self._default_meta(self.preds),
            self.reach_grid, res.cost, res.selectable, res.best_idx,
        )
        return res._replace(cost=cost2, best_idx=best)

    def set_stop_point(self, stop_s, stop_v):
        """Behavior-planner stop point → stopping-trajectory mode
        (set_stopping_point, planner.py:664-669)."""
        self.stop_point = (float(stop_s), float(stop_v)) if stop_s is not None else None

    def _stopping_matrix(self, level: int, x_cl):
        """End-position-constrained sampling matrix: t1 × s1 × d1 with end
        velocity 0 (spec: _create_end_point_trajectory_bundle,
        reactive_planner.py:628-671 + the d_delta scaling of
        _generate_stopping_trajectories, reactive_planner_cpp.py:258-290).
        Column 5 carries the end *position* (quintic_lon mode)."""
        p = self.config.planning
        stop_s, stop_v = self.stop_point
        x0_lon, x0_lat = x_cl

        d_delta = 0.4
        d_thresh = 5.0
        ref_vel = (x0_lon[1] + stop_v) / 2.0
        if ref_vel < d_thresh:
            d_delta = max((x0_lon[1] / d_thresh) * d_delta, 0.01)

        t1 = smp.time_samples(p.t_min, self.horizon, self.dt, level)
        t1 = np.unique(np.concatenate([t1, [self.n_steps * self.dt]]))
        s1 = smp.linspace_samples((x0_lon[0] + stop_s) / 2.0, stop_s, level)
        d1 = np.union1d(
            smp.linspace_samples(x0_lat[0] - d_delta, x0_lat[0] + d_delta, max(level - 1, 0)),
            [x0_lat[0]],
        )
        # quintic_lon: column 5 = end position s1, column 6 = end acceleration
        return smp.build_sampling_matrix(
            t1_vals=t1, ss1_vals=s1, d1_vals=d1,
            x0_lon=x0_lon, x0_lat=x0_lat, dtype=self.np_dtype,
        )

    # ------------------------------------------------------------- fallbacks
    @staticmethod
    def _select_stopping_index(matrix, feasible_mask, d_pos) -> int:
        """Reference `_select_stopping_trajectory` order: v ascending, then t
        ascending, then d by |d - current d| (reactive_planner_cpp.py:443-466);
        first feasible wins."""
        v = matrix[:, 5]
        t = matrix[:, 1]
        d = matrix[:, 10]
        d_rank_vals = np.unique(d)
        d_rank = {val: r for r, val in enumerate(d_rank_vals[np.argsort(np.abs(d_rank_vals - d_pos))])}
        order = np.lexsort((np.array([d_rank[val] for val in d]), t, v))
        for i in order:
            if feasible_mask[i]:
                return int(i)
        return int(order[0])

    def _standstill_trajectory(self, x0, x_cl) -> PlannedTrajectory:
        """Constant-pose trajectory with an initial braking pulse
        (_compute_standstill_trajectory, reactive_planner.py:579-626)."""
        n1 = self.n_steps + 1
        rep = lambda v: np.full(n1, v, self.np_dtype)
        a = np.zeros(n1, self.np_dtype)
        if n1 > 1:
            a[1] = -x0.velocity / self.dt
        kappa0 = np.tan(float(x0.steering_angle)) / self.veh.wheelbase
        row = np.zeros(13, self.np_dtype)
        row[1] = self.horizon
        row[2:5] = x_cl[0]
        row[7:10] = x_cl[1]
        row[10] = x_cl[1][0]
        return PlannedTrajectory(
            x=rep(float(x0.x)), y=rep(float(x0.y)), theta=rep(float(x0.orientation)),
            v=rep(0.0), a=a, kappa=rep(kappa0),
            s=rep(x_cl[0][0]), s_dot=rep(x_cl[0][1]), s_ddot=rep(x_cl[0][2]),
            d=rep(x_cl[1][0]), d_dot=rep(x_cl[1][1]), d_ddot=rep(x_cl[1][2]),
            cost=0.0, sampling_parameters=row, mode="standstill",
        ).compute_steering(self.veh.wheelbase)

    # ---------------------------------------------------------- materialation
    def _select_rows_fn(self):
        return _jitted_select_rows()

    def _replan_pack_fn(self):
        return _jitted_replan_pack()

    def _materialize(self, res, idx: int, matrix, mode: str,
                     risks=None, cost_override=None) -> PlannedTrajectory:
        rows = np.asarray(
            self._select_rows_fn()(res.rollout, res.cost, res.cost_terms, idx),
            dtype=self.np_dtype,
        )
        return self._plan_from_rows(rows, res, idx, matrix, mode,
                                    risks=risks, cost_override=cost_override)

    def _plan_from_rows(self, rows, res, idx: int, matrix, mode: str,
                        risks=None, cost_override=None,
                        risk_scalars=None) -> PlannedTrajectory:
        """Build the PlannedTrajectory from already-fetched (13, L) rows
        (12 state rows + [cost, cost_terms...]; see _jitted_select_rows).
        `risk_scalars`: already-fetched (ego_risk, obst_risk) of the selected
        candidate — avoids recomputing the risk batch for log_risk."""
        k = res.cost_terms.shape[1]
        n1 = res.rollout.x.shape[1]
        (x, y, theta, v, a_, kappa, s, s_dot, s_ddot, d, d_dot, d_ddot) = (
            r[:n1] for r in rows[:12])
        extra = rows[12]
        plan = PlannedTrajectory(
            x=x, y=y, theta=theta, v=v, a=a_, kappa=kappa,
            s=s, s_dot=s_dot, s_ddot=s_ddot,
            d=d, d_dot=d_dot, d_ddot=d_ddot,
            cost=float(extra[0]) if cost_override is None
            else float(cost_override),
            sampling_parameters=np.asarray(matrix[idx]),
            mode=mode,
            cost_terms=extra[1:1 + k],
        ).compute_steering(self.veh.wheelbase)
        if (self.config.debug.log_risk and self.preds is not None
                and self.preds.num_obstacles > 0):
            # selected trajectory's risk via the full harm x probability
            # stack (reference debug.yaml log_risk → planner.py risk
            # logging); reuse the caller's batch when it already computed one
            if risk_scalars is not None:
                plan.ego_risk, plan.obst_risk = risk_scalars
            else:
                if risks is None:
                    risks = self._risk_fn()(res.rollout, self.preds,
                                            self._default_meta(self.preds))
                plan.ego_risk = float(risks.ego_risk[idx])
                plan.obst_risk = float(risks.obst_risk[idx])
        return plan


# ---------------------------------------------------------------------------
# fused-fetch device programs (tunnel round-trip economy, see PERF.md).
# MODULE-LEVEL singletons: per-planner jit closures would recompile for
# every new Agent/Simulation (a fresh function identity is a fresh jit
# cache entry — measured ~2.5 s per Simulation on CPU).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _jitted_responsibility(w, dt, mass):
    """Device-resident responsibility re-selection: risk stack → reach-grid
    term → cost += w·term → re-argmin over selectable, all without a single
    host fetch (the previous host pass fetched term/cost/selectable per
    replan).  Keyed by the planner's static scalars."""
    import jax
    import jax.numpy as jnp

    from frenetix_tpu.risk.costs import trajectory_risks
    from frenetix_tpu.risk.reachable_set import responsibility_reach_grid

    def f(ro, preds, meta, grid, cost, selectable, best0):
        risks = trajectory_risks(ro, preds, meta, mass)
        term = responsibility_reach_grid(ro, grid, risks, dt)
        cost2 = cost + w * term
        masked = jnp.where(selectable, cost2, jnp.inf)
        best = jnp.where(jnp.any(selectable), jnp.argmin(masked),
                         best0).astype(jnp.int32)
        return cost2, best

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jitted_occlusion_pack(dt, veh_key, thr_key, w_pm, w_um, w_ve):
    """ONE-fetch occlusion-gated re-selection, (14, L): header
    [found, idx, selection_cost, ego_risk, obst_risk] + the selected
    candidate's 12 state rows + [cost, cost_terms...].  Runs the whole
    sequential occlusion branch on device — risk stack, the SHARED
    phantom_safety_mask gate, optional external soft costs, masked argmin —
    replacing ~5 separate device fetches per occlusion replan.  Keyed by the
    planner's static scalars (dt, vehicle, thresholds, external weights) so
    every Agent/Simulation shares one compiled program."""
    import jax
    import jax.numpy as jnp

    from frenetix_tpu.occlusion import (
        PhantomThresholds, external_occlusion_costs, phantom_safety_mask,
    )
    from frenetix_tpu.ops.kinematics import VehicleParams
    from frenetix_tpu.risk.costs import trajectory_risks

    veh = VehicleParams(*veh_key)
    thr = PhantomThresholds(*thr_key)
    use_ext = (w_pm != 0.0) or (w_um != 0.0) or (w_ve != 0.0)

    def f(ro, preds, meta, phantom_mask, selectable, cost, terms,
          ego, r_vis, pts, pts_valid):
        risks = trajectory_risks(ro, preds, meta, veh.mass)
        safe = phantom_safety_mask(risks, phantom_mask, thr,
                                   rollout=ro, preds=preds, veh=veh, dt=dt)
        sel = selectable & safe
        cost2 = cost
        if use_ext:
            cost2 = cost2 + external_occlusion_costs(
                ro, w_pm=w_pm, w_um=w_um, w_ve=w_ve, risks=risks,
                phantom_mask=phantom_mask, ego=ego, r_vis=r_vis,
                occluder_pts=pts, occluder_valid=pts_valid,
            )
        masked = jnp.where(sel, cost2, jnp.inf)
        idx = jnp.argmin(masked).astype(jnp.int32)
        found = jnp.any(sel)

        k = terms.shape[1]
        n1 = ro.x.shape[1]
        length = max(n1, 1 + k, 5)
        dt_ = ro.x.dtype

        def pad(v):
            return jnp.zeros(length, dt_).at[:n1].set(v)

        header = (
            jnp.zeros(length, dt_)
            .at[0].set(found.astype(dt_))
            .at[1].set(idx.astype(dt_))
            .at[2].set(cost2[idx])
            .at[3].set(risks.ego_risk[idx])
            .at[4].set(risks.obst_risk[idx])
        )
        extra = jnp.zeros(length, dt_)
        extra = extra.at[0].set(cost2[idx]).at[1:1 + k].set(terms[idx])
        return jnp.stack([
            header,
            pad(ro.x[idx]), pad(ro.y[idx]), pad(ro.theta_gl[idx]),
            pad(ro.v[idx]), pad(ro.a[idx]), pad(ro.kappa_gl[idx]),
            pad(ro.s[idx]), pad(ro.s_vel[idx]), pad(ro.s_acc[idx]),
            pad(ro.d[idx]), pad(ro.d_vel[idx]), pad(ro.d_acc[idx]),
            extra,
        ])

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jitted_replan_pack():
    """ONE-fetch replan result, (14, L): a header row
    [found, best_idx, feasible, collisions, off_road, histogram...] followed
    by the selected candidate's 12 state rows and a [cost, cost_terms...]
    row, all evaluated at best_idx (the rows are garbage when found == 0 and
    ignored by the host).  The sequential path previously paid three round
    trips per replan over the remote tunnel (found/best, selected rows,
    summary); all counters/indices are < 2^24 so they survive the float32
    packing exactly."""
    import jax
    import jax.numpy as jnp

    def f(ro, cost, terms, collides, boundary_step, histogram, found, best,
          mask):
        k = terms.shape[1]
        n1 = ro.x.shape[1]
        h = histogram.shape[0]
        length = max(n1, 1 + k, 5 + h)
        idx = best
        dt_ = ro.x.dtype

        def pad(v):
            return jnp.zeros(length, dt_).at[:n1].set(v)

        header = (
            jnp.zeros(length, dt_)
            .at[0].set(found.astype(dt_))
            .at[1].set(best.astype(dt_))
            .at[2].set(jnp.sum(ro.feasible & mask).astype(dt_))
            .at[3].set(jnp.sum(collides & mask).astype(dt_))
            .at[4].set(jnp.sum((boundary_step >= 0) & mask).astype(dt_))
            .at[5:5 + h].set(histogram.astype(dt_))
        )
        extra = jnp.zeros(length, dt_)
        extra = extra.at[0].set(cost[idx]).at[1:1 + k].set(terms[idx])
        return jnp.stack([
            header,
            pad(ro.x[idx]), pad(ro.y[idx]), pad(ro.theta_gl[idx]),
            pad(ro.v[idx]), pad(ro.a[idx]), pad(ro.kappa_gl[idx]),
            pad(ro.s[idx]), pad(ro.s_vel[idx]), pad(ro.s_acc[idx]),
            pad(ro.d[idx]), pad(ro.d_vel[idx]), pad(ro.d_acc[idx]),
            extra,
        ])

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jitted_select_rows():
    """Jitted single-fetch materialization: the selected candidate's 12
    state rows + a 13th row carrying [cost, cost_terms...] — every per-field
    device slice costs a separate round trip over the remote tunnel (~14 per
    replan before this)."""
    import jax
    import jax.numpy as jnp

    def f(ro, cost, terms, idx):
        k = terms.shape[1]
        n1 = ro.x.shape[1]
        length = max(n1, 1 + k)  # short horizons: pad, don't clip

        def pad(v):
            return jnp.zeros(length, ro.x.dtype).at[:n1].set(v)

        extra = jnp.zeros(length, ro.x.dtype)
        extra = extra.at[0].set(cost[idx]).at[1:1 + k].set(terms[idx])
        return jnp.stack([
            pad(ro.x[idx]), pad(ro.y[idx]), pad(ro.theta_gl[idx]),
            pad(ro.v[idx]), pad(ro.a[idx]), pad(ro.kappa_gl[idx]),
            pad(ro.s[idx]), pad(ro.s_vel[idx]), pad(ro.s_acc[idx]),
            pad(ro.d[idx]), pad(ro.d_vel[idx]), pad(ro.d_acc[idx]),
            extra,
        ])

    return jax.jit(f)
