"""Pure-NumPy scalar-loop implementation of the planner semantics.

The living behavioral specification: an *independent* re-implementation of
the per-trajectory algorithms of the reference's pure-Python backend
(`/root/reference/frenetix_motion_planner/reactive_planner.py:274-577`,
`partial_cost_functions.py`), deliberately written the slow scalar way
(Python loops over time steps, `np.linalg.solve` for coefficients).

Dual role, mirroring the reference's own dual-backend design
(`use_cpp` toggle, frenet_interface.py:71-73, SURVEY §4):
  - the differential-test oracle for the batched TPU kernels
    (tests/ compares every kernel against these loops in float64), and
  - a selectable debugging backend (`ReactivePlannerNumpy`).

Documented spec choices shared with the batched implementation (deviations
from the reference noted in the respective kernels):
  - segment lookup clips to the table range and flags out-of-domain,
  - (s, d) → (x, y) uses lerped vertex position + lerped-angle normal,
  - the time grid is the intended round(t1/dt)+1 quantization (the
    reference's float arange overshoots by one step for most t1).
"""
from __future__ import annotations

import numpy as np

_EPS = 1e-5


def quartic_coeffs_solve(xs, vxs, axs, v_target, T):
    """Reference QuarticTrajectory._calc_coeffs_static_ via np.linalg.solve."""
    A = np.array([[3 * T**2, 4 * T**3], [6 * T, 12 * T**2]])
    b = np.array([v_target - vxs - axs * T, -axs])
    x = np.linalg.solve(A, b)
    return np.array([xs, vxs, 0.5 * axs, x[0], x[1], 0.0])


def quintic_coeffs_solve(xs, vxs, axs, xe, vxe, axe, T):
    """Reference QuinticTrajectory._calc_coeffs_static via np.linalg.solve."""
    A = np.array(
        [
            [T**3, T**4, T**5],
            [3 * T**2, 4 * T**3, 5 * T**4],
            [6 * T, 12 * T**2, 20 * T**3],
        ]
    )
    b = np.array(
        [xe - xs - vxs * T - 0.5 * axs * T**2, vxe - vxs - axs * T, axe - axs]
    )
    x = np.linalg.solve(A, b)
    return np.array([xs, vxs, 0.5 * axs, x[0], x[1], x[2]])


def poly_eval(c, tau, der=0):
    if der == 0:
        return c[0] + c[1] * tau + c[2] * tau**2 + c[3] * tau**3 + c[4] * tau**4 + c[5] * tau**5
    if der == 1:
        return c[1] + 2 * c[2] * tau + 3 * c[3] * tau**2 + 4 * c[4] * tau**3 + 5 * c[5] * tau**4
    if der == 2:
        return 2 * c[2] + 6 * c[3] * tau + 12 * c[4] * tau**2 + 20 * c[5] * tau**3
    if der == 3:
        return 6 * c[3] + 24 * c[4] * tau + 60 * c[5] * tau**2
    raise ValueError(der)


def squared_jerk_integral(c, t):
    t2, t3, t4, t5 = t * t, t**3, t**4, t**5
    return (
        36 * c[3] * c[3] * t
        + 144 * c[3] * c[4] * t2
        + 240 * c[3] * c[5] * t3
        + 192 * c[4] * c[4] * t3
        + 720 * c[4] * c[5] * t4
        + 720 * c[5] * c[5] * t5
    )


def make_valid_orientation(theta):
    while theta > 2 * np.pi:
        theta -= 2 * np.pi
    while theta < -2 * np.pi:
        theta += 2 * np.pi
    return theta


def interpolate_angle(x, x1, x2, y1, y2):
    return make_valid_orientation((y2 - y1) * (x - x1) / (x2 - x1) + y1)


def seg_index(ref_s, s):
    idx = int(np.searchsorted(ref_s, s, side="right")) - 1
    idx = min(max(idx, 0), len(ref_s) - 2)
    in_domain = ref_s[0] <= s <= ref_s[-1]
    lam = (s - ref_s[idx]) / (ref_s[idx + 1] - ref_s[idx])
    return idx, lam, in_domain


def frenet_to_cartesian_point(ref, s, d):
    idx, lam, in_dom = seg_index(ref.s, s)
    base = ref.xy[idx] + lam * (ref.xy[idx + 1] - ref.xy[idx])
    theta = ref.theta[idx] + lam * (ref.theta[idx + 1] - ref.theta[idx])
    return base[0] - d * np.sin(theta), base[1] + d * np.cos(theta), in_dom


def check_feasibility_single(
    row,
    ref,
    veh,
    *,
    dt,
    n_steps,
    low_vel_mode,
    x0_orientation,
    quintic_lon=False,
):
    """Scalar-loop oracle of ReactivePlannerPython.check_feasibility for one
    sampling-matrix row.  Returns a dict of (N+1,) arrays + flags + slot list.
    """
    N = n_steps
    t1 = row[1]
    x0_lon = row[2:5]
    ss1, sss1 = row[5], row[6]
    x0_lat = row[7:10]
    d1, dd1, ddd1 = row[10], row[11], row[12]

    if quintic_lon:
        c_lon = quintic_coeffs_solve(*x0_lon, ss1, 0.0, sss1, t1)
    else:
        c_lon = quartic_coeffs_solve(*x0_lon, ss1, t1)

    slots = np.zeros(11, dtype=bool)

    # NOTE: the reference builds `t = np.round(np.arange(0, t1+dt, dt), 5)`
    # (reactive_planner.py:296); float accumulation makes that arange overshoot
    # for most t1 (e.g. t1=1.1 → 13 samples incl. t=1.2, evaluating the
    # polynomial beyond its end time).  We use the intended quantization
    # round(t1/dt)+1 — documented spec choice, shared with ops.kinematics.
    traj_len = min(int(round(t1 / dt)) + 1, n_steps + 1)
    t = np.arange(traj_len) * dt

    s = np.zeros(N + 1)
    s_vel = np.zeros(N + 1)
    s_acc = np.zeros(N + 1)
    s[:traj_len] = poly_eval(c_lon, t, 0)
    s_vel[:traj_len] = poly_eval(c_lon, t, 1)
    s_acc[:traj_len] = poly_eval(c_lon, t, 2)
    for ext in range(traj_len, N + 1):
        s[ext] = s[ext - 1] + dt * s_vel[traj_len - 1]
    s_vel[traj_len:] = s_vel[traj_len - 1]
    s_acc[traj_len:] = 0.0

    d = np.zeros(N + 1)
    d_vel = np.zeros(N + 1)
    d_acc = np.zeros(N + 1)
    if low_vel_mode:
        span = poly_eval(c_lon, t1, 0) - x0_lon[0]
        lat_T = span if span > 0 else t1
        c_lat = quintic_coeffs_solve(*x0_lat, d1, dd1, ddd1, lat_T)
        s1 = s[:traj_len] - s[0]
        d[:traj_len] = poly_eval(c_lat, s1, 0)
        d_vel[:traj_len] = poly_eval(c_lat, s1, 1)
        d_acc[:traj_len] = poly_eval(c_lat, s1, 2)
    else:
        c_lat = quintic_coeffs_solve(*x0_lat, d1, dd1, ddd1, t1)
        d[:traj_len] = poly_eval(c_lat, t, 0)
        d_vel[:traj_len] = poly_eval(c_lat, t, 1)
        d_acc[:traj_len] = poly_eval(c_lat, t, 2)
    d[traj_len:] = d[traj_len - 1]
    d_vel[traj_len:] = 0.0
    d_acc[traj_len:] = 0.0

    if np.any(s_vel < -_EPS):
        slots[10] = True
        slots[2] = True
    if np.any(np.abs(s_acc) > veh.a_max):
        slots[1] = True
    s_vel = np.where(np.abs(s_vel) < _EPS, 0.0, s_vel)

    x = np.zeros(N + 1)
    y = np.zeros(N + 1)
    v = np.zeros(N + 1)
    a = np.zeros(N + 1)
    theta_gl = np.zeros(N + 1)
    theta_cl = np.zeros(N + 1)
    kappa_gl = np.zeros(N + 1)

    kappa_max = np.tan(veh.delta_max) / veh.wheelbase

    for i in range(N + 1):
        if not low_vel_mode:
            dp = d_vel[i] / s_vel[i] if s_vel[i] > 0.001 else 0.0
            ddot = d_acc[i] - dp * s_acc[i]
            dpp = ddot / (s_vel[i] ** 2) if s_vel[i] > 0.001 else 0.0
        else:
            dp = d_vel[i]
            dpp = d_acc[i]

        s_idx, s_lambda, in_dom = seg_index(ref.s, s[i])
        if not in_dom:
            slots[3] = True
        alpha = interpolate_angle(
            s[i], ref.s[s_idx], ref.s[s_idx + 1], ref.theta[s_idx], ref.theta[s_idx + 1]
        )
        if s_vel[i] > 0.001 or low_vel_mode:
            theta_cl[i] = np.arctan2(dp, 1.0)
            theta_gl[i] = theta_cl[i] + alpha
        else:
            theta_gl[i] = x0_orientation if i == 0 else theta_gl[i - 1]
            theta_cl[i] = theta_gl[i] - alpha

        k_r = (ref.kappa[s_idx + 1] - ref.kappa[s_idx]) * s_lambda + ref.kappa[s_idx]
        k_r_d = (ref.kappa_d[s_idx + 1] - ref.kappa_d[s_idx]) * s_lambda + ref.kappa_d[s_idx]

        oneKrD = 1 - k_r * d[i]
        cosTheta = np.cos(theta_cl[i])
        tanTheta = np.tan(theta_cl[i])

        kappa_gl[i] = (dpp + (k_r * dp + k_r_d * d[i]) * tanTheta) * cosTheta * (
            (cosTheta / oneKrD) ** 2
        ) + (cosTheta / oneKrD) * k_r
        v[i] = s_vel[i] * (oneKrD / cosTheta)
        a[i] = s_acc[i] * (oneKrD / cosTheta) + ((s_vel[i] ** 2) / cosTheta) * (
            oneKrD * tanTheta * (kappa_gl[i] * (oneKrD / cosTheta) - k_r)
            - (k_r_d * d[i] + k_r * dp)
        )

        if v[i] < -_EPS:
            slots[4] = True
        if abs(kappa_gl[i]) > kappa_max:
            slots[5] = True
        yaw_rate = (theta_gl[i] - theta_gl[i - 1]) / dt if i > 0 else 0.0
        if abs(round(yaw_rate, 5)) > kappa_max * v[i]:
            slots[6] = True
        kappa_dot = (kappa_gl[i] - kappa_gl[i - 1]) / dt if i > 0 else 0.0
        if abs(kappa_dot) > 0.4:
            slots[7] = True
        a_max_i = veh.a_max * veh.v_switch / v[i] if v[i] > veh.v_switch else veh.a_max
        if not (-veh.a_max <= a[i] <= a_max_i):
            slots[8] = True

    for i in range(N + 1):
        xi, yi, in_dom = frenet_to_cartesian_point(ref, s[i], d[i])
        x[i], y[i] = xi, yi
        if not in_dom:
            slots[9] = True

    feasible = not any(slots[k] for k in (1, 2, 3, 4, 5, 6, 7, 8))
    valid = not (slots[9] or slots[10])
    slots[0] = not (feasible and valid)

    return dict(
        s=s, s_vel=s_vel, s_acc=s_acc, d=d, d_vel=d_vel, d_acc=d_acc,
        x=x, y=y, theta_gl=theta_gl, theta_cl=theta_cl, v=v, a=a,
        kappa_gl=kappa_gl, c_lon=c_lon, c_lat=c_lat,
        feasible=feasible, valid=valid, slots=slots, traj_len=traj_len,
    )


def simpson_scipy_like(y, dx):
    """scipy.integrate.simps with even='avg' semantics (uniform spacing)."""
    y = np.asarray(y, dtype=float)
    n = y.shape[-1]

    def simpson_odd(yy):
        k = yy.shape[-1]
        if k < 3:
            return np.trapz(yy, dx=dx, axis=-1)
        w = np.ones(k)
        w[1:-1:2] = 4.0
        w[2:-1:2] = 2.0
        return np.sum(yy * w, axis=-1) * dx / 3.0

    if n % 2 == 1:
        return simpson_odd(y)
    r1 = simpson_odd(y[..., :-1]) + 0.5 * dx * (y[..., -1] + y[..., -2])
    r2 = simpson_odd(y[..., 1:]) + 0.5 * dx * (y[..., 0] + y[..., 1])
    return 0.5 * (r1 + r2)


def cost_terms_single(res, *, dt, desired_velocity, pred_means=None, pred_inv_covs=None,
                      pred_len=0, obstacle_xy=None):
    """Oracle cost terms for one candidate (partial_cost_functions.py)."""
    out = {}
    out["acceleration"] = simpson_scipy_like(res["a"] ** 2, dt)
    jerk = np.diff(res["a"]) / dt
    out["jerk"] = simpson_scipy_like(jerk**2, dt)
    out["lateral_jerk"] = squared_jerk_integral(res["c_lat"], dt)
    out["longitudinal_jerk"] = squared_jerk_integral(res["c_lon"], dt)
    dtheta = np.diff(res["theta_cl"]) / dt
    out["orientation_offset"] = simpson_scipy_like(dtheta**2, dt)
    v = res["v"]
    half = len(v) // 2
    out["velocity_offset"] = float(
        np.sum(np.abs(v[half:-1] - desired_velocity)) + abs((v[-1] - desired_velocity) ** 2)
    )
    dd = res["d"]
    out["distance_to_reference_path"] = float(
        (np.sum(np.abs(dd)) + np.abs(dd[-1]) * 5) / len(dd)
    )
    out["path_length"] = simpson_scipy_like(v, dt)
    if obstacle_xy is not None and len(obstacle_xy):
        c = 0.0
        pts = np.stack([res["x"], res["y"]], axis=1)
        for ob in obstacle_xy:
            dist2 = np.sum((pts - ob[None]) ** 2, axis=1)
            c += float(np.sum(1.0 / dist2))
        out["distance_to_obstacles"] = c
    else:
        out["distance_to_obstacles"] = 0.0
    if pred_means is not None and pred_len:
        total = 0.0
        for o in range(pred_means.shape[0]):
            for i in range(1, len(res["x"])):
                if i < pred_len:
                    delta = np.array([res["x"][i], res["y"][i]]) - pred_means[o, i - 1]
                    md2 = delta @ pred_inv_covs[o, i - 1] @ delta
                    total += 1.0 / md2**2
        out["prediction"] = total
    else:
        out["prediction"] = 0.0
    return out


class ReactivePlannerNumpy:
    """Minimal NumPy planning cycle: evaluate + cost + argmin over feasible.

    Not performance-relevant; the analog of the reference's use_cpp=False
    backend for debugging and spec exploration (collision/boundary stages are
    exercised through the TPU backend).
    """

    def __init__(self, config):
        self.config = config
        self.veh = config.vehicle
        self.dt = config.planning.dt
        self.n_steps = config.planning.n_steps

    def plan_cycle(self, matrix, ref_np, x0_orientation, low_vel_mode,
                   desired_velocity, weights=None):
        from frenetix_tpu.ops.costs import COST_TERM_ORDER

        if weights is None:
            weights = self.config.cost_weights
        best, best_cost = None, np.inf
        for i in range(len(matrix)):
            r = check_feasibility_single(
                matrix[i], ref_np, self.veh, dt=self.dt, n_steps=self.n_steps,
                low_vel_mode=low_vel_mode, x0_orientation=x0_orientation,
            )
            if not (r["feasible"] and r["valid"]):
                continue
            terms = cost_terms_single(r, dt=self.dt,
                                      desired_velocity=desired_velocity)
            cost = sum(weights.get(k, 0.0) * terms.get(k, 0.0)
                       for k in COST_TERM_ORDER)
            if cost < best_cost:
                best, best_cost = (i, r), cost
        return best, best_cost
