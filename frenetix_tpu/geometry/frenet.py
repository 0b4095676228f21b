"""Batched Frenet ↔ Cartesian conversions against device-resident path tables.

Replaces the per-point C++ queries of the reference:
  - `pycrccosy.CurvilinearCoordinateSystem.convert_to_cartesian_coords` /
    `convert_to_curvilinear_coords` (utils_coordinate_system.py:263-274), which
    the Python backend calls once per (candidate, timestep) inside a Python loop
    (reactive_planner.py:539), and
  - the table interpolation embedded in the kinematic check
    (reactive_planner.py:414-460: `s_idx = argmax(ref_pos > s) - 1`, `s_lambda`,
    `interpolate_angle`, linear interpolation of κ and dκ/ds).

TPU-native design: every conversion is a vectorized `searchsorted` + gather +
lerp over arbitrarily-shaped query batches — one fused XLA computation for all
(M, N+1) samples of a replanning cycle at once.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "segment_index",
    "interp_table",
    "interp_angle_table",
    "wrap_valid_orientation",
    "frenet_to_cartesian",
    "cartesian_to_frenet",
]

TWO_PI = 6.283185307179586


def wrap_valid_orientation(theta):
    """Wrap into (-2π, 2π) — same result as commonroad's `make_valid_orientation`
    (subtract/add 2π while out of range), used by the reference's
    `interpolate_angle` (utils_coordinate_system.py:137-155)."""
    return jnp.fmod(theta, TWO_PI)


def segment_index(ref_s, s):
    """Index i of the table segment [ref_s[i], ref_s[i+1]] containing s, plus the
    interpolation factor λ and an in-domain mask.

    Matches the reference's `s_idx = np.argmax(ref_pos > s) - 1` +
    `s_lambda` (reactive_planner.py:415-420) for in-domain s; out-of-domain
    queries are clipped to the first/last segment and flagged in the mask
    (the reference instead produces wrapped negative indices / raises — see
    SURVEY §7.3 "curvilinear projection robustness").
    """
    idx = jnp.searchsorted(ref_s, s, side="right") - 1
    idx = jnp.clip(idx, 0, ref_s.shape[0] - 2)
    denom = ref_s[idx + 1] - ref_s[idx]
    lam = (s - ref_s[idx]) / denom
    in_domain = (s >= ref_s[0]) & (s <= ref_s[-1])
    return idx, lam, in_domain


def interp_table(table, idx, lam):
    """Linear interpolation table[idx] + λ(table[idx+1] - table[idx]).

    `table` has shape (R,) or (R, C); idx/lam share any batch shape.
    """
    lo = table[idx]
    hi = table[idx + 1]
    if table.ndim == 2:
        lam = lam[..., None]
    return lo + lam * (hi - lo)


def interp_angle_table(theta_table, idx, lam):
    """Angle interpolation as in the reference's `interpolate_angle`
    (utils_coordinate_system.py:137-155): plain lerp of the (unwrapped) angle
    table followed by `make_valid_orientation` wrapping."""
    return wrap_valid_orientation(interp_table(theta_table, idx, lam))


def frenet_to_cartesian(ref, s, d):
    """Batched (s, d) → (x, y): point on the polyline at arclength s plus d
    along the left normal of the interpolated tangent.

    Replaces `convert_to_cartesian_coords` point queries
    (utils_coordinate_system.py:263-270); the in-domain mask stands in for the
    reference's None-return ("out of projection domain",
    reactive_planner.py:539-547).

    Returns (x, y, in_domain) with the batch shape of s/d.
    """
    idx, lam, in_domain = segment_index(ref.s, s)
    base = interp_table(ref.xy, idx, lam)
    theta = interp_table(ref.theta, idx, lam)
    x = base[..., 0] - d * jnp.sin(theta)
    y = base[..., 1] + d * jnp.cos(theta)
    return x, y, in_domain


def cartesian_to_frenet(ref, x, y):
    """Batched (x, y) → (s, d) by closest-point projection onto the polyline.

    Replaces `convert_to_curvilinear_coords` (utils_coordinate_system.py:272-274).
    d > 0 left of the path (same convention as pycrccosy).  Cost is
    O(P·R) distance evaluations fused by XLA — fine for per-step initial-state
    computation and obstacle projections.

    Returns (s, d).
    """
    p = jnp.stack([jnp.asarray(x), jnp.asarray(y)], axis=-1)  # (..., 2)
    batch_shape = p.shape[:-1]
    pf = p.reshape(-1, 1, 2)  # (P, 1, 2)
    a = ref.xy[None, :-1, :]  # (1, R-1, 2)
    b = ref.xy[None, 1:, :]
    ab = b - a
    ap = pf - a
    seg_len2 = jnp.sum(ab * ab, axis=-1)
    t = jnp.clip(jnp.sum(ap * ab, axis=-1) / jnp.maximum(seg_len2, 1e-12), 0.0, 1.0)
    closest = a + t[..., None] * ab
    diff = pf - closest
    dist2 = jnp.sum(diff * diff, axis=-1)  # (P, R-1)
    best = jnp.argmin(dist2, axis=-1)  # (P,)
    rows = jnp.arange(pf.shape[0])
    t_best = t[rows, best]
    seg_s = ref.s[best] + t_best * (ref.s[best + 1] - ref.s[best])
    ab_best = ab[0, best]
    ap_best = pf[:, 0, :] - a[0, best]
    cross = ab_best[:, 0] * ap_best[:, 1] - ab_best[:, 1] * ap_best[:, 0]
    dist = jnp.sqrt(dist2[rows, best])
    d = jnp.where(cross >= 0.0, dist, -dist)
    return seg_s.reshape(batch_shape), d.reshape(batch_shape)
