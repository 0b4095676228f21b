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

import jax
import jax.numpy as jnp

__all__ = [
    "segment_index",
    "interp_table",
    "interp_angle_table",
    "interp_weights",
    "interp_ref_tables",
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

    Exploits the RefPathTable uniform-spacing invariant: idx = floor(s/ds) is
    pure arithmetic (a jnp.searchsorted here costs ~24 ms per replan on TPU).
    """
    ds = ref_s[1] - ref_s[0]
    idx = jnp.clip(jnp.floor(s / ds).astype(jnp.int32), 0, ref_s.shape[0] - 2)
    lam = s / ds - idx.astype(s.dtype)
    in_domain = (s >= ref_s[0]) & (s <= ref_s[-1])
    return idx, lam, in_domain


def interp_weights(ref_s, idx, lam):
    """(P, R) two-hot linear-interpolation matrix W with W[p, idx_p] = 1-λ_p and
    W[p, idx_p+1] = λ_p.  `W @ tables` then evaluates *all* table lookups of a
    replan as one MXU matmul — the TPU-native replacement for per-table gathers
    (each (M·N)-element gather from a (R,) table costs ~5 ms on v5e; the fused
    matmul evaluates five tables in ~1 ms)."""
    r = ref_s.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], r), 1)
    i = idx[:, None]
    l = lam[:, None]
    one = jnp.ones((), lam.dtype)
    return jnp.where(cols == i, one - l, 0.0) + jnp.where(cols == i + 1, l, 0.0)


def _split_precision_interp(tables, idx, lam):
    """Exact-in-bf16 table interpolation as ONE default-precision matmul.

    TPU matmuls run at full MXU rate only at DEFAULT precision, which rounds
    the *inputs* to bfloat16 (8 mantissa bits) — a raw two-hot · table product
    loses up to ~0.5 m on 300 m-scale position columns, and forcing
    Precision.HIGHEST breaks XLA's weight-matrix fusion (~600× slower,
    measured).  Instead the interpolation lo + λ·(table[i+1]-table[i]) is
    decomposed so every matmul operand is exactly representable in bf16:

        hi   = round(table - table[0])          integers |·| ≤ 256 → exact
        lo   = (table - table[0]) - hi          |·| ≤ 0.5 → ~2⁻⁹ rel. error
        diff = table[i+1] - table[i]            row-to-row step, small
        out  = base + onehot·hi + onehot·lo + λ ⊙ (onehot·diff)

    with the single-hot matrix exact (0/1) and the λ multiply in f32 on the
    VPU.  Worst-case error ~1-2 mm on positions; one fused matmul with 3×C
    columns at full MXU rate.
    """
    base = tables[0]  # (C,)
    rel = tables - base
    # two-level integer split: 256·k is exact in bf16 for k ≤ 255 (paths to
    # ~65 km), round(rel - hi_a) ∈ [-128, 128] exact, residual ≤ 0.5
    hi_a = jnp.round(rel / 256.0) * 256.0
    hi_b = jnp.round(rel - hi_a)
    lo = rel - hi_a - hi_b
    diff = jnp.concatenate([tables[1:] - tables[:-1], jnp.zeros_like(tables[:1])])
    stacked = jnp.concatenate([hi_a, hi_b, lo, diff], axis=1)  # (W, 4C)

    w = tables.shape[0]
    c = tables.shape[1]
    # one-hot matmul, NOT a gather.  A row-gather producing 4C=28-column
    # f32 rows is bitwise-identical here (a DEFAULT-precision TPU dot
    # rounds its inputs to bf16 with an exact 0/1 one-hot, so the only
    # nonzero accumulation term is bf16(stacked[idx])) — but it was
    # MEASURED 7× SLOWER: TPU gathers of 112-byte rows pay (8,128)-tile
    # read amplification (119.5 ms vs ~16 ms for this dot at A=512,
    # M=768; BENCH_r04 per-op profile).
    #
    # The dot is oriented (4C, W) @ (W, P) → columns-major: with P on the
    # minor (lane) dimension every output tile is fully utilized (the
    # (P, 28) orientation wastes 100/128 lanes AND forced XLA to emit a
    # serial 7-iteration transpose loop when consumers slice per column —
    # 15% of the headline cycle).  Same products, same single-term
    # accumulations — bitwise identical values.
    cols = jax.lax.broadcasted_iota(jnp.int32, (w, idx.shape[0]), 0)
    onehot_t = (cols == idx[None, :]).astype(lam.dtype)       # (W, P)
    out4 = jnp.dot(stacked.T, onehot_t,
                   preferred_element_type=lam.dtype)          # (4C, P)
    return (
        base[:, None]
        + out4[:c] + out4[c : 2 * c] + out4[2 * c : 3 * c]
        + lam[None, :] * out4[3 * c :]
    )  # (C, P)


def interp_ref_tables(ref, s, extra_tables=None, window_rows=None, window_anchor=None):
    """Interpolated (alpha, k_r, k_r_d, x, y) at arclengths `s` (any batch
    shape) in one fused two-hot matmul; alpha is the wrapped path orientation
    (reference `interpolate_angle` semantics).  Returns a dict of arrays with
    the batch shape of s, plus (idx, lam, in_domain).

    `extra_tables` (R, K): additional per-vertex columns (e.g. drivable-
    corridor bounds) interpolated in the same matmul for free; returned under
    key "extras" as a tuple of K batch-shaped arrays (columns-major — a
    stacked batch+(K,) array would re-materialize the transposed layout).

    `window_rows` (static int) + `window_anchor` (traced scalar arclength):
    the matmul's contraction dimension shrinks from R to `window_rows` by
    dynamically slicing the table around the anchor — exact same result as
    long as all queries fall inside the window (one replanning cycle's s-range
    is bounded by v_max·horizon, so a ~190 m window covers it; queries
    outside the window clamp to its edge AND are flagged out-of-domain).
    This is the cycle's dominant FLOP term (O(batch·R) one-hot weights).
    """
    batch_shape = s.shape
    idx, lam, in_dom = segment_index(ref.s, s)
    cols = [ref.theta, ref.kappa, ref.kappa_d, ref.xy[:, 0], ref.xy[:, 1]]
    tables = jnp.stack(cols, axis=1)
    if extra_tables is not None:
        tables = jnp.concatenate([tables, extra_tables], axis=1)

    r = ref.s.shape[0]
    if window_rows is not None and window_rows < r:
        ds = ref.s[1] - ref.s[0]
        margin = window_rows // 8
        offset = jnp.clip(
            jnp.floor(window_anchor / ds).astype(jnp.int32) - margin,
            0, r - window_rows,
        )
        # gather instead of lax.dynamic_slice_in_dim: under vmap (the
        # multi-agent batched cycle), a per-agent dynamic_slice lowers to a
        # serial while loop over the batch (measured: ~143 ms of 293 ms/call
        # at A=2048 — slice + update-slice pairs, one per agent); a gather
        # with batched indices stays one fused op.  offset is already
        # clipped, so every row index is in range.
        rows = offset + jnp.arange(window_rows)
        tables = jnp.take(tables, rows, axis=0)
        idx_local = idx - offset
        in_window = (idx_local >= 0) & (idx_local <= window_rows - 2)
        in_dom = in_dom & in_window
        idx_use = jnp.clip(idx_local, 0, window_rows - 2)
    else:
        idx_use = idx

    if s.dtype == jnp.float32:
        vals_t = _split_precision_interp(tables, idx_use.reshape(-1),
                                         lam.reshape(-1))  # (C, P)
    else:
        w = interp_weights(tables[:, 0], idx_use.reshape(-1), lam.reshape(-1))
        vals = jnp.dot(w, tables, preferred_element_type=s.dtype,
                       precision=jax.lax.Precision.HIGHEST)  # (P, 5+K)
        vals_t = vals.T
    # per-column batch-shaped arrays from the columns-major result — row
    # slices are contiguous, so no transpose materializes (the previous
    # (P, C) orientation made XLA emit a serial per-column transpose loop)
    field = [vals_t[i].reshape(batch_shape) for i in range(tables.shape[1])]
    return {
        "alpha": wrap_valid_orientation(field[0]),
        "theta_lerp": field[0],
        "k_r": field[1],
        "k_r_d": field[2],
        "x": field[3],
        "y": field[4],
        # tuple of K batch-shaped arrays (a stacked batch+(K,) array would
        # re-materialize the transposed layout)
        "extras": tuple(field[5:]) if extra_tables is not None else None,
        "idx": idx,
        "lam": lam,
        "in_domain": in_dom,
    }


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
    t = interp_ref_tables(ref, s)
    theta = t["theta_lerp"]
    x = t["x"] - d * jnp.sin(theta)
    y = t["y"] + d * jnp.cos(theta)
    return x, y, t["in_domain"]


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
