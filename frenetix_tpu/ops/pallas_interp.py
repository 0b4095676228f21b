"""Pallas TPU kernel: fused reference-table interpolation.

The replanning cycle's dominant op is the two-hot interpolation matmul
(geometry.frenet.interp_weights): for every (candidate, timestep) query it
contracts a two-hot row against the (W, C) table window.  The XLA lowering
streams the implicit (P, W) weight matrix; this Pallas version keeps the
table window *stationary in VMEM* across the whole grid and materializes the
two-hot weights only block-by-block in VMEM scratch:

    grid over P/BLK query blocks:
      idx/λ (BLK,)  →  two-hot (BLK, W) in VMEM  →  MXU dot (BLK, W)·(W, C)

Usage: `interp_tables_pallas(table_window, idx_local, lam)` — a drop-in for
the windowed matmul inside `interp_ref_tables` (select with
`FRENETIX_PALLAS=1` or `use_pallas=True`).

Measured on TPU v5e (34816×31 queries, W=768, C=7): the XLA two-hot path and
this kernel are within ~10% of each other — XLA's fusion is already excellent
here; the kernel exists as the foundation for deeper fusion (rollout+interp+
feasibility in one kernel) and as the project's Pallas reference pattern.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["interp_tables_pallas"]


def _interp_kernel(idx_ref, lam_ref, table_ref, out_ref):
    """One block of queries against the VMEM-resident table window.

    idx_ref: (BLK,) int32 — local segment indices (pre-clipped to [0, W-2])
    lam_ref: (BLK,) — interpolation factors
    table_ref: (W, C) — full table window (same block for every grid step)
    out_ref: (BLK, C)
    """
    w = table_ref.shape[0]
    idx = idx_ref[:]  # (BLK,)
    lam = lam_ref[:]
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], w), 1)
    iw = idx[:, None]
    lw = lam[:, None]
    one = jnp.ones((), lam.dtype)
    weights = jnp.where(cols == iw, one - lw, 0.0) + jnp.where(cols == iw + 1, lw, 0.0)
    out_ref[:, :] = jnp.dot(
        weights, table_ref[:, :], preferred_element_type=lam.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def interp_tables_pallas(table_window, idx_local, lam, *, block: int = 1024,
                         interpret: bool = False):
    """Linear interpolation of all table columns at the given local indices.

    table_window: (W, C); idx_local: (P,) int32 in [0, W-2]; lam: (P,).
    Returns (P, C).  P is padded to a multiple of `block` internally.
    `interpret=True` runs the kernel through the Pallas interpreter (CPU
    differential testing — tests/test_geometry.py)."""
    p = idx_local.shape[0]
    c = table_window.shape[1]
    p_pad = ((p + block - 1) // block) * block
    if p_pad != p:
        idx_local = jnp.pad(idx_local, (0, p_pad - p))
        lam = jnp.pad(lam, (0, p_pad - p))

    out = pl.pallas_call(
        _interp_kernel,
        out_shape=jax.ShapeDtypeStruct((p_pad, c), lam.dtype),
        grid=(p_pad // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            # whole table window resident for every grid step
            pl.BlockSpec(table_window.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx_local.astype(jnp.int32), lam, table_window)
    return out[:p]
