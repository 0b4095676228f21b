"""Generic ONNX graph → JAX function interpreter (inference ops).

Executes an `onnx_lite.OnnxGraph` eagerly with jnp ops, so the resulting
callable can be `jax.jit`-ed (shape-producing ops — Shape/Gather/Concat on
shape tensors — are evaluated on host NumPy so reshapes stay static under
tracing).  Covers the op set needed for small perception/prediction models
(the reference's Wale-Net uses: MatMul, Add, Gemm, Conv, MaxPool, GRU,
LeakyRelu, Tanh, Exp, Reshape, Transpose, Squeeze, Unsqueeze, Slice, Concat,
Expand, Tile, Shape, Gather, Constant(OfShape), Identity).

This replaces the reference's `onnxruntime.InferenceSession` C++ dependency
(wale_net.py:224-341) with an XLA-compiled path that runs on TPU and batches
across obstacles (restoring step_multi-style batching, wale_net.py:261-309).
"""
from __future__ import annotations

import numpy as np

__all__ = ["build_jax_fn"]


def _is_shape_like(x):
    return isinstance(x, np.ndarray) and x.dtype in (np.int64, np.int32)


def build_jax_fn(graph):
    """graph (OnnxGraph) → fn(**inputs) -> list of outputs (jnp arrays)."""
    import jax
    import jax.numpy as jnp

    init = {k: np.asarray(v) for k, v in graph.initializers.items()}

    def run(**inputs):
        env: dict = {}
        env.update({k: jnp.asarray(v) for k, v in init.items()})
        env.update(inputs)

        def get(name):
            return env[name]

        for node in graph.nodes:
            op = node.op_type
            ins = [get(n) for n in node.inputs if n]
            a = node.attrs

            if op == "Constant":
                out = np.asarray(a["value"])
            elif op == "Identity":
                out = ins[0]
            elif op == "MatMul":
                out = jnp.matmul(ins[0], ins[1])
            elif op == "Add":
                out = ins[0] + ins[1]
            elif op == "Mul":
                out = ins[0] * ins[1]
            elif op == "Sub":
                out = ins[0] - ins[1]
            elif op == "Div":
                out = ins[0] / ins[1]
            elif op == "Gemm":
                x, w = ins[0], ins[1]
                if a.get("transA"):
                    x = x.T
                if a.get("transB"):
                    w = w.T
                out = a.get("alpha", 1.0) * (x @ w)
                if len(ins) > 2:
                    out = out + a.get("beta", 1.0) * ins[2]
            elif op == "LeakyRelu":
                alpha = a.get("alpha", 0.01)
                out = jnp.where(ins[0] >= 0, ins[0], alpha * ins[0])
            elif op in ("Relu",):
                out = jnp.maximum(ins[0], 0)
            elif op == "Tanh":
                out = jnp.tanh(ins[0])
            elif op == "Exp":
                out = jnp.exp(ins[0])
            elif op == "Sigmoid":
                out = jax.nn.sigmoid(ins[0])
            elif op == "Softmax":
                out = jax.nn.softmax(ins[0], axis=a.get("axis", -1))
            elif op == "Conv":
                out = _conv(jnp, ins, a)
            elif op == "MaxPool":
                out = _maxpool(jnp, ins[0], a)
            elif op == "AveragePool":
                out = _avgpool(jnp, ins[0], a)
            elif op == "GRU":
                out = _gru(jax, jnp, ins, a)
                env[node.outputs[0]] = out[0]
                if len(node.outputs) > 1 and node.outputs[1]:
                    env[node.outputs[1]] = out[1]
                continue
            elif op == "Shape":
                out = np.asarray(ins[0].shape, np.int64)
            elif op == "Gather":
                data, idx = ins
                axis = a.get("axis", 0)
                if _is_shape_like(data):
                    # np.take with scalar idx returns a np scalar — keep ndarray
                    out = np.asarray(np.take(data, np.asarray(idx), axis=axis))
                else:
                    out = jnp.take(data, jnp.asarray(idx), axis=axis)
            elif op == "Unsqueeze":
                axes = _axes_of(ins, a)
                out = ins[0]
                for ax in sorted(axes):
                    out = (
                        np.expand_dims(out, ax)
                        if _is_shape_like(out)
                        else jnp.expand_dims(out, ax)
                    )
            elif op == "Squeeze":
                axes = _axes_of(ins, a)
                out = ins[0]
                for ax in sorted(axes, reverse=True):
                    out = jnp.squeeze(out, axis=ax)
            elif op == "Concat":
                axis = a.get("axis", 0)
                if all(_is_shape_like(x) for x in ins):
                    out = np.concatenate([np.atleast_1d(x) for x in ins], axis=axis)
                else:
                    out = jnp.concatenate(ins, axis=axis)
            elif op == "ConstantOfShape":
                shape = tuple(int(v) for v in np.asarray(ins[0]))
                val_arr = np.asarray(a.get("value", np.zeros(1, np.float32))).reshape(-1)
                val = val_arr[0] if val_arr.size else 0
                if np.issubdtype(val_arr.dtype, np.integer):
                    # integer fills are almost always *shape tensors* consumed
                    # by Expand/Reshape — keep them host-side (a jnp array
                    # created under trace is a tracer and can't be read back)
                    out = np.full(shape, val, dtype=val_arr.dtype)
                else:
                    out = jnp.full(shape, val, dtype=val_arr.dtype)
            elif op == "Reshape":
                shape = [int(v) for v in np.asarray(ins[1])]
                cur = ins[0].shape
                shape = [cur[i] if s == 0 else s for i, s in enumerate(shape)]
                out = jnp.reshape(ins[0], shape)
            elif op == "Transpose":
                out = jnp.transpose(ins[0], a.get("perm"))
            elif op == "Expand":
                # ONNX Expand: broadcast to the shape given by the second
                # input's *values* (a host shape tensor in this interpreter)
                target = tuple(int(v) for v in np.asarray(ins[1]))
                full = np.broadcast_shapes(tuple(ins[0].shape), target)
                out = jnp.broadcast_to(ins[0], full)
            elif op == "Tile":
                reps = [int(v) for v in np.asarray(ins[1])]
                out = jnp.tile(ins[0], reps)
            elif op == "Slice":
                out = _slice(jnp, ins)
            elif op == "Cast":
                out = ins[0]
            elif op == "Flatten":
                ax = a.get("axis", 1)
                out = jnp.reshape(ins[0], (int(np.prod(ins[0].shape[:ax])), -1))
            else:
                raise NotImplementedError(f"ONNX op {op} not supported")
            env[node.outputs[0]] = out

        return [env[name] for name in graph.outputs]

    return run


def _axes_of(ins, attrs):
    if len(ins) > 1:
        return [int(v) for v in np.asarray(ins[1]).reshape(-1)]
    ax = attrs.get("axes", [0])
    return [int(v) for v in np.atleast_1d(ax)]


def _conv(jnp, ins, a):
    import jax

    x, w = ins[0], ins[1]
    strides = tuple(a.get("strides", [1, 1]))
    pads = a.get("pads", [0, 0, 0, 0])
    padding = [(pads[0], pads[2]), (pads[1], pads[3])]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if len(ins) > 2:
        out = out + ins[2][None, :, None, None]
    return out


def _maxpool(jnp, x, a):
    import jax

    k = tuple(a.get("kernel_shape"))
    strides = tuple(a.get("strides", k))
    pads = a.get("pads", [0] * 2 * len(k))
    padding = [(0, 0), (0, 0)] + [(pads[i], pads[i + len(k)]) for i in range(len(k))]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1) + k,
        window_strides=(1, 1) + strides,
        padding=padding,
    )


def _avgpool(jnp, x, a):
    import jax

    k = tuple(a.get("kernel_shape"))
    strides = tuple(a.get("strides", k))
    ones = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add,
        window_dimensions=(1, 1) + k, window_strides=(1, 1) + strides,
        padding="VALID",
    )
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 1) + k, window_strides=(1, 1) + strides,
        padding="VALID",
    )
    return s / ones


def _gru(jax, jnp, ins, a):
    """ONNX GRU (single direction, zrh gate order), linear_before_reset
    semantics matching PyTorch exports.  X: (T, B, I); returns
    (Y (T, 1, B, H), Y_h (1, B, H))."""
    x = ins[0]
    w = ins[1][0]  # (3H, I)
    r = ins[2][0]  # (3H, H)
    h_size = a["hidden_size"]
    if len(ins) > 3 and ins[3] is not None and getattr(ins[3], "size", 0):
        b = ins[3][0]  # (6H,)
        wb, rb = b[: 3 * h_size], b[3 * h_size :]
    else:
        wb = jnp.zeros(3 * h_size, x.dtype)
        rb = jnp.zeros(3 * h_size, x.dtype)

    wz, wr, wh = w[:h_size], w[h_size : 2 * h_size], w[2 * h_size :]
    rz, rr, rh = r[:h_size], r[h_size : 2 * h_size], r[2 * h_size :]
    wbz, wbr, wbh = wb[:h_size], wb[h_size : 2 * h_size], wb[2 * h_size :]
    rbz, rbr, rbh = rb[:h_size], rb[h_size : 2 * h_size], rb[2 * h_size :]

    batch = x.shape[1]
    h0 = jnp.zeros((batch, h_size), x.dtype)

    # precompute input projections for the whole sequence (one big matmul)
    xz = x @ wz.T + wbz
    xr = x @ wr.T + wbr
    xh = x @ wh.T + wbh

    def step(h, inp):
        xz_t, xr_t, xh_t = inp
        z = jax.nn.sigmoid(xz_t + h @ rz.T + rbz)
        rt = jax.nn.sigmoid(xr_t + h @ rr.T + rbr)
        hh = jnp.tanh(xh_t + rt * (h @ rh.T + rbh))
        h_new = (1.0 - z) * hh + z * h
        return h_new, h_new

    h_last, ys = jax.lax.scan(step, h0, (xz, xr, xh))
    return ys[:, None, :, :], h_last[None, :, :]


def _slice(jnp, ins):
    data = ins[0]
    starts = [int(v) for v in np.asarray(ins[1]).reshape(-1)]
    ends = [int(v) for v in np.asarray(ins[2]).reshape(-1)]
    axes = (
        [int(v) for v in np.asarray(ins[3]).reshape(-1)]
        if len(ins) > 3
        else list(range(len(starts)))
    )
    steps = (
        [int(v) for v in np.asarray(ins[4]).reshape(-1)]
        if len(ins) > 4
        else [1] * len(starts)
    )
    slicer = [slice(None)] * data.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        lim = data.shape[ax]
        en = min(en, lim) if en >= 0 else en
        slicer[ax] = slice(st, en, sp)
    return data[tuple(slicer)]
