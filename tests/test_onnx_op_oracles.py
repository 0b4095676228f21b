"""Independent oracles for the ONNX->JAX interpreter's recurrent/conv ops
(VERDICT r2 item 4, second half): the GRU and Conv/MaxPool kernels are
checked against (a) torch — a fully independent framework implementing the
same ONNX-exported semantics the reference ran through onnxruntime
(wale_net.py:224-341) — and (b) a from-scratch NumPy scalar GRU step, using
the REAL wale-net.onnx weights, not synthetic ones.
"""
import os

import numpy as np
import pytest

ONNX_PATH = "/root/reference/wale_net_lite/wale-net.onnx"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ONNX_PATH), reason="walenet weights not available"
)


def _graph():
    from frenetix_tpu.models.onnx_lite import load_onnx

    return load_onnx(ONNX_PATH)


def _gru_weights(g, node):
    w = np.asarray(g.initializers[node.inputs[1]])[0]  # (3H, I) zrh
    r = np.asarray(g.initializers[node.inputs[2]])[0]  # (3H, H) zrh
    b = np.asarray(g.initializers[node.inputs[3]])[0]  # (6H,)
    h = node.attrs["hidden_size"]
    return w, r, b, h


def test_gru_matches_torch_on_real_weights():
    """Interpreter GRU (linear_before_reset=1, zrh gates) vs torch.nn.GRU
    (rzn gates) on the shipped encoder weights, full 30-step sequence."""
    torch = pytest.importorskip("torch")

    from frenetix_tpu.models.onnx_jax import _gru

    g = _graph()
    node = next(n for n in g.nodes if n.op_type == "GRU")
    assert node.attrs["linear_before_reset"] == 1
    w, r, b, h = _gru_weights(g, node)
    i_size = w.shape[1]

    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (30, 4, i_size)).astype(np.float32)

    import jax
    import jax.numpy as jnp

    ins = [jnp.asarray(x), jnp.asarray(w[None]), jnp.asarray(r[None]),
           jnp.asarray(b[None])]
    y, y_h = _gru(jax, jnp, ins, node.attrs)
    y = np.asarray(y)[:, 0]          # (T, B, H)
    y_h = np.asarray(y_h)[0]         # (B, H)

    # torch gate order is (r, z, n); ONNX is (z, r, h) — permute blocks
    def zrh_to_rzn(m):
        z, rr, hh = m[:h], m[h:2 * h], m[2 * h:]
        return np.concatenate([rr, z, hh], axis=0)

    tg = torch.nn.GRU(i_size, h, num_layers=1)
    with torch.no_grad():
        tg.weight_ih_l0.copy_(torch.from_numpy(zrh_to_rzn(w)))
        tg.weight_hh_l0.copy_(torch.from_numpy(zrh_to_rzn(r)))
        tg.bias_ih_l0.copy_(torch.from_numpy(zrh_to_rzn(b[:3 * h])))
        tg.bias_hh_l0.copy_(torch.from_numpy(zrh_to_rzn(b[3 * h:])))
        ty, th = tg(torch.from_numpy(x))
    np.testing.assert_allclose(y, ty.numpy(), atol=1e-5)
    np.testing.assert_allclose(y_h, th.numpy()[0], atol=1e-5)


def test_gru_matches_numpy_scalar_oracle():
    """From-scratch scalar NumPy GRU step (ONNX spec, linear_before_reset=1:
    h~ = tanh(Wh x + bWh + r*(Rh h + bRh))) vs the interpreter."""
    from frenetix_tpu.models.onnx_jax import _gru

    g = _graph()
    node = next(n for n in g.nodes if n.op_type == "GRU")
    w, r, b, h = _gru_weights(g, node)
    i_size = w.shape[1]
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (8, 2, i_size)).astype(np.float32)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    wb, rb = b[:3 * h].astype(np.float64), b[3 * h:].astype(np.float64)
    w64, r64 = w.astype(np.float64), r.astype(np.float64)
    ht = np.zeros((x.shape[1], h))
    outs = []
    for t in range(x.shape[0]):
        xt = x[t].astype(np.float64)
        z = sig(xt @ w64[:h].T + wb[:h] + ht @ r64[:h].T + rb[:h])
        rt = sig(xt @ w64[h:2 * h].T + wb[h:2 * h]
                 + ht @ r64[h:2 * h].T + rb[h:2 * h])
        hh = np.tanh(xt @ w64[2 * h:].T + wb[2 * h:]
                     + rt * (ht @ r64[2 * h:].T + rb[2 * h:]))
        ht = (1.0 - z) * hh + z * ht
        outs.append(ht)

    import jax
    import jax.numpy as jnp

    ins = [jnp.asarray(x), jnp.asarray(w[None]), jnp.asarray(r[None]),
           jnp.asarray(b[None])]
    y, _ = _gru(jax, jnp, ins, node.attrs)
    np.testing.assert_allclose(np.asarray(y)[:, 0], np.stack(outs),
                               atol=1e-5)


def test_conv_and_maxpool_match_torch_on_real_weights():
    """Interpreter Conv (pads=1) + MaxPool (2x2/2) vs torch on the shipped
    scene-encoder weights (sc_conv1, the 256x256 input stage)."""
    torch = pytest.importorskip("torch")

    import jax.numpy as jnp

    from frenetix_tpu.models.onnx_jax import _conv, _maxpool

    g = _graph()
    conv_node = next(n for n in g.nodes if n.op_type == "Conv")
    wname, bname = conv_node.inputs[1], conv_node.inputs[2]
    w = np.asarray(g.initializers[wname])
    bb = np.asarray(g.initializers[bname])
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 255, (2, w.shape[1], 64, 64)).astype(np.float32)

    mine = np.asarray(
        _conv(jnp, [jnp.asarray(x), jnp.asarray(w), jnp.asarray(bb)],
              conv_node.attrs))
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(bb),
        stride=tuple(conv_node.attrs["strides"]),
        padding=tuple(conv_node.attrs["pads"][:2])).numpy()
    np.testing.assert_allclose(mine, ref, atol=2e-3)

    pool_node = next(n for n in g.nodes if n.op_type == "MaxPool")
    mp_mine = np.asarray(_maxpool(jnp, jnp.asarray(mine), pool_node.attrs))
    mp_ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(ref), kernel_size=2, stride=2).numpy()
    np.testing.assert_allclose(mp_mine, mp_ref, atol=2e-3)
