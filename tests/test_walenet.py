"""Wale-Net port: ONNX parsing, JAX interpreter, end-to-end prediction."""
import os

import numpy as np
import pytest

ONNX_PATH = "/root/reference/wale_net_lite/wale-net.onnx"
SCENARIO = "/root/reference/example_scenarios/ZAM_Tjunction-1_23_T-1.xml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ONNX_PATH), reason="walenet weights not available"
)


def test_onnx_graph_structure():
    from frenetix_tpu.models.onnx_lite import load_onnx

    g = load_onnx(ONNX_PATH)
    assert g.inputs == ["hist", "nbrs", "sc_img"]
    assert g.outputs == ["predictions"]
    assert "sc_conv1.weight" in g.initializers
    assert g.initializers["sc_conv1.weight"].shape == (32, 1, 3, 3)
    # scalar constants must decode as scalars (shape ())
    consts = [n.attrs.get("value") for n in g.nodes if n.op_type == "Constant"]
    assert any(np.asarray(c).shape == () for c in consts if c is not None)


def test_interpreter_jit_matches_eager():
    import jax
    import jax.numpy as jnp

    from frenetix_tpu.models.onnx_jax import build_jax_fn
    from frenetix_tpu.models.onnx_lite import load_onnx

    g = load_onnx(ONNX_PATH)
    fn = build_jax_fn(g)
    rng = np.random.default_rng(1)
    b = 3
    hist = jnp.asarray(rng.normal(0, 5, (30, b, 2)).astype(np.float32))
    nbrs = jnp.asarray(rng.normal(0, 5, (30, 39 * b, 2)).astype(np.float32))
    sc = jnp.asarray(rng.uniform(0, 255, (b, 1, 256, 256)).astype(np.float32))
    eager = fn(hist=hist, nbrs=nbrs, sc_img=sc)[0]
    jitted = jax.jit(lambda h, n, s: fn(hist=h, nbrs=n, sc_img=s)[0])(hist, nbrs, sc)
    assert eager.shape == (40, b, 5)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-4)
    # sigma channels positive (exp), rho in (-1, 1) (tanh)
    out = np.asarray(eager)
    assert np.all(out[:, :, 2:4] > 0)
    assert np.all(np.abs(out[:, :, 4]) < 1.0)


def test_walenet_scenario_prediction_accuracy():
    """Short-horizon predictions of a steadily moving vehicle must track the
    ground truth closely (the model was trained on such data)."""
    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.models.walenet import WaleNet

    sc = load_scenario(SCENARIO)
    net = WaleNet(sc)
    # obstacle 1 drives steadily through the scenario
    preds = net.predict([1], 10)
    pos, cov = preds[1]
    ob = sc.obstacles[1]
    gt = np.array([ob.state_at_time(11 + i).position for i in range(10)])
    err = np.linalg.norm(pos[:10] - gt, axis=1)
    assert err[0] < 1.0, err
    assert err.mean() < 2.0, err
    assert np.all(np.linalg.eigvalsh(cov).reshape(-1) > 0)  # valid covariances


def test_walenet_prediction_tensor_dict():
    from frenetix_tpu.io import load_scenario
    from frenetix_tpu.models.walenet import walenet_predictions

    sc = load_scenario(SCENARIO)
    ids = [ob.obstacle_id for ob in sc.dynamic_obstacles]
    pd = walenet_predictions(sc, ids, 5, 30)
    assert pd["means"].shape == (16, 30, 2)
    assert pd["valid"][: len(ids)].all()
    assert not pd["valid"][len(ids) :].any()
    # inverse covariances must actually invert
    k = 0
    prod = pd["covs"][k, 0].astype(np.float64) @ pd["inv_covs"][k, 0].astype(np.float64)
    np.testing.assert_allclose(prod, np.eye(2), atol=1e-2)
