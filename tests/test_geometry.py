"""Reference-path tables and batched Frenet conversions."""
import numpy as np
import jax.numpy as jnp

from frenetix_tpu.geometry.refpath import (
    prepare_reference_path,
    polyline_pathlength,
    resample_polyline,
)
from frenetix_tpu.geometry import frenet as fr


def curved_path(n=400, radius=60.0):
    """Quarter-circle-ish smooth test path."""
    t = np.linspace(0, np.pi / 2, n)
    return np.stack([radius * np.sin(t), radius * (1 - np.cos(t))], axis=1)


def test_pathlength_monotone():
    ref = prepare_reference_path(curved_path(), extension=10.0)
    assert np.all(np.diff(ref.s) > 0)
    assert ref.s[0] == 0.0


def test_curvature_of_circle():
    ref = prepare_reference_path(curved_path(radius=60.0), extension=0.0)
    # interior curvature ≈ 1/R = 1/60 (sign: left turn → positive)
    interior = ref.kappa[10:-10]
    np.testing.assert_allclose(interior, 1.0 / 60.0, rtol=0.05)


def test_resample_spacing():
    p = resample_polyline(curved_path(), 0.5)
    seg = np.linalg.norm(np.diff(p, axis=0), axis=1)
    np.testing.assert_allclose(seg, 0.5, rtol=0.05)


def test_frenet_roundtrip():
    ref = prepare_reference_path(curved_path(), extension=5.0)
    s_q = np.linspace(5.0, ref.length - 5.0, 50)
    d_q = np.linspace(-2.5, 2.5, 50)
    x, y, ok = fr.frenet_to_cartesian(ref, jnp.asarray(s_q), jnp.asarray(d_q))
    assert bool(jnp.all(ok))
    s_back, d_back = fr.cartesian_to_frenet(ref, x, y)
    np.testing.assert_allclose(np.asarray(s_back), s_q, atol=2e-2)
    np.testing.assert_allclose(np.asarray(d_back), d_q, atol=2e-2)


def test_cartesian_to_frenet_sign():
    """d > 0 left of the path."""
    ref = prepare_reference_path(
        np.stack([np.linspace(0, 100, 200), np.zeros(200)], axis=1), extension=0.0
    )
    s, d = fr.cartesian_to_frenet(ref, jnp.asarray([50.0, 50.0]), jnp.asarray([2.0, -3.0]))
    np.testing.assert_allclose(np.asarray(d), [2.0, -3.0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(s), [50.0, 50.0], atol=1e-9)


def test_segment_index_matches_argmax_semantics():
    # tables are uniformly spaced by construction (prepare_reference_path)
    ref_s = jnp.asarray(np.array([0.0, 2.5, 5.0, 7.5, 10.0]))
    queries = np.array([0.0, 0.5, 2.5, 2.4999, 3.9, 9.99, 10.0])
    idx, lam, ok = fr.segment_index(ref_s, jnp.asarray(queries))
    ref_np = np.asarray(ref_s)
    for q, i, l in zip(queries, np.asarray(idx), np.asarray(lam)):
        expected = int(np.argmax(ref_np > q)) - 1 if np.any(ref_np > q) else len(ref_np) - 2
        if expected < 0:
            expected = 0
        assert i == expected, (q, i, expected)
        np.testing.assert_allclose(
            l, (q - ref_np[i]) / (ref_np[i + 1] - ref_np[i]), atol=1e-12
        )
    assert bool(jnp.all(ok))
    _, _, ok2 = fr.segment_index(ref_s, jnp.asarray([-0.1, 10.1]))
    assert not bool(jnp.any(ok2))


def test_wrap_valid_orientation():
    vals = np.array([0.0, 3.0, 7.0, -7.0, 13.0, -13.0])
    got = np.asarray(fr.wrap_valid_orientation(jnp.asarray(vals)))
    import tests.reference_impl as ri

    expected = [ri.make_valid_orientation(v) for v in vals]
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_pallas_interp_kernel_matches_reference():
    """The Pallas interpolation kernel (ops/pallas_interp.py), run through
    the Pallas interpreter on CPU, must match plain linear interpolation of
    the table columns exactly."""
    from frenetix_tpu.ops.pallas_interp import interp_tables_pallas

    rng = np.random.default_rng(7)
    w, c, p = 96, 5, 300
    table = rng.normal(size=(w, c)).astype(np.float32)
    idx = rng.integers(0, w - 1, size=p).astype(np.int32)
    lam = rng.uniform(0, 1, size=p).astype(np.float32)

    out = np.asarray(interp_tables_pallas(table, idx, lam, block=128,
                                          interpret=True))
    expect = (1.0 - lam)[:, None] * table[idx] + lam[:, None] * table[idx + 1]
    np.testing.assert_allclose(out, expect, atol=1e-6)
