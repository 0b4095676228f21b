"""Closed-form polynomial solves vs. the np.linalg.solve oracle."""
import numpy as np
import jax.numpy as jnp

from frenetix_tpu.ops import polynomials as poly
from tests import reference_impl as ref


def test_quartic_coeffs_match_solver(rng):
    for _ in range(50):
        xs, vxs, axs = rng.normal(0, 10), rng.uniform(0, 30), rng.normal(0, 3)
        v1 = rng.uniform(0, 30)
        T = rng.uniform(0.5, 5.0)
        expected = ref.quartic_coeffs_solve(xs, vxs, axs, v1, T)
        got = np.asarray(poly.quartic_coeffs(xs, vxs, axs, v1, T))
        np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


def test_quintic_coeffs_match_solver(rng):
    for _ in range(50):
        xs, vxs, axs = rng.normal(0, 5), rng.normal(0, 3), rng.normal(0, 2)
        xe, vxe, axe = rng.normal(0, 5), rng.normal(0, 3), rng.normal(0, 2)
        T = rng.uniform(0.5, 5.0)
        expected = ref.quintic_coeffs_solve(xs, vxs, axs, xe, vxe, axe, T)
        got = np.asarray(poly.quintic_coeffs(xs, vxs, axs, xe, vxe, axe, T))
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-11)


def test_quintic_end_conditions():
    c = np.asarray(poly.quintic_coeffs(1.0, 2.0, -0.5, 4.0, 0.0, 0.0, 2.5))
    np.testing.assert_allclose(ref.poly_eval(c, 2.5, 0), 4.0, atol=1e-10)
    np.testing.assert_allclose(ref.poly_eval(c, 2.5, 1), 0.0, atol=1e-10)
    np.testing.assert_allclose(ref.poly_eval(c, 2.5, 2), 0.0, atol=1e-10)
    np.testing.assert_allclose(ref.poly_eval(c, 0.0, 0), 1.0, atol=1e-12)
    np.testing.assert_allclose(ref.poly_eval(c, 0.0, 1), 2.0, atol=1e-12)
    np.testing.assert_allclose(ref.poly_eval(c, 0.0, 2), -0.5, atol=1e-12)


def test_quartic_end_conditions():
    c = np.asarray(poly.quartic_coeffs(0.0, 5.0, 1.0, 12.0, 3.0))
    np.testing.assert_allclose(ref.poly_eval(c, 3.0, 1), 12.0, atol=1e-10)
    np.testing.assert_allclose(ref.poly_eval(c, 3.0, 2), 0.0, atol=1e-10)


def test_batched_eval_matches_scalar(rng):
    m, n = 16, 31
    coeffs = rng.normal(size=(m, 6))
    tau = np.linspace(0, 3, n)
    pos = np.asarray(poly.poly_position(jnp.asarray(coeffs), jnp.asarray(tau)[None, :]))
    vel = np.asarray(poly.poly_velocity(jnp.asarray(coeffs), jnp.asarray(tau)[None, :]))
    acc = np.asarray(poly.poly_acceleration(jnp.asarray(coeffs), jnp.asarray(tau)[None, :]))
    jrk = np.asarray(poly.poly_jerk(jnp.asarray(coeffs), jnp.asarray(tau)[None, :]))
    for i in range(m):
        np.testing.assert_allclose(pos[i], ref.poly_eval(coeffs[i], tau, 0), rtol=1e-12)
        np.testing.assert_allclose(vel[i], ref.poly_eval(coeffs[i], tau, 1), rtol=1e-12)
        np.testing.assert_allclose(acc[i], ref.poly_eval(coeffs[i], tau, 2), rtol=1e-12)
        np.testing.assert_allclose(jrk[i], ref.poly_eval(coeffs[i], tau, 3), rtol=1e-12)


def test_squared_jerk_integral_closed_form(rng):
    """Closed form equals dense numeric integration of jerk^2."""
    coeffs = rng.normal(size=6)
    t_end = 2.0
    got = float(poly.squared_jerk_integral(jnp.asarray(coeffs), t_end))
    tt = np.linspace(0, t_end, 200001)
    jerk = ref.poly_eval(coeffs, tt, 3)
    numeric = np.trapz(jerk**2, tt)
    np.testing.assert_allclose(got, numeric, rtol=1e-6)
    np.testing.assert_allclose(got, ref.squared_jerk_integral(coeffs, t_end), rtol=1e-12)
