"""Dynamics model tests: analytic Jacobians vs autodiff, numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_ros_tpu.models import diff_drive as dd


def numpy_step(z, u, coeffs, dt):
    """Independent numpy transcription of the reference dynamics
    (/root/reference/mpc_ros/src/mpc_planner.cpp:208-215)."""
    x, y, theta, v, cte, etheta = z
    omega, accel = u
    f0 = sum(c * x**i for i, c in enumerate(coeffs))
    return np.array(
        [
            x + v * np.cos(theta) * dt,
            y + v * np.sin(theta) * dt,
            theta + omega * dt,
            v + accel * dt,
            (f0 - y) + v * np.sin(etheta) * dt,
            etheta + omega * dt,
        ]
    )


@pytest.fixture
def sample():
    rng = np.random.default_rng(0)
    z = rng.normal(size=6)
    u = rng.normal(size=2)
    coeffs = rng.normal(size=4) * 0.1
    dt = 0.1
    return z, u, coeffs, dt


def test_step_matches_numpy_oracle(sample):
    z, u, coeffs, dt = sample
    got = dd.step(jnp.asarray(z), jnp.asarray(u), jnp.asarray(coeffs), dt)
    np.testing.assert_allclose(np.asarray(got), numpy_step(z, u, coeffs, dt), rtol=1e-12)


def test_analytic_jacobians_match_autodiff(sample):
    z, u, coeffs, dt = sample
    z, u, coeffs = jnp.asarray(z), jnp.asarray(u), jnp.asarray(coeffs)
    A, B = dd.step_jacobians(z, u, coeffs, dt)
    A_ad = jax.jacfwd(lambda zz: dd.step(zz, u, coeffs, dt))(z)
    B_ad = jax.jacfwd(lambda uu: dd.step(z, uu, coeffs, dt))(u)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ad), atol=1e-12)
    np.testing.assert_allclose(np.asarray(B), np.asarray(B_ad), atol=1e-12)


def test_aug_jacobians_match_autodiff(sample):
    z, u, coeffs, dt = sample
    s = jnp.concatenate([jnp.asarray(z), jnp.asarray(u) * 0.5])
    u, coeffs = jnp.asarray(u), jnp.asarray(coeffs)
    A, B = dd.aug_step_jacobians(s, u, coeffs, dt)
    A_ad = jax.jacfwd(lambda ss: dd.aug_step(ss, u, coeffs, dt))(s)
    B_ad = jax.jacfwd(lambda uu: dd.aug_step(s, uu, coeffs, dt))(u)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ad), atol=1e-12)
    np.testing.assert_allclose(np.asarray(B), np.asarray(B_ad), atol=1e-12)


def test_rollout_shapes_and_consistency(sample):
    z, u, coeffs, dt = sample
    T = 9
    us = jnp.asarray(np.tile(u, (T, 1)))
    zs = dd.rollout(jnp.asarray(z), us, jnp.asarray(coeffs), dt)
    assert zs.shape == (T + 1, 6)
    # manual forward
    zi = np.asarray(z)
    for i in range(T):
        zi = numpy_step(zi, np.asarray(us[i]), coeffs, dt)
        np.testing.assert_allclose(np.asarray(zs[i + 1]), zi, rtol=1e-10, atol=1e-12)


def test_step_vmap_batches():
    rng = np.random.default_rng(1)
    zb = jnp.asarray(rng.normal(size=(32, 6)))
    ub = jnp.asarray(rng.normal(size=(32, 2)))
    cb = jnp.asarray(rng.normal(size=(32, 4)))
    out = jax.vmap(lambda z, u, c: dd.step(z, u, c, 0.1))(zb, ub, cb)
    assert out.shape == (32, 6)
    one = dd.step(zb[3], ub[3], cb[3], 0.1)
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(one), rtol=1e-12)


def test_f32_dtype_preserved(sample):
    z, u, coeffs, dt = sample
    out = dd.step(
        jnp.asarray(z, jnp.float32),
        jnp.asarray(u, jnp.float32),
        jnp.asarray(coeffs, jnp.float32),
        np.float32(dt),
    )
    assert out.dtype == jnp.float32
    A, B = dd.step_jacobians(
        jnp.asarray(z, jnp.float32),
        jnp.asarray(u, jnp.float32),
        jnp.asarray(coeffs, jnp.float32),
        np.float32(dt),
    )
    assert A.dtype == jnp.float32 and B.dtype == jnp.float32
