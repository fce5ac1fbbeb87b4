"""Tests for polynomial fitting and frame transform ops."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.ops import poly, frames


def test_polyeval_matches_numpy():
    c = jnp.asarray([1.0, -2.0, 0.5, 0.25])
    xs = np.linspace(-3, 3, 11)
    got = poly.polyeval(c, jnp.asarray(xs))
    want = np.polyval(np.asarray(c)[::-1], xs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


def test_polyder_eval_matches_autodiff():
    c = jnp.asarray([1.0, -2.0, 0.5, 0.25])
    x = jnp.asarray(1.7)
    got = poly.polyder_eval(c, x)
    want = jax.grad(lambda xx: poly.polyeval(c, xx))(x)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-12)


def test_polyfit_recovers_exact_cubic():
    rng = np.random.default_rng(0)
    true_c = rng.normal(size=4)
    xs = np.linspace(-2, 2, 20)
    ys = np.polyval(true_c[::-1], xs)
    c = poly.polyfit(jnp.asarray(xs), jnp.asarray(ys), 3)
    np.testing.assert_allclose(np.asarray(c), true_c, rtol=1e-5, atol=1e-6)


def test_polyfit_matches_reference_ls_solution():
    """Least-squares fit of noisy data must match numpy's polyfit
    (same LS problem the reference solves with householder QR,
    /root/reference/mpc_ros/src/driving_state.cpp:283-300)."""
    rng = np.random.default_rng(1)
    xs = np.linspace(-1.5, 2.5, 30)
    ys = 0.3 * xs**3 - 0.2 * xs**2 + xs - 0.5 + rng.normal(size=30) * 0.05
    c = poly.polyfit(jnp.asarray(xs), jnp.asarray(ys), 3)
    want = np.polyfit(xs, ys, 3)[::-1]
    np.testing.assert_allclose(np.asarray(c), want, rtol=1e-5, atol=1e-7)


def test_polyfit_masked_ignores_padding():
    rng = np.random.default_rng(2)
    true_c = rng.normal(size=4)
    xs = np.linspace(-2, 2, 16)
    ys = np.polyval(true_c[::-1], xs)
    # pad with garbage rows, masked out
    xs_pad = np.concatenate([xs, rng.normal(size=8) * 100])
    ys_pad = np.concatenate([ys, rng.normal(size=8) * 100])
    w = np.concatenate([np.ones(16), np.zeros(8)])
    c = poly.polyfit(jnp.asarray(xs_pad), jnp.asarray(ys_pad), 3, weights=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(c), true_c, rtol=1e-4, atol=1e-5)


def test_world_robot_roundtrip():
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.normal(size=10))
    ys = jnp.asarray(rng.normal(size=10))
    px, py, th = 1.0, -2.0, 0.7
    xr, yr = frames.world_to_robot(xs, ys, px, py, th)
    xw, yw = frames.robot_to_world(xr, yr, px, py, th)
    np.testing.assert_allclose(np.asarray(xw), np.asarray(xs), atol=1e-12)
    np.testing.assert_allclose(np.asarray(yw), np.asarray(ys), atol=1e-12)


def test_world_to_robot_matches_reference_formula():
    # /root/reference/mpc_ros/src/driving_state.cpp:202-207
    px, py, th = 0.5, 1.5, 2.1
    wx, wy = 3.0, -1.0
    dx, dy = wx - px, wy - py
    want_x = dx * np.cos(th) + dy * np.sin(th)
    want_y = dy * np.cos(th) - dx * np.sin(th)
    xr, yr = frames.world_to_robot(jnp.asarray(wx), jnp.asarray(wy), px, py, th)
    np.testing.assert_allclose(float(xr), want_x, rtol=1e-12)
    np.testing.assert_allclose(float(yr), want_y, rtol=1e-12)


def test_normalize_angle():
    vals = np.array([0.0, np.pi - 1e-9, -np.pi, 3 * np.pi, -3 * np.pi, 10.0, -10.0])
    out = np.asarray(frames.normalize_angle(jnp.asarray(vals)))
    assert np.all(out >= -np.pi) and np.all(out < np.pi)
    np.testing.assert_allclose(np.sin(out), np.sin(vals), atol=1e-9)
    np.testing.assert_allclose(np.cos(out), np.cos(vals), atol=1e-9)
