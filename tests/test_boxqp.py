"""Box-QP tests: exact active-set enumeration vs scipy brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_ros_tpu.solver.boxqp import solve_boxqp_2d


def brute_force(Q, q, lb, ub):
    from scipy.optimize import minimize

    f = lambda d: 0.5 * d @ Q @ d + q @ d
    res = minimize(f, np.clip(np.zeros(2), lb, ub), jac=lambda d: Q @ d + q,
                   bounds=list(zip(lb, ub)), method="L-BFGS-B",
                   options={"ftol": 1e-16, "gtol": 1e-14})
    return res.x


@pytest.mark.parametrize("seed", range(20))
def test_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(2, 2))
    Q = L @ L.T + 0.1 * np.eye(2)
    q = rng.normal(size=2) * 3
    lb = -np.abs(rng.normal(size=2)) - 0.1
    ub = np.abs(rng.normal(size=2)) + 0.1
    d, free, M = solve_boxqp_2d(jnp.asarray(Q), jnp.asarray(q),
                                jnp.asarray(lb), jnp.asarray(ub))
    want = brute_force(Q, q, lb, ub)
    np.testing.assert_allclose(np.asarray(d), want, atol=1e-6)


def test_unconstrained_interior():
    Q = np.array([[2.0, 0.3], [0.3, 1.5]])
    q = np.array([0.1, -0.2])
    d, free, M = solve_boxqp_2d(jnp.asarray(Q), jnp.asarray(q),
                                jnp.asarray([-10.0, -10.0]), jnp.asarray([10.0, 10.0]))
    np.testing.assert_allclose(np.asarray(d), -np.linalg.solve(Q, q), atol=1e-10)
    np.testing.assert_allclose(np.asarray(free), [1.0, 1.0])


def test_fully_clamped():
    Q = np.eye(2)
    q = np.array([100.0, -100.0])  # pushes dim0 to lb, dim1 to ub
    d, free, M = solve_boxqp_2d(jnp.asarray(Q), jnp.asarray(q),
                                jnp.asarray([-1.0, -1.0]), jnp.asarray([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(d), [-1.0, 1.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(free), [0.0, 0.0])


def test_gain_rows_zero_when_clamped():
    Q = np.array([[2.0, 0.5], [0.5, 3.0]])
    q = np.array([100.0, 0.1])  # dim0 clamps at lb, dim1 free
    lb = jnp.asarray([-1.0, -5.0])
    ub = jnp.asarray([1.0, 5.0])
    d, free, M = solve_boxqp_2d(jnp.asarray(Q), jnp.asarray(q), lb, ub)
    Qus = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8)))
    K = M @ (-(free[:, None] * Qus))  # M is the returned inverse
    np.testing.assert_allclose(np.asarray(K)[0], np.zeros(8), atol=1e-12)
    # free row solves the reduced system: Q11 K1 = -Qus1
    np.testing.assert_allclose(
        np.asarray(K)[1], -np.asarray(Qus)[1] / Q[1, 1], atol=1e-10
    )


def test_vmap_batch():
    rng = np.random.default_rng(1)
    B = 64
    Ls = rng.normal(size=(B, 2, 2))
    Qs = np.einsum("bij,bkj->bik", Ls, Ls) + 0.1 * np.eye(2)
    qs = rng.normal(size=(B, 2)) * 2
    lb = jnp.asarray([-1.0, -1.0])
    ub = jnp.asarray([1.0, 1.0])
    ds, _, _ = jax.vmap(lambda Q, q: solve_boxqp_2d(Q, q, lb, ub))(
        jnp.asarray(Qs), jnp.asarray(qs)
    )
    for i in range(0, B, 7):
        want = brute_force(Qs[i], qs[i], np.asarray(lb), np.asarray(ub))
        np.testing.assert_allclose(np.asarray(ds[i]), want, atol=1e-6)
