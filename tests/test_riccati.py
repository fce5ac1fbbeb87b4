"""Parallel (associative-scan) Riccati vs the sequential backward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_ros_tpu.solver import ilqr, riccati


def random_lqr(T, n=8, m=2, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(np.eye(n) + 0.1 * rng.normal(size=(T, n, n)))
    B = jnp.asarray(0.1 * rng.normal(size=(T, n, m)))
    l_s = jnp.asarray(rng.normal(size=(T, n)))
    l_u = jnp.asarray(rng.normal(size=(T, m)))
    M = rng.normal(size=(T, n, n)) * 0.3
    l_ss = jnp.asarray(np.einsum("tij,tkj->tik", M, M) + np.eye(n) * 0.5)
    Lu = rng.normal(size=(T, m, m)) * 0.3
    l_uu = jnp.asarray(np.einsum("tij,tkj->tik", Lu, Lu) + np.eye(m) * 1.0)
    l_us = jnp.asarray(0.2 * rng.normal(size=(T, m, n)))
    MT = rng.normal(size=(n, n)) * 0.3
    V_ss = jnp.asarray(MT @ MT.T + np.eye(n) * 0.5)
    V_s = jnp.asarray(rng.normal(size=n))
    return A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss


def sequential_reference(A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss):
    """Plain numpy Riccati recursion (no box, no regularization)."""
    T = A.shape[0]
    P = np.asarray(V_ss)
    p = np.asarray(V_s)
    ks, Ks, Ps, ps = [], [], [P], [p]
    for t in range(T - 1, -1, -1):
        At, Bt = np.asarray(A[t]), np.asarray(B[t])
        Qs = np.asarray(l_s[t]) + At.T @ p
        Qu = np.asarray(l_u[t]) + Bt.T @ p
        Qss = np.asarray(l_ss[t]) + At.T @ P @ At
        Quu = np.asarray(l_uu[t]) + Bt.T @ P @ Bt
        Qus = np.asarray(l_us[t]) + Bt.T @ P @ At
        k = -np.linalg.solve(Quu, Qu)
        K = -np.linalg.solve(Quu, Qus)
        p = Qs + K.T @ Quu @ k + K.T @ Qu + Qus.T @ k
        P = Qss + K.T @ Quu @ K + K.T @ Qus + Qus.T @ K
        P = 0.5 * (P + P.T)
        ks.append(k); Ks.append(K); Ps.append(P); ps.append(p)
    return (np.asarray(ks[::-1]), np.asarray(Ks[::-1]),
            np.asarray(Ps[::-1]), np.asarray(ps[::-1]))


@pytest.mark.parametrize("T", [1, 2, 3, 17, 64])
def test_parallel_matches_sequential(T):
    prob = random_lqr(T, seed=T)
    ks, Ks, Ps, ps = riccati.parallel_gains(*prob)
    ks_r, Ks_r, Ps_r, ps_r = sequential_reference(*prob)
    np.testing.assert_allclose(np.asarray(Ps), Ps_r, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ps), ps_r, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ks), ks_r, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Ks), Ks_r, rtol=1e-8, atol=1e-8)


def test_parallel_matches_solver_backward_pass():
    """With inactive box bounds and mu=0, the control-limited sequential
    pass must coincide with the parallel factorization."""
    T = 19
    prob = random_lqr(T, seed=99)
    A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss = prob
    big = jnp.asarray([1e9, 1e9])
    us = jnp.zeros((T, 2))
    ks_seq, Ks_seq, _, _, _ = ilqr.backward_pass(
        A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss, us, -big, big,
        jnp.asarray(0.0))
    ks_par, Ks_par, _, _ = riccati.parallel_gains(*prob)
    np.testing.assert_allclose(np.asarray(ks_seq), np.asarray(ks_par),
                               rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Ks_seq), np.asarray(Ks_par),
                               rtol=1e-7, atol=1e-7)


def test_parallel_vmaps_over_batch():
    B_ = 4
    probs = [random_lqr(12, seed=s) for s in range(B_)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    ks, Ks, Ps, ps = jax.vmap(riccati.parallel_gains)(*stacked)
    for i in range(B_):
        ks_i, _, _, _ = riccati.parallel_gains(*probs[i])
        np.testing.assert_allclose(np.asarray(ks[i]), np.asarray(ks_i),
                                   rtol=1e-9, atol=1e-10)


def test_solver_with_horizon_parallel_matches_sequential():
    """Full solve with horizon_parallel=True equals the sequential solver
    on an interior (unsaturated) problem."""
    from mpc_ros_tpu.config import MPCParams, SolverConfig

    z0 = jnp.asarray([0.0, 0.0, 0.0, 0.3, 0.05, -0.0997])
    coeffs = jnp.asarray([0.05, -0.1, 0.2, -0.02])
    p = MPCParams(w_cte=100.0, w_vel=100.0, w_angvel_d=10.0,
                  w_accel_d=10.0).astype(jnp.float64)
    cfg_seq = SolverConfig(n_steps=40, tol_grad=1e-9)
    cfg_par = SolverConfig(n_steps=40, tol_grad=1e-9, horizon_parallel=True)
    r_seq = ilqr.solve(z0, coeffs, p, cfg_seq)
    r_par = ilqr.solve(z0, coeffs, p, cfg_par)
    assert bool(r_par.converged)
    np.testing.assert_allclose(np.asarray(r_par.us), np.asarray(r_seq.us),
                               atol=1e-6)


def test_boxed_parallel_matches_sequential_under_saturation():
    """VERDICT r1 item 5: the exact control-limited horizon-parallel pass
    must equal the sequential pass WITH SATURATED BOUNDS (clamp patterns
    engaged), not just on interior problems. mu=0, f64."""
    T = 33
    prob = random_lqr(T, seed=7)
    A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss = prob
    # tight box around a nonzero current iterate -> many stages clamp
    lb = jnp.asarray([-0.3, -0.2])
    ub = jnp.asarray([0.25, 0.35])
    rng = np.random.default_rng(3)
    us = jnp.asarray(rng.uniform(-0.3, 0.35, size=(T, 2)))
    mu = jnp.asarray(0.0)
    ks_seq, Ks_seq, dV1_s, dV2_s, pg_s = ilqr.backward_pass(
        A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss, us, lb, ub, mu)
    ks_par, Ks_par, dV1_p, dV2_p, pg_p = ilqr.backward_pass_parallel(
        A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss, us, lb, ub, mu,
        n_sweeps=12)
    # the test must actually exercise saturation
    at_bound = np.logical_or(
        np.isclose(np.asarray(ks_seq), np.asarray(lb - us)),
        np.isclose(np.asarray(ks_seq), np.asarray(ub - us)))
    assert at_bound.sum() >= 5, "test problem not saturated enough"
    np.testing.assert_allclose(np.asarray(ks_par), np.asarray(ks_seq),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Ks_par), np.asarray(Ks_seq),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(float(dV1_p), float(dV1_s), rtol=1e-8)
    np.testing.assert_allclose(float(dV2_p), float(dV2_s), rtol=1e-8)
    np.testing.assert_allclose(float(pg_p), float(pg_s), rtol=1e-8)


@pytest.mark.parametrize("T", [2, 9, 50])
def test_boxed_parallel_saturation_sizes(T):
    prob = random_lqr(T, seed=100 + T)
    A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss = prob
    lb = jnp.asarray([-0.2, -0.2])
    ub = jnp.asarray([0.2, 0.2])
    us = jnp.zeros((T, 2))
    mu = jnp.asarray(0.0)
    ks_seq, Ks_seq, *_ = ilqr.backward_pass(
        A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss, us, lb, ub, mu)
    ks_par, Ks_par, *_ = ilqr.backward_pass_parallel(
        A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss, us, lb, ub, mu,
        n_sweeps=12)
    np.testing.assert_allclose(np.asarray(ks_par), np.asarray(ks_seq),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Ks_par), np.asarray(Ks_seq),
                               rtol=1e-8, atol=1e-8)


def test_solver_horizon_parallel_matches_on_saturated_problem():
    """Full SOLVE equality with active control bounds: an aggressive curve
    with a tight angular-velocity limit saturates omega for much of the
    horizon; horizon_parallel must land on the same solution."""
    from mpc_ros_tpu.config import MPCParams, SolverConfig

    coeffs = jnp.asarray([0.5, 1.0, 0.3, 0.0])
    z0 = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.5, float(np.arctan(1.0))])
    p = MPCParams(w_cte=300.0, w_vel=100.0, w_angvel_d=1.0,
                  w_accel_d=1.0, max_angvel=0.3,
                  max_throttle=0.2).astype(jnp.float64)
    cfg_seq = SolverConfig(n_steps=40, tol_grad=1e-9)
    cfg_par = SolverConfig(n_steps=40, tol_grad=1e-9, horizon_parallel=True)
    r_seq = ilqr.solve(z0, coeffs, p, cfg_seq)
    r_par = ilqr.solve(z0, coeffs, p, cfg_par)
    assert bool(r_seq.converged) and bool(r_par.converged)
    us = np.asarray(r_seq.us)
    assert (np.abs(us[:, 0]) > 0.3 - 1e-9).sum() >= 10, "omega not saturated"
    assert (np.abs(us[:, 1]) > 0.2 - 1e-9).sum() >= 10, "accel not saturated"
    np.testing.assert_allclose(np.asarray(r_par.us), us, atol=1e-6)
