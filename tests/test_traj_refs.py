"""Per-stage (time-indexed) reference profiles.

The reference NLP keeps its three setpoints (ref_cte, ref_etheta, ref_v)
constant over the horizon (/root/reference/mpc_ros/src/mpc_planner.cpp:122-130).
`refs` (N, 3) upgrades them to per-knot profiles — the objective behind the
upstream repo's trajectory-tracking mode (/root/reference/README.md:43-46)
and per-stage speed scheduling. These tests pin:

* constant profiles reproduce the scalar path bit-for-bit,
* the closed-form stage expansion stays exact under per-stage setpoints,
* profiled solves match the float64 full-NLP oracle at the 1e-3 spec,
* the batched path with per-scenario profiles matches single solves.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.config import MPCParams, SolverConfig
from mpc_ros_tpu.engine.batch import batch_solve
from mpc_ros_tpu.models import costs
from mpc_ros_tpu.solver import ilqr
from mpc_ros_tpu.solver.oracle import solve_oracle


def scenario(curve=0.2):
    coeffs = np.array([0.05, -0.1, curve, -0.02])
    z0 = np.array([0.0, 0.0, 0.0, 0.3, coeffs[0], float(np.arctan(coeffs[1]))])
    return z0, coeffs


def params64():
    return MPCParams(
        dt=0.1, ref_vel=0.5, w_cte=100.0, w_etheta=100.0, w_vel=100.0,
        w_angvel=100.0, w_accel=50.0, w_angvel_d=10.0, w_accel_d=10.0,
        max_angvel=1.0, max_throttle=1.0,
    ).astype(jnp.float64)


def const_refs(p, N):
    row = jnp.asarray([p.ref_cte, p.ref_etheta, p.ref_vel], jnp.float64)
    return jnp.broadcast_to(row, (N, 3))


def ramp_refs(p, N):
    """Speed ramp 0.7 -> 0.2 m/s with a small cte offset profile."""
    t = jnp.linspace(0.0, 1.0, N, dtype=jnp.float64)
    return jnp.stack(
        [0.02 * jnp.sin(2.0 * jnp.pi * t), jnp.zeros_like(t),
         0.7 - 0.5 * t], axis=-1)


def test_constant_profile_matches_scalar_path():
    z0, coeffs = scenario()
    p = params64()
    cfg = SolverConfig(n_steps=12, max_sqp_iters=100, tol_grad=1e-10)
    res_scalar = ilqr.solve(jnp.asarray(z0), jnp.asarray(coeffs), p, cfg)
    res_refs = ilqr.solve(jnp.asarray(z0), jnp.asarray(coeffs), p, cfg,
                          refs=const_refs(p, cfg.n_steps))
    np.testing.assert_allclose(np.asarray(res_refs.us),
                               np.asarray(res_scalar.us), atol=1e-12)
    np.testing.assert_allclose(float(res_refs.cost),
                               float(res_scalar.cost), rtol=1e-12)


def test_total_cost_with_profile_matches_per_knot_sum():
    rng = np.random.default_rng(3)
    N = 9
    zs = jnp.asarray(rng.normal(size=(N, 6)))
    us = jnp.asarray(rng.normal(size=(N - 1, 2)))
    p = params64()
    refs = ramp_refs(p, N)
    J = float(costs.total_cost(zs, us, p, refs))
    # per-knot scalar evaluation with that knot's setpoints substituted
    J_knots = sum(
        float(costs.state_cost(
            zs[i], p.replace(ref_cte=refs[i, 0], ref_etheta=refs[i, 1],
                             ref_vel=refs[i, 2])))
        for i in range(N))
    J_ctrl = float(costs.total_cost(jnp.zeros((N, 6)), us, p)) \
        - N * float(costs.state_cost(jnp.zeros((6,)), p))
    np.testing.assert_allclose(J, J_knots + J_ctrl, rtol=1e-12)


def test_stage_expansion_exact_under_profile():
    rng = np.random.default_rng(7)
    s = jnp.asarray(rng.normal(size=(8,)))
    u = jnp.asarray(rng.normal(size=(2,)))
    p = params64()
    ref3 = jnp.asarray([0.03, -0.06, 0.65], jnp.float64)
    rate_on = jnp.asarray(1.0, jnp.float64)

    f_s = lambda s_: costs.stage_cost_aug(s_, u, rate_on, p, ref3)
    f_u = lambda u_: costs.stage_cost_aug(s, u_, rate_on, p, ref3)
    l_s, l_u, l_ss, l_uu, l_us = costs.stage_expansion_aug(s, u, rate_on, p, ref3)
    np.testing.assert_allclose(np.asarray(l_s), np.asarray(jax.grad(f_s)(s)),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(l_u), np.asarray(jax.grad(f_u)(u)),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(l_ss),
                               np.asarray(jax.hessian(f_s)(s)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(l_uu),
                               np.asarray(jax.hessian(f_u)(u)), atol=1e-12)
    mixed = jax.jacfwd(lambda s_: jax.grad(
        lambda u_: costs.stage_cost_aug(s_, u_, rate_on, p, ref3))(u))(s)
    np.testing.assert_allclose(np.asarray(l_us), np.asarray(mixed), atol=1e-12)


def test_speed_profile_solve_matches_oracle():
    """Headline tolerance carried over to the time-indexed objective."""
    z0, coeffs = scenario()
    p = params64()
    cfg = SolverConfig(n_steps=12, max_sqp_iters=200, tol_grad=1e-10)
    refs = ramp_refs(p, cfg.n_steps)
    res = ilqr.solve(jnp.asarray(z0), jnp.asarray(coeffs), p, cfg, refs=refs)
    orc = solve_oracle(z0, coeffs, p, cfg, refs=np.asarray(refs))
    assert orc.success, orc.status
    dev = np.max(np.abs(np.asarray(res.us) - orc.us))
    assert dev < 1e-3, f"control deviation vs oracle: {dev}"
    np.testing.assert_allclose(float(res.cost), orc.cost, rtol=1e-5)
    # the ramp is actually followed: terminal speed well below the start
    assert float(res.zs[-1, 3]) < float(res.zs[0, 3]) + 0.1


def test_profile_changes_solution():
    z0, coeffs = scenario()
    p = params64()
    cfg = SolverConfig(n_steps=12)
    res_c = ilqr.solve(jnp.asarray(z0), jnp.asarray(coeffs), p, cfg)
    res_r = ilqr.solve(jnp.asarray(z0), jnp.asarray(coeffs), p, cfg,
                       refs=ramp_refs(p, cfg.n_steps))
    assert float(jnp.max(jnp.abs(res_c.us - res_r.us))) > 1e-3


def test_batched_profiles_match_single():
    z0, coeffs = scenario()
    p = params64()
    cfg = SolverConfig(n_steps=10, max_sqp_iters=100, tol_grad=1e-10)
    B = 4
    key = jax.random.PRNGKey(0)
    base = ramp_refs(p, cfg.n_steps)
    refs = base[None] + 0.1 * jax.random.normal(key, (B, cfg.n_steps, 3),
                                                jnp.float64)
    z0s = jnp.broadcast_to(jnp.asarray(z0), (B, 6))
    cs = jnp.broadcast_to(jnp.asarray(coeffs), (B, 4))
    res_b = batch_solve(z0s, cs, p, cfg, refs=refs)
    for i in range(B):
        res_i = ilqr.solve(z0s[i], cs[i], p, cfg, refs=refs[i])
        np.testing.assert_allclose(np.asarray(res_b.us[i]),
                                   np.asarray(res_i.us), atol=1e-9)
