"""Cost tests: FG_eval-exact objective, stage decomposition, exact expansion."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_ros_tpu.config import MPCParams
from mpc_ros_tpu.models import costs
from mpc_ros_tpu.models.diff_drive import STATE_DIM


def numpy_fg0(zs, us, p):
    """Direct numpy transcription of FG_eval's fg[0]
    (/root/reference/mpc_ros/src/mpc_planner.cpp:122-147)."""
    N = zs.shape[0]
    J = 0.0
    for i in range(N):
        J += p.w_cte * (zs[i, 4] - p.ref_cte) ** 2
        J += p.w_etheta * (zs[i, 5] - p.ref_etheta) ** 2
        J += p.w_vel * (zs[i, 3] - p.ref_vel) ** 2
    for i in range(N - 1):
        J += p.w_angvel * us[i, 0] ** 2
        J += p.w_accel * us[i, 1] ** 2
    for i in range(N - 2):
        J += p.w_angvel_d * (us[i + 1, 0] - us[i, 0]) ** 2
        J += p.w_accel_d * (us[i + 1, 1] - us[i, 1]) ** 2
    return J


def make_traj(N=12, seed=0):
    rng = np.random.default_rng(seed)
    zs = rng.normal(size=(N, 6))
    us = rng.normal(size=(N - 1, 2))
    p = MPCParams(
        w_cte=100.0, w_etheta=90.0, w_vel=7.0, w_angvel=3.0, w_accel=2.0,
        w_angvel_d=11.0, w_accel_d=13.0, ref_vel=0.5, ref_cte=0.1, ref_etheta=-0.05,
    )
    return jnp.asarray(zs), jnp.asarray(us), p


def test_total_cost_matches_fg0():
    zs, us, p = make_traj()
    J = costs.total_cost(zs, us, p)
    J_ref = numpy_fg0(np.asarray(zs), np.asarray(us), p)
    np.testing.assert_allclose(float(J), J_ref, rtol=1e-12)


def test_stage_decomposition_sums_to_total():
    zs, us, p = make_traj()
    T = us.shape[0]
    # augmented states: s_i = (z_i, u_{i-1}); s_0 gets a zero placeholder
    pu = jnp.concatenate([jnp.zeros((1, 2)), us[:-1]], axis=0)
    ss = jnp.concatenate([zs[:-1], pu], axis=-1)
    rate_on = jnp.asarray([0.0] + [1.0] * (T - 1))
    stage = jax.vmap(lambda s, u, r: costs.stage_cost_aug(s, u, r, p))(ss, us, rate_on)
    terminal = costs.state_cost(zs[-1], p)
    np.testing.assert_allclose(
        float(jnp.sum(stage) + terminal), float(costs.total_cost(zs, us, p)), rtol=1e-12
    )


def test_stage_expansion_matches_autodiff():
    zs, us, p = make_traj(seed=3)
    s = jnp.concatenate([zs[2], us[1]])
    u = us[2]
    for rate_on in (0.0, 1.0):
        l_s, l_u, l_ss, l_uu, l_us = costs.stage_expansion_aug(s, u, rate_on, p)
        f_s = lambda ss: costs.stage_cost_aug(ss, u, rate_on, p)
        f_u = lambda uu: costs.stage_cost_aug(s, uu, rate_on, p)
        np.testing.assert_allclose(np.asarray(l_s), np.asarray(jax.grad(f_s)(s)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(l_u), np.asarray(jax.grad(f_u)(u)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(l_ss), np.asarray(jax.hessian(f_s)(s)), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(l_uu), np.asarray(jax.hessian(f_u)(u)), atol=1e-12
        )
        l_us_ad = jax.jacfwd(lambda uu: jax.grad(f_s)(s) * 0.0 + jax.grad(
            lambda sss: costs.stage_cost_aug(sss, uu, rate_on, p)
        )(s))(u).T
        np.testing.assert_allclose(np.asarray(l_us), np.asarray(l_us_ad), atol=1e-12)


def test_quadratic_expansion_is_exact():
    """Cost is quadratic -> second-order Taylor around any point is exact."""
    zs, us, p = make_traj(seed=5)
    s0 = jnp.concatenate([zs[4], us[3]])
    u0 = us[4]
    rate_on = 1.0
    l0 = costs.stage_cost_aug(s0, u0, rate_on, p)
    l_s, l_u, l_ss, l_uu, l_us = costs.stage_expansion_aug(s0, u0, rate_on, p)
    rng = np.random.default_rng(9)
    ds = jnp.asarray(rng.normal(size=STATE_DIM + 2))
    du = jnp.asarray(rng.normal(size=2))
    pred = (
        l0 + l_s @ ds + l_u @ du
        + 0.5 * ds @ l_ss @ ds + 0.5 * du @ l_uu @ du + du @ l_us @ ds
    )
    actual = costs.stage_cost_aug(s0 + ds, u0 + du, rate_on, p)
    np.testing.assert_allclose(float(pred), float(actual), rtol=1e-10)
