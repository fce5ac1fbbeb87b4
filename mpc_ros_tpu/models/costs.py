"""Path-tracking NMPC cost — FG_eval-exact, with analytic quadratic expansion.

Reproduces the reference objective exactly
(/root/reference/mpc_ros/src/mpc_planner.cpp:122-147):

    J = sum_{i<N}   w_cte    (cte_i - ref_cte)^2
                  + w_etheta (etheta_i - ref_etheta)^2
                  + w_vel    (v_i - ref_vel)^2
      + sum_{i<N-1} w_angvel omega_i^2 + w_accel a_i^2
      + sum_{i<N-2} w_angvel_d (omega_{i+1}-omega_i)^2
                  + w_accel_d (a_{i+1}-a_i)^2

Because the cost is quadratic in (v, cte, etheta, u), its gradients are linear
and Hessians constant: the quadratic expansion below is EXACT (Gauss-Newton ==
full Newton for the cost part), which is what lets the SQP stack converge to
Ipopt's optimum at tight tolerance.

Stage decomposition over the augmented state s = (z, prev_u):
    stage i (i = 0..T-1):  state_cost(z_i) + control_cost(u_i)
                           + [i>=1] rate_cost(u_i - prev_u_i)
    terminal:              state_cost(z_T)
with T = N-1. Summing stages reproduces J exactly (prev_u_i == u_{i-1} by the
augmented dynamics).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import MPCParams
from .diff_drive import STATE_DIM, CONTROL_DIM, AUG_STATE_DIM, V, CTE, ETHETA


def state_weights(p: MPCParams, dtype):
    """(wz, ref): the tracked-state weight and setpoint vectors shared by
    the stage expansion here and the solver's terminal expansion — ONE
    definition so a new tracked term cannot desynchronize them."""
    wz = jnp.zeros((STATE_DIM,), dtype)
    wz = wz.at[V].set(jnp.asarray(p.w_vel, dtype))
    wz = wz.at[CTE].set(jnp.asarray(p.w_cte, dtype))
    wz = wz.at[ETHETA].set(jnp.asarray(p.w_etheta, dtype))
    ref = jnp.zeros((STATE_DIM,), dtype)
    ref = ref.at[V].set(jnp.asarray(p.ref_vel, dtype))
    ref = ref.at[CTE].set(jnp.asarray(p.ref_cte, dtype))
    ref = ref.at[ETHETA].set(jnp.asarray(p.ref_etheta, dtype))
    return wz, ref


def state_cost(z: jnp.ndarray, p: MPCParams) -> jnp.ndarray:
    """Per-knot tracking cost on (cte, etheta, v). z: (..., 6)."""
    return (
        p.w_cte * (z[..., CTE] - p.ref_cte) ** 2
        + p.w_etheta * (z[..., ETHETA] - p.ref_etheta) ** 2
        + p.w_vel * (z[..., V] - p.ref_vel) ** 2
    )


def total_cost(zs: jnp.ndarray, us: jnp.ndarray, p: MPCParams) -> jnp.ndarray:
    """Full objective over a trajectory. zs: (N, 6), us: (N-1, 2)."""
    J = jnp.sum(state_cost(zs, p))
    J = J + jnp.sum(p.w_angvel * us[:, 0] ** 2 + p.w_accel * us[:, 1] ** 2)
    du = us[1:] - us[:-1]
    J = J + jnp.sum(p.w_angvel_d * du[:, 0] ** 2 + p.w_accel_d * du[:, 1] ** 2)
    return J


def stage_cost_aug(s: jnp.ndarray, u: jnp.ndarray, rate_on, p: MPCParams) -> jnp.ndarray:
    """Stage cost on augmented state s = (z, prev_u); `rate_on` masks the
    rate term off at stage 0 (where prev_u is a placeholder)."""
    z = s[..., :STATE_DIM]
    pu = s[..., STATE_DIM:]
    du = u - pu
    c = state_cost(z, p)
    c = c + p.w_angvel * u[..., 0] ** 2 + p.w_accel * u[..., 1] ** 2
    c = c + rate_on * (p.w_angvel_d * du[..., 0] ** 2 + p.w_accel_d * du[..., 1] ** 2)
    return c


def stage_expansion_aug(s: jnp.ndarray, u: jnp.ndarray, rate_on, p: MPCParams):
    """Exact quadratic expansion of `stage_cost_aug` around (s, u).

    Returns (l_s, l_u, l_ss, l_uu, l_us) with shapes
    (8,), (2,), (8,8), (2,2), (2,8). All closed-form (the cost is quadratic).
    """
    dtype = s.dtype
    z = s[..., :STATE_DIM]
    pu = s[..., STATE_DIM:]
    du = u - pu

    wz, ref = state_weights(p, dtype)

    wu = jnp.stack([jnp.asarray(p.w_angvel, dtype), jnp.asarray(p.w_accel, dtype)])
    wd = rate_on * jnp.stack(
        [jnp.asarray(p.w_angvel_d, dtype), jnp.asarray(p.w_accel_d, dtype)]
    )

    # gradients
    g_z = 2.0 * wz * (z - ref)
    g_pu = -2.0 * wd * du
    l_s = jnp.concatenate([g_z, g_pu], axis=-1)
    l_u = 2.0 * wu * u + 2.0 * wd * du

    # Hessians (constant, diagonal blocks)
    l_ss = jnp.zeros((AUG_STATE_DIM, AUG_STATE_DIM), dtype)
    l_ss = l_ss.at[jnp.arange(STATE_DIM), jnp.arange(STATE_DIM)].set(2.0 * wz)
    idx_pu = STATE_DIM + jnp.arange(CONTROL_DIM)
    l_ss = l_ss.at[idx_pu, idx_pu].set(2.0 * wd)

    l_uu = jnp.diag(2.0 * (wu + wd))

    l_us = jnp.zeros((CONTROL_DIM, AUG_STATE_DIM), dtype)
    l_us = l_us.at[jnp.arange(CONTROL_DIM), idx_pu].set(-2.0 * wd)
    return l_s, l_u, l_ss, l_uu, l_us
