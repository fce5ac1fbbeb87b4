"""Differential-drive error-state kinematic model.

The 6-state / 2-control ZOH-Euler model from the reference NLP's dynamics
defects (/root/reference/mpc_ros/src/mpc_planner.cpp:208-215):

    state z = (x, y, theta, v, cte, etheta)
    control u = (omega, accel)

    x'      = x + v cos(theta) dt
    y'      = y + v sin(theta) dt
    theta'  = theta + omega dt
    v'      = v + accel dt
    cte'    = (f(x) - y) + v sin(etheta) dt      # f = reference polynomial
    etheta' = etheta + omega dt

Note cte' deliberately uses the *fresh* polynomial error f(x)-y rather than
propagating cte (reference quirk Q10, kept: it is the behavior spec).

Sign convention (`cte_vsin_sign`): the reference mixes two incompatible
etheta conventions — `atan(coeffs[1])` initializes etheta as path-minus-yaw
(/root/reference/mpc_ros/src/driving_state.cpp:212) while the 30%-lookahead
heuristic overwrites it with yaw-minus-path (:233), and the dynamics couple
them as `cte' = ... + v sin(etheta) dt` (matching the first) but
`etheta' = etheta + w dt` (matching the second). With the heuristic active
(almost always) the cte coupling has the WRONG sign and fights the steering
on every curve. `cte_vsin_sign=-1.0` implements the evident intent
consistently for the yaw-minus-path convention; `+1.0` (the default, kept
for FG_eval parity) reproduces the reference bit-for-bit. Closed-loop
experiments show tracking quality is dominated by the cost weights, not
this sign, so parity wins the default. Recorded as quirk Q11 in README.

Analytic Jacobians are provided (and verified against `jax.jacfwd` in tests)
so the hot batched-linearization path is closed-form — no per-step autodiff
graph — and maps directly onto a Pallas kernel later.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.poly import polyeval, polyder_eval

# State / control indices
X, Y, THETA, V, CTE, ETHETA = range(6)
OMEGA, ACCEL = range(2)

STATE_DIM = 6
CONTROL_DIM = 2
# Augmented state for the rate-cost formulation: (z, prev_u)
AUG_STATE_DIM = STATE_DIM + CONTROL_DIM


def step(z: jnp.ndarray, u: jnp.ndarray, coeffs: jnp.ndarray, dt,
         cte_vsin_sign: float = 1.0) -> jnp.ndarray:
    """One ZOH-Euler step of the error-state kinematics. z:(6,), u:(2,).

    `cte_vsin_sign` is static (+1.0 = reference-exact, -1.0 = consistent
    convention; see module docstring)."""
    x, y, theta, v, cte, etheta = (z[..., i] for i in range(6))
    omega = u[..., OMEGA]
    accel = u[..., ACCEL]
    f0 = polyeval(coeffs, x)
    return jnp.stack(
        [
            x + v * jnp.cos(theta) * dt,
            y + v * jnp.sin(theta) * dt,
            theta + omega * dt,
            v + accel * dt,
            (f0 - y) + cte_vsin_sign * v * jnp.sin(etheta) * dt,
            etheta + omega * dt,
        ],
        axis=-1,
    )


def step_jacobians(z: jnp.ndarray, u: jnp.ndarray, coeffs: jnp.ndarray, dt,
                   cte_vsin_sign: float = 1.0):
    """Closed-form (A, B) = (d step/dz, d step/du); shapes (6,6), (6,2)."""
    dtype = z.dtype
    x = z[..., X]
    theta = z[..., THETA]
    v = z[..., V]
    etheta = z[..., ETHETA]
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    ce = jnp.cos(etheta)
    se = jnp.sin(etheta)
    fp = polyder_eval(coeffs, x)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    dt = jnp.asarray(dt, dtype)

    rows = [
        #      x        y      theta         v        cte     etheta
        [one, zero, -v * st * dt, ct * dt, zero, zero],          # x'
        [zero, one, v * ct * dt, st * dt, zero, zero],           # y'
        [zero, zero, one, zero, zero, zero],                     # theta'
        [zero, zero, zero, one, zero, zero],                     # v'
        [fp, -one, zero, cte_vsin_sign * se * dt, zero,
         cte_vsin_sign * v * ce * dt],                           # cte'
        [zero, zero, zero, zero, zero, one],                     # etheta'
    ]
    A = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    b_rows = [
        [zero, zero],        # x'
        [zero, zero],        # y'
        [dt * one, zero],    # theta'  <- omega
        [zero, dt * one],    # v'      <- accel
        [zero, zero],        # cte'
        [dt * one, zero],    # etheta' <- omega
    ]
    B = jnp.stack([jnp.stack(r, axis=-1) for r in b_rows], axis=-2)
    return A, B


# Augmented-state step/Jacobians: s = (z, prev_u) -> (step(z, u), u). The
# augmentation turns the reference's actuator-rate costs (w_angvel_d,
# w_accel_d over consecutive controls,
# /root/reference/mpc_ros/src/mpc_planner.cpp:144-147) into Markov stage
# costs so the problem keeps the Riccati-factorizable structure. Built by
# the ONE generic augmentation (base.make_aug) — the former hand copy here
# had to track every layout change twice. The module-level functions keep
# their original p-free signatures for the kernels and tests.
from .base import make_aug as _make_aug

_aug_step_p, _aug_jacs_p = _make_aug(
    lambda z, u, c, dt, sign, p: step(z, u, c, dt, sign),
    lambda z, u, c, dt, sign, p: step_jacobians(z, u, c, dt, sign))


def aug_step(s: jnp.ndarray, u: jnp.ndarray, coeffs: jnp.ndarray, dt,
             cte_vsin_sign: float = 1.0) -> jnp.ndarray:
    return _aug_step_p(s, u, coeffs, dt, cte_vsin_sign, None)


def aug_step_jacobians(s: jnp.ndarray, u: jnp.ndarray, coeffs: jnp.ndarray,
                       dt, cte_vsin_sign: float = 1.0):
    """Closed-form Jacobians of `aug_step`; shapes (8,8), (8,2)."""
    return _aug_jacs_p(s, u, coeffs, dt, cte_vsin_sign, None)


def _control_bounds(p, dtype):
    # broadcast first: either leaf may be per-scenario (B,)-shaped
    mw, mt = jnp.broadcast_arrays(jnp.asarray(p.max_angvel, dtype),
                                  jnp.asarray(p.max_throttle, dtype))
    lb = jnp.stack([-mw, -mt])
    return lb, -lb


def _register():
    # Registry adapter: the module-level functions keep their original
    # p-free signatures (the Pallas kernels and existing tests call them
    # directly); the registry wraps them in the uniform Model signature.
    from .base import Model, register_model

    return register_model(Model(
        name="diff_drive",
        step=lambda z, u, c, dt, sign, p: step(z, u, c, dt, sign),
        step_jacobians=lambda z, u, c, dt, sign, p: step_jacobians(
            z, u, c, dt, sign),
        aug_step=_aug_step_p,
        aug_step_jacobians=_aug_jacs_p,
        control_bounds=_control_bounds,
        control_names=("omega", "accel"),
    ))


MODEL = _register()


def rollout(z0: jnp.ndarray, us: jnp.ndarray, coeffs: jnp.ndarray, dt,
            cte_vsin_sign: float = 1.0) -> jnp.ndarray:
    """Roll the plant forward: z0 (6,), us (T,2) -> states (T+1, 6).

    The kinematic model IS the simulator (SURVEY.md §4): this same function
    drives both the solver's forward pass and the closed-loop test plant.
    (Delegates to the registry Model's generic scan.)
    """
    return MODEL.rollout(z0, us, coeffs, dt, cte_vsin_sign, None)
