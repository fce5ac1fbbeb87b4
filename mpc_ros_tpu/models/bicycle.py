"""Kinematic bicycle (Ackermann-steered) error-state model.

A second model family beyond the reference's differential drive: the classic
path-tracking bicycle kinematics that the reference's NLP structure descends
from (the diff-drive FG_eval is the bicycle model with `v/Lf * delta`
replaced by a direct angular-velocity control — compare
/root/reference/mpc_ros/src/mpc_planner.cpp:208-215). Same 6-state
(x, y, psi, v, cte, epsi) error-state layout, so the FG_eval cost, the
quadratic expansion, the Riccati stack, the oracle, and the batch engines
all apply unchanged; only the dynamics rows and the steering bound differ.

    state z = (x, y, psi, v, cte, epsi)      control u = (delta, accel)

    x'    = x + v cos(psi) dt
    y'    = y + v sin(psi) dt
    psi'  = psi + (v / lf) delta dt          # lf: CoG -> front-axle distance
    v'    = v + accel dt
    cte'  = (f(x) - y) + sign * v sin(epsi) dt
    epsi' = epsi + (v / lf) delta dt

Positive delta steers left (counter-clockwise psi), matching the diff-drive
omega convention. `p.lf` and the steering bound `p.max_steer` live in
MPCParams (traced — sweepable per scenario, e.g. tuning one weight set
across a mixed fleet of wheelbases).

Like diff_drive, cte' uses the fresh polynomial error f(x) - y (quirk Q10
kept as the behavior spec) and `sign` is the Q11 coupling sign.

Note psi' and epsi' advance by the SAME (v/lf) delta dt each step — the
identity the megakernel's transcendental-free trig exploits for diff-drive
(config.py: SolverConfig.trig) holds here too.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.poly import polyeval, polyder_eval
from .base import Model, make_aug, register_model

X, Y, PSI, V, CTE, EPSI = range(6)
DELTA, ACCEL = range(2)

STATE_DIM = 6
CONTROL_DIM = 2


def step(z, u, coeffs, dt, sign, p):
    """One ZOH-Euler step. z (...,6), u (...,2) -> (...,6)."""
    x, y, psi, v, cte, epsi = (z[..., i] for i in range(6))
    delta = u[..., DELTA]
    accel = u[..., ACCEL]
    dtype = z.dtype
    dt = jnp.asarray(dt, dtype)
    lf = jnp.asarray(p.lf, dtype)
    f0 = polyeval(coeffs, x)
    dpsi = v / lf * delta * dt
    return jnp.stack(
        [
            x + v * jnp.cos(psi) * dt,
            y + v * jnp.sin(psi) * dt,
            psi + dpsi,
            v + accel * dt,
            (f0 - y) + sign * v * jnp.sin(epsi) * dt,
            epsi + dpsi,
        ],
        axis=-1,
    )


def step_jacobians(z, u, coeffs, dt, sign, p):
    """Closed-form (A, B) = (d step/dz, d step/du); shapes (6,6), (6,2).

    Verified against jax.jacfwd in tests/test_bicycle.py."""
    dtype = z.dtype
    x = z[..., X]
    psi = z[..., PSI]
    v = z[..., V]
    epsi = z[..., EPSI]
    delta = u[..., DELTA]
    cp = jnp.cos(psi)
    sp = jnp.sin(psi)
    ce = jnp.cos(epsi)
    se = jnp.sin(epsi)
    fp = polyder_eval(coeffs, x)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    dt = jnp.asarray(dt, dtype)
    lf = jnp.asarray(p.lf, dtype)
    k = dt / lf                    # psi'/epsi' sensitivity scale
    dk_dv = delta * k              # d(v/lf * delta * dt)/dv
    dk_dd = v * k                  # d(.)/ddelta

    rows = [
        #      x        y        psi          v         cte     epsi
        [one, zero, -v * sp * dt, cp * dt, zero, zero],           # x'
        [zero, one, v * cp * dt, sp * dt, zero, zero],            # y'
        [zero, zero, one, dk_dv, zero, zero],                     # psi'
        [zero, zero, zero, one, zero, zero],                      # v'
        [fp, -one, zero, sign * se * dt, zero, sign * v * ce * dt],  # cte'
        [zero, zero, zero, dk_dv, zero, one],                     # epsi'
    ]
    A = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    b_rows = [
        [zero, zero],          # x'
        [zero, zero],          # y'
        [dk_dd, zero],         # psi'  <- delta
        [zero, dt * one],      # v'    <- accel
        [zero, zero],          # cte'
        [dk_dd, zero],         # epsi' <- delta
    ]
    B = jnp.stack([jnp.stack(r, axis=-1) for r in b_rows], axis=-2)
    return A, B


def _control_bounds(p, dtype):
    # broadcast first: either leaf may be per-scenario (B,)-shaped
    ms, mt = jnp.broadcast_arrays(jnp.asarray(p.max_steer, dtype),
                                  jnp.asarray(p.max_throttle, dtype))
    lb = jnp.stack([-ms, -mt])
    return lb, -lb


def _yaw_rate(v, delta, p):
    """Heading rate of the commanded kinematics: psi_dot = v * delta / lf."""
    return v * delta / p.lf


aug_step, aug_step_jacobians = make_aug(step, step_jacobians)

MODEL = register_model(Model(
    name="bicycle",
    step=step,
    step_jacobians=step_jacobians,
    aug_step=aug_step,
    aug_step_jacobians=aug_step_jacobians,
    control_bounds=_control_bounds,
    control_names=("delta", "accel"),
    yaw_rate=_yaw_rate,
    # Ackermann steering cannot rotate in place: the planner skips the
    # RotateBeforeTracking / StopAndRotate behaviors for this family
    can_rotate_in_place=False,
))
