"""Model registry — pluggable vehicle dynamics for the NMPC stack.

The reference hard-wires one robot class: differential drive (FG_eval's
dynamics defects, /root/reference/mpc_ros/src/mpc_planner.cpp:208-215).
Here the solver is generic over a `Model`: any 6-state / 2-control
error-state kinematics with the (x, y, theta, v, cte, etheta) layout plugs
into the same iLQR/SQP stack, cost expansion, oracle, and batch engine —
`SolverConfig.model` selects it (static, so jit specializes per model and
the diff-drive Pallas megakernel keeps its hand-tuned fast path).

A `Model` carries the step function, its closed-form Jacobians, the
augmented-state variants used by the rate-cost formulation (see
diff_drive.aug_step), and the control box bounds. All functions take the
full `MPCParams` so models may read extra numeric parameters (e.g. the
bicycle wheelbase `lf`) — traced leaves, sweepable per scenario.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp

Fn = Callable


def _yaw_rate_direct(v, u0, p):
    """Default heading-rate map: the first control IS the yaw rate
    (differential drive: u0 = omega)."""
    return u0


@dataclasses.dataclass(frozen=True)
class Model:
    """One vehicle-dynamics family (static: participates in jit keys).

    Function signatures (z (...,6), s (...,8), u (...,2), coeffs (P,)):
      step(z, u, coeffs, dt, sign, p)               -> z'
      step_jacobians(z, u, coeffs, dt, sign, p)     -> (A (6,6), B (6,2))
      aug_step(s, u, coeffs, dt, sign, p)           -> s' = (step(z,u), u)
      aug_step_jacobians(s, u, coeffs, dt, sign, p) -> (A (8,8), B (8,2))
      control_bounds(p, dtype)                      -> (lb (2,), ub (2,))
    `sign` is the static cte/etheta coupling sign (quirk Q11); non-path
    models may ignore it.

    `yaw_rate(v, u0, p)` maps (speed, first control) to the heading rate —
    omega itself for diff-drive, v*delta/lf for the bicycle; the planner's
    delay-mode prediction and the simulator plants use it.
    `can_rotate_in_place` gates the FSM's rotation states: Ackermann
    vehicles cannot execute the reference's in-place rotate behaviors, so
    the planner skips them (Tracking handles heading convergence) and goal
    completion relaxes to position + stopped.
    """

    name: str
    step: Fn
    step_jacobians: Fn
    aug_step: Fn
    aug_step_jacobians: Fn
    control_bounds: Fn
    control_names: tuple = ("omega", "accel")
    yaw_rate: Fn = _yaw_rate_direct
    can_rotate_in_place: bool = True

    def rollout(self, z0, us, coeffs, dt, sign, p):
        """Roll the plant forward: z0 (6,), us (T,2) -> (T+1, 6)."""

        def body(z, u):
            z_next = self.step(z, u, coeffs, dt, sign, p)
            return z_next, z_next

        _, zs = jax.lax.scan(body, z0, us)
        return jnp.concatenate([z0[None], zs], axis=0)


def make_aug(step: Fn, step_jacobians: Fn, state_dim: int = 6,
             control_dim: int = 2):
    """Generic augmented-state (z, prev_u) wrappers from a plain step.

    The augmentation turns actuator-rate costs into Markov stage costs —
    see models/diff_drive.py:aug_step for the derivation.
    """

    def aug_step(s, u, coeffs, dt, sign, p):
        z_next = step(s[..., :state_dim], u, coeffs, dt, sign, p)
        return jnp.concatenate([z_next, u], axis=-1)

    def aug_step_jacobians(s, u, coeffs, dt, sign, p):
        z = s[..., :state_dim]
        A, B = step_jacobians(z, u, coeffs, dt, sign, p)
        batch = z.shape[:-1]
        dtype = z.dtype
        zeros_su = jnp.zeros(batch + (state_dim, control_dim), dtype)
        zeros_us = jnp.zeros(batch + (control_dim, state_dim), dtype)
        zeros_uu = jnp.zeros(batch + (control_dim, control_dim), dtype)
        eye_uu = jnp.broadcast_to(jnp.eye(control_dim, dtype=dtype),
                                  batch + (control_dim, control_dim))
        A_aug = jnp.concatenate(
            [
                jnp.concatenate([A, zeros_su], axis=-1),
                jnp.concatenate([zeros_us, zeros_uu], axis=-1),
            ],
            axis=-2,
        )
        B_aug = jnp.concatenate([B, eye_uu], axis=-2)
        return A_aug, B_aug

    return aug_step, aug_step_jacobians


def make_jacobians(step: Fn) -> Fn:
    """Exact (A, B) Jacobians of a plain step function via forward-mode AD.

    This is the CppAD-capability replacement: in the reference, users write
    the dynamics on `AD<double>` and the vendored CppAD engine tapes and
    differentiates them (FG_eval at
    /root/reference/mpc_ros/src/mpc_planner.cpp:208-215 through
    /root/reference/mpc_ros/include/cppad/core/jacobian.hpp). Here JAX
    tracing IS the tape: any `step` written with jnp ops gets exact
    Jacobians from `jax.jacfwd`, with XLA playing the role of CppAD's tape
    optimizer. Hand-derived Jacobians (models/diff_drive.py,
    models/bicycle.py) remain preferable for families with hand-tuned
    Pallas fast paths, but are no longer required to plug a new vehicle
    family into the solver stack — see `model_from_step`.

    Returns a `step_jacobians(z, u, coeffs, dt, sign, p) -> (A, B)` that
    accepts arbitrary leading batch dims on `z`/`u` (coeffs/p are treated
    as shared, matching every solver call site, which vmaps per stage).
    """

    def single(z, u, coeffs, dt, sign, p):
        A = jax.jacfwd(lambda zz: step(zz, u, coeffs, dt, sign, p))(z)
        B = jax.jacfwd(lambda uu: step(z, uu, coeffs, dt, sign, p))(u)
        return A, B

    def step_jacobians(z, u, coeffs, dt, sign, p):
        batch = z.shape[:-1]
        if not batch:
            return single(z, u, coeffs, dt, sign, p)
        zf = z.reshape((-1, z.shape[-1]))
        uf = u.reshape((-1, u.shape[-1]))
        A, B = jax.vmap(
            lambda zz, uu: single(zz, uu, coeffs, dt, sign, p))(zf, uf)
        return (A.reshape(batch + A.shape[1:]),
                B.reshape(batch + B.shape[1:]))

    return step_jacobians


def model_from_step(name: str, step: Fn, control_bounds: Fn,
                    control_names: tuple = ("omega", "accel"),
                    register: bool = True,
                    allow_override: bool = False) -> Model:
    """Build (and by default register) a complete Model from just a step
    function — derivatives come from autodiff (`make_jacobians`), the
    rate-cost augmentation from `make_aug`.

    The full CppAD workflow equivalent: the reference user writes FG_eval
    and gets sparse Jacobians/Hessians from the vendored AD engine; here a
    user writes `step(z, u, coeffs, dt, sign, p)` with jnp ops and gets a
    solver-ready vehicle family (single `solve_jit`, vmapped
    `engine.batch_solve`, oracle, planner) with zero hand math.
    """
    step_jacobians = make_jacobians(step)
    aug_step, aug_step_jacobians = make_aug(step, step_jacobians)
    mdl = Model(
        name=name,
        step=step,
        step_jacobians=step_jacobians,
        aug_step=aug_step,
        aug_step_jacobians=aug_step_jacobians,
        control_bounds=control_bounds,
        control_names=tuple(control_names),
    )
    if register:
        register_model(mdl, allow_override=allow_override)
    return mdl


_REGISTRY: Dict[str, Model] = {}


def register_model(model: Model, allow_override: bool = False) -> Model:
    """Add a family to the registry. Overwriting an existing name is
    refused by default — a silent replacement of e.g. 'diff_drive' would
    reroute every solve (including the Pallas fast-path dispatch keyed on
    the name) through the new dynamics with no symptom but wrong
    trajectories."""
    if model.name in _REGISTRY and not allow_override:
        raise ValueError(
            f"model {model.name!r} is already registered; pass "
            f"allow_override=True to replace it deliberately")
    _REGISTRY[model.name] = model
    return model


def get_model(name: str) -> Model:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def available_models() -> tuple:
    return tuple(sorted(_REGISTRY))
