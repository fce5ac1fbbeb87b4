"""Batched scenario solving — the single-chip throughput engine.

The reference solves exactly one NLP per control cycle on a CPU
(/root/reference/mpc_ros/src/mpc_planner.cpp:265). The TPU design's first
scale axis (SURVEY.md §2.4a) is `vmap` over thousands of independent scenario
NLPs — initial pose x reference shape x weight draws — so every Riccati
step becomes a large batched (B, 8, 8) einsum that XLA maps onto the MXU.

Two entry points:
* `batch_solve`      — shared MPCParams across the batch (control serving).
* `batch_solve_swept` — per-scenario MPCParams pytree (Monte-Carlo tuning
  sweeps where weight vectors differ per scenario).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..config import MPCParams, SolverConfig
from ..solver import ilqr
from ..solver.types import SolveResult

Array = Any


@struct.dataclass
class Scenario:
    """One NMPC problem instance (all leaves batchable)."""

    z0: Array      # (6,) initial state
    coeffs: Array  # (P,) reference-polynomial coefficients


@functools.partial(jax.jit, static_argnames=("cfg",))
def batch_solve(z0s: jnp.ndarray, coeffs: jnp.ndarray, p: MPCParams,
                cfg: SolverConfig,
                u_init: Optional[jnp.ndarray] = None,
                refs: Optional[jnp.ndarray] = None,
                blobs=None) -> SolveResult:
    """Solve B scenarios with shared params. z0s: (B, 6), coeffs: (B, P).

    `refs` (B, N, 3) = per-scenario time-indexed setpoint profiles
    (trajectory-tracking mode; see solver.ilqr.solve). `blobs`:
    per-scenario parametric obstacles (GaussianObstacles, leaves (B, K))
    — refs and blobs compose (obstacle-aware trajectory tracking)."""
    u_ax = None if u_init is None else 0
    r_ax = None if refs is None else 0
    b_ax = None if blobs is None else 0
    return jax.vmap(
        lambda z, c, u, r, b: ilqr.solve(z, c, p, cfg, u_init=u, refs=r,
                                         blobs=b),
        in_axes=(0, 0, u_ax, r_ax, b_ax),
    )(z0s, coeffs, u_init, refs, blobs)


@functools.partial(jax.jit, static_argnames=("cfg",))
def batch_solve_swept(z0s: jnp.ndarray, coeffs: jnp.ndarray,
                      ps: MPCParams, cfg: SolverConfig) -> SolveResult:
    """Solve B scenarios with per-scenario params (every MPCParams leaf has
    a leading batch dimension)."""
    return jax.vmap(lambda z, c, p: ilqr.solve(z, c, p, cfg))(z0s, coeffs, ps)


def make_random_scenarios(key, batch: int, dtype=jnp.float32,
                          pose_scale: float = 0.3,
                          curve_scale: float = 0.25):
    """Random tracking scenarios for benchmarks/sweeps: perturbed initial
    error states + random cubic reference paths (robot-frame)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    B = batch
    coeffs = jax.random.normal(k1, (B, 4), dtype) * jnp.asarray(
        [0.1, 0.2, curve_scale, 0.05], dtype
    )
    v0 = jax.random.uniform(k2, (B,), dtype, 0.0, 0.8)
    cte = coeffs[:, 0] + jax.random.normal(k3, (B,), dtype) * pose_scale * 0.3
    etheta = jnp.arctan(coeffs[:, 1]) + jax.random.normal(k4, (B,), dtype) * 0.2
    zeros = jnp.zeros((B,), dtype)
    z0s = jnp.stack([zeros, zeros, zeros, v0, cte, etheta], axis=-1)
    return z0s, coeffs


def analytic_u_init(z0s, coeffs, p, cfg):
    """Cheap analytic cold-start initialization (opt-in, round 5): a
    decaying proportional steer toward the path plus an accelerate-to-
    setpoint column,

        omega_k = clip(-1.2 etheta0 - 0.6 cte0, bounds) * exp(-0.15 k)
        accel_k = clip(ref_vel - v0, bounds)

    ~10 FLOPs/lane against the solver's ~40k. The zero init (the
    reference's cold start, /root/reference/mpc_ros/src/
    mpc_planner.cpp:288-300) stays the DEFAULT for reference/oracle
    parity; this helper is for throughput workloads: measured on the
    bench ensemble (B=8192, N=30, ddp) mean iterations 3.57 -> 3.28 and
    mean tile-max 5.50 -> 5.12 (-7% of the megakernel's executed work)
    with the SAME optimum on every lane (gain grid: 1.2/0.6 beat
    1.5/1.0, curvature feedforward, and slower decays). Use as
    `batch_solve_lane(..., u_init=analytic_u_init(z0s, coeffs, p, cfg))`
    or `bench.py --smart-init`."""
    dtype = z0s.dtype
    T = cfg.n_controls
    from ..models.base import get_model

    lb, ub = get_model(cfg.model).control_bounds(p, dtype)
    # (2,) broadcasts over (B, T, 2) directly; per-lane (2, B) bounds need
    # the T axis inserted: (B, 1, 2)
    lb2 = lb if lb.ndim == 1 else lb.T[:, None, :]
    ub2 = ub if ub.ndim == 1 else ub.T[:, None, :]
    w0 = -1.2 * z0s[:, 5] - 0.6 * z0s[:, 4]
    a0 = jnp.asarray(p.ref_vel, dtype) - z0s[:, 3]
    decay = jnp.exp(jnp.asarray(-0.15, dtype) * jnp.arange(T, dtype=dtype))
    u = jnp.stack([w0[:, None] * decay[None, :],
                   jnp.broadcast_to(a0[:, None], (z0s.shape[0], T))],
                  axis=-1)
    return jnp.clip(u, jnp.broadcast_to(lb2, u.shape),
                    jnp.broadcast_to(ub2, u.shape))
