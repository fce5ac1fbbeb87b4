"""Sharded scenario sweeps: shard_map over the data axis + psum reductions.

Design constraint carried over from the reference (SURVEY.md §5.8): the
per-cycle control path never blocks on cross-device communication — only the
batched sweep path does collectives, and those are pure reductions (`psum`)
over ICI after embarrassingly-parallel per-scenario solves.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import MPCParams, SolverConfig
from ..solver import ilqr
from ..solver.types import SolveResult
from .mesh import DATA_AXIS

Array = Any


@struct.dataclass
class SweepStats:
    """Globally-reduced sweep statistics (one value per sweep, all devices)."""

    mean_cost: Array
    max_cost: Array
    converged_frac: Array
    mean_iters: Array
    mean_abs_omega0: Array
    mean_abs_accel0: Array


def _local_solve_and_stats(z0s, coeffs, p, cfg):
    res = jax.vmap(lambda z, c: ilqr.solve(z, c, p, cfg))(z0s, coeffs)
    n_local = z0s.shape[0]
    n_global = jax.lax.psum(jnp.asarray(n_local, z0s.dtype), DATA_AXIS)
    psum = lambda x: jax.lax.psum(x, DATA_AXIS)
    stats = SweepStats(
        mean_cost=psum(jnp.sum(res.cost)) / n_global,
        max_cost=jax.lax.pmax(jnp.max(res.cost), DATA_AXIS),
        converged_frac=psum(jnp.sum(res.converged.astype(z0s.dtype))) / n_global,
        mean_iters=psum(jnp.sum(res.n_iters.astype(z0s.dtype))) / n_global,
        mean_abs_omega0=psum(jnp.sum(jnp.abs(res.us[:, 0, 0]))) / n_global,
        mean_abs_accel0=psum(jnp.sum(jnp.abs(res.us[:, 0, 1]))) / n_global,
    )
    return res, stats


@functools.lru_cache(maxsize=None)
def _time_sharded_riccati_jit(mesh):
    """One compiled executable per mesh — constructing jit wrappers inside
    the call body would re-trace and re-compile on EVERY invocation (remote
    TPU compiles run 3-370 s; see CLAUDE.md)."""
    from ..solver.riccati import parallel_gains
    from .mesh import DATA_AXIS, TIME_AXIS

    bt = NamedSharding(mesh, P(DATA_AXIS, TIME_AXIS))
    b_only = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        jax.vmap(parallel_gains),
        in_shardings=(bt, bt, bt, bt, bt, bt, bt, b_only, b_only),
    )


def time_sharded_riccati(mesh, A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss):
    """Batched horizon-parallel Riccati with BOTH axes sharded: scenario
    batch over `data`, horizon over `time`.

    The associative scan (solver/riccati.py) runs over the time-sharded
    axis; XLA GSPMD inserts the inter-device collectives (the block-scan
    prefix exchange) along ICI. Inputs: A,B,l_* have shape (batch, T, ...);
    V_s, V_ss are per-batch terminal expansions (batch, ...).
    """
    return _time_sharded_riccati_jit(mesh)(
        A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss)


@functools.lru_cache(maxsize=None)
def _sweep_jit(mesh, cfg: SolverConfig):
    """One compiled sweep executable per (mesh, SolverConfig) — params enter
    as a replicated ARGUMENT (traced pytree), so weight hot-reloads and
    repeated calls reuse the executable instead of re-tracing it."""
    fn = jax.shard_map(
        lambda z0s, coeffs, p: _local_solve_and_stats(z0s, coeffs, p, cfg),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(
            SolveResult(us=P(DATA_AXIS), zs=P(DATA_AXIS), cost=P(DATA_AXIS),
                        converged=P(DATA_AXIS), n_iters=P(DATA_AXIS),
                        grad_norm=P(DATA_AXIS), reg=P(DATA_AXIS)),
            SweepStats(mean_cost=P(), max_cost=P(), converged_frac=P(),
                       mean_iters=P(), mean_abs_omega0=P(),
                       mean_abs_accel0=P()),
        ),
        # the solver body is shard-agnostic (pure per-scenario math); skip
        # varying-manual-axes tracking of its internal scan carries
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_sweep(mesh, z0s: jnp.ndarray, coeffs: jnp.ndarray,
                  p: MPCParams, cfg: SolverConfig) -> tuple[SolveResult, SweepStats]:
    """Solve a scenario batch sharded over the mesh's data axis.

    Per-scenario results stay sharded (no gather of the big arrays);
    statistics are psum-reduced over ICI and come back replicated.
    """
    return _sweep_jit(mesh, cfg)(z0s, coeffs, p)


@functools.lru_cache(maxsize=None)
def _sharded_lane_jit(mesh, cfg: SolverConfig, sharded_leaves: tuple,
                      has_warm: bool, has_blobs: bool):
    """One compiled sharded fleet-solve per (mesh, SolverConfig, per-robot
    leaf signature, optional-input signature). The scenario batch (and any
    (B,)-shaped MPCParams leaves, warm starts, per-robot obstacle fields)
    shard over the data axis; scalar params replicate. The solve itself is
    embarrassingly parallel — NO collectives in the control path (SURVEY.md
    §5.8 design rule)."""
    import dataclasses as _dc

    from ..models.obstacles import GaussianObstacles
    from ..solver.batch_lane import batch_solve_lane

    p_spec = MPCParams(**{
        f.name: P(DATA_AXIS) if f.name in sharded_leaves else P()
        for f in _dc.fields(MPCParams)})
    in_specs = [P(DATA_AXIS), P(DATA_AXIS), p_spec]
    if has_warm:
        in_specs.append(P(DATA_AXIS))
    if has_blobs:
        in_specs.append(GaussianObstacles(
            cx=P(DATA_AXIS), cy=P(DATA_AXIS),
            gamma=P(DATA_AXIS), w=P(DATA_AXIS)))
    out_spec = SolveResult(us=P(DATA_AXIS), zs=P(DATA_AXIS),
                           cost=P(DATA_AXIS), converged=P(DATA_AXIS),
                           n_iters=P(DATA_AXIS), grad_norm=P(DATA_AXIS),
                           reg=P(DATA_AXIS))

    def body(z0s, coeffs, p, *rest):
        i = 0
        u_init = None
        blobs = None
        if has_warm:
            u_init = rest[i]
            i += 1
        if has_blobs:
            blobs = rest[i]
        return batch_solve_lane(z0s, coeffs, p, cfg, u_init=u_init,
                                blobs=blobs)

    fn = jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=out_spec, check_vma=False)
    return jax.jit(fn)


def sharded_batch_solve(mesh, z0s: jnp.ndarray, coeffs: jnp.ndarray,
                        p: MPCParams, cfg: SolverConfig, u_init=None,
                        blobs=None) -> SolveResult:
    """`batch_solve_lane` sharded over the mesh's data axis: each device
    solves B/D robots with the lane-major solver (the megakernel on TPU).
    Per-robot results stay sharded on their devices until fetched.

    MPCParams leaves shaped (B,) shard with the batch (per-robot wheelbase
    / weight sweeps); scalars replicate. Requires B divisible by the data
    axis (and, for the TPU megakernel, B/D divisible by 128)."""
    import dataclasses as _dc

    import numpy as _np

    B = z0s.shape[0]
    n_data = mesh.shape[DATA_AXIS]
    if B % n_data:
        raise ValueError(f"batch {B} not divisible by data axis {n_data}")
    sharded = tuple(sorted(
        f.name for f in _dc.fields(MPCParams)
        if _np.ndim(getattr(p, f.name)) >= 1
        and _np.shape(getattr(p, f.name))[0] == B))
    fn = _sharded_lane_jit(mesh, cfg, sharded, u_init is not None,
                           blobs is not None)
    args = [z0s, coeffs, p]
    if u_init is not None:
        args.append(u_init)
    if blobs is not None:
        args.append(blobs)
    return fn(*args)
