"""Pallas TPU kernel: fused multi-alpha forward pass + line-search select.

One kernel per 128-lane batch tile does, entirely on-chip:
  1. closed-loop rollouts for ALL line-search step sizes (carry
     (n_alpha*8, 128); candidate trajectories parked in VMEM scratch —
     ~1 MB at T=29, n_alpha=8),
  2. the FG_eval stage-cost accumulation per candidate,
  3. per-lane acceptance (largest alpha with a cost decrease) and
  4. the masked update: lanes that are done or rejected emit their previous
     trajectory unchanged.

This replaces, per SQP iteration: the XLA forward scan (T sequential steps
over an (n_alpha, 8, B) carry), the all-candidate trajectory materialization
to HBM (~150 MB round trip), the one-hot selection einsums, and the
full-array `where` masking — the dominant cost after the backward kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .backward_pallas import _polyval_tile
from .backward_fused_pallas import (N_PAR, P_DT, P_RCTE, P_RETH, P_RVEL,
                                    P_WACC, P_WANG, P_WCTE, P_WDACC,
                                    P_WDANG, P_WETH, P_WVEL)

_N = 8
_M = 2
_LANES = 128


def _kernel(T: int, n_alpha: int, sign: float, dtype,
            ss_ref, us_ref, ks_ref, Ks_ref, c_ref, par_ref, lb_ref, ub_ref,
            cost_ref, act_ref,
            ss_out, us_out, cost_out, acc_out,
            s_scr):
    par = par_ref[...]
    lb = lb_ref[...]
    ub = ub_ref[...]
    cf = c_ref[...]
    dt = par[P_DT]
    cost_prev = cost_ref[0]
    act = act_ref[0]

    alphas = [0.5 ** j for j in range(n_alpha)]

    # initial state replicated across alphas: scratch row layout (a*8+i)
    s0 = ss_ref[0]                    # (8, 128)
    for a in range(n_alpha):
        s_scr[pl.ds(a * _N, _N)] = s0

    def stage_cost(s_rows, u_rows, rate):
        v = s_rows[3]
        cte = s_rows[4]
        eth = s_rows[5]
        du0 = u_rows[0] - s_rows[6]
        du1 = u_rows[1] - s_rows[7]
        return (par[P_WCTE] * (cte - par[P_RCTE]) ** 2
                + par[P_WETH] * (eth - par[P_RETH]) ** 2
                + par[P_WVEL] * (v - par[P_RVEL]) ** 2
                + par[P_WANG] * u_rows[0] ** 2 + par[P_WACC] * u_rows[1] ** 2
                + rate * (par[P_WDANG] * du0 ** 2 + par[P_WDACC] * du1 ** 2))

    def term_cost(s_rows):
        return (par[P_WCTE] * (s_rows[4] - par[P_RCTE]) ** 2
                + par[P_WETH] * (s_rows[5] - par[P_RETH]) ** 2
                + par[P_WVEL] * (s_rows[3] - par[P_RVEL]) ** 2)

    def roll_body(t, accs):
        s_b = ss_ref[t]               # (8, 128)
        u_b = us_ref[t]               # (2, 128)
        k = ks_ref[t]                 # (2, 128)
        K = Ks_ref[t]                 # (2, 8, 128)
        rate = jnp.where(t >= 1, 1.0, 0.0).astype(dtype)
        new_accs = []
        for a in range(n_alpha):
            s_a = s_scr[pl.ds(a * _N, _N)]       # (8, 128)
            ds = s_a - s_b
            # NOTE: unlike the megakernel, K arrives as an INPUT here, so
            # the col-4 structural zero of the real backward pass is not a
            # contract of this kernel — the full sum stays
            u0 = u_b[0] + alphas[a] * k[0] + sum(
                K[0, j] * ds[j] for j in range(_N))
            u1 = u_b[1] + alphas[a] * k[1] + sum(
                K[1, j] * ds[j] for j in range(_N))
            u0 = jnp.clip(u0, lb[0], ub[0])
            u1 = jnp.clip(u1, lb[1], ub[1])
            new_accs.append(accs[a] + stage_cost(s_a, (u0, u1), rate))
            # dynamics step
            x, y, th, v, cte, eth = (s_a[i] for i in range(6))
            f0 = _polyval_tile(cf, x)
            s_n = jnp.stack([
                x + v * jnp.cos(th) * dt,
                y + v * jnp.sin(th) * dt,
                th + u0 * dt,
                v + u1 * dt,
                (f0 - y) + sign * v * jnp.sin(eth) * dt,
                eth + u0 * dt,
                u0,
                u1,
            ])
            s_scr[pl.ds(a * _N, _N)] = s_n
        return tuple(new_accs)

    zero = jnp.zeros((_LANES,), dtype)
    # only the running states live in scratch; the winning trajectory is
    # re-rolled after selection (2x rollout compute, zero HBM candidates)
    accs = jax.lax.fori_loop(0, T, roll_body,
                             tuple(zero for _ in range(n_alpha)))
    costs = [accs[a] + term_cost(s_scr[pl.ds(a * _N, _N)])
             for a in range(n_alpha)]

    # acceptance: first (largest) alpha with a cost decrease
    picked = jnp.zeros((_LANES,), dtype)
    alpha_sel = jnp.zeros((_LANES,), dtype)
    cost_sel = cost_prev
    for a in range(n_alpha):
        improved = (costs[a] < cost_prev).astype(dtype)
        take = improved * (1.0 - jnp.minimum(picked, 1.0))
        picked = picked + take
        alpha_sel = alpha_sel + take * alphas[a]
        cost_sel = jnp.where(take > 0.5, costs[a], cost_sel)
    accepted = jnp.minimum(picked, 1.0)
    upd = accepted * act                   # only active lanes move

    # re-roll the SELECTED alpha per lane, writing outputs with masking
    ss_out[0] = s0
    s_scr[pl.ds(0, _N)] = s0

    def sel_body(t, _):
        s_b = ss_ref[t]
        u_b = us_ref[t]
        k = ks_ref[t]
        K = Ks_ref[t]
        s_a = s_scr[pl.ds(0, _N)]
        ds = s_a - s_b
        u0 = u_b[0] + alpha_sel * k[0] + sum(K[0, j] * ds[j] for j in range(_N))
        u1 = u_b[1] + alpha_sel * k[1] + sum(K[1, j] * ds[j] for j in range(_N))
        u0 = jnp.clip(u0, lb[0], ub[0])
        u1 = jnp.clip(u1, lb[1], ub[1])
        x, y, th, v, cte, eth = (s_a[i] for i in range(6))
        f0 = _polyval_tile(cf, x)
        s_n = jnp.stack([
            x + v * jnp.cos(th) * dt,
            y + v * jnp.sin(th) * dt,
            th + u0 * dt,
            v + u1 * dt,
            (f0 - y) + sign * v * jnp.sin(eth) * dt,
            eth + u0 * dt,
            u0,
            u1,
        ])
        s_scr[pl.ds(0, _N)] = s_n
        # masked writes: rejected/inactive lanes keep the old trajectory
        us_out[t] = upd[None, :] * jnp.stack([u0, u1]) \
            + (1.0 - upd)[None, :] * u_b
        ss_out[t + 1] = upd[None, :] * s_n + (1.0 - upd)[None, :] * ss_ref[t + 1]
        return 0

    jax.lax.fori_loop(0, T, sel_body, 0)
    cost_out[0] = jnp.where(upd > 0.5, cost_sel, cost_prev)
    acc_out[0] = accepted


def forward_pallas(ss_bar, us_bar, ks, Ks, coeffs, params_pack, sign,
                   lb, ub, cost_prev, act, n_alpha: int = 8,
                   *, interpret: bool = False):
    """Fused line search. Batch-last inputs: ss_bar (T+1,8,B),
    us_bar (T,2,B), ks (T,2,B), Ks (T,2,8,B), coeffs (4,B),
    params_pack (12,B), lb/ub (2,B), cost_prev (B,), act (B,) in {0,1}.

    Returns (ss_new (T+1,8,B), us_new (T,2,B), cost_new (B,),
    accepted (B,) in {0,1}) with rejected/inactive lanes passed through.
    """
    T = us_bar.shape[0]
    B = us_bar.shape[-1]
    assert B % _LANES == 0
    dtype = ss_bar.dtype
    grid = (B // _LANES,)

    def lane_spec(*dims):
        ndim = len(dims)
        return pl.BlockSpec(
            dims + (_LANES,),
            lambda i, nd=ndim: (0,) * nd + (i,),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(_kernel, T, n_alpha, float(sign), dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec(T + 1, _N),   # ss_bar
            lane_spec(T, _M),       # us_bar
            lane_spec(T, _M),       # ks
            lane_spec(T, _M, _N),   # Ks
            lane_spec(coeffs.shape[0]),  # coeffs: any polynomial order
            lane_spec(N_PAR),       # params
            lane_spec(_M),          # lb
            lane_spec(_M),          # ub
            lane_spec(1),           # cost_prev
            lane_spec(1),           # act
        ],
        out_specs=[
            lane_spec(T + 1, _N),
            lane_spec(T, _M),
            lane_spec(1),
            lane_spec(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T + 1, _N, B), dtype),
            jax.ShapeDtypeStruct((T, _M, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_alpha * _N, _LANES), dtype),
        ],
        interpret=interpret,
    )(ss_bar, us_bar, ks, Ks, coeffs, params_pack, lb, ub,
      cost_prev[None], act[None])
    ss_new, us_new, cost_new, accepted = out
    return ss_new, us_new, cost_new[0], accepted[0]
