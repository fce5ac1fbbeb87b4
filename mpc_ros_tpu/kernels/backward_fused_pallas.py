"""Pallas TPU kernel: Riccati backward scan with INLINE linearization.

Extends kernels/backward_pallas.py by computing each stage's Jacobians and
cost quadratics inside the kernel from the raw trajectory slice instead of
reading pre-materialized (T, 8, 8, B) arrays: per-iteration HBM traffic for
the backward pass drops from ~174 MB (write + read the stage arrays) to
~1.5 MB (the trajectory itself). Recomputing the linearization per stage is
~100 VPU ops per lane-tile — free next to the saved bandwidth. (The same
fusion in XLA was measured SLOWER because the per-step stacked-row builds
defeat its scan lowering; hand-scheduling in Pallas sidesteps that.)

Inputs are batch-last; parameters arrive as a packed (12, B) tile so
per-scenario weights (Monte-Carlo sweeps) work unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .backward_pallas import (_boxqp_tile, _mtm, _mtv, _mv,
                              _polyder_tile)

_N = 8
_M = 2
_LANES = 128

# packed-parameter row indices
P_WCTE, P_WETH, P_WVEL, P_WANG, P_WACC, P_WDANG, P_WDACC = range(7)
P_RVEL, P_RCTE, P_RETH, P_DT, P_LF = range(7, 12)
N_PAR = 12


def pack_params(p, B: int, dtype) -> jnp.ndarray:
    """Stack the MPCParams leaves the kernel needs into (12, B).

    Row P_LF (the bicycle wheelbase, traced/per-lane sweepable) is only
    read by the megakernel's bicycle specialization; the diff-drive
    kernels ignore it."""
    rows = [p.w_cte, p.w_etheta, p.w_vel, p.w_angvel, p.w_accel,
            p.w_angvel_d, p.w_accel_d, p.ref_vel, p.ref_cte, p.ref_etheta,
            p.dt, p.lf]
    return jnp.stack([
        jnp.broadcast_to(jnp.asarray(r, dtype), (B,)) for r in rows
    ])


def _kernel(T: int, sign: float, dtype, ss_ref, us_ref, c_ref, par_ref,
            Vs0_ref, Vss0_ref, lb_ref, ub_ref, mu_ref,
            ks_ref, Ks_ref, dv1_ref, dv2_ref, pg_ref):
    lb = lb_ref[...]
    ub = ub_ref[...]
    mu = mu_ref[...]
    par = par_ref[...]              # (12, 128)
    cf = c_ref[...]
    dt = par[P_DT]
    wv2 = 2.0 * par[P_WVEL]
    wc2 = 2.0 * par[P_WCTE]
    we2 = 2.0 * par[P_WETH]
    ww2 = 2.0 * par[P_WANG]
    wa2 = 2.0 * par[P_WACC]

    Vs0 = Vs0_ref[...]
    Vss0 = Vss0_ref[...]
    zero_t = jnp.zeros((1, _LANES), dtype)
    zeros = jnp.zeros((_LANES,), dtype)
    ones = jnp.ones((_LANES,), dtype)

    def body(i, carry):
        Vs, Vss, dv1, dv2, pg = carry
        t = jnp.asarray(T - 1, jnp.int32) - i
        s_t = ss_ref[t]             # (8, 128)
        u_t = us_ref[t]             # (2, 128)
        rate = jnp.where(t >= 1, 1.0, 0.0).astype(dtype)

        x = s_t[0]
        th = s_t[2]
        v = s_t[3]
        cte = s_t[4]
        eth = s_t[5]
        pu0 = s_t[6]
        pu1 = s_t[7]
        ct, st = jnp.cos(th), jnp.sin(th)
        ce, se = jnp.cos(eth), jnp.sin(eth)
        fp = _polyder_tile(cf, x)
        # Jacobian structure (models/diff_drive.step_jacobians): A has only
        # 15/64 nonzeros, B 5/16 — all A/B products below are hand-expanded
        # against that sparsity (~2x fewer VPU ops than generic matmuls).
        a02 = -v * st * dt          # dA x'/d theta
        a03 = ct * dt
        a12 = v * ct * dt
        a13 = st * dt
        a40 = fp
        a43 = sign * se * dt
        a45 = sign * v * ce * dt

        def At_vec(y):
            """A^T contraction over y's first axis: y (8, ...) -> (8, ...).
            Also applies to matrices (8, 8, 128) by broadcasting the scalar
            coefficients over trailing axes."""
            z = jnp.zeros_like(y[0])
            return jnp.stack([
                y[0] + a40 * y[4],
                y[1] - y[4],
                a02 * y[0] + a12 * y[1] + y[2],
                a03 * y[0] + a13 * y[1] + y[3] + a43 * y[4],
                z,
                a45 * y[4] + y[5],
                z,
                z,
            ])

        def Bt_vec(y):
            """B^T y for y (8, 128) -> (2, 128)."""
            return jnp.stack([
                dt * (y[2] + y[5]) + y[6],
                dt * y[3] + y[7],
            ])

        wdw2 = 2.0 * rate * par[P_WDANG]
        wda2 = 2.0 * rate * par[P_WDACC]
        du0 = u_t[0] - pu0
        du1 = u_t[1] - pu1
        ls = jnp.stack([
            zeros, zeros, zeros,
            wv2 * (v - par[P_RVEL]),
            wc2 * (cte - par[P_RCTE]),
            we2 * (eth - par[P_RETH]),
            -wdw2 * du0,
            -wda2 * du1,
        ])
        lu = jnp.stack([
            ww2 * u_t[0] + wdw2 * du0,
            wa2 * u_t[1] + wda2 * du1,
        ])
        lss_diag = [zeros, zeros, zeros, wv2, wc2, we2, wdw2, wda2]
        luu00 = ww2 + wdw2
        luu11 = wa2 + wda2

        # Q expansion (structured)
        Qs = ls + At_vec(Vs)
        Qu = lu + Bt_vec(Vs)
        # VA = Vss @ A: columns via A's column structure; rows stay dense
        VA_cols = [
            Vss[:, 0] + a40 * Vss[:, 4],
            Vss[:, 1] - Vss[:, 4],
            a02 * Vss[:, 0] + a12 * Vss[:, 1] + Vss[:, 2],
            a03 * Vss[:, 0] + a13 * Vss[:, 1] + Vss[:, 3] + a43 * Vss[:, 4],
            jnp.zeros_like(Vss[:, 0]),
            a45 * Vss[:, 4] + Vss[:, 5],
            jnp.zeros_like(Vss[:, 0]),
            jnp.zeros_like(Vss[:, 0]),
        ]
        VA = jnp.stack(VA_cols, axis=1)        # (8, 8, 128), rows m cols j
        AtVA = At_vec(VA)                      # A^T applied to VA's rows? no:
        # At_vec maps y (8, ...) over its ROW index; VA's row index is m,
        # which is exactly the contraction index of A^T VA — shapes (8,8,128)
        # broadcast through.
        Qss = jnp.stack([
            jnp.stack([AtVA[i, j] + (lss_diag[i] if i == j else zeros)
                       for j in range(_N)]) for i in range(_N)
        ])
        BtVA = Bt_vec(VA)                      # (2, 8, 128)
        # l_us only couples u with the prev_u slots (cols 6, 7)
        Qus = jnp.stack([
            jnp.stack([BtVA[0, j] + (-wdw2 if j == 6 else zeros)
                       for j in range(_N)]),
            jnp.stack([BtVA[1, j] + (-wda2 if j == 7 else zeros)
                       for j in range(_N)]),
        ])
        # VB = Vss @ B: columns via B's structure
        VB0 = dt * (Vss[:, 2] + Vss[:, 5]) + Vss[:, 6]   # (8, 128)
        VB1 = dt * Vss[:, 3] + Vss[:, 7]
        VB = jnp.stack([VB0, VB1], axis=1)               # (8, 2, 128)
        BtVB = Bt_vec(VB)                                # (2, 2, 128)
        offd = 0.5 * (BtVB[0, 1] + BtVB[1, 0])
        Quu = jnp.stack([
            jnp.stack([BtVB[0, 0] + luu00, offd]),
            jnp.stack([offd, BtVB[1, 1] + luu11]),
        ])
        Quu_reg = jnp.stack([
            jnp.stack([Quu[0, 0] + mu[0], Quu[0, 1]]),
            jnp.stack([Quu[1, 0], Quu[1, 1] + mu[0]]),
        ])

        lbd = lb - u_t
        ubd = ub - u_t
        k, K = _boxqp_tile(Quu_reg, Qu, lbd, ubd, Qus, dtype)

        Quu_k = _mv(Quu, k, _M, _M)
        # Vs_n = Qs + K'(Quu k + Qu) + Qus' k (one folded matvec)
        ku = jnp.stack([Quu_k[0] + Qu[0], Quu_k[1] + Qu[1]])
        Vs_n = Qs + _mtv(K, ku, _N, _M) + _mtv(Qus, k, _N, _M)
        KtQuu = _mtm(K, Quu, _N, _M, _M)
        # Vss_n = Qss + K'Quu K + K'Qus + (K'Qus)' is symmetric by
        # construction (Quu is); build only the upper triangle and mirror —
        # half the entry math and no 0.5*(V+V') pass (same rewrite as the
        # megakernel, kernels/solve_pallas.py)
        vrows = [[None] * _N for _ in range(_N)]
        for i2 in range(_N):
            for j2 in range(i2, _N):
                e = (Qss[i2, j2]
                     + KtQuu[i2, 0] * K[0, j2] + KtQuu[i2, 1] * K[1, j2]
                     + K[0, i2] * Qus[0, j2] + K[1, i2] * Qus[1, j2]
                     + K[0, j2] * Qus[0, i2] + K[1, j2] * Qus[1, i2])
                vrows[i2][j2] = e
                if j2 != i2:
                    vrows[j2][i2] = e
        Vss_n = jnp.stack([jnp.stack(r) for r in vrows])

        ks_ref[t] = k
        Ks_ref[t] = K

        dv1 = dv1 + (k[0] * Qu[0] + k[1] * Qu[1])[None]
        dv2 = dv2 + 0.5 * (k[0] * Quu_k[0] + k[1] * Quu_k[1])[None]
        pg_t = jnp.maximum(
            jnp.abs(u_t[0] - jnp.clip(u_t[0] - Qu[0], lb[0], ub[0])),
            jnp.abs(u_t[1] - jnp.clip(u_t[1] - Qu[1], lb[1], ub[1])))
        pg = jnp.maximum(pg, pg_t[None])
        return (Vs_n, Vss_n, dv1, dv2, pg)

    Vs_f, Vss_f, dv1, dv2, pg = jax.lax.fori_loop(
        0, T, body, (Vs0, Vss0, zero_t, zero_t, zero_t))
    dv1_ref[...] = dv1
    dv2_ref[...] = dv2
    pg_ref[...] = pg


def backward_fused_pallas(ss, us, coeffs, params_pack, sign, V_s, V_ss,
                          lb, ub, mu, *, interpret: bool = False):
    """Fused linearize+backward pass from the raw trajectory.

    ss (T+1,8,B), us (T,2,B), coeffs (4,B), params_pack (12,B) from
    `pack_params`, V_s (8,B), V_ss (8,8,B), lb/ub (2,B), mu (B,).
    Returns ks (T,2,B), Ks (T,2,8,B), dV1 (B,), dV2 (B,), pg (B,).
    """
    T = us.shape[0]
    B = us.shape[-1]
    assert B % _LANES == 0, f"batch {B} must be a multiple of {_LANES}"
    dtype = ss.dtype
    grid = (B // _LANES,)

    def lane_spec(*dims):
        ndim = len(dims)
        return pl.BlockSpec(
            dims + (_LANES,),
            lambda i, nd=ndim: (0,) * nd + (i,),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(_kernel, T, float(sign), dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec(T + 1, _N),    # ss
            lane_spec(T, _M),        # us
            lane_spec(coeffs.shape[0]),  # coeffs: any polynomial order
            lane_spec(N_PAR),        # params
            lane_spec(_N),           # V_s
            lane_spec(_N, _N),       # V_ss
            lane_spec(_M),           # lb
            lane_spec(_M),           # ub
            lane_spec(1),            # mu
        ],
        out_specs=[
            lane_spec(T, _M),
            lane_spec(T, _M, _N),
            lane_spec(1),
            lane_spec(1),
            lane_spec(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, _M, B), dtype),
            jax.ShapeDtypeStruct((T, _M, _N, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
        ],
        interpret=interpret,
    )(ss, us, coeffs, params_pack, V_s, V_ss, lb, ub, mu[None])
    ks, Ks, dv1, dv2, pg = out
    return ks, Ks, dv1[0], dv2[0], pg[0]
