"""Pallas TPU kernel: fused control-limited Riccati backward scan.

The XLA lane-major backward pass (solver/batch_lane.py) is memory-bound in
principle (~3 flop/byte) but measured ~1% of the HBM roofline: a T-step
`lax.scan` pays per-step scheduling overhead that dwarfs the 3 MB/step of
useful traffic. This kernel fuses the WHOLE scan: one program per 128-lane
batch tile holds the value-function carry (Vs (8,128), Vss (8,8,128)) in
VMEM/registers and walks all T stages in an on-chip `fori_loop` — per-stage
quadratics stream through VMEM blocks once, no inter-step barriers.

Layout: batch on the 128 vector lanes (minor axis), small state/control
dims unrolled as (8, 128)-tile row arithmetic — every 8x8-per-lane matmul
is 64 broadcast-FMAs on (8, 128) tiles (pure VPU; there is nothing for the
MXU here since each lane owns a different matrix).

Same math as `_backward_bl` (tested equal): per-stage exact 2-dim box QP by
active-set enumeration, masked feedback rows, expected-improvement terms
and projected gradient.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_N = 8
_M = 2
_LANES = 128
_COMBOS = list(itertools.product(range(3), repeat=2))


# ---- per-lane small-matrix helpers: X, Y are (r, c, 128) jnp values ------

def _mm(X, Y, r, k, c):
    """Z[i,j] = sum_m X[i,m] Y[m,j]; X (r,k,128), Y (k,c,128) -> (r,c,128)."""
    rows = []
    for i in range(r):
        acc = X[i, 0][None, :] * Y[0]
        for m in range(1, k):
            acc = acc + X[i, m][None, :] * Y[m]
        rows.append(acc)
    return jnp.stack(rows)


def _mtm(X, Y, r, k, c):
    """Z[i,j] = sum_m X[m,i] Y[m,j]; X (k,r,128), Y (k,c,128) -> (r,c,128)."""
    rows = []
    for i in range(r):
        acc = X[0, i][None, :] * Y[0]
        for m in range(1, k):
            acc = acc + X[m, i][None, :] * Y[m]
        rows.append(acc)
    return jnp.stack(rows)


def _mtv(X, v, r, k):
    """y[i] = sum_m X[m,i] v[m]; X (k,r,128), v (k,128) -> (r,128)."""
    return jnp.stack(
        [sum(X[m, i] * v[m] for m in range(k)) for i in range(r)])


def _mv(X, v, r, k):
    """y[i] = sum_m X[i,m] v[m]; X (r,k,128), v (k,128) -> (r,128)."""
    return jnp.stack(
        [sum(X[i, m] * v[m] for m in range(k)) for i in range(r)])


def _boxqp_tile(Quu, Qu, lbd, ubd, Qus, dtype):
    """Exact 2-dim box QP per lane. Quu (2,2,V), Qu (2,V), lbd/ubd (2,V),
    Qus (2,8,V) -> k (2,V), K (2,8,V), where V is any per-lane tile shape
    ((128,) for the two-kernel design, (sub, 128) for the megakernel)."""
    a, b = Quu[0, 0], Quu[0, 1]
    c, d = Quu[1, 0], Quu[1, 1]

    cand_d = []
    cand_viol = []
    cand_inv = []
    cand_free = []
    for c0, c1 in _COMBOS:
        f0 = 1.0 if c0 == 0 else 0.0
        f1 = 1.0 if c1 == 0 else 0.0
        # clamp targets
        d0c = jnp.zeros_like(Qu[0]) if c0 == 0 else (lbd[0] if c0 == 1 else ubd[0])
        d1c = jnp.zeros_like(Qu[1]) if c1 == 0 else (lbd[1] if c1 == 1 else ubd[1])
        # masked system M = Q*ff + diag(1-f); closed-form 2x2 inverse
        m00 = a * f0 * f0 + (1.0 - f0)
        m01 = b * f0 * f1
        m10 = c * f1 * f0
        m11 = d * f1 * f1 + (1.0 - f1)
        det = m00 * m11 - m01 * m10
        i00, i01 = m11 / det, -m01 / det
        i10, i11 = -m10 / det, m00 / det
        # rhs = f * (-(q + Q d_c)) + (1-f) d_c
        qd0 = a * d0c + b * d1c
        qd1 = c * d0c + d * d1c
        r0 = f0 * (-(Qu[0] + qd0)) + (1.0 - f0) * d0c
        r1 = f1 * (-(Qu[1] + qd1)) + (1.0 - f1) * d1c
        d0 = i00 * r0 + i01 * r1
        d1 = i10 * r0 + i11 * r1
        lam0 = Qu[0] + a * d0 + b * d1
        lam1 = Qu[1] + c * d0 + d * d1
        viol = (f0 * (jnp.maximum(lbd[0] - d0, 0.0) + jnp.maximum(d0 - ubd[0], 0.0))
                + f1 * (jnp.maximum(lbd[1] - d1, 0.0) + jnp.maximum(d1 - ubd[1], 0.0)))
        if c0 == 1:
            viol = viol + jnp.maximum(-lam0, 0.0)
        elif c0 == 2:
            viol = viol + jnp.maximum(lam0, 0.0)
        if c1 == 1:
            viol = viol + jnp.maximum(-lam1, 0.0)
        elif c1 == 2:
            viol = viol + jnp.maximum(lam1, 0.0)
        viol = viol + (2.0 - f0 - f1) * 1e-12
        cand_d.append((d0, d1))
        cand_viol.append(viol)
        cand_inv.append((i00, i01, i10, i11, f0, f1))
        cand_free.append((f0, f1))

    best_viol = cand_viol[0]
    for v in cand_viol[1:]:
        best_viol = jnp.minimum(best_viol, v)

    # winner-take-first select via masks (ties broken by combo order)
    picked = jnp.zeros_like(best_viol)
    k0 = jnp.zeros_like(best_viol)
    k1 = jnp.zeros_like(best_viol)
    Krows = [jnp.zeros((_N,) + best_viol.shape, dtype),
             jnp.zeros((_N,) + best_viol.shape, dtype)]
    for idx, (c0c1) in enumerate(_COMBOS):
        is_best = jnp.logical_and(cand_viol[idx] <= best_viol, picked < 0.5)
        sel = is_best.astype(dtype)
        picked = picked + sel
        d0, d1 = cand_d[idx]
        k0 = k0 + sel * d0
        k1 = k1 + sel * d1
        i00, i01, i10, i11, f0, f1 = cand_inv[idx]
        # K = Minv @ (-(f * Qus)): rows for clamped dims are zero
        r0 = -(i00[None] * f0 * Qus[0] + i01[None] * f1 * Qus[1])
        r1 = -(i10[None] * f0 * Qus[0] + i11[None] * f1 * Qus[1])
        Krows[0] = Krows[0] + sel[None] * r0
        Krows[1] = Krows[1] + sel[None] * r1
    k = jnp.stack([k0, k1])
    K = jnp.stack(Krows)
    return k, K


def _backward_kernel(T: int, dtype, A_ref, B_ref, ls_ref, lu_ref, lss_ref,
                     luu_ref, lus_ref, us_ref, Vs0_ref, Vss0_ref, lb_ref,
                     ub_ref, mu_ref, ks_ref, Ks_ref, dv1_ref, dv2_ref,
                     pg_ref):
    lb = lb_ref[...]            # (2, 128)
    ub = ub_ref[...]
    mu = mu_ref[...]            # (1, 128)

    Vs0 = Vs0_ref[...]
    Vss0 = Vss0_ref[...]
    zero = jnp.zeros((1, _LANES), dtype)

    def body(i, carry):
        Vs, Vss, dv1, dv2, pg = carry
        t = jnp.asarray(T - 1, jnp.int32) - i
        A_t = A_ref[t]          # (8, 8, 128)
        B_t = B_ref[t]          # (8, 2, 128)
        ls = ls_ref[t]          # (8, 128)
        lu = lu_ref[t]          # (2, 128)
        lss = lss_ref[t]        # (8, 8, 128)
        luu = luu_ref[t]        # (2, 2, 128)
        lus = lus_ref[t]        # (2, 8, 128)
        u_t = us_ref[t]         # (2, 128)

        Qs = ls + _mtv(A_t, Vs, _N, _N)
        Qu = lu + _mtv(B_t, Vs, _M, _N)
        VA = _mm(Vss, A_t, _N, _N, _N)
        Qss = lss + _mtm(A_t, VA, _N, _N, _N)
        Qus = lus + _mtm(B_t, VA, _M, _N, _N)
        VB = _mm(Vss, B_t, _N, _N, _M)
        Quu = luu + _mtm(B_t, VB, _M, _N, _M)
        # symmetrize; QP uses the regularized matrix, value updates the raw
        # one (matches solver/batch_lane._backward_bl exactly)
        offd = 0.5 * (Quu[0, 1] + Quu[1, 0])
        Quu = jnp.stack([
            jnp.stack([Quu[0, 0], offd]),
            jnp.stack([offd, Quu[1, 1]]),
        ])
        Quu_reg = jnp.stack([
            jnp.stack([Quu[0, 0] + mu[0], Quu[0, 1]]),
            jnp.stack([Quu[1, 0], Quu[1, 1] + mu[0]]),
        ])

        lbd = lb - u_t
        ubd = ub - u_t
        k, K = _boxqp_tile(Quu_reg, Qu, lbd, ubd, Qus, dtype)

        Quu_k = _mv(Quu, k, _M, _M)
        KtQuuk = _mtv(K, Quu_k, _N, _M)
        KtQu = _mtv(K, Qu, _N, _M)
        Qust_k = _mtv(Qus, k, _N, _M)
        Vs_n = Qs + KtQuuk + KtQu + Qust_k

        # K (2,8,128): KtQuu[i,j] = sum_m K[m,i] Quu[m,j]
        KtQuu = _mtm(K, Quu, _N, _M, _M)
        KtQuuK = _mm(KtQuu, K, _N, _M, _N)     # (8,8,128)
        KtQus = _mtm(K, Qus, _N, _M, _N)
        QustK = _mtm(Qus, K, _N, _M, _N)
        Vss_n = Qss + KtQuuK + KtQus + QustK
        # symmetrize
        Vss_n = 0.5 * (Vss_n + Vss_n.transpose(1, 0, 2))

        # write gains
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
        0, T, body, (Vs0, Vss0, zero, zero, zero))
    dv1_ref[...] = dv1
    dv2_ref[...] = dv2
    pg_ref[...] = pg


def backward_pallas(A, Bm, l_s, l_u, l_ss, l_uu, l_us, us, V_s, V_ss,
                    lb, ub, mu, *, interpret: bool = False):
    """Fused backward pass. Batch-last inputs:
    A (T,8,8,B), Bm (T,8,2,B), l_s (T,8,B), l_u (T,2,B), l_ss (T,8,8,B),
    l_uu (T,2,2,B), l_us (T,2,8,B), us (T,2,B), V_s (8,B), V_ss (8,8,B),
    lb/ub (2,B), mu (B,). B must be a multiple of 128.

    Returns ks (T,2,B), Ks (T,2,8,B), dV1 (B,), dV2 (B,), pg (B,).
    """
    T = us.shape[0]
    B = us.shape[-1]
    assert B % _LANES == 0, f"batch {B} must be a multiple of {_LANES}"
    dtype = A.dtype
    grid = (B // _LANES,)

    def lane_spec(*dims):
        ndim = len(dims)
        return pl.BlockSpec(
            dims + (_LANES,),
            lambda i, nd=ndim: (0,) * nd + (i,),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(_backward_kernel, T, dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec(T, _N, _N),    # A
            lane_spec(T, _N, _M),    # B
            lane_spec(T, _N),        # l_s
            lane_spec(T, _M),        # l_u
            lane_spec(T, _N, _N),    # l_ss
            lane_spec(T, _M, _M),    # l_uu
            lane_spec(T, _M, _N),    # l_us
            lane_spec(T, _M),        # us
            lane_spec(_N),           # V_s
            lane_spec(_N, _N),       # V_ss
            lane_spec(_M),           # lb
            lane_spec(_M),           # ub
            lane_spec(1),            # mu (1, B)
        ],
        out_specs=[
            lane_spec(T, _M),        # ks
            lane_spec(T, _M, _N),    # Ks
            lane_spec(1),            # dV1
            lane_spec(1),            # dV2
            lane_spec(1),            # pg
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, _M, B), dtype),
            jax.ShapeDtypeStruct((T, _M, _N, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
        ],
        interpret=interpret,
    )(A, Bm, l_s, l_u, l_ss, l_uu, l_us, us, V_s, V_ss, lb, ub, mu[None])
    ks, Ks, dv1, dv2, pg = out
    return ks, Ks, dv1[0], dv2[0], pg[0]
