"""Shared Pallas tile helpers for the NMPC kernels.

Per-lane small-matrix arithmetic on (r, c, V)-shaped values (V = the
per-lane tile shape: (128,) historically, (sub, 128) in the wide-tile
megakernel), Horner polynomial evaluation of the reference path, and the
exact 9-combo 2-dim box QP. Consumed by kernels/backward_fused_pallas.py,
kernels/forward_pallas.py and kernels/solve_pallas.py; the standalone
(non-fused) backward kernel that originally lived here was superseded by
the fused designs and removed.

Layout rationale: batch on the 128 vector lanes (minor axis), small
state/control dims unrolled as tile-row arithmetic — every 8x8-per-lane
matmul is 64 broadcast-FMAs on lane tiles (pure VPU; there is nothing for
the MXU here since each lane owns a different matrix).
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp

_N = 8
_M = 2
_LANES = 128
_COMBOS = list(itertools.product(range(3), repeat=2))


def _polyval_tile(c, x):
    """Horner evaluation of f(x) = sum_i c[i] x^i on per-lane tiles.
    c: (P, V...) coefficient rows, x: (V...) — any polynomial order
    (the reference's cubic is just P=4)."""
    P = c.shape[0]
    acc = c[P - 1]
    for i in range(P - 2, -1, -1):
        acc = c[i] + x * acc
    return jnp.broadcast_to(acc, x.shape)


def _polyder_tile(c, x):
    """f'(x) for the same representation (zero for constant polys)."""
    P = c.shape[0]
    if P == 1:
        return jnp.zeros_like(x)
    acc = (P - 1.0) * c[P - 1]
    for i in range(P - 2, 0, -1):
        acc = float(i) * c[i] + x * acc
    return jnp.broadcast_to(acc, x.shape)


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
