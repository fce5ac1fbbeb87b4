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


def _polyder2_tile(c, x):
    """f''(x) — the cte row's exact state curvature for the DDP
    second-order backward pass (SolverConfig.ddp)."""
    P = c.shape[0]
    if P <= 2:
        return jnp.zeros_like(x)
    acc = float((P - 1) * (P - 2)) * c[P - 1]
    for i in range(P - 2, 1, -1):
        acc = float(i * (i - 1)) * c[i] + x * acc
    return jnp.broadcast_to(acc, x.shape)


# ---- per-lane small-matrix helpers: X, Y are (r, c, 128) jnp values ------

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
    ((128,) for the two-kernel design, (sub, 128) for the megakernel).

    Active-set enumeration over the 9 clamp combos, specialized per combo:
    a clamped dimension collapses the masked 2x2 solve to a 1-D (or 0-D)
    closed form, so the whole enumeration needs 3 reciprocals (1/a, 1/d,
    1/det) instead of 4 divisions in each combo, and the feedback matrix
    K = Minv @ (-(f*Qus)) is assembled ONCE from the selected inverse
    entries — masked-accumulating full K rows over all 9 combos was ~60%
    of the QP's vector ops (divisions + that accumulation dominated the
    backward-pass kernel time)."""
    a, b = Quu[0, 0], Quu[0, 1]
    c, d = Quu[1, 0], Quu[1, 1]
    det = a * d - b * c
    rdet = 1.0 / det
    ra = 1.0 / a
    rd = 1.0 / d
    # both-free inverse entries
    i00, i01 = d * rdet, -b * rdet
    i10, i11 = -c * rdet, a * rdet
    targ0 = {1: lbd[0], 2: ubd[0]}
    targ1 = {1: lbd[1], 2: ubd[1]}

    def lam_viol(lam, side):
        return jnp.maximum(-lam if side == 1 else lam, 0.0)

    cand_d = []
    cand_viol = []
    for c0, c1 in _COMBOS:
        if c0 == 0 and c1 == 0:
            d0 = -(i00 * Qu[0] + i01 * Qu[1])
            d1 = -(i10 * Qu[0] + i11 * Qu[1])
            viol = (jnp.maximum(lbd[0] - d0, 0.0)
                    + jnp.maximum(d0 - ubd[0], 0.0)
                    + jnp.maximum(lbd[1] - d1, 0.0)
                    + jnp.maximum(d1 - ubd[1], 0.0))
        elif c0 == 0:                      # u1 clamped, u0 free
            d1 = targ1[c1]
            d0 = -(Qu[0] + b * d1) * ra
            lam1 = Qu[1] + c * d0 + d * d1
            viol = (jnp.maximum(lbd[0] - d0, 0.0)
                    + jnp.maximum(d0 - ubd[0], 0.0)
                    + lam_viol(lam1, c1) + 1e-12)
        elif c1 == 0:                      # u0 clamped, u1 free
            d0 = targ0[c0]
            d1 = -(Qu[1] + c * d0) * rd
            lam0 = Qu[0] + a * d0 + b * d1
            viol = (jnp.maximum(lbd[1] - d1, 0.0)
                    + jnp.maximum(d1 - ubd[1], 0.0)
                    + lam_viol(lam0, c0) + 1e-12)
        else:                              # both clamped
            d0 = targ0[c0]
            d1 = targ1[c1]
            lam0 = Qu[0] + a * d0 + b * d1
            lam1 = Qu[1] + c * d0 + d * d1
            viol = lam_viol(lam0, c0) + lam_viol(lam1, c1) + 2e-12
        cand_d.append((d0, d1))
        cand_viol.append(viol)

    best_viol = cand_viol[0]
    for v in cand_viol[1:]:
        best_viol = jnp.minimum(best_viol, v)

    # winner-take-first select via masks (ties broken by combo order);
    # select scalars (step + inverse entries), not K rows
    zeros = jnp.zeros_like(best_viol)
    picked, k0, k1 = zeros, zeros, zeros
    j00, j01, j10, j11 = zeros, zeros, zeros, zeros
    for idx, (c0, c1) in enumerate(_COMBOS):
        is_best = jnp.logical_and(cand_viol[idx] <= best_viol, picked < 0.5)
        sel = is_best.astype(dtype)
        picked = picked + sel
        d0, d1 = cand_d[idx]
        k0 = k0 + sel * d0
        k1 = k1 + sel * d1
        if c0 == 0 and c1 == 0:
            j00 = j00 + sel * i00
            j01 = j01 + sel * i01
            j10 = j10 + sel * i10
            j11 = j11 + sel * i11
        elif c0 == 0:                      # only u0 free: row0 = -Qus[0]/a
            j00 = j00 + sel * ra
        elif c1 == 0:                      # only u1 free: row1 = -Qus[1]/d
            j11 = j11 + sel * rd
    k = jnp.stack([k0, k1])
    K = jnp.stack([
        -(j00[None] * Qus[0] + j01[None] * Qus[1]),
        -(j10[None] * Qus[0] + j11[None] * Qus[1]),
    ])
    return k, K
