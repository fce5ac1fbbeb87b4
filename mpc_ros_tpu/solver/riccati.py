"""Horizon-parallel Riccati factorization via `jax.lax.associative_scan`.

The reference's CppAD/Ipopt stack scales superlinearly in the horizon N with
zero time-axis parallelism (SURVEY.md §5.7); the sequential Riccati recursion
in `ilqr.backward_pass` is O(N) depth. This module factorizes the SAME value
recursion in O(log N) depth by composing value-propagation maps with an
associative operator — the time-axis analog of parallel prefix sums, after
Sarkka & Garcia-Fernandez, "Temporal Parallelization of Bayesian Smoothers"
(IEEE TAC 2021), applied to LQT.

Math. The unconstrained stage elimination
    V_k(x) = min_u [ 1/2 x'Xx + r'x + 1/2 u'Ru + q'u + u'Mx + V_{k+1}(Ax+Bu) ]
is a linear-fractional map V_{k+1} -> V_k. Completing the square in u first
(u~ = u + R^{-1}(Mx + q)) removes cross and linear control terms:
    A^ = A - B R^{-1} M,  b^ = -B R^{-1} q,  C = B R^{-1} B',
    X^ = X - M' R^{-1} M, r^ = r - M' R^{-1} q,
after which each stage is the standard 5-tuple element
    e_k = (A^, b^, C, eta = -r^, J = X^)
with the associative combination (value convention V(x) = 1/2 x'Jx - eta'x):
    e1 (*) e2:
      A = A2 (I + C1 J2)^{-1} A1
      b = A2 (I + C1 J2)^{-1} (b1 + C1 eta2) + b2
      C = A2 (I + C1 J2)^{-1} C1 A2' + C2
      eta = A1' (I + J2 C1)^{-1} (eta2 - J2 b1) + eta1
      J = A1' (I + J2 C1)^{-1} J2 A1 + J1
A reverse associative scan then yields every value function (P_k, p_k)
simultaneously; per-stage gains follow embarrassingly parallel from the
standard Q-expansion.

This path is exact for the UNCONSTRAINED subproblem (box bounds inactive);
the control-limited sequential pass remains the default for saturated
problems. Use for long horizons (N >= 64) where the O(N) scan dominates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxqp import inv2


class LQRElement(NamedTuple):
    A: jnp.ndarray    # (..., n, n)
    b: jnp.ndarray    # (..., n)
    C: jnp.ndarray    # (..., n, n)
    eta: jnp.ndarray  # (..., n)
    J: jnp.ndarray    # (..., n, n)


def combine(e2: LQRElement, e1: LQRElement) -> LQRElement:
    """Associative combination of value-propagation elements.

    NOTE the argument order: `associative_scan(..., reverse=True)` calls the
    operator with the LATER element first; e1 spans the earlier interval.
    Batched over leading dims; inner solves are (n, n).
    """
    n = e1.A.shape[-1]
    eye = jnp.eye(n, dtype=e1.A.dtype)
    # D = (I + C1 J2)^{-1}; E = (I + J2 C1)^{-1} = D' for symmetric C1, J2
    D = jnp.linalg.solve(eye + e1.C @ e2.J, eye)
    A2D = e2.A @ D
    A = A2D @ e1.A
    b = jnp.einsum("...ij,...j->...i", A2D, e1.b
                   + jnp.einsum("...ij,...j->...i", e1.C, e2.eta)) + e2.b
    C = A2D @ e1.C @ jnp.swapaxes(e2.A, -1, -2) + e2.C
    E = jnp.swapaxes(D, -1, -2)
    A1tE = jnp.swapaxes(e1.A, -1, -2) @ E
    eta = jnp.einsum("...ij,...j->...i", A1tE,
                     e2.eta - jnp.einsum("...ij,...j->...i", e2.J, e1.b)) + e1.eta
    J = A1tE @ e2.J @ e1.A + e1.J
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    return LQRElement(A=A, b=b, C=C, eta=eta, J=J)


def make_elements(A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss,
                  ridge: float = 1e-9, free=None, d_c=None) -> LQRElement:
    """Build per-stage elements (T+1 of them; the last is the terminal).

    Shapes: A (T,n,n), B (T,n,m), l_ss (T,n,n), l_uu (T,m,m), l_us (T,m,n),
    l_s (T,n), l_u (T,m); V_s (n,), V_ss (n,n) terminal expansion.

    l_uu must be SPD; `ridge` keeps the closed-form 2x2 inverse finite when
    a caller hands in a singular control Hessian (e.g. a zero control
    weight with no regularization), instead of silently flooding every
    downstream value function with NaNs.

    Clamped-dimension elimination (the control-limited extension): with
    `free` (T, m) a 0/1 mask and `d_c` (T, m) the FIXED du values on
    clamped dims (zero on free dims), each stage is rebuilt with the
    clamped controls held constant at their bound offsets — they become
    affine dynamics/cost terms — and the square is completed over the free
    dims only. This is the exact per-stage elimination the sequential
    control-limited pass performs (ilqr.backward_pass: K rows of clamped
    dims are zero, k holds the box-QP value), expressed as scan elements.
    """
    T, n, m = B.shape
    assert m == 2, "inv2 fast path expects control dim 2"
    eye_m = jnp.eye(m, dtype=l_uu.dtype)
    if free is not None:
        # du = du_F + d_c with du_C fixed: fold the constant into the
        # linear terms, restrict the quadratic to the free block (clamped
        # rows/cols of R become identity so inv2 stays finite; their
        # l_u_eff is zero so they contribute nothing), zero clamped B cols.
        l_s = l_s + jnp.einsum("tmn,tm->tn", l_us, d_c)
        l_u = free * (l_u + jnp.einsum("tmk,tk->tm", l_uu, d_c))
        l_us = free[:, :, None] * l_us
        # F R F + diag(1 - free): clamped rows/cols become identity
        l_uu = (free[:, :, None] * free[:, None, :] * l_uu
                + (1.0 - free)[:, :, None] * eye_m)
        b0 = jnp.einsum("tnm,tm->tn", B, d_c)
        B = B * free[:, None, :]
    else:
        b0 = 0.0
    Rinv = inv2(l_uu + ridge * eye_m)                  # (T, m, m)
    BRinv = B @ Rinv                                   # (T, n, m)
    A_hat = A - BRinv @ l_us
    b_hat = b0 - jnp.einsum("tnm,tm->tn", BRinv, l_u)
    C = BRinv @ jnp.swapaxes(B, -1, -2)
    X_hat = l_ss - jnp.swapaxes(l_us, -1, -2) @ Rinv @ l_us
    r_hat = l_s - jnp.einsum("tmn,tmk,tk->tn",
                             l_us, Rinv, l_u)
    leaf = LQRElement(A=A_hat, b=b_hat, C=C, eta=-r_hat, J=X_hat)

    term = LQRElement(
        A=jnp.zeros((1, n, n), A.dtype),
        b=jnp.zeros((1, n), A.dtype),
        C=jnp.zeros((1, n, n), A.dtype),
        eta=-V_s[None],
        J=V_ss[None],
    )
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), leaf, term)


def parallel_value_functions(A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss):
    """All value functions (P_k, p_k), k = 0..T, in O(log T) depth."""
    elems = make_elements(A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss)
    acc = jax.lax.associative_scan(combine, elems, reverse=True)
    Ps = acc.J                 # (T+1, n, n)
    ps = -acc.eta              # (T+1, n)
    return Ps, ps


def parallel_gains(A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss):
    """Unconstrained LQR gains for every stage, computed in parallel.

    Returns (ks (T,m), Ks (T,m,n), Ps, ps). Equivalent to the sequential
    backward pass with inactive box bounds and mu = 0 (tested).
    """
    Ps, ps = parallel_value_functions(
        A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss)
    P_next = Ps[1:]            # (T, n, n)
    p_next = ps[1:]            # (T, n)
    Bt = jnp.swapaxes(B, -1, -2)
    Q_u = l_u + jnp.einsum("tmn,tn->tm", Bt, p_next)
    Q_uu = l_uu + Bt @ P_next @ B
    Q_us = l_us + Bt @ P_next @ A
    Quu_inv = inv2(0.5 * (Q_uu + jnp.swapaxes(Q_uu, -1, -2))
                   + 1e-9 * jnp.eye(2, dtype=Q_uu.dtype))
    ks = -jnp.einsum("tmk,tk->tm", Quu_inv, Q_u)
    Ks = -(Quu_inv @ Q_us)
    return ks, Ks, Ps, ps


def parallel_gains_boxed(A, B, l_s, l_u, l_ss, l_uu, l_us, V_s, V_ss,
                         lb_du, ub_du, mu=0.0, n_sweeps: int = 8):
    """EXACT control-limited horizon-parallel backward pass.

    Active-set iteration around the associative scan: guess each stage's
    clamp pattern (sweep 0: all free — the unconstrained scan), rebuild the
    stage elements with the clamped control dims ELIMINATED (held constant
    at their box-QP values — `make_elements(free=..., d_c=...)`), rescan
    in O(log T) depth, re-solve every stage's 2-dim box QP against the new
    value functions, and repeat. At a fixed point of the pattern the value
    functions equal the sequential control-limited pass's exactly
    (envelope argument: on the free block K'(Q_u + Q_uu k) = 0 at mu = 0,
    so the sequential Vs/Vss updates reduce to the exact partial
    minimization this elimination performs; tested under saturation in
    tests/test_riccati.py).

    mu regularizes each stage's box QP exactly like ilqr.backward_pass
    (Q_uu + mu I); for the VALUE recursion it is folded into l_uu (the
    elements need an SPD R up front), so at inflated mu gains differ from
    the sequential pass by O(mu) — same caveat as the unconstrained path.

    lb_du, ub_du: (T, m) box bounds ON THE STEP du = u - u_bar.
    Each sweep costs one scan + T box QPs; total depth O(sweeps log T).
    `n_sweeps` is a CAP: the loop exits early once the clamp pattern is
    stable (the sweep that re-derives its own pattern certifies the fixed
    point). MPC-family problems stabilize in 2-3 sweeps; adversarial
    random problems with ~2/3 of all control dims clamped were measured
    needing up to 7.

    Returns (ks, Ks, Q_u, Q_uu, free): feedforwards with clamped dims at
    their bound offsets, gains with zero clamped rows, and the final Q
    expansion for expected-improvement/projected-gradient bookkeeping.
    """
    from .boxqp import solve_boxqp_2d

    T, n, m = B.shape
    dtype = A.dtype
    eye_m = jnp.eye(m, dtype=dtype)
    l_uu_mu = l_uu + mu * eye_m
    Bt = jnp.swapaxes(B, -1, -2)

    def qp_stage(Quu_t, Qu_t, Qus_t, lbd_t, ubd_t):
        # regularize the QP only (like ilqr.backward_pass: Q_uu_reg in the
        # box QP / gains, unregularized Q_uu in the dV bookkeeping)
        k, f, Minv = solve_boxqp_2d(Quu_t + mu * eye_m, Qu_t, lbd_t, ubd_t)
        K = Minv @ (-(f[:, None] * Qus_t))
        return k, f, K

    def sweep(free, d_c):
        elems = make_elements(A, B, l_s, l_u, l_ss, l_uu_mu, l_us,
                              V_s, V_ss, free=free, d_c=d_c)
        acc = jax.lax.associative_scan(combine, elems, reverse=True)
        P_next = acc.J[1:]
        p_next = -acc.eta[1:]
        # Q expansion with the ORIGINAL (unmasked) stage quantities — the
        # per-stage QP sees the true problem, only the value functions
        # carry the elimination
        Q_u = l_u + jnp.einsum("tmn,tn->tm", Bt, p_next)
        Q_uu = l_uu + Bt @ P_next @ B
        Q_uu = 0.5 * (Q_uu + jnp.swapaxes(Q_uu, -1, -2))
        Q_us = l_us + Bt @ P_next @ A
        ks, free_n, Ks = jax.vmap(qp_stage)(Q_uu, Q_u, Q_us, lb_du, ub_du)
        return ks, Ks, Q_u, Q_uu, free_n

    def cond(carry):
        it, changed, *_ = carry
        return jnp.logical_and(it < n_sweeps, changed)

    def body(carry):
        it, _, free, d_c, _, _, _, _ = carry
        ks, Ks, Q_u, Q_uu, free_n = sweep(free, d_c)
        d_c_n = (1.0 - free_n) * ks
        # pattern stability must include WHICH bound (lo->hi flips keep
        # free at 0 but move d_c), hence the d_c comparison
        changed = jnp.logical_or(jnp.any(free_n != free),
                                 jnp.any(d_c_n != d_c))
        return (it + 1, changed, free_n, d_c_n, ks, Ks, Q_u, Q_uu)

    init = (jnp.asarray(0, jnp.int32), jnp.asarray(True),
            jnp.ones((T, m), dtype), jnp.zeros((T, m), dtype),
            jnp.zeros((T, m), dtype), jnp.zeros((T, m, n), dtype),
            jnp.zeros((T, m), dtype), jnp.zeros((T, m, m), dtype))
    (_, _, free, _, ks, Ks, Q_u, Q_uu) = jax.lax.while_loop(cond, body, init)
    return ks, Ks, Q_u, Q_uu, free
