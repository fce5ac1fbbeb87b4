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
                  ridge: float = 1e-9) -> LQRElement:
    """Build per-stage elements (T+1 of them; the last is the terminal).

    Shapes: A (T,n,n), B (T,n,m), l_ss (T,n,n), l_uu (T,m,m), l_us (T,m,n),
    l_s (T,n), l_u (T,m); V_s (n,), V_ss (n,n) terminal expansion.

    l_uu must be SPD; `ridge` keeps the closed-form 2x2 inverse finite when
    a caller hands in a singular control Hessian (e.g. a zero control
    weight with no regularization), instead of silently flooding every
    downstream value function with NaNs.
    """
    T, n, m = B.shape
    assert m == 2, "inv2 fast path expects control dim 2"
    eye_m = jnp.eye(m, dtype=l_uu.dtype)
    Rinv = inv2(l_uu + ridge * eye_m)                  # (T, m, m)
    BRinv = B @ Rinv                                   # (T, n, m)
    A_hat = A - BRinv @ l_us
    b_hat = -jnp.einsum("tnm,tm->tn", BRinv, l_u)
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
