"""LQR-structured equality-constrained QP solves via Riccati recursions.

The condensed path (`solvers/condense` inside the SQP) eliminates states and
pays O((Nt nu)^2) memory and an O((Nt nu)^3) factorization -- ideal at the
reference's Nt = 15, increasingly wasteful for long horizons.  This module
keeps the block-banded KKT structure and solves it by Riccati recursion:

  * `lqr_backward_scan` / `lqr_solve`: classic discrete-time Riccati sweep
    as a `lax.scan` -- O(Nt) tiny (13x13 / 6x6) ops.
  * `lqr_backward_assoc`: the same backward pass as a
    `jax.lax.associative_scan` over value-function elements
    (Sarkka & Garcia-Fernandez, "Temporal parallelization of Bayesian
    smoothers", 2020, applied to LQR) -- O(log Nt) depth, the
    parallel-in-horizon analogue of sequence parallelism for this workload
    (cf. PAPERS.md piMPC / parallel Riccati references).
  * `lqr_forward_assoc`: the forward rollout as an associative composition
    of affine maps, also O(log Nt) depth.

The horizon axis is this framework's "sequence length" (SURVEY.md section 5,
long-context analogue); these kernels are what makes Nt = 512 horizons
tractable on TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LQRProblem(NamedTuple):
    """min sum_t 1/2 x_t'Q_t x_t + q_t'x_t + 1/2 u_t'R_t u_t + r_t'u_t
           + 1/2 x_N'QN x_N + qN'x_N
       s.t. x_{t+1} = A_t x_t + B_t u_t + c_t,  x_0 given."""

    A: jnp.ndarray  # (Nt, n, n)
    B: jnp.ndarray  # (Nt, n, m)
    c: jnp.ndarray  # (Nt, n)
    Q: jnp.ndarray  # (Nt, n, n) stage state cost (t = 0..Nt-1)
    q: jnp.ndarray  # (Nt, n)
    R: jnp.ndarray  # (Nt, m, m)
    r: jnp.ndarray  # (Nt, m)
    QN: jnp.ndarray  # (n, n)
    qN: jnp.ndarray  # (n,)
    x0: jnp.ndarray  # (n,)


class LQRSolution(NamedTuple):
    X: jnp.ndarray  # (Nt+1, n)
    U: jnp.ndarray  # (Nt, m)
    P: jnp.ndarray  # (Nt+1, n, n) value Hessians (diagnostic / reuse)
    p: jnp.ndarray  # (Nt+1, n)


def _gains_from_value(prob: LQRProblem, P_next, p_next, t_A, t_B, t_c, t_R, t_r):
    """Stage feedback (K, k) and value update given V_{t+1}."""
    BtP = t_B.T @ P_next
    Quu = t_R + BtP @ t_B
    Qux = BtP @ t_A
    qu = t_r + BtP @ t_c + t_B.T @ p_next
    Quu_inv = jnp.linalg.inv(Quu)
    K = Quu_inv @ Qux
    k = Quu_inv @ qu
    return K, k, Qux, qu


def lqr_backward_scan(prob: LQRProblem):
    """Sequential Riccati sweep. Returns (P (Nt+1,n,n), p (Nt+1,n), K, k)."""

    def step(carry, inp):
        P_next, p_next = carry
        A, B, c, Q, q, R, r = inp
        K, k, Qux, qu = _gains_from_value(prob, P_next, p_next, A, B, c, R, r)
        AtP = A.T @ P_next
        P = Q + AtP @ A - Qux.T @ K
        P = 0.5 * (P + P.T)
        p = q + AtP @ c + A.T @ p_next - Qux.T @ k
        return (P, p), (P, p, K, k)

    (_, _), (Ps, ps, Ks, ks) = jax.lax.scan(
        step,
        (prob.QN, prob.qN),
        (prob.A, prob.B, prob.c, prob.Q, prob.q, prob.R, prob.r),
        reverse=True,
    )
    P_all = jnp.concatenate([Ps, prob.QN[None]], axis=0)
    p_all = jnp.concatenate([ps, prob.qN[None]], axis=0)
    return P_all, p_all, Ks, ks


def lqr_backward_assoc(prob: LQRProblem):
    """Parallel-in-horizon backward pass via associative scan.

    Value-function elements (A, b, C, eta, J) with the combination rule of
    Sarkka & Garcia-Fernandez (2020); the scanned prefix products yield
    V_t for every t in O(log Nt) depth.
    """
    n = prob.A.shape[-1]
    eye = jnp.eye(n, dtype=prob.A.dtype)

    # Per-stage elements (A, b, C, eta, J): the conditional value message of
    # one stage with the control optimized out.  Convention:
    # V(x) = 1/2 x'Jx - eta'x, so eta = -q for stage cost +q'x.
    def make_element(A, B, c, Q, q, R, r):
        Rinv = jnp.linalg.inv(R)
        C = B @ Rinv @ B.T
        b = c - B @ (Rinv @ r)
        return (A, b, C, -q, Q)

    elems = jax.vmap(make_element)(
        prob.A, prob.B, prob.c, prob.Q, prob.q, prob.R, prob.r
    )

    mv = lambda M, v: jnp.einsum("...ij,...j->...i", M, v)
    mT = lambda M: jnp.swapaxes(M, -1, -2)

    def combine(e_later, e_earlier):
        # associative_scan(reverse=True) accumulates suffixes: the first
        # argument is the block LATER in time.  Combination rule of Sarkka &
        # Garcia-Fernandez (2020), i = earlier, j = later.
        A_j, b_j, C_j, eta_j, J_j = e_later
        A_i, b_i, C_i, eta_i, J_i = e_earlier
        M = jnp.linalg.inv(eye + C_i @ J_j)
        AjM = A_j @ M
        A_new = AjM @ A_i
        b_new = mv(AjM, b_i + mv(C_i, eta_j)) + b_j
        C_new = AjM @ C_i @ mT(A_j) + C_j
        N_ = jnp.linalg.inv(eye + J_j @ C_i)
        eta_new = mv(mT(A_i) @ N_, eta_j - mv(J_j, b_i)) + eta_i
        J_new = mT(A_i) @ N_ @ J_j @ A_i + J_i
        return (A_new, b_new, C_new, eta_new, J_new)

    # terminal element: V_N(x) = 1/2 x'QN x + qN'x  ->  (0,0,0,-qN,QN)
    term = (
        jnp.zeros((1, n, n), prob.A.dtype),
        jnp.zeros((1, n), prob.A.dtype),
        jnp.zeros((1, n, n), prob.A.dtype),
        -prob.qN[None],
        prob.QN[None],
    )
    all_elems = jax.tree.map(
        lambda e, t: jnp.concatenate([e, t], axis=0), elems, term
    )
    scanned = jax.lax.associative_scan(combine, all_elems, reverse=True, axis=0)
    _, _, _, etas, Js = scanned
    # back to the V(x) = 1/2 x'Px + p'x convention of the sequential sweep
    return Js, -etas


def lqr_forward(prob: LQRProblem, P_all, p_all):
    """Forward rollout given value functions; sequential scan."""

    def step(x, inp):
        A, B, c, R, r, P_next, p_next = inp
        K, k, _, _ = _gains_from_value(prob, P_next, p_next, A, B, c, R, r)
        u = -K @ x - k
        x_next = A @ x + B @ u + c
        return x_next, (x, u)

    _, (Xs, Us) = jax.lax.scan(
        step,
        prob.x0,
        (prob.A, prob.B, prob.c, prob.R, prob.r, P_all[1:], p_all[1:]),
    )
    x_last = prob.A[-1] @ Xs[-1] + prob.B[-1] @ Us[-1] + prob.c[-1]
    X = jnp.concatenate([Xs, x_last[None]], axis=0)
    return X, Us


def lqr_forward_assoc(prob: LQRProblem, P_all, p_all):
    """Forward rollout as an associative composition of affine maps."""
    n = prob.A.shape[-1]

    def closed_loop(A, B, c, R, r, P_next, p_next):
        K, k, _, _ = _gains_from_value(prob, P_next, p_next, A, B, c, R, r)
        F = A - B @ K
        f = c - B @ k
        return F, f, K, k

    F, f, K, k = jax.vmap(closed_loop)(
        prob.A, prob.B, prob.c, prob.R, prob.r, P_all[1:], p_all[1:]
    )

    def compose(e_i, e_j):
        # x -> F_j (F_i x + f_i) + f_j; leaves may carry batch axes.
        F_i, f_i = e_i
        F_j, f_j = e_j
        return (F_j @ F_i, jnp.einsum("...ij,...j->...i", F_j, f_i) + f_j)

    Fs, fs = jax.lax.associative_scan(compose, (F, f), axis=0)
    X_tail = jnp.einsum("tij,j->ti", Fs, prob.x0) + fs  # x_1..x_Nt
    X = jnp.concatenate([prob.x0[None], X_tail], axis=0)
    U = -jnp.einsum("tij,tj->ti", K, X[:-1]) - k
    return X, U


def lqr_solve(prob: LQRProblem, mode: str = "scan") -> LQRSolution:
    """Solve the LQR problem exactly.  mode: 'scan' | 'assoc'."""
    if mode == "scan":
        P_all, p_all, _, _ = lqr_backward_scan(prob)
        X, U = lqr_forward(prob, P_all, p_all)
    elif mode == "assoc":
        P_all, p_all = lqr_backward_assoc(prob)
        X, U = lqr_forward_assoc(prob, P_all, p_all)
    else:
        raise ValueError(f"unknown mode {mode}")
    return LQRSolution(X=X, U=U, P=P_all, p=p_all)
