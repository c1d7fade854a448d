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


class LQRFactorization(NamedTuple):
    """Quadratic part of the Riccati recursion, reusable across re-solves.

    In ADMM-around-LQR (`solvers/mpc_qp_stagewise.py`) the quadratic data
    (A, B, Q, R, QN) is constant within a phase -- only the linear terms
    (q, r, qN) change per iteration.  Factoring once and re-solving with
    matvec-sized backward/forward passes removes every per-iteration matrix
    product and inverse (the 13x13 / 6x6 class).
    """

    A: jnp.ndarray  # (Nt, n, n)
    B: jnp.ndarray  # (Nt, n, m)
    c: jnp.ndarray  # (Nt, n)
    P: jnp.ndarray  # (Nt+1, n, n) value Hessians
    K: jnp.ndarray  # (Nt, m, n) feedback gains
    Quu_inv: jnp.ndarray  # (Nt, m, m)
    F: jnp.ndarray  # (Nt, n, n) closed loop A - B K
    PC: jnp.ndarray  # (Nt, n) P_{t+1} c_t (constant linear contribution)


def lqr_factor(A, B, c, Q, R, QN) -> LQRFactorization:
    """Backward Riccati sweep on the quadratic data only.

    Q may be (Nt, n, n) or (n, n) broadcast; same for R.
    """
    Nt, n, m = B.shape
    Q = jnp.broadcast_to(Q, (Nt, n, n))
    R = jnp.broadcast_to(R, (Nt, m, m))

    def step(P_next, inp):
        A_t, B_t, Q_t, R_t = inp
        BtP = B_t.T @ P_next
        Quu = R_t + BtP @ B_t
        Quu_inv = jnp.linalg.inv(Quu)
        Qux = BtP @ A_t
        K = Quu_inv @ Qux
        P = Q_t + A_t.T @ P_next @ A_t - Qux.T @ K
        P = 0.5 * (P + P.T)
        return P, (P, K, Quu_inv)

    _, (Ps, Ks, Quu_invs) = jax.lax.scan(
        step, QN, (A, B, Q, R), reverse=True
    )
    P_all = jnp.concatenate([Ps, QN[None]], axis=0)
    F = A - jnp.einsum("tnm,tmk->tnk", B, Ks)
    PC = jnp.einsum("tij,tj->ti", P_all[1:], c)
    return LQRFactorization(
        A=A, B=B, c=c, P=P_all, K=Ks, Quu_inv=Quu_invs, F=F, PC=PC
    )


def lqr_resolve(fact: LQRFactorization, q, r, qN, x0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve the LQR with new linear terms against an existing factorization.

    Backward pass (vectors only):
        w_t  = P_{t+1} c_t + p_{t+1}
        k_t  = Quu_inv_t (r_t + B_t' w_t)
        p_t  = q_t + F_t' w_t - K_t' r_t
    Forward pass:
        u_t = -K_t x_t - k_t,   x_{t+1} = F_t x_t + c_t - B_t k_t
    """

    def bwd(p_next, inp):
        F_t, B_t, K_t, Quu_inv_t, PC_t, q_t, r_t = inp
        w = PC_t + p_next
        k = Quu_inv_t @ (r_t + B_t.T @ w)
        p = q_t + F_t.T @ w - K_t.T @ r_t
        return p, k

    _, ks = jax.lax.scan(
        bwd, qN, (fact.F, fact.B, fact.K, fact.Quu_inv, fact.PC, q, r),
        reverse=True,
    )

    def fwd(x, inp):
        F_t, B_t, c_t, K_t, k_t = inp
        u = -K_t @ x - k_t
        x_next = F_t @ x + c_t - B_t @ k_t
        return x_next, (x, u)

    x_last, (Xs, Us) = jax.lax.scan(
        fwd, x0, (fact.F, fact.B, fact.c, fact.K, ks)
    )
    X = jnp.concatenate([Xs, x_last[None]], axis=0)
    return X, Us


def lqr_resolve_assoc(
    fact: LQRFactorization, q, r, qN, x0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`lqr_resolve` with both passes as associative scans (O(log Nt) depth).

    Given the factorization, the backward pass is the *affine* recursion

        p_t = F_t' p_{t+1} + g_t,   g_t = q_t + F_t' PC_t - K_t' r_t,

    and the forward pass is x_{t+1} = F_t x_t + (c_t - B_t k_t) -- both are
    compositions of affine maps, so each becomes one
    `jax.lax.associative_scan` whose combine steps are large batched
    matmuls over the whole horizon (MXU work) instead of 2*Nt sequential
    matvec kernels.  This is what makes a *batched* long-horizon ADMM
    iteration launch-overhead-free: per iteration the sequential depth is
    O(log Nt), with every level a (B*Nt/2^k, n, n) matmul.

    Exact same math as `lqr_resolve` (tests assert equality to fp tolerance).
    """
    mv = lambda M, v: jnp.einsum("...ij,...j->...i", M, v)

    # ---- backward: suffix composition p_t = (M_t o ... o M_{Nt-1})(qN) ----
    Ft_T = jnp.swapaxes(fact.F, -1, -2)
    g = q + mv(Ft_T, fact.PC) - mv(jnp.swapaxes(fact.K, -1, -2), r)

    def compose_bwd(later, earlier):
        # associative_scan(reverse=True) passes the LATER-in-time block
        # first (same convention as `lqr_backward_assoc`); the suffix
        # composite applies the earlier map AFTER the later one.
        A_l, b_l = later
        A_e, b_e = earlier
        return (A_e @ A_l, mv(A_e, b_l) + b_e)

    As, bs = jax.lax.associative_scan(compose_bwd, (Ft_T, g), reverse=True, axis=0)
    p = mv(As, qN) + bs  # p_t for t = 0..Nt-1
    p_next = jnp.concatenate([p[1:], qN[None]], axis=0)  # p_{t+1}
    ks = mv(fact.Quu_inv, r + mv(jnp.swapaxes(fact.B, -1, -2), fact.PC + p_next))

    # ---- forward: prefix composition x_{t+1} = (M~_t o ... o M~_0)(x0) ----
    d = fact.c - mv(fact.B, ks)

    def compose_fwd(a, b):
        # a = earlier, b = later; composite applies b AFTER a.
        A_a, b_a = a
        A_b, b_b = b
        return (A_b @ A_a, mv(A_b, b_a) + b_b)

    Fs, fs = jax.lax.associative_scan(compose_fwd, (fact.F, d), axis=0)
    X_tail = mv(Fs, x0) + fs  # x_1..x_Nt
    X = jnp.concatenate([x0[None], X_tail], axis=0)
    U = -mv(fact.K, X[:-1]) - ks
    return X, U


def lqr_factor_assoc(A, B, c, Q, R, QN) -> LQRFactorization:
    """`lqr_factor` with the value-Hessian pass parallel-in-horizon.

    P_t comes from `lqr_backward_assoc` (associative scan over value
    elements); the gains (K, Quu_inv) then depend only on P_{t+1} per
    stage, so they are one batched solve over all stages at once.  Linear
    terms are irrelevant to the quadratic factorization and passed as 0.
    """
    Nt, n, m = B.shape
    Q = jnp.broadcast_to(Q, (Nt, n, n))
    R = jnp.broadcast_to(R, (Nt, m, m))
    zeros_q = jnp.zeros((Nt, n), A.dtype)
    zeros_r = jnp.zeros((Nt, m), A.dtype)
    prob = LQRProblem(
        A=A, B=B, c=c, Q=Q, q=zeros_q, R=R, r=zeros_r,
        QN=QN, qN=jnp.zeros(n, A.dtype), x0=jnp.zeros(n, A.dtype),
    )
    P_all, _ = lqr_backward_assoc(prob)
    P_next = P_all[1:]
    BtP = jnp.einsum("tnm,tnk->tmk", B, P_next)  # B_t' P_{t+1}
    Quu = R + BtP @ B
    Qux = BtP @ A
    Quu_inv = jnp.linalg.inv(Quu)
    K = Quu_inv @ Qux
    F = A - B @ K
    PC = jnp.einsum("tij,tj->ti", P_next, c)
    return LQRFactorization(
        A=A, B=B, c=c, P=P_all, K=K, Quu_inv=Quu_inv, F=F, PC=PC
    )


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
