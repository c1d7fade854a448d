"""Riccati LQR solves vs a dense KKT golden; scan vs associative variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ft_mpc_tpu.solvers.riccati import LQRProblem, lqr_solve


def random_lqr(rng, Nt=12, n=5, m=3):
    def psd(k, scale=1.0):
        L = rng.standard_normal((k, k)) * 0.3
        return L @ L.T + scale * np.eye(k)

    A = rng.standard_normal((Nt, n, n)) * 0.2 + np.eye(n) * 0.9
    B = rng.standard_normal((Nt, n, m)) * 0.4
    c = rng.standard_normal((Nt, n)) * 0.1
    Q = np.stack([psd(n, 0.5) for _ in range(Nt)])
    q = rng.standard_normal((Nt, n)) * 0.2
    R = np.stack([psd(m, 0.8) for _ in range(Nt)])
    r = rng.standard_normal((Nt, m)) * 0.2
    QN = psd(n, 1.0)
    qN = rng.standard_normal(n) * 0.2
    x0 = rng.standard_normal(n)
    return LQRProblem(*map(jnp.asarray, (A, B, c, Q, q, R, r, QN, qN, x0)))


def dense_kkt_solve(prob):
    """Golden: assemble the full equality-constrained QP KKT and solve."""
    Nt, n = prob.A.shape[0], prob.A.shape[1]
    m = prob.B.shape[2]
    A, B, c = map(np.asarray, (prob.A, prob.B, prob.c))
    Q, q, R, r = map(np.asarray, (prob.Q, prob.q, prob.R, prob.r))
    QN, qN, x0 = map(np.asarray, (prob.QN, prob.qN, prob.x0))

    # variables: x_1..x_Nt (Nt*n) then u_0..u_{Nt-1} (Nt*m)
    nx, nu = Nt * n, Nt * m
    H = np.zeros((nx + nu, nx + nu))
    g = np.zeros(nx + nu)
    for t in range(1, Nt):
        H[(t - 1) * n : t * n, (t - 1) * n : t * n] = Q[t]
        g[(t - 1) * n : t * n] = q[t]
    H[(Nt - 1) * n : Nt * n, (Nt - 1) * n : Nt * n] = QN
    g[(Nt - 1) * n : Nt * n] = qN
    for t in range(Nt):
        H[nx + t * m : nx + (t + 1) * m, nx + t * m : nx + (t + 1) * m] = R[t]
        g[nx + t * m : nx + (t + 1) * m] = r[t]

    # constraints: x_{t+1} - A x_t - B u_t = c_t
    E = np.zeros((Nt * n, nx + nu))
    d = np.zeros(Nt * n)
    for t in range(Nt):
        E[t * n : (t + 1) * n, t * n : (t + 1) * n] = np.eye(n)
        if t > 0:
            E[t * n : (t + 1) * n, (t - 1) * n : t * n] = -A[t]
        E[t * n : (t + 1) * n, nx + t * m : nx + (t + 1) * m] = -B[t]
        d[t * n : (t + 1) * n] = c[t] + (A[0] @ x0 if t == 0 else 0)

    KKT = np.block([[H, E.T], [E, np.zeros((Nt * n, Nt * n))]])
    rhs = np.concatenate([-g, d])
    sol = np.linalg.solve(KKT, rhs)
    X = np.concatenate([x0[None], sol[:nx].reshape(Nt, n)])
    U = sol[nx : nx + nu].reshape(Nt, m)
    return X, U


@pytest.mark.parametrize("seed", [0, 1])
def test_riccati_scan_matches_dense_kkt(seed):
    rng = np.random.default_rng(seed)
    prob = random_lqr(rng)
    sol = lqr_solve(prob, mode="scan")
    X_ref, U_ref = dense_kkt_solve(prob)
    np.testing.assert_allclose(np.asarray(sol.U), U_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.X), X_ref, atol=1e-8)


@pytest.mark.parametrize("seed", [0, 1])
def test_riccati_assoc_matches_scan(seed):
    rng = np.random.default_rng(seed)
    prob = random_lqr(rng, Nt=16)
    s1 = lqr_solve(prob, mode="scan")
    s2 = lqr_solve(prob, mode="assoc")
    np.testing.assert_allclose(np.asarray(s2.U), np.asarray(s1.U), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s2.X), np.asarray(s1.X), atol=1e-7)


def test_riccati_long_horizon_stable():
    rng = np.random.default_rng(3)
    prob = random_lqr(rng, Nt=256, n=4, m=2)
    sol = lqr_solve(prob, mode="assoc")
    assert np.isfinite(np.asarray(sol.U)).all()
    # optimality: gradient of the Lagrangian-free reduced objective ~ 0
    s1 = lqr_solve(prob, mode="scan")
    np.testing.assert_allclose(
        np.asarray(sol.U), np.asarray(s1.U), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_factor_resolve_matches_full_solve(seed):
    from ft_mpc_tpu.solvers.riccati import lqr_factor, lqr_resolve

    rng = np.random.default_rng(seed)
    prob = random_lqr(rng, Nt=20)
    fact = lqr_factor(prob.A, prob.B, prob.c, prob.Q, prob.R, prob.QN)
    # Re-solve against the factorization with two different linear terms.
    for scale in (1.0, -2.5):
        X, U = lqr_resolve(fact, scale * prob.q, scale * prob.r,
                           scale * prob.qN, prob.x0)
        ref = lqr_solve(prob._replace(q=scale * prob.q, r=scale * prob.r,
                                      qN=scale * prob.qN), mode="scan")
        np.testing.assert_allclose(np.asarray(U), np.asarray(ref.U), atol=1e-9)
        np.testing.assert_allclose(np.asarray(X), np.asarray(ref.X), atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1])
def test_resolve_assoc_matches_resolve(seed):
    """Associative-scan resolve (O(log Nt) depth) == sequential resolve."""
    from ft_mpc_tpu.solvers.riccati import lqr_factor, lqr_resolve, lqr_resolve_assoc

    rng = np.random.default_rng(seed)
    prob = random_lqr(rng, Nt=33)  # non-power-of-two horizon on purpose
    fact = lqr_factor(prob.A, prob.B, prob.c, prob.Q, prob.R, prob.QN)
    X_s, U_s = lqr_resolve(fact, prob.q, prob.r, prob.qN, prob.x0)
    X_a, U_a = lqr_resolve_assoc(fact, prob.q, prob.r, prob.qN, prob.x0)
    np.testing.assert_allclose(np.asarray(U_a), np.asarray(U_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(X_a), np.asarray(X_s), atol=1e-8)


@pytest.mark.parametrize("seed", [0, 2])
def test_factor_assoc_matches_factor(seed):
    """Parallel-in-horizon factorization == sequential Riccati factorization
    (and a resolve against it matches the sequential pipeline end-to-end)."""
    from ft_mpc_tpu.solvers.riccati import (
        lqr_factor,
        lqr_factor_assoc,
        lqr_resolve_assoc,
    )

    rng = np.random.default_rng(seed)
    prob = random_lqr(rng, Nt=24)
    f_s = lqr_factor(prob.A, prob.B, prob.c, prob.Q, prob.R, prob.QN)
    f_a = lqr_factor_assoc(prob.A, prob.B, prob.c, prob.Q, prob.R, prob.QN)
    np.testing.assert_allclose(np.asarray(f_a.P), np.asarray(f_s.P), atol=1e-7)
    np.testing.assert_allclose(np.asarray(f_a.K), np.asarray(f_s.K), atol=1e-7)
    X, U = lqr_resolve_assoc(f_a, prob.q, prob.r, prob.qN, prob.x0)
    ref = lqr_solve(prob, mode="scan")
    np.testing.assert_allclose(np.asarray(U), np.asarray(ref.U), atol=1e-7)
    np.testing.assert_allclose(np.asarray(X), np.asarray(ref.X), atol=1e-7)
