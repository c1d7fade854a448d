"""Batched ADMM QP solver vs scipy golden solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize, nnls

from ft_mpc_tpu.solvers.admm import QP, ADMMConfig, admm_solve
from ft_mpc_tpu.solvers.allocation import allocate_thrusters, clip_wrench
from ft_mpc_tpu.ops.dynamics import BodyParams
from ft_mpc_tpu.geometry.scenario import build_scenario
from ft_mpc_tpu.utils.faults import BrokenThruster


def scipy_qp(P, q, A, l, u, x0=None):
    """Golden solve via SLSQP."""
    n = P.shape[0]

    def f(x):
        return 0.5 * x @ P @ x + q @ x

    def jac(x):
        return P @ x + q

    cons = []
    for i in range(A.shape[0]):
        a, lo, hi = A[i], l[i], u[i]
        if hi < 1e7:
            cons.append({"type": "ineq", "fun": (lambda x, a=a, hi=hi: hi - a @ x)})
        if lo > -1e7:
            cons.append({"type": "ineq", "fun": (lambda x, a=a, lo=lo: a @ x - lo)})
    res = minimize(
        f,
        np.zeros(n) if x0 is None else x0,
        jac=jac,
        constraints=cons,
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12},
    )
    return res.x


def random_qp(rng, n=8, m=12):
    L = rng.standard_normal((n, n))
    P = L @ L.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    x_feas = rng.standard_normal(n) * 0.3
    margin = rng.uniform(0.1, 1.0, m)
    u = A @ x_feas + margin
    l = A @ x_feas - rng.uniform(0.1, 1.0, m)
    # make a couple of rows equality
    l[0] = u[0] = (A[0] @ x_feas)
    return P, q, A, l, u


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_admm_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    P, q, A, l, u = random_qp(rng)
    sol = admm_solve(
        QP(*map(jnp.asarray, (P, q, A, l, u))), ADMMConfig(iters=400, rho=0.2)
    )
    x_ref = scipy_qp(P, q, A, l, u)
    f_admm = 0.5 * np.asarray(sol.x) @ P @ np.asarray(sol.x) + q @ np.asarray(sol.x)
    f_ref = 0.5 * x_ref @ P @ x_ref + q @ x_ref
    # objective within tolerance and solution close
    assert f_admm <= f_ref + 1e-5
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=2e-4)
    assert float(sol.r_prim) < 1e-4


def test_admm_vmap_batch():
    rng = np.random.default_rng(7)
    qps = [random_qp(rng) for _ in range(16)]
    batch = QP(*[jnp.asarray(np.stack([qp[i] for qp in qps])) for i in range(5)])
    sols = jax.vmap(lambda qp: admm_solve(qp, ADMMConfig(iters=400, rho=0.2)))(batch)
    for k in range(16):
        x_ref = scipy_qp(*qps[k])
        np.testing.assert_allclose(np.asarray(sols.x[k]), x_ref, atol=5e-4)


def test_allocation_recovers_wrench():
    params = BodyParams.default(0.1)
    sc = build_scenario(params, [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)])
    wrench = jnp.asarray([0.5, -0.3, 0.8, 0.02, -0.05, 0.04])
    res = allocate_thrusters(
        wrench,
        params.D,
        sc.u_ub,
        sc.faulty_force_gen,
        sc.hull_A,
        sc.hull_b,
        sc.hull_mask,
    )
    # D u == wrench (equality constraint met), bounds respected
    np.testing.assert_allclose(
        np.asarray(params.D @ res.u_phys), np.asarray(wrench), atol=2e-4
    )
    u = np.asarray(res.u_phys)
    assert (u >= -1e-9).all()
    assert (u <= np.asarray(sc.u_ub) + 1e-9).all()
    assert not bool(res.was_clipped)
    # commands on broken thrusters are zero
    assert abs(u[10]) < 1e-9 and abs(u[11]) < 1e-9


def test_allocation_is_min_energy():
    """Compare against scipy NNLS-based golden for the min-norm allocation."""
    params = BodyParams.default(0.1)
    sc = build_scenario(params, [])
    wrench = jnp.asarray([1.0, 0.5, -0.7, 0.01, 0.02, -0.03])
    res = allocate_thrusters(
        wrench, params.D, sc.u_ub, sc.faulty_force_gen,
        sc.hull_A, sc.hull_b, sc.hull_mask,
    )
    D = np.asarray(params.D)
    # golden via SLSQP
    x_ref = scipy_qp(
        2 * np.eye(16),
        np.zeros(16),
        np.vstack([D, np.eye(16)]),
        np.concatenate([np.asarray(wrench), np.zeros(16)]),
        np.concatenate([np.asarray(wrench), np.full(16, 3.4)]),
    )
    assert np.sum(np.asarray(res.u_phys) ** 2) <= np.sum(x_ref**2) + 1e-4


def test_clip_wrench_projects_infeasible():
    params = BodyParams.default(0.1)
    sc = build_scenario(params, [])
    big = jnp.asarray([20.0, 0, 0, 0, 0, 0])  # outside attainable set (max Fx = 13.6)
    w, clipped = clip_wrench(big, sc.hull_A, sc.hull_b, sc.hull_mask,
                             gen_G=sc.gen_G, gen_c=sc.gen_c, gen_L=sc.gen_L)
    assert bool(clipped)
    A = np.asarray(sc.hull_A) * np.asarray(sc.hull_mask)[:, None]
    b = np.where(np.asarray(sc.hull_mask) > 0.5, np.asarray(sc.hull_b), 1e8)
    assert np.max(A @ np.asarray(w) - b) < 1e-4
    # feasible wrench passes through untouched
    small = jnp.asarray([0.1, 0.1, 0.1, 0.0, 0.0, 0.0])
    w2, clipped2 = clip_wrench(small, sc.hull_A, sc.hull_b, sc.hull_mask,
                               gen_G=sc.gen_G, gen_c=sc.gen_c, gen_L=sc.gen_L)
    assert not bool(clipped2)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(small), atol=1e-12)
