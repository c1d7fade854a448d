"""Thruster control allocation, device-resident.

Maps a 6-d generalized force (wrench) command to 16 nonnegative thruster
magnitudes.  Semantics match `ControlAllocator`
(`ft_mpc/controllers/tools/control_allocator.py`):

  1. Wrench clipping: project the *total* demanded wrench (command + fault)
     onto the attainable set.  The reference solves a halfspace QP with daqp
     (`:42-63`, with a wrong-dimension identity bug).  Here the attainable
     set's zonotope structure is exploited: w = gen_c + gen_G theta with
     theta in [0,1]^16, so the projection is a *box-constrained least
     squares* solved by FISTA -- no duals, no penalty parameter, global
     convergence, and the output is attainable *by construction* (it also
     yields a feasible thruster allocation theta for free).
  2. `allocate_thrusters`: minimum-energy allocation
        min ||u||^2  s.t.  D u = w_des,  0 <= u <= u_ub
     via the batched ADMM (CVXPY parametric QP in the reference, `:27-40`).
     Allocation failure calls `exit()` in the reference (`:88-92`); here the
     FISTA feasible point is a guaranteed fallback, selected branchlessly
     when the ADMM equality residual is poor.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ft_mpc_tpu.solvers.admm import QP, ADMMConfig, admm_solve

_BIG = 1e8


class AllocationResult(NamedTuple):
    u_phys: jnp.ndarray  # (16,) thruster commands
    wrench_clipped: jnp.ndarray  # (6,) wrench actually allocated (post-projection)
    was_clipped: jnp.ndarray  # bool scalar
    r_prim: jnp.ndarray  # allocation primal residual (feasibility monitor)
    used_fallback: jnp.ndarray  # bool: FISTA feasible point used instead of ADMM


def project_wrench_zonotope(
    w0: jnp.ndarray,  # (6,) total demanded wrench (incl. fault)
    gen_G: jnp.ndarray,  # (6, 16)
    gen_c: jnp.ndarray,  # (6,)
    gen_L: jnp.ndarray,  # scalar Lipschitz constant
    iters: int = 60,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Euclidean projection of w0 onto the attainable zonotope via FISTA.

    Returns (w_projected, theta) with w = gen_c + gen_G theta exactly.
    """
    dtype = w0.dtype
    n = gen_G.shape[1]
    step = 1.0 / gen_L

    def body(_, carry):
        theta, eta, t = carry
        grad = gen_G.T @ (gen_G @ eta + gen_c - w0)
        theta_new = jnp.clip(eta - step * grad, 0.0, 1.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        eta_new = theta_new + ((t - 1.0) / t_new) * (theta_new - theta)
        return (theta_new, eta_new, t_new)

    theta0 = jnp.full(n, 0.5, dtype)
    theta, _, _ = jax.lax.fori_loop(
        0, iters, body, (theta0, theta0, jnp.asarray(1.0, dtype))
    )
    return gen_c + gen_G @ theta, theta


def clip_wrench(
    w0: jnp.ndarray,
    hull_A: jnp.ndarray,
    hull_b: jnp.ndarray,
    hull_mask: jnp.ndarray,
    gen_G: jnp.ndarray | None = None,
    gen_c: jnp.ndarray | None = None,
    gen_L: jnp.ndarray | None = None,
    iters: int = 60,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project w0 onto the attainable set.  Returns (w, was_clipped).

    With generator data (preferred), uses the exact FISTA zonotope
    projection; otherwise falls back to a halfspace-QP projection.
    The halfspace test (A w <= b) decides `was_clipped` either way, matching
    the reference's feasibility shortcut (`control_allocator.py:59-62`).
    """
    A = hull_A * hull_mask[:, None]
    b = jnp.where(hull_mask > 0.5, hull_b, _BIG)
    feasible = jnp.all(A @ w0 <= b + 1e-7)

    if gen_G is not None:
        w_proj, _ = project_wrench_zonotope(w0, gen_G, gen_c, gen_L, iters)
    else:
        n = w0.shape[-1]
        qp = QP(
            P=jnp.eye(n, dtype=w0.dtype),
            q=-w0,
            A=A,
            l=jnp.full_like(b, -_BIG),
            u=b,
        )
        w_proj = admm_solve(qp, ADMMConfig(iters=60, phases=4, rho=20.0)).x
    w = jnp.where(feasible, w0, w_proj)
    return w, ~feasible


def allocate_thrusters(
    wrench_cmd: jnp.ndarray,
    D: jnp.ndarray,
    u_ub: jnp.ndarray,
    faulty_force_gen: jnp.ndarray,
    hull_A: jnp.ndarray,
    hull_b: jnp.ndarray,
    hull_mask: jnp.ndarray,
    gen_G: jnp.ndarray | None = None,
    gen_c: jnp.ndarray | None = None,
    gen_L: jnp.ndarray | None = None,
    max_thrust: float | jnp.ndarray = 3.4,
    cfg: ADMMConfig = ADMMConfig(iters=40, phases=1, rho=1.0),
) -> AllocationResult:
    """Full allocation path: fault offset, zonotope projection, min-energy QP.

    Mirrors `get_physical_input` (`control_allocator.py:65-95`): the total
    wrench (command + stuck-on fault) is clipped to the attainable set, the
    fault contribution is subtracted back out, and the remainder is
    distributed over healthy thrusters with minimum energy.
    """
    w_total = wrench_cmd + faulty_force_gen
    if gen_G is not None:
        A = hull_A * hull_mask[:, None]
        b = jnp.where(hull_mask > 0.5, hull_b, _BIG)
        feasible = jnp.all(A @ w_total <= b + 1e-7)
        w_proj, theta = project_wrench_zonotope(w_total, gen_G, gen_c, gen_L)
        w_clipped = jnp.where(feasible, w_total, w_proj)
        was_clipped = ~feasible
        # feasible allocation from the projection (exact when clipped)
        u_fallback = jnp.clip(theta * max_thrust, 0.0, u_ub)
    else:
        w_clipped, was_clipped = clip_wrench(w_total, hull_A, hull_b, hull_mask)
        u_fallback = None
    w_des = w_clipped - faulty_force_gen

    n = D.shape[-1]
    qp = QP(
        P=2.0 * jnp.eye(n, dtype=wrench_cmd.dtype),
        q=jnp.zeros(n, dtype=wrench_cmd.dtype),
        A=jnp.concatenate([D, jnp.eye(n, dtype=wrench_cmd.dtype)], axis=0),
        l=jnp.concatenate([w_des, jnp.zeros(n)]),
        u=jnp.concatenate([w_des, u_ub]),
    )
    sol = admm_solve(qp, cfg)
    u = jnp.clip(sol.x, 0.0, u_ub)
    # Min-norm equality polish over healthy thrusters (same as the lanes
    # kernel): removes the penalty-method equality residual in one 6x6
    # solve; broken thrusters are masked so the box clip cannot
    # reintroduce the residual through them.
    healthy = jnp.where(u_ub > 1e-12, 1.0, 0.0)
    Dm = D * healthy[None, :]
    W2 = Dm @ Dm.T + 1e-6 * jnp.eye(D.shape[0], dtype=wrench_cmd.dtype)
    lam = jnp.linalg.solve(W2, w_des - D @ u)
    u = jnp.clip(u + healthy * (Dm.T @ lam), 0.0, u_ub)
    eq_err = jnp.max(jnp.abs(D @ u - w_des))
    used_fallback = jnp.asarray(False)
    if u_fallback is not None:
        # The fallback (theta*max_thrust from the zonotope projection) is
        # feasibility-only -- it carries no energy optimality (its null-space
        # content is whatever FISTA landed on from theta0 = 0.5, e.g. whole
        # opposing-thruster pairs half-on).  Swap to it only when the ADMM
        # genuinely failed to realize the wrench, not on marginal residual
        # wins, or the min-energy solution is silently discarded.
        fb_err = jnp.max(jnp.abs(D @ u_fallback - w_des))
        used_fallback = (eq_err > 1e-2) & (fb_err < eq_err - 1e-9)
        u = jnp.where(used_fallback, u_fallback, u)
    return AllocationResult(
        u_phys=u,
        wrench_clipped=w_des,
        was_clipped=was_clipped,
        r_prim=jnp.max(jnp.abs(D @ u - w_des)),
        used_fallback=used_fallback,
    )
