"""Thruster control allocation, device-resident.

Maps a 6-d generalized force (wrench) command to 16 nonnegative thruster
magnitudes.  Semantics match `ControlAllocator`
(`ft_mpc/controllers/tools/control_allocator.py`):

  1. `clip_wrench`: project the *total* demanded wrench (command + fault)
     onto the attainable-wrench polytope:
        min ||w - w0||^2  s.t.  A w <= b
     The reference calls daqp only when infeasible (`:42-63`, with a
     wrong-dimension identity bug); here the projection runs branch-free
     every step and `jnp.where` keeps the original wrench when it was
     already feasible.
  2. `allocate_thrusters`: minimum-energy allocation
        min ||u||^2  s.t.  D u = w_des,  0 <= u <= u_ub
     (CVXPY parametric QP at `:27-40`; failure there calls `exit()` at
     `:88-92` -- here the QP always returns and residuals are reported).

Both are instances of the one batched ADMM kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ft_mpc_tpu.solvers.admm import QP, ADMMConfig, ADMMSolution, admm_solve

_BIG = 1e8


class AllocationResult(NamedTuple):
    u_phys: jnp.ndarray  # (16,) thruster commands
    wrench_clipped: jnp.ndarray  # (6,) wrench actually allocated (post-projection)
    was_clipped: jnp.ndarray  # bool scalar
    r_prim: jnp.ndarray  # allocation primal residual (feasibility monitor)


def clip_wrench(
    w0: jnp.ndarray,
    hull_A: jnp.ndarray,
    hull_b: jnp.ndarray,
    hull_mask: jnp.ndarray,
    cfg: ADMMConfig = ADMMConfig(iters=40, phases=2, rho=20.0),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project w0 onto {A w <= b} (masked rows inactive).

    Returns (w, was_clipped).
    """
    A = hull_A * hull_mask[:, None]
    b = jnp.where(hull_mask > 0.5, hull_b, _BIG)
    feasible = jnp.all(A @ w0 <= b + 1e-7)

    n = w0.shape[-1]
    qp = QP(
        P=jnp.eye(n, dtype=w0.dtype),
        q=-w0,
        A=A,
        l=jnp.full_like(b, -_BIG),
        u=b,
    )
    sol = admm_solve(qp, cfg)
    w = jnp.where(feasible, w0, sol.x)
    return w, ~feasible


def allocate_thrusters(
    wrench_cmd: jnp.ndarray,
    D: jnp.ndarray,
    u_ub: jnp.ndarray,
    faulty_force_gen: jnp.ndarray,
    hull_A: jnp.ndarray,
    hull_b: jnp.ndarray,
    hull_mask: jnp.ndarray,
    cfg: ADMMConfig = ADMMConfig(iters=40, phases=2, rho=1.0),
) -> AllocationResult:
    """Full allocation path: fault offset, hull projection, min-energy QP.

    Mirrors `get_physical_input` (`control_allocator.py:65-95`):
    the total wrench (command + stuck-on fault) is clipped to the attainable
    set, the fault contribution is subtracted back out, and the remainder is
    distributed over healthy thrusters with minimum energy.
    """
    w_total, was_clipped = clip_wrench(
        wrench_cmd + faulty_force_gen, hull_A, hull_b, hull_mask
    )
    w_des = w_total - faulty_force_gen

    n = D.shape[-1]
    m_eq = D.shape[-2]
    qp = QP(
        P=2.0 * jnp.eye(n, dtype=wrench_cmd.dtype),
        q=jnp.zeros(n, dtype=wrench_cmd.dtype),
        A=jnp.concatenate([D, jnp.eye(n, dtype=wrench_cmd.dtype)], axis=0),
        l=jnp.concatenate([w_des, jnp.zeros(n)]),
        u=jnp.concatenate([w_des, u_ub]),
    )
    sol = admm_solve(qp, cfg)
    u = jnp.clip(sol.x, 0.0, u_ub)
    return AllocationResult(
        u_phys=u, wrench_clipped=w_des, was_clipped=was_clipped, r_prim=sol.r_prim
    )
