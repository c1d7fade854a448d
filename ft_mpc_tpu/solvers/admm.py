"""Batched dense ADMM QP solver (OSQP-style), device-resident and shape-static.

Solves   min  1/2 x^T P x + q^T x   s.t.  l <= A x <= u
with the operator-splitting iteration of OSQP (Stellato et al.):

    x~ = (P + sigma I + A^T R A)^{-1} (sigma x - q + A^T (R z - y))
    x+ = alpha x~ + (1-alpha) x
    z+ = clip(alpha A x~ + (1-alpha) z + R^{-1} y, l, u)
    y+ = y + R (alpha A x~ + (1-alpha) z - z+)

where R = diag(rho_i), with rho boosted on equality rows (l_i == u_i).

TPU-first design decisions:
  * One Cholesky factorization per solve (the KKT matrix is fixed across
    iterations); iterations are two triangular solves + two matvecs -- all
    MXU-friendly dense ops.  Under `vmap` the factorization and iterations
    become batched over thousands of scenarios.
  * Fixed iteration count (static shapes, no data-dependent control flow);
    residuals are returned so callers can monitor convergence.  A
    `jax.lax.while_loop` variant would save iterations per-sample but
    desynchronizes a batch; fixed count keeps the whole batch in lockstep,
    which is what wins on SIMD hardware.
  * Masked (padded) constraint rows are expressed as 0 <= 0.x <= big and
    cost nothing.

This single kernel serves three roles in the framework (the reference used a
different native library for each): the condensed MPC subproblem (vs IPOPT,
`spiraling_mpc.py:346`), the thruster allocation QP (vs CVXPY/OSQP,
`control_allocator.py:27-40,86`), and the wrench clipping QP (vs daqp,
`control_allocator.py:42-63`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


class QP(NamedTuple):
    """Dense QP data.  All arrays may carry leading batch axes under vmap."""

    P: jnp.ndarray  # (n, n) symmetric PSD
    q: jnp.ndarray  # (n,)
    A: jnp.ndarray  # (m, n)
    l: jnp.ndarray  # (m,)
    u: jnp.ndarray  # (m,)


class ADMMConfig(NamedTuple):
    iters: int = 100  # iterations per phase
    phases: int = 4  # rho is re-tuned and K refactorized between phases
    rho: float = 0.1
    rho_eq_scale: float = 1e3  # rho multiplier on rows with l == u
    rho_min: float = 1e-6
    rho_max: float = 1e6
    sigma: float = 1e-6
    alpha: float = 1.6  # over-relaxation
    # Fixed-iteration, fixed-phase schedule: static shapes, no data-dependent
    # control flow; a whole scenario batch stays in lockstep.  The adaptive
    # rho between phases is the OSQP residual-balancing rule, which fixes the
    # dual-drift stall of fixed-rho ADMM on degenerate constraint sets.


class ADMMSolution(NamedTuple):
    x: jnp.ndarray  # (n,) primal solution
    z: jnp.ndarray  # (m,) constraint-space auxiliary
    y: jnp.ndarray  # (m,) dual variables
    r_prim: jnp.ndarray  # scalar, inf-norm of Ax - z
    r_dual: jnp.ndarray  # scalar, inf-norm of Px + q + A^T y


@partial(jax.jit, static_argnames=("cfg",))
def admm_solve(
    qp: QP,
    cfg: ADMMConfig = ADMMConfig(),
    x0: jnp.ndarray | None = None,
    y0: jnp.ndarray | None = None,
) -> ADMMSolution:
    """Solve one QP.  Batch by wrapping in `jax.vmap` (all ops batch cleanly)."""
    n = qp.P.shape[-1]
    m = qp.A.shape[-2]
    dtype = qp.P.dtype

    x = jnp.zeros(n, dtype) if x0 is None else x0
    y = jnp.zeros(m, dtype) if y0 is None else y0
    z = jnp.clip(qp.A @ x, qp.l, qp.u)

    eq_scale = jnp.where(jnp.abs(qp.u - qp.l) < 1e-12, cfg.rho_eq_scale, 1.0)
    rho_base = jnp.asarray(cfg.rho, dtype)
    eye = jnp.eye(n, dtype=dtype)

    def run_phase(carry, _):
        x, z, y, rho_base = carry
        rho = rho_base * eq_scale
        K = qp.P + cfg.sigma * eye + (qp.A.T * rho) @ qp.A
        # Explicit inverse: iterations become pure matvecs (no sequential
        # triangular solves on the TPU hot path).  K is regularized by sigma
        # and rho, so the inverse is numerically benign at fp32.
        Kinv = cho_solve(cho_factor(K), eye)

        def body(_, st):
            x, z, y = st
            rhs = cfg.sigma * x - qp.q + qp.A.T @ (rho * z - y)
            x_t = Kinv @ rhs
            x_new = cfg.alpha * x_t + (1.0 - cfg.alpha) * x
            z_hat = cfg.alpha * (qp.A @ x_t) + (1.0 - cfg.alpha) * z
            z_new = jnp.clip(z_hat + y / rho, qp.l, qp.u)
            y_new = y + rho * (z_hat - z_new)
            return (x_new, z_new, y_new)

        x, z, y = jax.lax.fori_loop(0, cfg.iters, body, (x, z, y))

        # OSQP residual-balancing rho update (relative residuals).
        Ax = qp.A @ x
        r_prim = jnp.max(jnp.abs(Ax - z))
        r_dual = jnp.max(jnp.abs(qp.P @ x + qp.q + qp.A.T @ y))
        prim_scale = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z))), 1e-6
        )
        dual_scale = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(qp.P @ x)), jnp.max(jnp.abs(qp.q))), 1e-6
        )
        dual_scale = jnp.maximum(dual_scale, jnp.max(jnp.abs(qp.A.T @ y)))
        ratio = (r_prim / prim_scale) / jnp.maximum(r_dual / dual_scale, 1e-12)
        rho_new = jnp.clip(
            rho_base * jnp.sqrt(ratio), cfg.rho_min, cfg.rho_max
        )
        return (x, z, y, rho_new), (r_prim, r_dual)

    (x, z, y, _), _ = jax.lax.scan(
        run_phase, (x, z, y, rho_base), None, length=cfg.phases
    )

    r_prim = jnp.max(jnp.abs(qp.A @ x - z))
    r_dual = jnp.max(jnp.abs(qp.P @ x + qp.q + qp.A.T @ y))
    return ADMMSolution(x=x, z=z, y=y, r_prim=r_prim, r_dual=r_dual)


def admm_refine(
    qp: QP,
    sol: ADMMSolution,
    cfg: ADMMConfig,
    extra_iters: int,
) -> ADMMSolution:
    """Continue iterating from a previous solution (warm restart)."""
    cfg2 = cfg._replace(iters=extra_iters)
    return admm_solve(qp, cfg2, x0=sol.x, y0=sol.y)
