"""Independent reference solver for the spiraling MPC NLP (validation only).

The reference validates nothing -- its accuracy story is "IPOPT converged"
(`ft_mpc/controllers/spiraling_mpc.py:346`), and CasADi/IPOPT are not
installable in this environment.  This module closes the accuracy loop with
a *methodologically independent* solver: the same NLP in single-shooting
form, solved by scipy's SLSQP (sequential least-squares QP with BFGS-class
Hessian updates and an active-set QP core -- none of the ADMM/RTI machinery
of the deployed solver), in float64, with exact objective/constraint
derivatives supplied by JAX AD.

NLP (matches `build_solver`, `spiraling_mpc.py:87-230`, states eliminated):

  min_U  sum_t e_t' Q e_t + u_t' R u_t  +  V_f(e_N)
  s.t.   hull_A (u_t + R(x_t) u_ref_t + u_comp + u_unc) <= hull_b   (per t)
         term_A e_N <= term_b
  with   x_{t+1} = F(x_t, u_t)   (RK4 center dynamics, substituted)

`solve_reference` is host-side, one scenario, seconds-slow -- it exists so
tests can assert the deployed solver's converged solutions match an
independent implementation to <= 1e-4 (the BASELINE.md accuracy bar).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.controllers.spiraling import N_OPT, N_U, _stage_dynamics
from ft_mpc_tpu.geometry.scenario import Scenario
from ft_mpc_tpu.ops.dynamics import BodyParams
from ft_mpc_tpu.ops.quaternion import rot_full_inv
from ft_mpc_tpu.terminal.poly import terminal_value

_BIG = 1e8


class ReferenceSolution(NamedTuple):
    U: np.ndarray  # (Nt, 6) optimal input deviations
    X: np.ndarray  # (Nt+1, 13) rolled-out states
    cost: float
    max_violation: float  # worst inequality violation at the solution
    success: bool
    n_iter: int


def _build_funcs(params, scenario, weights, Nt, c0, x_ref, u_ref):
    scenario = jax.tree.map(jnp.asarray, scenario)
    stage_dyn = partial(_stage_dynamics, params, scenario)
    hull_A = scenario.hull_A * scenario.hull_mask[:, None]
    hull_b = jnp.where(scenario.hull_mask > 0.5, scenario.hull_b, _BIG)
    term_A = scenario.term_A * scenario.term_mask[:, None]
    term_b = jnp.where(scenario.term_mask > 0.5, scenario.term_b, _BIG)

    def roll(U_flat):
        U = U_flat.reshape(Nt, N_U)

        def step(x, inp):
            u, ur = inp
            x1 = stage_dyn(x, u, ur)
            return x1, x1

        _, Xs = jax.lax.scan(step, c0, (U, u_ref[:Nt]))
        return jnp.concatenate([c0[None], Xs], axis=0)

    def objective(U_flat):
        U = U_flat.reshape(Nt, N_U)
        X = roll(U_flat)
        e = X[1:-1, :N_OPT] - x_ref[1:-1]
        J = jnp.einsum("ti,ij,tj->", e, weights.Q, e)
        J = J + jnp.einsum("ti,ij,tj->", U, weights.R, U)
        return J + terminal_value(scenario.term, X[-1, :N_OPT] - x_ref[-1])

    def constraints(U_flat):
        """Stacked inequality slacks, >= 0 feasible (SLSQP convention).

        Includes the optional stage state box (stages 1..Nt-1, parity with
        `spiraling_mpc.py:180-185`) and wrench rate rows when the weights
        carry x_lb/x_ub/du_max -- the same rows the deployed SQP builds, so
        constrained solutions are comparable to 1e-4.
        """
        U = U_flat.reshape(Nt, N_U)
        X = roll(U_flat)
        u_r = jnp.einsum("tij,tj->ti", rot_full_inv(X[:-1, 9:13]), u_ref[:Nt])
        w_tot = U + u_r + scenario.u_comp + scenario.faulty_force_gen
        slack_hull = hull_b[None, :] - w_tot @ hull_A.T  # (Nt, F)
        e_N = X[-1, :N_OPT] - x_ref[-1]
        slack_term = term_b - term_A @ e_N
        slacks = [slack_hull.reshape(-1), slack_term]
        if getattr(weights, "x_lb", None) is not None or \
                getattr(weights, "x_ub", None) is not None:
            xs = X[1:-1]
            if weights.x_ub is not None:
                slacks.append((jnp.asarray(weights.x_ub)[None] - xs).reshape(-1))
            if weights.x_lb is not None:
                slacks.append((xs - jnp.asarray(weights.x_lb)[None]).reshape(-1))
        if getattr(weights, "du_max", None) is not None:
            dw = w_tot[1:] - w_tot[:-1]
            dmax = jnp.asarray(weights.du_max)[None]
            slacks.append((dmax - dw).reshape(-1))
            slacks.append((dmax + dw).reshape(-1))
        return jnp.concatenate(slacks)

    return roll, objective, constraints


def solve_reference(
    params: BodyParams,
    scenario: Scenario,
    weights,
    Nt: int,
    c0,
    x_ref,  # (Nt+1, 9)
    u_ref,  # (Nt+1, 6)
    U0=None,  # (Nt, 6) initial guess (deviations)
    maxiter: int = 300,
    ftol: float = 1e-12,
) -> ReferenceSolution:
    """Solve the condensed NLP with scipy SLSQP + JAX-exact derivatives."""
    from scipy.optimize import minimize

    if not jax.config.jax_enable_x64:
        raise RuntimeError("reference solver requires float64 (jax_enable_x64)")

    c0 = jnp.asarray(c0, jnp.float64)
    x_ref = jnp.asarray(x_ref, jnp.float64)
    u_ref = jnp.asarray(u_ref, jnp.float64)
    roll, objective, constraints = _build_funcs(
        params, scenario, weights, Nt, c0, x_ref, u_ref
    )
    obj_j = jax.jit(objective)
    grad_j = jax.jit(jax.grad(objective))
    con_j = jax.jit(constraints)
    conjac_j = jax.jit(jax.jacfwd(constraints))

    U0 = np.zeros(Nt * N_U) if U0 is None else np.asarray(U0, np.float64).ravel()
    res = minimize(
        lambda u: float(obj_j(jnp.asarray(u))),
        U0,
        jac=lambda u: np.asarray(grad_j(jnp.asarray(u))),
        method="SLSQP",
        constraints=[
            {
                "type": "ineq",
                "fun": lambda u: np.asarray(con_j(jnp.asarray(u))),
                "jac": lambda u: np.asarray(conjac_j(jnp.asarray(u))),
            }
        ],
        options={"maxiter": maxiter, "ftol": ftol},
    )
    U = res.x.reshape(Nt, N_U)
    X = np.asarray(roll(jnp.asarray(res.x)))
    viol = float(-min(0.0, float(np.min(np.asarray(con_j(jnp.asarray(res.x)))))))
    return ReferenceSolution(
        U=U,
        X=X,
        cost=float(res.fun),
        max_violation=viol,
        success=bool(res.success),
        n_iter=int(res.nit),
    )
