"""Offline terminal-ingredient pipeline (per fault class).

The TPU-native re-design of `explicitMPCTerminalIngredients`
(`ft_mpc/controllers/tools/terminal_ingredients.py:21-426`).  Same staged
structure, different machinery:

  A. `input_bound_box` -- the reference solves a CasADi/IPOPT NLP maximizing
     a log-volume box inside the acceleration polytope, with huge
     sympy-derived symbolic upper bounds on the feedback-linearization error
     (`:57-166`).  Here the fb-lin residual is the *exact* coupling
     left out of the double-integrator model (centripetal delta, Euler
     coupling, gyroscopic term -- read off `center_dx_dt`), bounded
     numerically over the omega-error box by dense grid evaluation with a
     safety factor; the resulting constraints are *linear in r_empc* for
     fixed emax, so the optimizer is an exact 1-D sweep + closed-form max
     instead of an NLP.
  B. `empc_ingredients` -- per-axis double-integrator DARE + MCAIS
     (replacing pympc: `geometry.invariant.mcais`).
  C. `value_function_bound` -- the reference enumerates an explicit MPC and
     fits a quadratic upper bound on a grid (`:168-273`).  Here the value
     function is *sampled by solving the grid of small MPC QPs as one
     batched ADMM call* (thousands of QPs in one device launch), then the
     quadratic upper bound is itself a constrained least-squares QP solved
     with the same solver.
  D. omega Lyapunov cost (`:316-321` parity) + assembly into
     (P9, p9, c) and the block terminal set (`calc_terminal_set`,
     `:396-426` parity).
  E. data-only serialization (npz).  The reference stores python code in
     YAML and `eval`s it at load (`:444-474`) -- deliberately not
     reproduced (SURVEY.md quirk 8).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import scipy.linalg as la

from ft_mpc_tpu.geometry.invariant import mcais
from ft_mpc_tpu.geometry.polytope import Polytope
from ft_mpc_tpu.terminal.poly import TerminalPoly, assemble_terminal_poly


# ----------------------------------------------------------------------------
# Stage A: input-bound box (emax, r_empc)
# ----------------------------------------------------------------------------

def fb_lin_residual(eo: np.ndarray, omega_des, r, inertia) -> np.ndarray:
    """Exact 6-d acceleration residual ignored by the double-integrator model.

    For omega = omega_des + eo:
      lin: w x (w x r) - w_des x (w_des x r) - (J^-1 g) x r
      ang: -J^-1 g,   g = w x (J w)   (gyroscopic)
    These are exactly the terms of `center_dx_dt` that the per-axis
    double-integrator eMPC does not model.
    """
    w = omega_des + eo
    J = inertia
    g = np.cross(w, J @ w)
    Jinv_g = np.linalg.solve(J, g)
    lin = (
        np.cross(w, np.cross(w, r))
        - np.cross(omega_des, np.cross(omega_des, r))
        - np.cross(Jinv_g, r)
    )
    return np.concatenate([lin, -Jinv_g])


def fb_quad_coeffs(omega_des, r, inertia):
    """Exact quadratic coefficients of `fb_lin_residual` in eo.

    Every component of the residual is a sum of cross products of
    w = omega_des + eo and linear maps of it, hence an *exactly* degree-2
    polynomial in eo.  The coefficients are therefore recovered exactly from
    13 function evaluations (no fitting):  fb_k(eo) = eo'H_k eo + G_k.eo + c_k.
    Returns (H (6,3,3) symmetric, G (6,3), c (6,)).
    """
    f = lambda e: fb_lin_residual(e, omega_des, r, inertia)
    c = f(np.zeros(3))
    eye = np.eye(3)
    fp = [f(eye[i]) for i in range(3)]
    fm = [f(-eye[i]) for i in range(3)]
    H = np.zeros((6, 3, 3))
    G = np.zeros((6, 3))
    for i in range(3):
        G[:, i] = 0.5 * (fp[i] - fm[i])
        H[:, i, i] = 0.5 * (fp[i] + fm[i]) - c
    for i in range(3):
        for j in range(i + 1, 3):
            fij = f(eye[i] + eye[j])
            H[:, i, j] = H[:, j, i] = 0.5 * (
                fij - c - G[:, i] - G[:, j] - H[:, i, i] - H[:, j, j]
            )
    return H, G, c


def _quad_box_max_batch(
    H: np.ndarray, g: np.ndarray, c: np.ndarray, emax: float
) -> np.ndarray:
    """Exact max of q_f(e) = e'H_f e + g_f.e + c_f over |e_i| <= emax, per row.

    The maximizer of a quadratic over a box lies on some face, where it is
    either a vertex or a stationary point of q restricted to that face --
    enumerating all 27 (free-subset, fixed-sign) candidates is exhaustive, so
    this is a *verified* maximum (vs the reference's sympy worst-case bounds,
    `terminal_ingredients.py:57-166`, and round 2's grid-max heuristic).
    Faces whose restricted Hessian is singular have their maximum on the face
    boundary, which lower-dimensional candidates cover.
    H: (F, 3, 3), g: (F, 3), c: (F,).  Returns (F,).
    """
    from itertools import product

    F = H.shape[0]
    best = np.full(F, -np.inf)

    def consider(e):  # e: (F, 3) candidate points, assumed inside the box
        q = np.einsum("fi,fij,fj->f", e, H, e) + np.einsum("fi,fi->f", g, e) + c
        np.maximum(best, q, out=best)

    idx = [0, 1, 2]
    for free_mask in product([False, True], repeat=3):
        free = [i for i in idx if free_mask[i]]
        fixed = [i for i in idx if not free_mask[i]]
        for signs in product([-emax, emax], repeat=len(fixed)):
            e = np.zeros((F, 3))
            for i, s in zip(fixed, signs):
                e[:, i] = s
            if free:
                k = len(free)
                Hff = 2.0 * H[:, free][:, :, free]  # (F, k, k)
                rhs = -(g[:, free] + 2.0 * np.einsum(
                    "fij,fj->fi", H[:, free][:, :, fixed], e[:, fixed]
                ))
                det = np.linalg.det(Hff)
                ok = np.abs(det) > 1e-12
                Hsafe = np.where(ok[:, None, None], Hff, np.eye(k)[None])
                ef = np.linalg.solve(Hsafe, rhs[..., None])[..., 0]
                inbox = np.all(np.abs(ef) <= emax * (1 + 1e-12), axis=1)
                valid = ok & inbox
                if not valid.any():
                    continue
                ef = np.clip(ef, -emax, emax)
                for j, i in enumerate(free):
                    e[:, i] = np.where(valid, ef[:, j], 0.0)
                q = (
                    np.einsum("fi,fij,fj->f", e, H, e)
                    + np.einsum("fi,fi->f", g, e)
                    + c
                )
                np.maximum(best, np.where(valid, q, -np.inf), out=best)
            else:
                consider(e)
    return best


def _fb_bound_per_facet(
    A: np.ndarray, emax: float, omega_des, r, inertia,
    coeffs=None,
) -> np.ndarray:
    """Per-facet directional bound max_{|eo|<=emax} a_i . fb(eo), EXACT.

    Sharper than a single norm bound: pure-torque facets only pay for the
    gyroscopic term, not the (much larger) centripetal delta.  a_i . fb is a
    3-variable quadratic, maximized exactly over the box (no grid, no safety
    factor) -- `tests/test_terminal.py` asserts 1e5 random samples never
    exceed this bound as-is.
    """
    Hq, Gq, cq = coeffs if coeffs is not None else fb_quad_coeffs(
        omega_des, r, inertia
    )
    Hf = np.einsum("fk,kij->fij", A, Hq)  # (F, 3, 3)
    gf = A @ Gq  # (F, 3)
    cf = A @ cq  # (F,)
    return np.maximum(_quad_box_max_batch(Hf, gf, cf, float(emax)), 0.0)


def input_bound_box(
    hull: Polytope,
    M: np.ndarray,
    f_virt6: np.ndarray,
    k_omega: np.ndarray,
    omega_des: np.ndarray,
    r: np.ndarray,
    inertia: np.ndarray,
    max_acceleration: float = 0.0,
    emax_grid=None,
) -> tuple[np.ndarray, float]:
    """Largest (emax box, r_empc ball) certified inside the acceleration set.

    Constraint per unit-norm facet a_i of the acceleration polytope
    (hull mapped through M^{-1}, shrunk by max_acceleration):

        r_empc ||a_i[:3]|| + a_i.(M f_virt6) + max_corner a_i.[0;-k eo]
            + fb_bound(emax) <= b_i

    For fixed emax everything but the first term is a constant, so the
    max feasible r_empc is closed-form; emax is optimized by 1-D sweep of
    the reference's log-volume objective (`terminal_ingredients.py:137-141`).
    """
    Minv = np.linalg.inv(M)
    acc = Polytope(hull.A @ Minv, hull.b).normalized()
    acc = acc.minkowski_subtract_ball(max_acceleration)
    A, b = acc.A, acc.b

    nominal = A @ (M @ f_virt6)  # per-facet nominal acceleration usage
    an_lin = np.linalg.norm(A[:, :3], axis=1)
    A_om = A[:, 3:]  # facet rows on angular-acceleration components
    k = np.asarray(k_omega, dtype=np.float64)

    if emax_grid is None:
        emax_grid = np.linspace(0.01, 1.2, 120)

    fb_coeffs = fb_quad_coeffs(
        np.asarray(omega_des), np.asarray(r), np.asarray(inertia)
    )
    best = None
    for emax in emax_grid:
        # worst corner of a_i . [0; -k eo] over |eo|<=emax:  sum |A_om k| emax
        corner = np.abs(A_om * k[None, :]).sum(axis=1) * emax
        slack = b - nominal - corner - _fb_bound_per_facet(
            A, emax, np.asarray(omega_des), np.asarray(r), np.asarray(inertia),
            coeffs=fb_coeffs,
        )
        if np.any(slack < 0):
            continue  # emax itself infeasible
        with np.errstate(divide="ignore"):
            r_caps = np.where(an_lin > 1e-9, slack / np.maximum(an_lin, 1e-9), np.inf)
        r_empc = float(np.min(r_caps))
        if r_empc <= 0:
            continue
        # reference objective: 15 log r_empc + sum log(2 k_i emax)
        obj = 15.0 * np.log(r_empc) + float(np.sum(np.log(2.0 * k * emax)))
        if best is None or obj > best[0]:
            best = (obj, emax, r_empc)
    if best is None:
        raise RuntimeError("no feasible (emax, r_empc): fault pattern too severe")
    _, emax, r_empc = best
    return np.array([emax, emax, emax]), r_empc


# ----------------------------------------------------------------------------
# Stage B: per-axis eMPC ingredients
# ----------------------------------------------------------------------------

@dataclass
class AxisEMPC:
    Ad: np.ndarray  # (2, 2)
    Bd: np.ndarray  # (2, 1)
    Q: np.ndarray  # (2, 2)
    R: np.ndarray  # (1, 1)
    P: np.ndarray  # (2, 2) DARE cost-to-go
    K: np.ndarray  # (1, 2) terminal LQR gain
    uimax: float
    domain: Polytope  # MCAIS in (pos, vel)


def empc_ingredients(
    q_pos: float,
    q_vel: float,
    r_in: float,
    dt: float,
    time_scaling: float,
    uimax: float,
    pos_bound: float = 5.0,
    vel_bound: float = 1.5,
) -> AxisEMPC:
    h = time_scaling * dt
    Ad = np.array([[1.0, h], [0.0, 1.0]])
    Bd = np.array([[0.5 * h * h], [h]])
    Q = np.diag([q_pos, q_vel]) * time_scaling
    R = np.array([[r_in]]) * time_scaling
    P = la.solve_discrete_are(Ad, Bd, Q, R)
    K = np.linalg.solve(R + Bd.T @ P @ Bd, Bd.T @ P @ Ad)
    A_cl = Ad - Bd @ K

    C = np.vstack([np.eye(2), -np.eye(2), K, -K])
    d = np.array([pos_bound, vel_bound, pos_bound, vel_bound, uimax, uimax])
    domain = mcais(A_cl, C, d)
    return AxisEMPC(Ad=Ad, Bd=Bd, Q=Q, R=R, P=P, K=K, uimax=uimax, domain=domain)


# ----------------------------------------------------------------------------
# Stage C: value-function sampling (batched QPs) + quadratic upper bound
# ----------------------------------------------------------------------------

def sample_value_function(
    empc: AxisEMPC,
    horizon: int,
    pos_bound: float = 5.0,
    vel_bound: float = 1.5,
    grid_step: float = 0.1,
):
    """V(x0) of the N-step MPC on a grid, via ONE batched ADMM call.

    The reference enumerates an explicit MPC solution and queries it per
    point (`bound_empc_cost`, `terminal_ingredients.py:221-273`); here each
    grid point is a tiny condensed QP and the whole grid solves in one
    device launch.
    Returns (points (M, 2), values (M,), feasible (M,) bool).
    """
    import jax
    import jax.numpy as jnp

    from ft_mpc_tpu.solvers.admm import QP, ADMMConfig, admm_solve

    N = horizon
    Ad, Bd, Q, R, P = empc.Ad, empc.Bd, empc.Q, empc.R, empc.P

    # Condensed prediction: x_k = A^k x0 + sum_j A^{k-1-j} B u_j, k=1..N
    powers = [np.linalg.matrix_power(Ad, k) for k in range(N + 1)]
    Phi = np.zeros((2 * N, N))  # stacks x_1..x_N
    Lam = np.zeros((2 * N, 2))
    for kk in range(1, N + 1):
        Lam[2 * (kk - 1) : 2 * kk] = powers[kk]
        for j in range(kk):
            Phi[2 * (kk - 1) : 2 * kk, j : j + 1] = powers[kk - 1 - j] @ Bd

    # Cost: sum_{k=0}^{N-1} x_k Q x_k + u_k R u_k + x_N P x_N
    Qbar = np.zeros((2 * N, 2 * N))
    for kk in range(1, N):
        Qbar[2 * (kk - 1) : 2 * kk, 2 * (kk - 1) : 2 * kk] = Q
    Qbar[2 * (N - 1) :, 2 * (N - 1) :] = P
    H = 2.0 * (Phi.T @ Qbar @ Phi + np.eye(N) * R[0, 0])
    Gq = 2.0 * Phi.T @ Qbar @ Lam  # q(x0) = Gq x0

    # Constraints: |u_k| <= uimax; x_k in X for k=1..N-1; x_N in domain.
    rowsA, rows_off, rows_d = [], [], []
    rowsA.append(np.eye(N))
    rows_off.append(np.zeros((N, 2)))
    rows_d.append(np.full(N, empc.uimax))
    rowsA.append(-np.eye(N))
    rows_off.append(np.zeros((N, 2)))
    rows_d.append(np.full(N, empc.uimax))
    Xbox_A = np.vstack([np.eye(2), -np.eye(2)])
    Xbox_d = np.array([pos_bound, vel_bound, pos_bound, vel_bound])
    for kk in range(1, N):
        sel = slice(2 * (kk - 1), 2 * kk)
        rowsA.append(Xbox_A @ Phi[sel])
        rows_off.append(Xbox_A @ Lam[sel])
        rows_d.append(Xbox_d)
    selN = slice(2 * (N - 1), 2 * N)
    rowsA.append(empc.domain.A @ Phi[selN])
    rows_off.append(empc.domain.A @ Lam[selN])
    rows_d.append(empc.domain.b)
    Acon = np.vstack(rowsA)
    Eoff = np.vstack(rows_off)
    dcon = np.concatenate(rows_d)

    xs = np.arange(-pos_bound, pos_bound + 1e-9, grid_step)
    vs = np.arange(-vel_bound, vel_bound + 1e-9, grid_step)
    pts = np.array([[x, v] for x in xs for v in vs])
    Mpts = pts.shape[0]

    qs = pts @ Gq.T  # (M, N)
    us = dcon[None, :] - pts @ Eoff.T  # (M, m)

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    qp = QP(
        P=jnp.broadcast_to(jnp.asarray(H, dtype), (Mpts, N, N)),
        q=jnp.asarray(qs, dtype),
        A=jnp.broadcast_to(jnp.asarray(Acon, dtype), (Mpts,) + Acon.shape),
        l=jnp.full((Mpts, Acon.shape[0]), -1e8, dtype),
        u=jnp.asarray(us, dtype),
    )
    sol = jax.vmap(lambda qp: admm_solve(qp, ADMMConfig(iters=60, phases=3, rho=1.0)))(qp)
    u_opt = np.asarray(sol.x)
    r_prim = np.asarray(sol.r_prim)

    feasible = r_prim < 1e-4
    # V = 1/2 u H u + q.u + x0-dependent constant (stage-0 + condensed terms)
    x0_cost = np.einsum("mi,ij,mj->m", pts, Q, pts)  # stage-0 cost
    cross = np.einsum("mi,ij,mj->m", pts, Lam.T @ Qbar @ Lam, pts)
    V = (
        0.5 * np.einsum("mn,nk,mk->m", u_opt, H, u_opt)
        + np.einsum("mn,mn->m", qs, u_opt)
        + x0_cost
        + cross
    )
    return pts, V, feasible


def _constrained_lsq_lower_bounded(Phi: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Exact solve of  min ||Phi t - v||^2  s.t.  Phi t >= v  (primal active set).

    The QP is tiny in the variable (6 params) but has thousands of rows; a
    textbook primal active-set method converges in a handful of pivots.
    """
    n = Phi.shape[1]
    H = Phi.T @ Phi
    Pv = Phi.T @ v
    scale = max(1.0, float(np.abs(v).max()))
    feas_tol = 1e-9 * scale

    t = np.linalg.lstsq(Phi, v, rcond=None)[0]  # unconstrained LSQ start
    S: list[int] = []
    for _ in range(200):
        resid = Phi @ t - v
        resid[S] = 0.0  # working-set rows are equalities (numerically exact)
        worst = int(np.argmin(resid))
        if resid[worst] >= -feas_tol:
            return t  # feasible, working-set multipliers already all valid
        S.append(worst)
        while True:
            A = Phi[S]
            k = len(S)
            KKT = np.block([[H, A.T], [A, np.zeros((k, k))]])
            rhs = np.concatenate([Pv, v[S]])
            sol = np.linalg.lstsq(KKT, rhs, rcond=None)[0]
            t, lam = sol[:n], sol[n:]
            # constraint Phi_S t >= v_S active with multiplier mu = -2 lam >= 0
            bad = np.where(lam > 1e-10 * scale)[0]
            if bad.size == 0:
                break
            S.pop(int(bad[np.argmax(lam[bad])]))
    return t


def fit_quadratic_upper_bound(pts: np.ndarray, vals: np.ndarray):
    """Least-squares quadratic upper bound: min sum (V_hat - V)^2, V_hat >= V.

    Solved exactly as the 6-parameter inequality-constrained least-squares
    problem it is (active set) -- the reference builds a CasADi Opti NLP for
    the same fit (`terminal_ingredients.py:240-273`).
    theta = (axx, axv, avv, bx, bv, c); V_hat = [x^2, 2xv, v^2, x, v, 1].theta
    """
    x, v = pts[:, 0], pts[:, 1]
    Phi = np.stack([x * x, 2 * x * v, v * v, x, v, np.ones_like(x)], axis=1)
    theta = _constrained_lsq_lower_bounded(
        Phi.astype(np.float64), np.asarray(vals, np.float64)
    )
    A2 = np.array([[theta[0], theta[1]], [theta[1], theta[2]]])
    b2 = theta[3:5]
    # Exactness guard: lift c by the residual underside (zero up to round-off).
    under = float(np.max(vals - Phi @ theta))
    c = float(theta[5]) + max(under, 0.0)
    return A2, b2, c


# ----------------------------------------------------------------------------
# Stage D/E: assembly
# ----------------------------------------------------------------------------

@dataclass
class TerminalIngredients:
    P9: np.ndarray  # (9, 9) quadratic part (cost_empc + cost_omega)
    p9: np.ndarray  # (9,)
    c: float
    term: TerminalPoly  # full certified cost incl. cross_1/cross_2 tables
    term_set: Polytope  # over the 9-d error
    emax: np.ndarray  # (3,)
    r_empc: float
    meta: dict


def compute_terminal_ingredients(
    hull: Polytope,
    M: np.ndarray,
    f_virt6: np.ndarray,
    omega_des: np.ndarray,
    r: np.ndarray,
    mass: float,
    inertia: np.ndarray,
    dt: float,
    Q: np.ndarray,
    R: np.ndarray,
    k_omega: np.ndarray,
    max_acceleration: float = 0.0,
    time_scaling: float = 5.0,
    empc_horizon: int = 3,
    grid_step: float = 0.1,
) -> TerminalIngredients:
    """Full pipeline for one fault class (mirrors
    `calculate_terminal_ingredients`, `terminal_ingredients.py:275-374`)."""
    Q = np.diag(Q) if np.ndim(Q) == 1 else np.asarray(Q)
    R = np.diag(R) if np.ndim(R) == 1 else np.asarray(R)
    k_omega = np.asarray(k_omega, dtype=np.float64)

    emax, r_empc = input_bound_box(
        hull, M, f_virt6, k_omega, omega_des, r, inertia, max_acceleration
    )
    uimax = r_empc / np.sqrt(3.0)

    Minv = np.linalg.inv(M)
    Qu_tilde = Minv.T @ R @ Minv
    r_in = float(np.max(np.linalg.eigvalsh(Qu_tilde[0:3, 0:3])))

    empc = empc_ingredients(
        float(Q[0, 0]), float(Q[3, 3]), r_in, dt, time_scaling, uimax
    )
    pts, vals, feas = sample_value_function(empc, empc_horizon, grid_step=grid_step)
    A2, b2, c2 = fit_quadratic_upper_bound(pts[feas], vals[feas])

    # omega Lyapunov cost (reference parity, terminal_ingredients.py:316-321)
    A_om = np.eye(3) - np.diag(k_omega) * dt
    Q_om = Q[6:9, 6:9] + 2.0 * np.linalg.norm(Qu_tilde) * np.diag(k_omega) ** 2
    P_om = la.solve_discrete_lyapunov(A_om, Q_om)

    P9 = np.zeros((9, 9))
    p9 = np.zeros(9)
    for i in range(3):
        P9[i, i] = A2[0, 0]
        P9[i, 3 + i] = P9[3 + i, i] = A2[0, 1]
        P9[3 + i, 3 + i] = A2[1, 1]
        p9[i] = b2[0]
        p9[3 + i] = b2[1]
    P9[6:9, 6:9] = P_om
    c = 3.0 * c2

    # Full polynomial cost: quadratic base + the reference's cross_1/cross_2
    # coupling bounds (`terminal_ingredients.py:341-369`), in the corrected
    # (every-term-prefactored) form -- see `cross_term_tables`.
    term = assemble_terminal_poly(
        P9, p9, c,
        mass=mass,
        inertia=inertia,
        r=r,
        omega_des=omega_des,
        Q=Q,
        k_omega=k_omega,
        qu_tilde_abs=float(np.linalg.norm(Qu_tilde)),
        input_empc_max=r_empc,
        prefactor_all=True,
    )

    # Terminal set: per-axis eMPC domain rows + omega box (calc_terminal_set
    # block structure, terminal_ingredients.py:396-426).
    dom = empc.domain
    nC = dom.num_facets
    blocks = []
    for i in range(3):
        Ai = np.zeros((nC, 9))
        Ai[:, i] = dom.A[:, 0]
        Ai[:, 3 + i] = dom.A[:, 1]
        blocks.append((Ai, dom.b))
    om_rows = np.zeros((6, 9))
    om_rows[0, 6] = om_rows[2, 7] = om_rows[4, 8] = 1.0
    om_rows[1, 6] = om_rows[3, 7] = om_rows[5, 8] = -1.0
    om_b = np.repeat(emax, 2)
    A9 = np.vstack([b[0] for b in blocks] + [om_rows])
    b9 = np.concatenate([b[1] for b in blocks] + [om_b])

    return TerminalIngredients(
        P9=P9,
        p9=p9,
        c=c,
        term=term,
        term_set=Polytope(A9, b9),
        emax=emax,
        r_empc=r_empc,
        meta={
            "uimax": uimax,
            "time_scaling": time_scaling,
            "empc_horizon": empc_horizon,
            "n_grid": int(feas.sum()),
        },
    )


# ----------------------------------------------------------------------------
# Serialization (data-only)
# ----------------------------------------------------------------------------

def save_terminal_ingredients(ti: TerminalIngredients, path: str | Path) -> None:
    np.savez(
        path,
        P9=ti.P9,
        p9=ti.p9,
        c=ti.c,
        poly_P=np.asarray(ti.term.P),
        poly_p=np.asarray(ti.term.p),
        poly_const=np.asarray(ti.term.c),
        poly_c=np.asarray(ti.term.poly_c),
        poly_pow=np.asarray(ti.term.poly_pow),
        sqrt_c=np.asarray(ti.term.sqrt_c),
        sqrt_pow=np.asarray(ti.term.sqrt_pow),
        app=np.asarray(ti.term.app),
        term_A=ti.term_set.A,
        term_b=ti.term_set.b,
        emax=ti.emax,
        r_empc=ti.r_empc,
        meta=json.dumps(ti.meta),
    )


def load_terminal_ingredients(path: str | Path) -> TerminalIngredients:
    z = np.load(path, allow_pickle=False)
    if "poly_P" in z:
        term = TerminalPoly(
            P=z["poly_P"], p=z["poly_p"], c=z["poly_const"],
            poly_c=z["poly_c"], poly_pow=z["poly_pow"],
            sqrt_c=z["sqrt_c"], sqrt_pow=z["sqrt_pow"], app=z["app"],
        )
    else:  # round-1 cache (quadratic-only): upgrade in place
        from ft_mpc_tpu.terminal.poly import quadratic_terminal

        term = quadratic_terminal(z["P9"], z["p9"], float(z["c"]))
    return TerminalIngredients(
        P9=z["P9"],
        p9=z["p9"],
        c=float(z["c"]),
        term=term,
        term_set=Polytope(z["term_A"], z["term_b"]),
        emax=z["emax"],
        r_empc=float(z["r_empc"]),
        meta=json.loads(str(z["meta"])),
    )


def cache_key(fault_pattern, tuning: dict, plant: dict | None = None) -> str:
    """Stable key for the per-fault-class cache.

    `plant` carries the physical identity (mass, inertia, dt, D, ...) so
    different vehicles with the same tuning never collide.
    """
    payload = json.dumps(
        {
            # cache format version (v2: + cross-term tables; v3: fault-aware
            # orbit selection -- pre-v3 fallback entries must re-search)
            "v": 3,
            "faults": sorted((int(f.index), float(f.intensity)) for f in fault_pattern),
            "tuning": {k: tuning[k] for k in sorted(tuning) if k != "sqp_iters"},
            "plant": plant or {},
        },
        sort_keys=True,
        default=float,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def plant_fingerprint(params) -> dict:
    """Cache-key identity of a BodyParams plant."""
    return {
        "mass": float(params.mass),
        "inertia": np.asarray(params.inertia).round(12).tolist(),
        "dt": float(params.dt),
        "max_thrust": float(params.max_thrust),
        "D": np.asarray(params.D).round(12).tolist(),
    }


def main() -> None:
    """CLI: regenerate the terminal cache for the active config."""
    import argparse

    from ft_mpc_tpu.api import DEFAULT_TUNING
    from ft_mpc_tpu.controllers.spiral_params import SpiralParameters
    from ft_mpc_tpu.geometry.zonotope import attainable_wrench_polytope
    from ft_mpc_tpu.ops.dynamics import BodyParams
    from ft_mpc_tpu.utils.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = load_config(args.config)
    tuning = {**DEFAULT_TUNING, **cfg.tuning}
    params = BodyParams.default(cfg.time_step)
    D = np.asarray(params.D)
    ff = np.zeros(16)
    for f in cfg.faults:
        if f.start_time == 0:
            ff[f.index] = f.intensity * float(params.max_thrust)
    broken = (ff > 0).astype(float)
    sp = SpiralParameters.compute(float(params.mass), np.asarray(params.inertia), D @ ff)
    hull = attainable_wrench_polytope(D, float(params.max_thrust), broken, ff / 3.4)

    ti = compute_terminal_ingredients(
        hull=hull,
        M=sp.M,
        f_virt6=np.concatenate([sp.f_virt, np.zeros(3)]),
        omega_des=sp.omega_des,
        r=sp.r,
        mass=float(params.mass),
        inertia=np.asarray(params.inertia),
        dt=cfg.time_step,
        Q=np.asarray(tuning["Q"], dtype=np.float64),
        R=np.asarray(tuning["R"], dtype=np.float64),
        k_omega=tuning["k_omega"],
        max_acceleration=float(tuning.get("max_acceleration", 0.0)),
        time_scaling=float(tuning.get("time_scaling", 5)),
        empc_horizon=int(tuning.get("empc_horizon", 3)),
    )
    out = args.out or str(
        Path(__file__).parent.parent / "config"
        / f"terminal_{cache_key(cfg.faults, tuning, plant_fingerprint(params))}.npz"
    )
    save_terminal_ingredients(ti, out)
    print(f"terminal ingredients written to {out}")
    print(f"  emax={ti.emax}, r_empc={ti.r_empc:.4f}")
    print(f"  P9 diag: {np.round(np.diag(ti.P9), 3)}")


if __name__ == "__main__":
    main()
