"""Stagewise (banded-KKT) ADMM for the MPC subproblem: long-horizon backend.

The condensed backend (`solvers/mpc_qp.py`) eliminates states; its
factorization is O((Nt nu)^3) and its prediction matrices O(Nt^2) -- the
right trade at the reference's Nt = 15.  This backend keeps states as
variables and hard-codes the dynamics into every ADMM x-update as an LQR
solve via Riccati recursion (`solvers/riccati.py`): per-iteration cost is
O(Nt) sequential or O(log Nt) with the associative scan, and nothing
quadratic in the horizon is ever materialized.  This is the
"parallel-in-horizon" answer to long-horizon MPC (the workload's analogue of
sequence parallelism; SURVEY.md section 5).

Splitting:  min  J(dx, du)   s.t.  dynamics (hard, inside the LQR),
            z_h = hull_A du_t <= h_hull,   z_T = T dx_N[0:9] <= h_term.

x-update = LQR with per-stage costs augmented by sigma-prox and rho-penalty
terms; z/y updates are the usual clipped ADMM steps.

Within a phase rho is fixed, so the Riccati quadratic data never changes:
the backward pass is FACTORED once per phase (`lqr_factor`) and every ADMM
iteration is a matvec-only re-solve (`lqr_resolve`) -- the stagewise
analogue of the condensed backend's one-factorization-per-phase discipline.
Between phases rho adapts by the same scaled-residual rule as
`mpc_qp.solve_mpc_qp`, and (rho, duals) carry across SQP iterations and
control steps exactly like the condensed path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ft_mpc_tpu.solvers.riccati import (
    LQRProblem,
    lqr_factor,
    lqr_resolve,
    lqr_resolve_assoc,
    lqr_solve,
)


class StagewiseMPCQP(NamedTuple):
    """Stagewise QP data in delta variables around the SQP linearization.

    Objective (matching the condensed assembly in `controllers/spiraling`):
        sum_{t=1..Nt-1} dx_t' Qx dx_t + 2 gx_t' dx_t
      + sum_{t=0..Nt-1} du_t' Ru du_t + 2 gu_t' du_t
      + dx_N' QxN dx_N + gxN' dx_N
    s.t. dx_{t+1} = A_t dx_t + B_t du_t + c_t,  dx_0 = 0,
         hull_A du_t <= h_hull_t,   T dx_N <= h_term.
    """

    A: jnp.ndarray  # (Nt, n, n)
    B: jnp.ndarray  # (Nt, n, m)
    c: jnp.ndarray  # (Nt, n) defects
    Qx: jnp.ndarray  # (n, n) stage state cost (embedded 9-d)
    gx: jnp.ndarray  # (Nt+1, n) linear state terms (index 0 unused)
    Ru: jnp.ndarray  # (m, m)
    gu: jnp.ndarray  # (Nt, m)
    QxN: jnp.ndarray  # (n, n)
    hull_A: jnp.ndarray  # (F, m)
    h_hull: jnp.ndarray  # (Nt, F)
    T: jnp.ndarray  # (Tm, n) terminal rows (masked rows zeroed, n-embedded)
    h_term: jnp.ndarray  # (Tm,)
    # Optional per-stage state-row block Cx dx_t <= h_box_t for t = 1..Nt
    # (the stagewise form of the reference's state box,
    # `spiraling_mpc.py:180-185`; mirrors the hull block but on states).
    # Zero-row Cx (shape (0, n)) disables it statically.
    Cx: jnp.ndarray | None = None  # (S, n)
    h_box: jnp.ndarray | None = None  # (Nt, S)


class StagewiseConfig(NamedTuple):
    iters: int = 40
    phases: int = 1  # rho re-factorizations; total iterations = iters*phases
    rho: float = 50.0
    rho_min: float = 1.0
    rho_max: float = 1e4
    # Per-phase rho change bound; tight (1.5) when (rho, duals) are carried
    # across solves, loose (5.0) for cold solves.
    adapt_clip: float = 5.0
    sigma: float = 1e-6
    alpha: float = 1.6
    # riccati backend: 'scan' (sequential factored resolve) | 'assoc'
    # (refactor + associative-scan solve per iteration) | 'scan-assoc'
    # (factored once per phase, associative-scan resolve -- the batched
    # long-horizon default: O(log Nt) depth per ADMM iteration).
    mode: str = "scan"
    # Elastic terminal rows: identical l1 exact-penalty dual clamp as the
    # condensed backend (`mpc_qp.StructuredADMMConfig.elastic_y_max`).
    # Feasible QPs with ||y_term*||_inf below the clamp solve UNCHANGED
    # (exact penalty theorem); genuinely infeasible restoration QPs
    # converge to the minimum-violation point with the violation reported
    # as `term_gap` instead of stalling r_prim at the infeasibility floor.
    # 0 disables (hard rows).
    elastic_y_max: float = 1e3


class StagewiseSolution(NamedTuple):
    dX: jnp.ndarray  # (Nt+1, n)
    dU: jnp.ndarray  # (Nt, m)
    y_hull: jnp.ndarray
    y_term: jnp.ndarray
    rho: jnp.ndarray  # adapted penalty, carry into the next solve's rho0
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    # max violation of dual-clamped elastic terminal rows (0 when the
    # restoration step is feasible; the infeasibility gap otherwise)
    term_gap: jnp.ndarray = 0.0  # plain float: no import-time backend init


@partial(jax.jit, static_argnames=("cfg",))
def solve_mpc_qp_stagewise(
    qp: StagewiseMPCQP,
    cfg: StagewiseConfig = StagewiseConfig(),
    y_hull0: jnp.ndarray | None = None,
    y_term0: jnp.ndarray | None = None,
    rho0: jnp.ndarray | None = None,
) -> StagewiseSolution:
    Nt, n, m = qp.B.shape
    F = qp.hull_A.shape[0]
    dtype = qp.A.dtype

    AhTAh = qp.hull_A.T @ qp.hull_A
    TtT = qp.T.T @ qp.T
    # Optional stage state-row block; zero-row Cx degenerates every box
    # term below to a no-op (empty contractions are free).
    Cx = qp.Cx if qp.Cx is not None else jnp.zeros((0, n), dtype)
    h_box = qp.h_box if qp.h_box is not None else jnp.zeros((Nt, 0), dtype)
    S_box = Cx.shape[0]
    CtC = Cx.T @ Cx  # (n, n); zeros when S_box == 0
    eye_n = jnp.eye(n, dtype=dtype)
    eye_m = jnp.eye(m, dtype=dtype)
    zeros_x = jnp.zeros(n, dtype)

    def x_update_factored(fact, resolve, dX, dU, zh, zt, zb, yh, yt, yb, rho):
        vh = zh - yh / rho  # (Nt, F)
        vt = zt - yt / rho  # (Tm,)
        vb = zb - yb / rho  # (Nt, S)
        r_lin = 2.0 * qp.gu - cfg.sigma * dU - rho * (vh @ qp.hull_A)
        q_lin = 2.0 * qp.gx[1:] - cfg.sigma * dX[1:] - rho * (vb @ Cx)
        qN_lin = q_lin[-1] - rho * (qp.T.T @ vt)
        q_full = jnp.concatenate([zeros_x[None], q_lin[:-1]], axis=0)
        return resolve(fact, q_full, r_lin, qN_lin, zeros_x)

    def x_update_assoc(rho, dX, dU, zh, zt, zb, yh, yt, yb):
        vh = zh - yh / rho
        vt = zt - yt / rho
        vb = zb - yb / rho
        r_lin = 2.0 * qp.gu - cfg.sigma * dU - rho * (vh @ qp.hull_A)
        q_lin = 2.0 * qp.gx[1:] - cfg.sigma * dX[1:] - rho * (vb @ Cx)
        qN_lin = q_lin[-1] - rho * (qp.T.T @ vt)
        Q_stage = 2.0 * qp.Qx + cfg.sigma * eye_n + rho * CtC
        R_stage = 2.0 * qp.Ru + cfg.sigma * eye_m + rho * AhTAh
        QN = 2.0 * qp.QxN + cfg.sigma * eye_n + rho * (TtT + CtC)
        prob = LQRProblem(
            A=qp.A, B=qp.B, c=qp.c,
            Q=jnp.broadcast_to(Q_stage, (Nt, n, n)),
            q=jnp.concatenate([zeros_x[None], q_lin[:-1]], axis=0),
            R=jnp.broadcast_to(R_stage, (Nt, m, m)),
            r=r_lin, QN=QN, qN=qN_lin, x0=zeros_x,
        )
        sol = lqr_solve(prob, mode="assoc")
        return sol.X, sol.U

    def Gx(dX, dU):
        return dU @ qp.hull_A.T, qp.T @ dX[-1], dX[1:] @ Cx.T

    dX0 = jnp.zeros((Nt + 1, n), dtype)
    dU0 = jnp.zeros((Nt, m), dtype)
    yh0 = jnp.zeros((Nt, F), dtype) if y_hull0 is None else y_hull0
    yt0 = jnp.zeros(qp.h_term.shape, dtype) if y_term0 is None else y_term0
    yb0 = jnp.zeros((Nt, S_box), dtype)
    zh0 = jnp.minimum(jnp.zeros((Nt, F), dtype), qp.h_hull)
    zt0 = jnp.minimum(qp.T @ dX0[-1], qp.h_term)
    zb0 = jnp.minimum(jnp.zeros((Nt, S_box), dtype), h_box)
    rho_init = (
        jnp.asarray(cfg.rho, dtype)
        if rho0 is None
        else jnp.clip(rho0, cfg.rho_min, cfg.rho_max).astype(dtype)
    )

    def run_phase(carry, _):
        dX, dU, zh, zt, zb, yh, yt, yb, rho = carry
        if cfg.mode in ("scan", "scan-assoc"):
            # one Riccati factorization for the whole phase (rho fixed)
            Q_stage = 2.0 * qp.Qx + cfg.sigma * eye_n + rho * CtC
            R_stage = 2.0 * qp.Ru + cfg.sigma * eye_m + rho * AhTAh
            QN = 2.0 * qp.QxN + cfg.sigma * eye_n + rho * (TtT + CtC)
            # 'scan-assoc': factor SEQUENTIALLY (once per phase -- cheap,
            # and lqr_factor_assoc's combine needs two batched 13x13
            # inverses per scan level, the slow-XLA pattern), resolve with
            # the associative scans (40x per phase, the hot path).
            factor = lqr_factor
            resolve = lqr_resolve if cfg.mode == "scan" else lqr_resolve_assoc
            fact = factor(qp.A, qp.B, qp.c, Q_stage, R_stage, QN)
            x_update = partial(x_update_factored, fact, resolve)
        else:
            x_update = partial(x_update_assoc, rho)

        def body(_, st):
            dX, dU, zh, zt, zb, yh, yt, yb = st
            if cfg.mode in ("scan", "scan-assoc"):
                dX_t, dU_t = x_update(dX, dU, zh, zt, zb, yh, yt, yb, rho)
            else:
                dX_t, dU_t = x_update(dX, dU, zh, zt, zb, yh, yt, yb)
            dX_new = cfg.alpha * dX_t + (1 - cfg.alpha) * dX
            dU_new = cfg.alpha * dU_t + (1 - cfg.alpha) * dU
            Gh_t, Gt_t, Gb_t = Gx(dX_t, dU_t)
            zh_hat = cfg.alpha * Gh_t + (1 - cfg.alpha) * zh
            zt_hat = cfg.alpha * Gt_t + (1 - cfg.alpha) * zt
            zb_hat = cfg.alpha * Gb_t + (1 - cfg.alpha) * zb
            zh_new = jnp.minimum(zh_hat + yh / rho, qp.h_hull)
            vt = zt_hat + yt / rho
            vb = zb_hat + yb / rho
            if cfg.elastic_y_max > 0:
                # exact hinge-penalty prox (see mpc_qp.body): consensus
                # converges on infeasible rows, dual saturates at y_max.
                # Box rows get the same elastic treatment as terminal rows
                # (a transiently box-violating linearization must not stall
                # the QP).
                soft = vt > qp.h_term + cfg.elastic_y_max / rho
                zt_new = jnp.where(
                    soft,
                    vt - cfg.elastic_y_max / rho,
                    jnp.minimum(vt, qp.h_term),
                )
                soft_b = vb > h_box + cfg.elastic_y_max / rho
                zb_new = jnp.where(
                    soft_b,
                    vb - cfg.elastic_y_max / rho,
                    jnp.minimum(vb, h_box),
                )
            else:
                zt_new = jnp.minimum(vt, qp.h_term)
                zb_new = jnp.minimum(vb, h_box)
            yh_new = yh + rho * (zh_hat - zh_new)
            yt_new = yt + rho * (zt_hat - zt_new)
            yb_new = yb + rho * (zb_hat - zb_new)
            if cfg.elastic_y_max > 0:
                yt_new = jnp.clip(yt_new, 0.0, cfg.elastic_y_max)
                yb_new = jnp.clip(yb_new, 0.0, cfg.elastic_y_max)
            return (dX_new, dU_new, zh_new, zt_new, zb_new,
                    yh_new, yt_new, yb_new)

        dX, dU, zh, zt, zb, yh, yt, yb = jax.lax.fori_loop(
            0, cfg.iters, body, (dX, dU, zh, zt, zb, yh, yt, yb)
        )

        # scaled-residual rho adaptation (same rule as mpc_qp.run_phase)
        Gh, Gt, Gb = Gx(dX, dU)
        # consensus residual is honest on elastic rows (exact hinge prox);
        # the restoration gap is reported for dual-saturated rows
        term_res = jnp.abs(Gt - zt)
        if cfg.elastic_y_max > 0:
            at_clamp = yt >= 0.999 * cfg.elastic_y_max
            term_gap = jnp.max(
                jnp.where(at_clamp, jnp.maximum(Gt - qp.h_term, 0.0), 0.0)
            )
            at_clamp_b = yb >= 0.999 * cfg.elastic_y_max
            term_gap = jnp.maximum(
                term_gap,
                jnp.max(
                    jnp.where(at_clamp_b, jnp.maximum(Gb - h_box, 0.0), 0.0),
                    initial=0.0,
                ),
            )
        else:
            term_gap = jnp.zeros((), dtype)
        r_prim = jnp.maximum(
            jnp.max(jnp.abs(Gh - zh)), jnp.max(term_res)
        )
        r_prim = jnp.maximum(r_prim, jnp.max(jnp.abs(Gb - zb), initial=0.0))
        r_dual = jnp.max(
            jnp.abs(2.0 * (dU @ qp.Ru) + 2.0 * qp.gu + yh @ qp.hull_A)
        )
        prim_scale = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Gh)), jnp.max(jnp.abs(zh))), 1e-6
        )
        dual_scale = jnp.maximum(jnp.max(jnp.abs(2.0 * dU @ qp.Ru)), 1e-6)
        ratio = (r_prim / prim_scale) / jnp.maximum(r_dual / dual_scale, 1e-12)
        factor = jnp.clip(jnp.sqrt(ratio), 1.0 / cfg.adapt_clip, cfg.adapt_clip)
        # freeze once converged: the ratio is noise there and a carried rho
        # would random-walk (same rule as the condensed/lanes backends)
        factor = jnp.where(r_prim <= 1e-4, 1.0, factor)
        rho_new = jnp.clip(rho * factor, cfg.rho_min, cfg.rho_max)
        return (dX, dU, zh, zt, zb, yh, yt, yb, rho_new), (r_prim, r_dual, term_gap)

    (dX, dU, zh, zt, zb, yh, yt, yb, rho_out), (rps, rds, gaps) = jax.lax.scan(
        run_phase, (dX0, dU0, zh0, zt0, zb0, yh0, yt0, yb0, rho_init), None,
        length=cfg.phases,
    )
    return StagewiseSolution(
        dX=dX, dU=dU, y_hull=yh, y_term=yt, rho=rho_out,
        r_prim=rps[-1], r_dual=rds[-1], term_gap=gaps[-1],
    )


@partial(jax.jit, static_argnames=("cfg",))
def solve_mpc_qp_stagewise_lanes(
    qp: StagewiseMPCQP,  # every leaf with a leading batch axis B
    cfg: StagewiseConfig = StagewiseConfig(),
    y_hull0: jnp.ndarray | None = None,
    y_term0: jnp.ndarray | None = None,
    rho0: jnp.ndarray | None = None,
) -> StagewiseSolution:
    """Batched stagewise solve on the lane-fused Pallas LQR resolve.

    Semantics match vmap(solve_mpc_qp_stagewise) with mode='scan' (same
    per-phase sequential factorization, same elastic hinge prox, same
    rho rule), but every ADMM x-update runs as TWO Pallas kernel launches
    (`solvers/lanes_riccati.py`) instead of 2*Nt vmapped XLA dispatches --
    the launch-overhead fix that makes long horizons batch-deployable
    (VERDICT r3 next-step 6).
    """
    from ft_mpc_tpu.solvers.lanes_riccati import lqr_resolve_lanes
    from ft_mpc_tpu.solvers.riccati import lqr_factor

    B, Nt, n, m = qp.B.shape
    F = qp.hull_A.shape[-2]
    dtype = qp.A.dtype

    AhTAh = jnp.einsum("bfi,bfj->bij", qp.hull_A, qp.hull_A)
    TtT = jnp.einsum("bti,btj->bij", qp.T, qp.T)
    # Optional stage state-row block (see solve_mpc_qp_stagewise)
    Cx = qp.Cx if qp.Cx is not None else jnp.zeros((B, 0, n), dtype)
    h_box = qp.h_box if qp.h_box is not None else jnp.zeros((B, Nt, 0), dtype)
    S_box = Cx.shape[-2]
    CtC = jnp.einsum("bsi,bsj->bij", Cx, Cx)
    eye_n = jnp.eye(n, dtype=dtype)
    eye_m = jnp.eye(m, dtype=dtype)
    zeros_x = jnp.zeros((B, n), dtype)

    def Gx(dX, dU):
        Gh = jnp.einsum("btm,bfm->btf", dU, qp.hull_A)
        Gt = jnp.einsum("btn,bn->bt", qp.T, dX[:, -1])
        Gb = jnp.einsum("btn,bsn->bts", dX[:, 1:], Cx)
        return Gh, Gt, Gb

    dX0 = jnp.zeros((B, Nt + 1, n), dtype)
    dU0 = jnp.zeros((B, Nt, m), dtype)
    yh0 = jnp.zeros((B, Nt, F), dtype) if y_hull0 is None else y_hull0
    yt0 = jnp.zeros(qp.h_term.shape, dtype) if y_term0 is None else y_term0
    yb0 = jnp.zeros((B, Nt, S_box), dtype)
    zh0 = jnp.minimum(jnp.zeros((B, Nt, F), dtype), qp.h_hull)
    zt0 = jnp.minimum(jnp.einsum("btn,bn->bt", qp.T, dX0[:, -1]), qp.h_term)
    zb0 = jnp.minimum(jnp.zeros((B, Nt, S_box), dtype), h_box)
    rho_init = (
        jnp.full((B,), cfg.rho, dtype)
        if rho0 is None
        else jnp.clip(jnp.broadcast_to(rho0, (B,)), cfg.rho_min, cfg.rho_max
                      ).astype(dtype)
    )

    def run_phase(carry, _):
        dX, dU, zh, zt, zb, yh, yt, yb, rho = carry
        # one batched Riccati factorization for the whole phase (rho fixed)
        Q_stage = (
            2.0 * qp.Qx + cfg.sigma * eye_n[None]
            + rho[:, None, None] * CtC
        )
        R_stage = (
            2.0 * qp.Ru + cfg.sigma * eye_m[None]
            + rho[:, None, None] * AhTAh
        )
        QN = (
            2.0 * qp.QxN + cfg.sigma * eye_n[None]
            + rho[:, None, None] * (TtT + CtC)
        )
        fact = jax.vmap(lqr_factor)(qp.A, qp.B, qp.c, Q_stage, R_stage, QN)

        def body(_, st):
            dX, dU, zh, zt, zb, yh, yt, yb = st
            vh = zh - yh / rho[:, None, None]
            vt = zt - yt / rho[:, None]
            vb = zb - yb / rho[:, None, None]
            r_lin = (
                2.0 * qp.gu - cfg.sigma * dU
                - rho[:, None, None] * jnp.einsum("btf,bfm->btm", vh, qp.hull_A)
            )
            q_lin = (
                2.0 * qp.gx[:, 1:] - cfg.sigma * dX[:, 1:]
                - rho[:, None, None] * jnp.einsum("bts,bsn->btn", vb, Cx)
            )
            qN_lin = q_lin[:, -1] - rho[:, None] * jnp.einsum(
                "btn,bt->bn", qp.T, vt
            )
            q_full = jnp.concatenate(
                [zeros_x[:, None], q_lin[:, :-1]], axis=1
            )
            dX_t, dU_t = lqr_resolve_lanes(fact, q_full, r_lin, qN_lin, zeros_x)
            dX_new = cfg.alpha * dX_t + (1 - cfg.alpha) * dX
            dU_new = cfg.alpha * dU_t + (1 - cfg.alpha) * dU
            Gh_t, Gt_t, Gb_t = Gx(dX_t, dU_t)
            zh_hat = cfg.alpha * Gh_t + (1 - cfg.alpha) * zh
            zt_hat = cfg.alpha * Gt_t + (1 - cfg.alpha) * zt
            zb_hat = cfg.alpha * Gb_t + (1 - cfg.alpha) * zb
            zh_new = jnp.minimum(zh_hat + yh / rho[:, None, None], qp.h_hull)
            vt_z = zt_hat + yt / rho[:, None]
            vb_z = zb_hat + yb / rho[:, None, None]
            if cfg.elastic_y_max > 0:
                # exact hinge-penalty prox (see solve_mpc_qp_stagewise)
                soft_shift = cfg.elastic_y_max / rho[:, None]
                zt_new = jnp.where(
                    vt_z > qp.h_term + soft_shift,
                    vt_z - soft_shift,
                    jnp.minimum(vt_z, qp.h_term),
                )
                soft_b = cfg.elastic_y_max / rho[:, None, None]
                zb_new = jnp.where(
                    vb_z > h_box + soft_b,
                    vb_z - soft_b,
                    jnp.minimum(vb_z, h_box),
                )
            else:
                zt_new = jnp.minimum(vt_z, qp.h_term)
                zb_new = jnp.minimum(vb_z, h_box)
            yh_new = yh + rho[:, None, None] * (zh_hat - zh_new)
            yt_new = yt + rho[:, None] * (zt_hat - zt_new)
            yb_new = yb + rho[:, None, None] * (zb_hat - zb_new)
            if cfg.elastic_y_max > 0:
                yt_new = jnp.clip(yt_new, 0.0, cfg.elastic_y_max)
                yb_new = jnp.clip(yb_new, 0.0, cfg.elastic_y_max)
            return (dX_new, dU_new, zh_new, zt_new, zb_new,
                    yh_new, yt_new, yb_new)

        dX, dU, zh, zt, zb, yh, yt, yb = jax.lax.fori_loop(
            0, cfg.iters, body, (dX, dU, zh, zt, zb, yh, yt, yb)
        )

        Gh, Gt, Gb = Gx(dX, dU)
        term_res = jnp.abs(Gt - zt)
        if cfg.elastic_y_max > 0:
            at_clamp = yt >= 0.999 * cfg.elastic_y_max
            term_gap = jnp.max(
                jnp.where(at_clamp, jnp.maximum(Gt - qp.h_term, 0.0), 0.0),
                axis=1,
            )
            at_clamp_b = yb >= 0.999 * cfg.elastic_y_max
            term_gap = jnp.maximum(
                term_gap,
                jnp.max(
                    jnp.where(at_clamp_b, jnp.maximum(Gb - h_box, 0.0), 0.0),
                    axis=(1, 2), initial=0.0,
                ),
            )
        else:
            term_gap = jnp.zeros((B,), dtype)
        r_prim = jnp.maximum(
            jnp.max(jnp.abs(Gh - zh), axis=(1, 2)), jnp.max(term_res, axis=1)
        )
        r_prim = jnp.maximum(
            r_prim, jnp.max(jnp.abs(Gb - zb), axis=(1, 2), initial=0.0)
        )
        r_dual = jnp.max(
            jnp.abs(
                2.0 * jnp.einsum("btm,bmk->btk", dU, qp.Ru) + 2.0 * qp.gu
                + jnp.einsum("btf,bfm->btm", yh, qp.hull_A)
            ),
            axis=(1, 2),
        )
        prim_scale = jnp.maximum(
            jnp.maximum(
                jnp.max(jnp.abs(Gh), axis=(1, 2)),
                jnp.max(jnp.abs(zh), axis=(1, 2)),
            ),
            1e-6,
        )
        dual_scale = jnp.maximum(
            jnp.max(
                jnp.abs(2.0 * jnp.einsum("btm,bmk->btk", dU, qp.Ru)),
                axis=(1, 2),
            ),
            1e-6,
        )
        ratio = (r_prim / prim_scale) / jnp.maximum(r_dual / dual_scale, 1e-12)
        factor = jnp.clip(jnp.sqrt(ratio), 1.0 / cfg.adapt_clip, cfg.adapt_clip)
        factor = jnp.where(r_prim <= 1e-4, 1.0, factor)
        rho_new = jnp.clip(rho * factor, cfg.rho_min, cfg.rho_max)
        return (dX, dU, zh, zt, zb, yh, yt, yb, rho_new), (r_prim, r_dual, term_gap)

    (dX, dU, zh, zt, zb, yh, yt, yb, rho_out), (rps, rds, gaps) = jax.lax.scan(
        run_phase, (dX0, dU0, zh0, zt0, zb0, yh0, yt0, yb0, rho_init), None,
        length=cfg.phases,
    )
    return StagewiseSolution(
        dX=dX, dU=dU, y_hull=yh, y_term=yt, rho=rho_out,
        r_prim=rps[-1], r_dual=rds[-1], term_gap=gaps[-1],
    )
