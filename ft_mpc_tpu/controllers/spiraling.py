"""Spiraling (micro-orbiting) MPC as a real-time-iteration SQP, fully on-device.

This is the TPU-native replacement for `SpiralingController`
(`ft_mpc/controllers/spiraling_mpc.py`).  The reference builds a 298-variable
CasADi NLP once and calls IPOPT (C++/Fortran, host CPU) every control step
(`spiraling_mpc.py:230,346`).  Here each control step is a fixed number of
SQP iterations, each of which:

  1. linearizes the orbit-center dynamics along the warm-started trajectory
     with `jax.jacfwd` (the state-dependent rotation of the nominal input,
     `spiraling_mpc.py:156-166`, is differentiated through automatically);
  2. condenses the horizon (eliminates states) into a dense 90-variable QP
     via a `lax.scan` over prediction matrices;
  3. solves the QP with the batched adaptive-rho ADMM solver.

Everything is shape-static and vmappable: one jitted function serves a
single scenario or a bank of thousands (fault patterns are `Scenario` data).

Problem-structure parity with the reference NLP (`build_solver`,
`spiraling_mpc.py:87-230`):
  * decision: inputs u_0..u_{Nt-1} (6 each, deviations from rotated nominal
    + compensation) and states x_0..x_{Nt} (13 each, eliminated here);
  * dynamics: RK4 shooting equalities (`:170-172`) -> condensing defects;
  * input constraints: hull rows A (u_t + u_r + u_comp + u_uncontrolled) <= b
    (`:133-146,174-177`), frozen at the linearization point (RTI);
  * running cost e^T Q e + u^T R u on the first 9 states (`:187-188`);
  * terminal cost + polytopic terminal set on the 9-d error (`:190-202`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ft_mpc_tpu.geometry.scenario import Scenario
from ft_mpc_tpu.ops.dynamics import BodyParams, center_step, robot_to_center
from ft_mpc_tpu.ops.quaternion import rot_full, rot_full_inv
from ft_mpc_tpu.solvers.allocation import AllocationResult, allocate_thrusters
from ft_mpc_tpu.solvers.mpc_qp import (
    StructuredADMMConfig,
    StructuredMPCQP,
    solve_mpc_qp,
)
from ft_mpc_tpu.solvers.mpc_qp_stagewise import (
    StagewiseConfig,
    StagewiseMPCQP,
    solve_mpc_qp_stagewise,
)
from ft_mpc_tpu.terminal.poly import (
    terminal_gradient,
    terminal_hessian_psd,
    terminal_value,
)

_BIG = 1e8
N_X = 13
N_U = 6
N_OPT = 9  # states with running cost: pos, vel, omega


class MPCConfig(NamedTuple):
    """Static controller configuration (hashable; part of the jit key)."""

    horizon: int = 15
    sqp_iters: int = 3
    admm: StructuredADMMConfig = StructuredADMMConfig(iters=30, phases=1, rho=50.0)
    # QP backend: 'condensed' (dense, states eliminated -- best for short
    # horizons) or 'stagewise' (Riccati-in-ADMM banded KKT -- O(Nt) or
    # O(log Nt) per iteration, for long horizons).
    qp_backend: str = "condensed"
    stagewise: StagewiseConfig = StagewiseConfig()
    # Proximal (Levenberg-style) damping added to the QP Hessian diagonal.
    # delta_U = 0 stays optimal at a KKT point, so fixed points are unchanged.
    prox: float = 0.0
    # Fixed-candidate merit line search (the globalization role IPOPT's
    # filter line search plays in the reference, done with static shapes:
    # all candidates are evaluated in one vmap and the best is selected).
    ls_alphas: tuple = (1.0, 0.5, 0.0)
    ls_penalty: float = 1e3  # l1 penalty weight on defects + violations
    # Newton-Schulz refresh steps for the carried ADMM inverse metric on
    # the lane-fused batched path (`sqp_solve_batch`).
    newton_iters: int = 3
    # Tail cleanup (lane-fused batched path only).  A warm-started batch's
    # QP residual distribution is heavy-tailed: the median scenario
    # converges in tens of ADMM iterations while a few hard double-fault
    # geometries (large terminal-Hessian curvature spread, diag(H) ratio
    # up to ~1e5) dominate max r_prim for hundreds of iterations.  Rather
    # than paying a worst-case iteration count on all B scenarios, the K
    # scenarios with the worst primal residual after the SQP scan get one
    # extra SQP iteration with an exact re-factored inverse metric and a
    # cleanup_iters x cleanup_phases ADMM budget (gather -> solve ->
    # scatter; ~K/B of a full step).  0 disables.
    cleanup_iters: int = 0
    cleanup_k: int = 256
    cleanup_phases: int = 2
    # Number of worst-K cleanup passes.  Each round re-ranks by
    # r_prim + du_norm + defect and gives the current worst K one more
    # exact-metric SQP iteration, so transient scenarios can receive
    # several extra iterations while converged rows drop out of the
    # ranking (VERDICT r4 item 1).
    cleanup_rounds: int = 1
    # Convergence-gated refinement (transient accuracy, VERDICT r4 item 1).
    # After the fixed sqp_iters scan, up to refine_iters FURTHER SQP
    # iterations run, each skipped (lax.cond -- no compute when taken
    # branch is the skip) once max(r_prim, du_norm) <= refine_tol.  Steady-
    # state warm-started solves converge within the base budget and pay
    # nothing; transient solves (fault switch, aggressive initial states)
    # iterate until the SQP step is below tolerance instead of stopping
    # under-converged -- the source of the r4 transient deviation
    # (1.3-2.7 N vs the float64 golden).  0 disables.
    refine_iters: int = 0
    refine_tol: float = 1e-3
    # ADMM budget for refine iterations.  The deployed fast budget (e.g.
    # 60 iters x 1 phase) cannot drive r_prim to refine_tol during
    # feasibility restoration, so refine iterations would burn their whole
    # budget without converging; None reuses cfg.admm (cheap), a stronger
    # config here makes each refine iteration an exact-class solve.
    refine_admm: StructuredADMMConfig | None = None
    # Terminal-set feasibility restoration: when the linearization point
    # violates a terminal row (h_term < 0, i.e. outside the certified
    # region of attraction), the QP row is relaxed to require the violation
    # shrink by this factor per SQP iteration instead of vanishing at once
    # (an infeasible QP would stall the SQP at du = 0, which is how the
    # reference fails there -- IPOPT reports infeasible,
    # `spiraling_mpc.py:347-353`).  Rows with h_term >= 0 stay exact, so
    # fixed points inside the region of attraction are unchanged.
    term_relax: float = 0.5


class MPCWeights(NamedTuple):
    """Cost data + optional stage constraint bounds (traced; lives on device).

    x_lb/x_ub are the reference's optional per-stage state box
    (`ft_mpc/controllers/spiraling_mpc.py:180-185`: rows xlb <= x_t <= xub
    on the full 13-d state for every non-terminal stage; the reference's
    t = 0 row is vacuous because x_0 is pinned to the measurement, so here
    the box is enforced at stages 1..Nt-1).  Entries at +/-1e8 (or beyond)
    are treated as unbounded.  du_max is a per-step rate bound on the total
    commanded wrench, |w_t - w_{t-1}| <= du_max for t = 1..Nt-1
    (beyond-reference: the reference NLP has no rate rows; BASELINE
    config 4).  Presence of these fields is static (part of the jit key
    via the pytree structure): when None, zero extra rows are built and
    the QP is bit-identical to the unconstrained problem.
    """

    Q: jnp.ndarray  # (9, 9)
    R: jnp.ndarray  # (6, 6)
    x_lb: jnp.ndarray | None = None  # (13,) stage state lower bounds
    x_ub: jnp.ndarray | None = None  # (13,) stage state upper bounds
    du_max: jnp.ndarray | None = None  # (6,) wrench rate bound per step

    @classmethod
    def from_diagonals(cls, q, r, x_lb=None, x_ub=None, du_max=None) -> "MPCWeights":
        f = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        opt = lambda v: None if v is None else jnp.asarray(v, f)
        return cls(Q=jnp.diag(jnp.asarray(q, f)), R=jnp.diag(jnp.asarray(r, f)),
                   x_lb=opt(x_lb), x_ub=opt(x_ub), du_max=opt(du_max))

    @property
    def has_state_box(self) -> bool:
        return self.x_lb is not None or self.x_ub is not None


def n_extra_rows(weights: MPCWeights, horizon: int) -> int:
    """Static count of extra dense rows (state box + rate) in the term block."""
    E = 0
    if weights.has_state_box:
        E += 2 * N_X * (horizon - 1)
    if weights.du_max is not None:
        E += 2 * N_U * (horizon - 1)
    return E


def _box_bounds(weights: MPCWeights, dtype):
    xub = (jnp.full((N_X,), _BIG, dtype) if weights.x_ub is None
           else jnp.asarray(weights.x_ub, dtype))
    xlb = (jnp.full((N_X,), -_BIG, dtype) if weights.x_lb is None
           else jnp.asarray(weights.x_lb, dtype))
    return xlb, xub


def params_batch_axes(params: BodyParams) -> BodyParams:
    """vmap in_axes spec for a possibly scenario-batched `BodyParams`.

    Per-scenario plant variation (BASELINE config 5: inertia/mass randomized
    from `data/InertialProperties.md`; reference constants at
    `ft_mpc/models/sys_model.py:51-60`) is expressed by giving mass/inertia/
    inertia_inv (and optionally dt) a leading scenario axis while D and
    max_thrust stay shared (thruster geometry does not vary).  Each leaf
    whose ndim exceeds its canonical rank maps over axis 0; the rest are
    broadcast.  An unbatched BodyParams yields all-None (classic shared
    plant) so every existing call is unchanged.
    """
    base = BodyParams(mass=0, inertia=2, inertia_inv=2, max_thrust=0, D=2, dt=0)
    return BodyParams(
        *[0 if jnp.ndim(leaf) > nd else None for leaf, nd in zip(params, base)]
    )


def _params_row(params: BodyParams, p_ax: BodyParams, idx) -> BodyParams:
    """Gather rows idx from the batched leaves of params (shared leaves pass)."""
    return BodyParams(
        *[leaf[idx] if ax == 0 else leaf for leaf, ax in zip(params, p_ax)]
    )


def _ext_rows(weights: MPCWeights, X, S_all, phi_all, stage_offset):
    """Extra dense inequality rows over the condensed decision vector.

    State box (stages 1..Nt-1, `spiraling_mpc.py:180-185` parity):
        +/- S_t dU <= +/-(x_bound - X_t - phi_t)
    Rate rows (stages 1..Nt-1): w_t = dU_t + stage_offset_t, so
        +/-(dU_t - dU_{t-1}) <= du_max -/+ (stage_offset_t - stage_offset_{t-1}).
    Returns (G, h) with E = n_extra_rows(...) rows; caller guarantees E > 0.
    """
    dtype = X.dtype
    Nt = S_all.shape[0]
    n_dec = S_all.shape[-1]
    rows_G, rows_h = [], []
    if weights.has_state_box:
        xlb, xub = _box_bounds(weights, dtype)
        S_box = S_all[:-1].reshape((Nt - 1) * N_X, n_dec)
        x_nom = X[1:-1] + phi_all[:-1]  # predicted stage states at dU = 0
        rows_G += [S_box, -S_box]
        rows_h += [(xub[None] - x_nom).reshape(-1), (x_nom - xlb[None]).reshape(-1)]
    if weights.du_max is not None:
        eyeN = jnp.eye(Nt, dtype=dtype)
        rate_G = jnp.kron(eyeN[1:] - eyeN[:-1], jnp.eye(N_U, dtype=dtype))
        dw = (stage_offset[1:] - stage_offset[:-1]).reshape(-1)
        dmax = jnp.tile(jnp.asarray(weights.du_max, dtype), Nt - 1)
        rows_G += [rate_G, -rate_G]
        rows_h += [dmax - dw, dmax + dw]
    return jnp.concatenate(rows_G, axis=0), jnp.concatenate(rows_h)


class WarmStart(NamedTuple):
    X: jnp.ndarray  # (Nt+1, 13) center-state trajectory
    U: jnp.ndarray  # (Nt, 6) input deviations
    y_hull: jnp.ndarray  # (Nt, F) QP duals of stage hull rows (active-set carry)
    y_term: jnp.ndarray  # (T,) QP duals of terminal rows
    rho: jnp.ndarray  # scalar ADMM penalty carry (cross-step adaptivity)
    # (n, n) warm inverse ADMM metric, Newton-refreshed each solve by the
    # lane-fused batched backend (`sqp_solve_batch`); None on the
    # per-scenario XLA paths, which refactor exactly instead.
    kinv: jnp.ndarray | None = None


class SQPInfo(NamedTuple):
    cost: jnp.ndarray  # realized quadratic objective (diagnostic)
    r_prim: jnp.ndarray  # QP primal residual of last SQP iteration
    r_dual: jnp.ndarray
    defect: jnp.ndarray  # max shooting defect after last iteration
    du_norm: jnp.ndarray  # |delta_U|_inf of last SQP step (SQP convergence)
    # Max violation of the elastic terminal-restoration rows (see
    # StructuredADMMConfig.elastic_y_max): 0 when the restoration step is
    # feasible, the infeasibility gap when the faulted input hull cannot
    # shrink the terminal violation at the required rate.  Provided by
    # EVERY backend (condensed, lanes, stagewise) -- never NaN; 0 when
    # elastic rows are disabled.
    term_gap: jnp.ndarray = 0.0  # plain float: no import-time backend init


def init_warmstart(
    params: BodyParams, scenario: Scenario, cfg: MPCConfig, c0: jnp.ndarray,
    weights: MPCWeights | None = None,
) -> WarmStart:
    """Roll the center dynamics forward with zero deviation input.

    Pass `weights` when it carries stage bounds (x_lb/x_ub/du_max): the
    extra dense rows enlarge the term-block dual vector, and the condensed
    backends carry those duals across steps through `y_term`.
    """

    def step(x, u_ref_zero):
        x1 = center_step(params, scenario.faulty_force_gen, scenario.r, x,
                         scenario.u_comp)
        return x1, x1

    _, X_tail = jax.lax.scan(step, c0, None, length=cfg.horizon)
    X = jnp.concatenate([c0[None], X_tail], axis=0)
    U = jnp.zeros((cfg.horizon, N_U), dtype=c0.dtype)
    F = scenario.hull_A.shape[0]
    T = scenario.term_A.shape[0]
    E = 0 if weights is None else n_extra_rows(weights, cfg.horizon)
    return WarmStart(
        X=X,
        U=U,
        y_hull=jnp.zeros((cfg.horizon, F), dtype=c0.dtype),
        y_term=jnp.zeros(T + E, dtype=c0.dtype),
        rho=jnp.asarray(cfg.admm.rho, dtype=c0.dtype),
    )


def shift_warmstart(warm: WarmStart, c0: jnp.ndarray) -> WarmStart:
    """One-stage shift, pinning the first state to the measurement.

    Matches `solve_mpc`'s warm start (`spiraling_mpc.py:324-334`) except the
    appended tail repeats the last stage instead of zeros (a zero quaternion
    is a poor linearization point; the reference's IPOPT tolerates it, an
    RTI scheme should not).
    """
    X = jnp.concatenate([c0[None], warm.X[2:], warm.X[-1:]], axis=0)
    U = jnp.concatenate([warm.U[1:], warm.U[-1:]], axis=0)
    y_hull = jnp.concatenate([warm.y_hull[1:], warm.y_hull[-1:]], axis=0)
    return WarmStart(
        X=X, U=U, y_hull=y_hull, y_term=warm.y_term, rho=warm.rho, kinv=warm.kinv
    )


def _stage_dynamics(
    params: BodyParams, scenario: Scenario, x: jnp.ndarray, u: jnp.ndarray,
    u_ref_t: jnp.ndarray,
) -> jnp.ndarray:
    """Discrete center dynamics of stage t under deviation input u.

    Total commanded wrench = u + rot(x) u_ref + u_comp; the constant fault
    wrench is added inside `center_step` (data, not symbols).
    """
    u_r = rot_full_inv(x[9:13]) @ u_ref_t
    return center_step(
        params, scenario.faulty_force_gen, scenario.r, x, u + u_r + scenario.u_comp
    )


def _condense(A_stack, B_stack, defects, horizon):
    """Prediction matrices: delta_x_t = S_t delta_U + phi_t for t = 1..Nt.

    One lax.scan; S is (13, Nt*6).
    """
    n_dec = horizon * N_U
    S0 = jnp.zeros((N_X, n_dec), dtype=A_stack.dtype)
    phi0 = jnp.zeros(N_X, dtype=A_stack.dtype)

    def step(carry, inp):
        S, phi = carry
        A_t, B_t, r_t, t = inp
        S_next = A_t @ S
        S_next = jax.lax.dynamic_update_slice(
            S_next,
            jax.lax.dynamic_slice(S_next, (0, t * N_U), (N_X, N_U)) + B_t,
            (0, t * N_U),
        )
        phi_next = A_t @ phi + r_t
        return (S_next, phi_next), (S_next, phi_next)

    ts = jnp.arange(horizon)
    (_, _), (S_all, phi_all) = jax.lax.scan(
        step, (S0, phi0), (A_stack, B_stack, defects, ts)
    )
    return S_all, phi_all  # (Nt, 13, Nt*6), (Nt, 13)


def _masked_geometry(scenario: Scenario):
    """Constraint geometry with padded rows made inert."""
    hull_A = scenario.hull_A * scenario.hull_mask[:, None]
    hull_b = jnp.where(scenario.hull_mask > 0.5, scenario.hull_b, _BIG)
    term_A = scenario.term_A * scenario.term_mask[:, None]
    term_b = jnp.where(scenario.term_mask > 0.5, scenario.term_b, _BIG)
    return hull_A, hull_b, term_A, term_b


def _linearize(params, scenario, cfg, X, U, u_ref):
    """Dynamics values + jacobians along (X, U), and hull offsets."""
    Nt = cfg.horizon
    stage_dyn = partial(_stage_dynamics, params, scenario)
    f_vals = jax.vmap(stage_dyn)(X[:-1], U, u_ref[:Nt])
    A_stack, B_stack = jax.vmap(jax.jacfwd(stage_dyn, argnums=(0, 1)))(
        X[:-1], U, u_ref[:Nt]
    )
    defects = f_vals - X[1:]
    return A_stack, B_stack, defects


def _assemble_condensed(
    params, scenario, weights, cfg, X, U, x_ref, u_ref,
    hull_A, hull_b, term_A, term_b,
):
    """Linearize + condense + dense-QP assembly for one scenario.

    Returns (StructuredMPCQP, S_all, phi_all, defects); vmapped unchanged
    by the batched path.
    """
    Nt = cfg.horizon
    dtype = X.dtype
    n_dec = Nt * N_U
    R_blk = jnp.kron(jnp.eye(Nt, dtype=dtype), weights.R)
    u_unc = scenario.faulty_force_gen

    A_stack, B_stack, defects = _linearize(params, scenario, cfg, X, U, u_ref)

    # Input-hull offsets (RTI: nominal-input rotation frozen).
    u_r_bar = jnp.einsum("tij,tj->ti", rot_full_inv(X[:-1, 9:13]), u_ref[:Nt])
    stage_offset = U + u_r_bar + scenario.u_comp + u_unc  # (Nt, 6)
    h_hull = hull_b[None, :] - stage_offset @ hull_A.T  # (Nt, F)

    S_all, phi_all = _condense(A_stack, B_stack, defects, Nt)
    S9 = S_all[:, :N_OPT, :]  # (Nt, 9, n_dec)
    e0 = X[1:, :N_OPT] + phi_all[:, :N_OPT] - x_ref[1:]  # (Nt, 9)

    # Running cost stages t = 1..Nt-1; terminal at Nt.  The terminal cost is
    # the full polynomial V_f (quadratic + quartic + sqrt-abs tables): exact
    # gradient, convexified Hessian at the linearization point -- for a
    # purely quadratic V_f this reduces bit-exactly to S9' P S9 / 2P e + p.
    S9_run, e0_run = S9[:-1], e0[:-1]
    S9_N, e0_N = S9[-1], e0[-1]
    HV = terminal_hessian_psd(scenario.term, e0_N)  # (9, 9)
    gV = terminal_gradient(scenario.term, e0_N)  # (9,)
    H = 2.0 * (
        jnp.einsum("tin,ij,tjm->nm", S9_run, weights.Q, S9_run)
        + 0.5 * S9_N.T @ HV @ S9_N
        + R_blk
        + cfg.prox * jnp.eye(n_dec, dtype=dtype)
    )
    g = 2.0 * (
        jnp.einsum("tin,ij,tj->n", S9_run, weights.Q, e0_run)
        + R_blk @ U.reshape(-1)
    ) + S9_N.T @ gV

    G_term = term_A @ S9_N
    h_term = term_b - term_A @ e0_N
    # soft feasibility restoration on violated rows (see MPCConfig.term_relax)
    h_term = jnp.maximum(h_term, cfg.term_relax * h_term)

    if n_extra_rows(weights, Nt) > 0:
        # State-box / rate rows ride the dense (elastic) term block: the
        # solvers treat (G_term, h_term) generically, so no backend change
        # is needed and the rows inherit the same restoration relax +
        # l1 exact-penalty elastic behavior as the terminal set.
        G_ext, h_ext = _ext_rows(weights, X, S_all, phi_all, stage_offset)
        h_ext = jnp.maximum(h_ext, cfg.term_relax * h_ext)
        G_term = jnp.concatenate([G_term, G_ext], axis=0)
        h_term = jnp.concatenate([h_term, h_ext])

    qp = StructuredMPCQP(
        H=H, g=g, hull_A=hull_A, h_hull=h_hull, G_term=G_term, h_term=h_term
    )
    return qp, S_all, phi_all, defects


def _assemble_condensed_batch(
    params, bank, weights, cfg, X, U, x_ref, u_ref,
    hull_A, hull_b, term_A, term_b,
):
    """Batched assembly: vmapped linearization, lane-fused condensing
    kernel, plain batched einsums for the dense QP pieces.

    Same math as vmap(_assemble_condensed); the condensing recursion runs
    in one Pallas kernel instead of a 15-step XLA scan.  x_ref carries a
    leading scenario axis (B, Nt+1, 9): omega rows are per-scenario
    (fault-aware orbits may differ across the bank).
    """
    from ft_mpc_tpu.solvers.lanes_condense import condense_lanes

    Nt = cfg.horizon
    dtype = X.dtype
    B = X.shape[0]
    n_dec = Nt * N_U

    p_ax = params_batch_axes(params)
    A_stack, B_stack, defects = jax.vmap(
        lambda p, sc, Xs, Us: _linearize(p, sc, cfg, Xs, Us, u_ref),
        in_axes=(p_ax, 0, 0, 0),
    )(params, bank, X, U)

    u_r_bar = jnp.einsum(
        "btij,tj->bti", rot_full_inv(X[:, :-1, 9:13]), u_ref[:Nt]
    )
    stage_offset = (
        U + u_r_bar + bank.u_comp[:, None, :] + bank.faulty_force_gen[:, None, :]
    )
    h_hull = hull_b[:, None, :] - jnp.einsum("bti,bfi->btf", stage_offset, hull_A)

    S_all, phi_all = condense_lanes(A_stack, B_stack, defects)
    S9 = S_all[:, :, :N_OPT, :]
    e0 = X[:, 1:, :N_OPT] + phi_all[:, :, :N_OPT] - x_ref[:, 1:]

    S9_run, e0_run = S9[:, :-1], e0[:, :-1]
    S9_N, e0_N = S9[:, -1], e0[:, -1]
    R_blk = jnp.kron(jnp.eye(Nt, dtype=dtype), weights.R)
    HV = jax.vmap(terminal_hessian_psd)(bank.term, e0_N)  # (B, 9, 9)
    gV = jax.vmap(terminal_gradient)(bank.term, e0_N)  # (B, 9)
    H = 2.0 * (
        jnp.einsum("btin,ij,btjm->bnm", S9_run, weights.Q, S9_run)
        + 0.5 * jnp.einsum("bin,bij,bjm->bnm", S9_N, HV, S9_N)
        + R_blk[None]
        + cfg.prox * jnp.eye(n_dec, dtype=dtype)[None]
    )
    g = 2.0 * (
        jnp.einsum("btin,ij,btj->bn", S9_run, weights.Q, e0_run)
        + U.reshape(B, -1) @ R_blk
    ) + jnp.einsum("bin,bi->bn", S9_N, gV)

    G_term = jnp.einsum("bti,bin->btn", term_A, S9_N)
    h_term = term_b - jnp.einsum("bti,bi->bt", term_A, e0_N)
    h_term = jnp.maximum(h_term, cfg.term_relax * h_term)

    if n_extra_rows(weights, Nt) > 0:
        G_ext, h_ext = jax.vmap(
            lambda Xs, Ss, ps, so: _ext_rows(weights, Xs, Ss, ps, so)
        )(X, S_all, phi_all, stage_offset)
        h_ext = jnp.maximum(h_ext, cfg.term_relax * h_ext)
        G_term = jnp.concatenate([G_term, G_ext], axis=1)
        h_term = jnp.concatenate([h_term, h_ext], axis=1)

    qp = StructuredMPCQP(
        H=H, g=g, hull_A=hull_A, h_hull=h_hull, G_term=G_term, h_term=h_term
    )
    return qp, S_all, phi_all, defects


def _assemble_stagewise(
    params, scenario, weights, cfg, X, U, x_ref, u_ref,
    hull_A, hull_b, term_A, term_b,
):
    """Linearize + stagewise (banded-KKT) QP assembly for one scenario.

    Returns (StagewiseMPCQP, defects); vmapped unchanged by the batched
    lanes path (`sqp_solve_batch_stagewise`).
    """
    Nt = cfg.horizon
    dtype = X.dtype
    u_unc = scenario.faulty_force_gen

    A_stack, B_stack, defects = _linearize(params, scenario, cfg, X, U, u_ref)
    u_r_bar = jnp.einsum(
        "tij,tj->ti", rot_full_inv(X[:-1, 9:13]), u_ref[:Nt]
    )
    stage_offset = U + u_r_bar + scenario.u_comp + u_unc  # (Nt, 6)
    h_hull = hull_b[None, :] - stage_offset @ hull_A.T  # (Nt, F)
    Q13 = jnp.zeros((N_X, N_X), dtype).at[:N_OPT, :N_OPT].set(weights.Q)
    e_bar = X[:, :N_OPT] - x_ref  # (Nt+1, 9)
    gx = jnp.zeros((Nt + 1, N_X), dtype)
    gx = gx.at[:, :N_OPT].set(e_bar @ weights.Q)
    # terminal: half-gradient / half-Hessian of the polynomial V_f
    # (so that 2*gxN = dV/de; quadratic V_f gives P e + p/2 and P).
    gx = gx.at[-1, :N_OPT].set(
        0.5 * terminal_gradient(scenario.term, e_bar[-1])
    )
    QN13 = (
        jnp.zeros((N_X, N_X), dtype)
        .at[:N_OPT, :N_OPT]
        .set(0.5 * terminal_hessian_psd(scenario.term, e_bar[-1]))
    )
    T13 = jnp.zeros((term_A.shape[0], N_X), dtype).at[:, :N_OPT].set(term_A)
    h_term = term_b - term_A @ e_bar[-1]
    h_term = jnp.maximum(h_term, cfg.term_relax * h_term)

    # Per-stage state box as a stage-row block C dx_t <= h_box_t (mirrors
    # the hull block, but on states).  Stage Nt is made inert (the
    # reference bounds non-terminal stages only, `spiraling_mpc.py:180-185`).
    if weights.has_state_box:
        xlb, xub = _box_bounds(weights, dtype)
        Cx = jnp.concatenate([jnp.eye(N_X, dtype=dtype),
                              -jnp.eye(N_X, dtype=dtype)], axis=0)
        h_box = jnp.concatenate([xub[None] - X[1:], X[1:] - xlb[None]], axis=1)
        h_box = h_box.at[-1].set(_BIG)
        h_box = jnp.maximum(h_box, cfg.term_relax * h_box)
    else:
        Cx = jnp.zeros((0, N_X), dtype)
        h_box = jnp.zeros((Nt, 0), dtype)
    if weights.du_max is not None:
        raise NotImplementedError(
            "input rate limits (du_max) require cross-stage input coupling; "
            "use qp_backend='condensed' (dense rate rows) -- the stagewise "
            "Riccati x-update has no adjacent-stage input block"
        )

    qp = StagewiseMPCQP(
        A=A_stack, B=B_stack, c=defects, Qx=Q13, gx=gx, Ru=weights.R,
        gu=U @ weights.R, QxN=QN13, hull_A=hull_A, h_hull=h_hull,
        T=T13, h_term=h_term, Cx=Cx, h_box=h_box,
    )
    return qp, defects


def _merit_alpha(
    params, scenario, weights, cfg, X, U, dX, dU, x_ref, u_ref,
    hull_A, hull_b, term_A, term_b,
):
    """Fixed-candidate l1-merit line search; returns the best step size."""
    Nt = cfg.horizon
    dtype = X.dtype
    u_unc = scenario.faulty_force_gen
    stage_dyn = partial(_stage_dynamics, params, scenario)

    def merit(alpha):
        Uc = U + alpha * dU
        Xc = jnp.concatenate([X[:1], X[1:] + alpha * dX], axis=0)
        f_c = jax.vmap(stage_dyn)(Xc[:-1], Uc, u_ref[:Nt])
        defect_c = f_c - Xc[1:]
        e_run_c = Xc[1:-1, :N_OPT] - x_ref[1:-1]
        e_N_c = Xc[-1, :N_OPT] - x_ref[-1]
        J = (
            jnp.einsum("ti,ij,tj->", e_run_c, weights.Q, e_run_c)
            + jnp.einsum("ti,ij,tj->", Uc, weights.R, Uc)
            + terminal_value(scenario.term, e_N_c)
        )
        u_r_c = jnp.einsum("tij,tj->ti", rot_full_inv(Xc[:-1, 9:13]), u_ref[:Nt])
        w_tot = Uc + u_r_c + scenario.u_comp + u_unc
        viol = (
            jnp.sum(jnp.abs(defect_c))
            + jnp.sum(jnp.maximum(w_tot @ hull_A.T - hull_b[None, :], 0.0))
            + jnp.sum(jnp.maximum(term_A @ e_N_c - term_b, 0.0))
        )
        if weights.has_state_box:
            xlb, xub = _box_bounds(weights, dtype)
            xs = Xc[1:-1]  # bounded stages 1..Nt-1
            viol = viol + jnp.sum(jnp.maximum(xs - xub[None], 0.0))
            viol = viol + jnp.sum(jnp.maximum(xlb[None] - xs, 0.0))
        if weights.du_max is not None:
            dw = w_tot[1:] - w_tot[:-1]
            viol = viol + jnp.sum(
                jnp.maximum(jnp.abs(dw) - weights.du_max[None], 0.0)
            )
        return J + cfg.ls_penalty * viol

    alphas = jnp.asarray(cfg.ls_alphas, dtype=dtype)
    merits = jax.vmap(merit)(alphas)
    # A non-finite candidate (astronomical trial step overflowing the
    # rollout) must never win over alpha = 0.
    merits = jnp.where(jnp.isfinite(merits), merits, jnp.inf)
    return alphas[jnp.argmin(merits)]


def sqp_solve(
    params: BodyParams,
    scenario: Scenario,
    weights: MPCWeights,
    cfg: MPCConfig,
    c0: jnp.ndarray,
    x_ref: jnp.ndarray,  # (Nt+1, 9)
    u_ref: jnp.ndarray,  # (Nt+1, 6)
    warm: WarmStart,
) -> tuple[WarmStart, SQPInfo]:
    """Fixed-iteration SQP on the spiraling MPC problem (one scenario)."""
    Nt = cfg.horizon
    dtype = c0.dtype

    # The omega rows of the reference are BY CONSTRUCTION the scenario's
    # micro-orbit spin rate (the reference overwrites them with omega_des in
    # `assign_trajectory`, spiraling_mpc.py:240-286).  Sourcing them from the
    # scenario keeps a shared x_ref window correct for banks whose rows use
    # different fault-aware orbits (controllers/orbit_search.py).
    x_ref = x_ref.at[:, 6:9].set(scenario.omega_des.astype(dtype))

    hull_A, hull_b, term_A, term_b = _masked_geometry(scenario)

    u_unc = scenario.faulty_force_gen
    stage_dyn = partial(_stage_dynamics, params, scenario)

    def make_sqp_iteration(admm_cfg):
      def sqp_iteration(carry, _):
        X, U, yh, yt, rho = carry

        if cfg.qp_backend == "condensed":
            qp, S_all, phi_all, defects = _assemble_condensed(
                params, scenario, weights, cfg, X, U, x_ref, u_ref,
                hull_A, hull_b, term_A, term_b,
            )
            sol = solve_mpc_qp(qp, admm_cfg, y_hull0=yh, y_term0=yt, rho0=rho)
            dU = sol.x.reshape(Nt, N_U)
            dX = jnp.einsum("tin,n->ti", S_all, sol.x) + phi_all  # (Nt, 13)
            rho_new = sol.rho
            du_raw = jnp.max(jnp.abs(sol.x))
        elif cfg.qp_backend == "stagewise":
            sqp_qp, defects = _assemble_stagewise(
                params, scenario, weights, cfg, X, U, x_ref, u_ref,
                hull_A, hull_b, term_A, term_b,
            )
            # The warm y_term may carry extra condensed-layout rows (state
            # box); the stagewise backend keeps box duals in its own block
            # (cold-started each solve), so only the true terminal duals
            # ride through.
            T_rows = term_A.shape[0]
            ssol = solve_mpc_qp_stagewise(
                sqp_qp, cfg.stagewise, y_hull0=yh, y_term0=yt[:T_rows], rho0=rho
            )
            dU = ssol.dU
            dX = ssol.dX[1:]
            sol = ssol._replace(y_term=yt.at[:T_rows].set(ssol.y_term))
            rho_new = ssol.rho
            du_raw = jnp.max(jnp.abs(dU))
        else:
            raise ValueError(f"unknown qp_backend {cfg.qp_backend}")

        # --- merit line search over fixed step candidates -----------------
        alpha = _merit_alpha(
            params, scenario, weights, cfg, X, U, dX, dU, x_ref, u_ref,
            hull_A, hull_b, term_A, term_b,
        )

        U_new = U + alpha * dU
        X_new = jnp.concatenate([X[:1], X[1:] + alpha * dX], axis=0)

        info = (
            sol.r_prim,
            sol.r_dual,
            jnp.max(jnp.abs(defects)),
            alpha * du_raw,
            jnp.asarray(sol.term_gap, X.dtype),
        )
        return (X_new, U_new, sol.y_hull, sol.y_term, rho_new), info

      return sqp_iteration

    sqp_iteration = make_sqp_iteration(cfg.admm)
    warm = warm._replace(X=warm.X.at[0].set(c0))
    (X, U, y_hull, y_term, rho), infos = jax.lax.scan(
        sqp_iteration,
        (warm.X, warm.U, warm.y_hull, warm.y_term, warm.rho),
        None,
        length=cfg.sqp_iters,
    )
    last_info = tuple(i[-1] for i in infos)

    if cfg.refine_iters > 0:
        # Convergence-gated extra SQP iterations (see MPCConfig.refine_*),
        # with their own (typically stronger) ADMM budget.
        refine_iteration = make_sqp_iteration(cfg.refine_admm or cfg.admm)

        def refine(full, _):
            carry, info = full
            need = jnp.maximum(info[0], info[3]) > cfg.refine_tol
            carry, info = jax.lax.cond(
                need,
                lambda c: refine_iteration(c, None),
                lambda c: (c, info),
                carry,
            )
            return (carry, info), None

        ((X, U, y_hull, y_term, rho), last_info), _ = jax.lax.scan(
            refine,
            ((X, U, y_hull, y_term, rho), last_info),
            None,
            length=cfg.refine_iters,
        )

    # Realized objective (diagnostic, exact nonlinear-trajectory quadratic cost).
    e_run = X[:-1, :N_OPT] - x_ref[:-1]
    cost = (
        jnp.einsum("ti,ij,tj->", e_run, weights.Q, e_run)
        + jnp.einsum("ti,ij,tj->", U, weights.R, U)
    )
    e_N = X[-1, :N_OPT] - x_ref[-1]
    cost = cost + terminal_value(scenario.term, e_N)

    info = SQPInfo(
        cost=cost,
        r_prim=last_info[0],
        r_dual=last_info[1],
        defect=last_info[2],
        du_norm=last_info[3],
        term_gap=last_info[4],
    )
    return (
        WarmStart(X=X, U=U, y_hull=y_hull, y_term=y_term, rho=rho, kinv=warm.kinv),
        info,
    )


def sqp_solve_batch(
    params: BodyParams,
    bank: Scenario,  # leading scenario-batch axis on every leaf
    weights: MPCWeights,
    cfg: MPCConfig,
    c0: jnp.ndarray,  # (B, 13)
    x_ref: jnp.ndarray,  # (Nt+1, 9) shared reference window
    u_ref: jnp.ndarray,  # (Nt+1, 6)
    warm: WarmStart,  # batched leaves; warm.kinv (B, n, n) or None
) -> tuple[WarmStart, SQPInfo]:
    """Batched SQP over a scenario bank on the lane-fused QP backend.

    Functionally equivalent to vmap(sqp_solve) with qp_backend='condensed',
    but the QP solve runs unvmapped through `solve_mpc_qp_lanes` (fused
    Pallas ADMM over 128-scenario lane tiles + Newton-refreshed K^{-1}),
    which vmap-of-pallas_call cannot express.  warm.kinv is refreshed each
    solve and carried across control steps; with kinv=None (cold start) the
    exact inverse metric is factored once before the SQP scan (the scan
    carry must be an array, so None cannot ride through it).
    """
    from ft_mpc_tpu.solvers.lanes_qp import build_K, exact_kinv, solve_mpc_qp_lanes

    Nt = cfg.horizon

    # per-scenario reference: omega rows come from each scenario's orbit
    # (see sqp_solve; fault-aware orbits differ across the bank)
    x_ref = jnp.broadcast_to(x_ref, (c0.shape[0],) + x_ref.shape)
    x_ref = x_ref.at[:, :, 6:9].set(
        bank.omega_des[:, None, :].astype(x_ref.dtype)
    )

    hull_A, hull_b, term_A, term_b = jax.vmap(_masked_geometry)(bank)

    if warm.kinv is None:
        qp0, _, _, _ = _assemble_condensed_batch(
            params, bank, weights, cfg, warm.X.at[:, 0].set(c0), warm.U,
            x_ref, u_ref, hull_A, hull_b, term_A, term_b,
        )
        K0, _ = build_K(qp0, warm.rho.astype(jnp.float32), cfg.admm.sigma)
        warm = warm._replace(kinv=exact_kinv(K0))

    # weights/cfg/x_ref/u_ref are loop-invariant: close over them (cfg
    # carries non-array leaves vmap must not traverse).  params is passed
    # explicitly so the worst-K cleanup can gather its batched leaves.
    p_ax = params_batch_axes(params)
    assemble = lambda p, sc, xr, X, U, hA, hb, tA, tb: _assemble_condensed_batch(
        p, sc, weights, cfg, X, U, xr, u_ref, hA, hb, tA, tb
    )
    line_search = jax.vmap(
        lambda p, sc, xr, X, U, dX, dU, hA, hb, tA, tb: _merit_alpha(
            p, sc, weights, cfg, X, U, dX, dU, xr, u_ref, hA, hb, tA, tb
        ),
        in_axes=(p_ax, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    )

    def sqp_iteration(carry, _):
        X, U, yh, yt, rho, kinv = carry
        qp, S_all, phi_all, defects = assemble(
            params, bank, x_ref, X, U, hull_A, hull_b, term_A, term_b
        )
        sol = solve_mpc_qp_lanes(
            qp, cfg.admm, y_hull0=yh, y_term0=yt, rho0=rho, kinv0=kinv,
            newton_iters=cfg.newton_iters,
        )
        dU = sol.x.reshape(-1, Nt, N_U)
        dX = jnp.einsum("btin,bn->bti", S_all, sol.x) + phi_all
        alpha = line_search(
            params, bank, x_ref, X, U, dX, dU, hull_A, hull_b, term_A, term_b
        )  # (B,)
        a = alpha[:, None, None]
        U_new = U + a * dU
        X_new = jnp.concatenate([X[:, :1], X[:, 1:] + a * dX], axis=1)
        du_raw = jnp.max(jnp.abs(sol.x), axis=1)
        info = (
            sol.r_prim,
            sol.r_dual,
            jnp.max(jnp.abs(defects), axis=(1, 2)),
            alpha * du_raw,
            sol.term_gap,
        )
        return (
            X_new, U_new, sol.y_hull, sol.y_term,
            sol.rho.astype(rho.dtype), sol.kinv,
        ), info

    X0 = warm.X.at[:, 0].set(c0)
    (X, U, y_hull, y_term, rho, kinv), infos = jax.lax.scan(
        sqp_iteration,
        (X0, warm.U, warm.y_hull, warm.y_term, warm.rho, warm.kinv),
        None,
        length=cfg.sqp_iters,
    )
    r_prim_f, r_dual_f, defect_f, du_norm_f, term_gap_f = (i[-1] for i in infos)

    n_rounds = cfg.cleanup_rounds if (cfg.cleanup_iters > 0 and cfg.cleanup_k > 0) else 0
    for _ in range(n_rounds):
        # Tail cleanup: one extra SQP iteration on the K worst scenarios
        # with exact factorization and a large ADMM budget (see MPCConfig).
        K = min(cfg.cleanup_k, X.shape[0])
        # Worst-K keyed on QP residual + SQP step size + shooting defect
        # (VERDICT r4 item 1): r_prim alone misses transient scenarios whose
        # QP converged but whose SQP has not (large du_norm/defect) -- those
        # are exactly the rows that deviate from the converged golden.
        _, idx = jax.lax.top_k(r_prim_f + du_norm_f + defect_f, K)
        bank_s = jax.tree.map(lambda a: a[idx], bank)
        params_s = _params_row(params, p_ax, idx)
        X_s, U_s = X[idx], U[idx]
        hA_s, hb_s = hull_A[idx], hull_b[idx]
        tA_s, tb_s = term_A[idx], term_b[idx]
        qp_s, S_s, phi_s, defects_s = assemble(
            params_s, bank_s, x_ref[idx], X_s, U_s, hA_s, hb_s, tA_s, tb_s
        )
        ccfg = cfg.admm._replace(
            iters=cfg.cleanup_iters, phases=cfg.cleanup_phases, adapt_clip=5.0
        )
        # kinv0=None -> exact inverse (and exact per-phase refactor), so the
        # cleanup solve is immune to warm-metric drift on exactly the
        # scenarios where the carried Newton refresh struggles most.
        sol = solve_mpc_qp_lanes(
            qp_s, ccfg, y_hull0=y_hull[idx], y_term0=y_term[idx], rho0=rho[idx],
        )
        dU_s = sol.x.reshape(K, Nt, N_U)
        dX_s = jnp.einsum("btin,bn->bti", S_s, sol.x) + phi_s
        alpha = line_search(
            params_s, bank_s, x_ref[idx], X_s, U_s, dX_s, dU_s,
            hA_s, hb_s, tA_s, tb_s,
        )
        a = alpha[:, None, None]
        X = X.at[idx].set(
            jnp.concatenate([X_s[:, :1], X_s[:, 1:] + a * dX_s], axis=1)
        )
        U = U.at[idx].set(U_s + a * dU_s)
        y_hull = y_hull.at[idx].set(sol.y_hull)
        y_term = y_term.at[idx].set(sol.y_term)
        rho = rho.at[idx].set(sol.rho.astype(rho.dtype))
        kinv = kinv.at[idx].set(sol.kinv)
        r_prim_f = r_prim_f.at[idx].set(sol.r_prim)
        r_dual_f = r_dual_f.at[idx].set(sol.r_dual)
        defect_f = defect_f.at[idx].set(jnp.max(jnp.abs(defects_s), axis=(1, 2)))
        du_norm_f = du_norm_f.at[idx].set(alpha * jnp.max(jnp.abs(sol.x), axis=1))
        term_gap_f = term_gap_f.at[idx].set(sol.term_gap)

    e_run = X[:, :-1, :N_OPT] - x_ref[:, :-1]
    cost = (
        jnp.einsum("bti,ij,btj->b", e_run, weights.Q, e_run)
        + jnp.einsum("bti,ij,btj->b", U, weights.R, U)
    )
    e_N = X[:, -1, :N_OPT] - x_ref[:, -1]
    cost = cost + jax.vmap(terminal_value)(bank.term, e_N)

    info = SQPInfo(
        cost=cost,
        r_prim=r_prim_f,
        r_dual=r_dual_f,
        defect=defect_f,
        du_norm=du_norm_f,
        term_gap=term_gap_f,
    )
    return (
        WarmStart(X=X, U=U, y_hull=y_hull, y_term=y_term, rho=rho, kinv=kinv),
        info,
    )


def _sqp_batch_stagewise_core(
    params, bank, weights, cfg, c0, x_ref, u_ref, warm
) -> tuple[WarmStart, SQPInfo]:
    """One batched stagewise SQP scan (no cleanup).

    mode='lanes' (`cfg.stagewise.mode`): vmapped assembly + the batched
    lane-fused Pallas LQR-resolve solver (`solve_mpc_qp_stagewise_lanes`)
    -- every ADMM x-update is 2 kernel launches for the whole bank.
    Other modes: vmap of the per-scenario `sqp_solve`.
    """
    p_ax = params_batch_axes(params)
    if cfg.stagewise.mode != "lanes":
        solve = jax.vmap(
            lambda p, sc, c, w: sqp_solve(
                p, sc, weights, cfg, c, x_ref, u_ref, w
            ),
            in_axes=(p_ax, 0, 0, 0),
        )
        return solve(params, bank, c0, warm)

    from ft_mpc_tpu.solvers.mpc_qp_stagewise import solve_mpc_qp_stagewise_lanes

    B = c0.shape[0]
    # per-scenario reference: omega rows come from each scenario's orbit
    x_ref_b = jnp.broadcast_to(x_ref, (B,) + x_ref.shape)
    x_ref_b = x_ref_b.at[:, :, 6:9].set(
        bank.omega_des[:, None, :].astype(x_ref.dtype)
    )
    hull_A, hull_b, term_A, term_b = jax.vmap(_masked_geometry)(bank)
    assemble = jax.vmap(
        lambda p, sc, xr, X, U, hA, hb, tA, tb: _assemble_stagewise(
            p, sc, weights, cfg, X, U, xr, u_ref, hA, hb, tA, tb
        ),
        in_axes=(p_ax, 0, 0, 0, 0, 0, 0, 0, 0),
    )
    line_search = jax.vmap(
        lambda p, sc, xr, X, U, dX, dU, hA, hb, tA, tb: _merit_alpha(
            p, sc, weights, cfg, X, U, dX, dU, xr, u_ref, hA, hb, tA, tb
        ),
        in_axes=(p_ax, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    )

    T_rows = term_A.shape[-2]

    def sqp_iteration(carry, _):
        X, U, yh, yt, rho = carry
        qp, defects = assemble(
            params, bank, x_ref_b, X, U, hull_A, hull_b, term_A, term_b
        )
        # warm y_term may carry extra condensed-layout rows (state box);
        # only the true terminal duals ride through (see sqp_solve).
        ssol = solve_mpc_qp_stagewise_lanes(
            qp, cfg.stagewise, y_hull0=yh, y_term0=yt[:, :T_rows], rho0=rho
        )
        ssol = ssol._replace(y_term=yt.at[:, :T_rows].set(ssol.y_term))
        dU = ssol.dU
        dX = ssol.dX[:, 1:]
        alpha = line_search(
            params, bank, x_ref_b, X, U, dX, dU, hull_A, hull_b, term_A, term_b
        )
        a = alpha[:, None, None]
        U_new = U + a * dU
        X_new = jnp.concatenate([X[:, :1], X[:, 1:] + a * dX], axis=1)
        du_raw = jnp.max(jnp.abs(dU), axis=(1, 2))
        info = (
            ssol.r_prim,
            ssol.r_dual,
            jnp.max(jnp.abs(defects), axis=(1, 2)),
            alpha * du_raw,
            ssol.term_gap,
        )
        return (X_new, U_new, ssol.y_hull, ssol.y_term, ssol.rho), info

    X0 = warm.X.at[:, 0].set(c0)
    rho0 = jnp.broadcast_to(warm.rho, (B,))
    (X, U, y_hull, y_term, rho), infos = jax.lax.scan(
        sqp_iteration, (X0, warm.U, warm.y_hull, warm.y_term, rho0), None,
        length=cfg.sqp_iters,
    )

    e_run = X[:, :-1, :N_OPT] - x_ref_b[:, :-1]
    cost = (
        jnp.einsum("bti,ij,btj->b", e_run, weights.Q, e_run)
        + jnp.einsum("bti,ij,btj->b", U, weights.R, U)
    )
    e_N = X[:, -1, :N_OPT] - x_ref_b[:, -1]
    cost = cost + jax.vmap(terminal_value)(bank.term, e_N)

    info = SQPInfo(
        cost=cost,
        r_prim=infos[0][-1],
        r_dual=infos[1][-1],
        defect=infos[2][-1],
        du_norm=infos[3][-1],
        term_gap=infos[4][-1],
    )
    return (
        WarmStart(X=X, U=U, y_hull=y_hull, y_term=y_term, rho=rho,
                  kinv=warm.kinv),
        info,
    )


def sqp_solve_batch_stagewise(
    params: BodyParams,
    bank: Scenario,  # leading scenario-batch axis on every leaf
    weights: MPCWeights,
    cfg: MPCConfig,
    c0: jnp.ndarray,  # (B, 13)
    x_ref: jnp.ndarray,
    u_ref: jnp.ndarray,
    warm: WarmStart,  # batched leaves; kinv None (no condensed metric)
) -> tuple[WarmStart, SQPInfo]:
    """Batched SQP on the stagewise (Riccati-in-ADMM) backend + tail cleanup.

    The batched core (`_sqp_batch_stagewise_core`: lane-fused Pallas LQR
    resolve with mode='lanes', vmapped XLA otherwise), then -- the same
    worst-K discipline as the lane-fused condensed backend
    (`MPCConfig.cleanup_*`) -- the K scenarios with the worst QP primal
    residual get one extra SQP iteration with a cleanup_iters x
    cleanup_phases ADMM budget.  This is what brings the long-horizon
    backend to the deployed residual class (<=1e-3) without paying a
    worst-case iteration count on all B scenarios (VERDICT r3 next-step 1).
    """
    new_warm, info = _sqp_batch_stagewise_core(
        params, bank, weights, cfg, c0, x_ref, u_ref, warm
    )

    n_rounds = cfg.cleanup_rounds if (cfg.cleanup_iters > 0 and cfg.cleanup_k > 0) else 0
    for _ in range(n_rounds):
        K = min(cfg.cleanup_k, c0.shape[0])
        # same transient-aware worst-K key as the condensed batch path
        _, idx = jax.lax.top_k(info.r_prim + info.du_norm + info.defect, K)
        ccfg = cfg._replace(
            sqp_iters=1,
            stagewise=cfg.stagewise._replace(
                iters=cfg.cleanup_iters,
                phases=cfg.cleanup_phases,
                adapt_clip=5.0,
            ),
            cleanup_iters=0,
        )
        bank_s = jax.tree.map(lambda a: a[idx], bank)
        params_s = _params_row(params, params_batch_axes(params), idx)
        warm_s = jax.tree.map(lambda a: a[idx], new_warm)
        warm_c, info_c = _sqp_batch_stagewise_core(
            params_s, bank_s, weights, ccfg, c0[idx], x_ref, u_ref, warm_s
        )
        new_warm = jax.tree.map(lambda a, b: a.at[idx].set(b), new_warm, warm_c)
        info = jax.tree.map(lambda a, b: a.at[idx].set(b), info, info_c)
    return new_warm, info


class ControlOutput(NamedTuple):
    u_phys: jnp.ndarray  # (16,) thruster commands
    wrench: jnp.ndarray  # (6,) commanded wrench (robot frame)
    c0: jnp.ndarray  # (13,) center state used
    warm: WarmStart
    info: SQPInfo
    alloc: AllocationResult


def _finalize_control(params, scenario, c0, u0, u_ref0):
    """Un-rotate the first SQP input and allocate thrusters (one scenario).

    Mirrors `spiraling_mpc.py:301-307`: u0 + rotated nominal + compensation,
    rotated into the robot frame by the spiral frame quaternion beta, then
    min-energy thruster allocation.
    """
    u_nom = rot_full_inv(c0[9:13]) @ u_ref0
    u_res = u0 + u_nom + scenario.u_comp
    u_res = rot_full(scenario.beta) @ u_res
    alloc = allocate_thrusters(
        u_res,
        params.D,
        scenario.u_ub,
        scenario.faulty_force_gen,
        scenario.hull_A,
        scenario.hull_b,
        scenario.hull_mask,
        gen_G=scenario.gen_G,
        gen_c=scenario.gen_c,
        gen_L=scenario.gen_L,
        max_thrust=params.max_thrust,
    )
    return u_res, alloc


def init_warmstart_batch(
    params: BodyParams,
    bank: Scenario,  # leading scenario-batch axis
    weights: MPCWeights,
    cfg: MPCConfig,
    c0: jnp.ndarray,  # (B, 13)
    x_ref: jnp.ndarray,  # (Nt+1, 9)
    u_ref: jnp.ndarray,  # (Nt+1, 6)
) -> WarmStart:
    """Batched warm start for `sqp_solve_batch`/`get_control_batch`.

    vmap of `init_warmstart` plus the exact cold-start inverse ADMM
    metric (one batched Cholesky at setup; afterwards `sqp_solve_batch`
    Newton-refreshes it, never refactoring on the hot path).

    With `cfg.qp_backend == 'stagewise'` (long horizons) no condensed
    metric exists -- the Riccati-in-ADMM backend factors per-stage -- so
    the kinv build is skipped and the batch runs vmapped per scenario.
    """
    from ft_mpc_tpu.solvers.lanes_qp import build_K, exact_kinv

    p_ax = params_batch_axes(params)
    warm = jax.vmap(
        lambda p, sc, c: init_warmstart(p, sc, cfg, c, weights=weights),
        in_axes=(p_ax, 0, 0),
    )(params, bank, c0)
    if cfg.qp_backend == "stagewise":
        return warm
    hull_A, hull_b, term_A, term_b = jax.vmap(_masked_geometry)(bank)
    x_ref = jnp.broadcast_to(x_ref, (c0.shape[0],) + x_ref.shape)
    x_ref = x_ref.at[:, :, 6:9].set(
        bank.omega_des[:, None, :].astype(x_ref.dtype)
    )
    qp, _, _, _ = _assemble_condensed_batch(
        params, bank, weights, cfg, warm.X, warm.U, x_ref, u_ref,
        hull_A, hull_b, term_A, term_b,
    )
    K, _ = build_K(qp, warm.rho.astype(jnp.float32), cfg.admm.sigma)
    return warm._replace(kinv=exact_kinv(K))


def get_control_batch(
    params: BodyParams,
    bank: Scenario,  # leading scenario-batch axis
    weights: MPCWeights,
    cfg: MPCConfig,
    x0: jnp.ndarray,  # (B, 13) robot states
    x_ref: jnp.ndarray,  # (Nt+1, 9) shared center reference window
    u_ref: jnp.ndarray,  # (Nt+1, 6)
    warm: WarmStart,  # from init_warmstart_batch / previous step (batched)
) -> ControlOutput:
    """One full control step for a scenario bank on the lane-fused backend.

    Batched equivalent of vmap(get_control): same transform + allocation
    (vmapped), but the SQP/QP core runs through `sqp_solve_batch`.

    Backend routing: `cfg.qp_backend == 'condensed'` (default, short
    horizons) runs the lane-fused Pallas ADMM; `'stagewise'` (long
    horizons, VERDICT r2 next-step 3) runs the O(Nt) Riccati-in-ADMM
    solver vmapped over the bank -- same batched API, no condensed
    (Nt*nu)^2 metric ever materialized.  Allocation stays lane-fused in
    both cases (horizon-independent).

    Per-scenario plant variation: `params` leaves may carry a leading
    scenario axis (see `params_batch_axes`) for mass/inertia/inertia_inv
    -- BASELINE config 5's randomized-inertia banks.  D and max_thrust
    must stay shared (thruster geometry; the lane-fused allocation kernel
    reads them unbatched -- per-scenario fault reshaping already lives in
    the scenario's gen_G/hull tensors).
    """
    from ft_mpc_tpu.solvers.lanes_alloc import allocate_thrusters_lanes

    c0 = jax.vmap(robot_to_center)(bank.r, x0)
    if cfg.qp_backend == "stagewise":
        new_warm, info = sqp_solve_batch_stagewise(
            params, bank, weights, cfg, c0, x_ref, u_ref, warm
        )
    else:
        new_warm, info = sqp_solve_batch(
            params, bank, weights, cfg, c0, x_ref, u_ref, warm
        )
    # Same wrench transform as _finalize_control, batched; allocation runs
    # through the lane-fused kernel (one launch per 128-scenario tile
    # instead of ~100 tiny vmapped XLA kernels).
    u_nom = jnp.einsum(
        "bij,j->bi", jax.vmap(rot_full_inv)(c0[:, 9:13]), u_ref[0]
    )
    u_res = new_warm.U[:, 0] + u_nom + bank.u_comp
    u_res = jnp.einsum("bij,bj->bi", jax.vmap(rot_full)(bank.beta), u_res)
    alloc = allocate_thrusters_lanes(
        u_res, params.D, bank.u_ub, bank.faulty_force_gen,
        bank.hull_A, bank.hull_b, bank.hull_mask,
        bank.gen_G, bank.gen_c, bank.gen_L, params.max_thrust,
    )
    return ControlOutput(
        u_phys=alloc.u_phys,
        wrench=u_res,
        c0=c0,
        warm=new_warm,
        info=info,
        alloc=alloc,
    )


def get_control(
    params: BodyParams,
    scenario: Scenario,
    weights: MPCWeights,
    cfg: MPCConfig,
    x0: jnp.ndarray,  # (13,) robot state
    x_ref: jnp.ndarray,  # (Nt+1, 9) center reference window
    u_ref: jnp.ndarray,  # (Nt+1, 6) nominal wrench window
    warm: WarmStart,
) -> ControlOutput:
    """One full control step: transform, SQP solve, un-rotate, allocate.

    Mirrors `SpiralingController.get_control` (`spiraling_mpc.py:288-317`).
    Warm-start shifting is the caller's (rollout's) responsibility via
    `shift_warmstart` so this function stays pure.
    """
    c0 = robot_to_center(scenario.r, x0)
    new_warm, info = sqp_solve(params, scenario, weights, cfg, c0, x_ref, u_ref, warm)

    u_res, alloc = _finalize_control(params, scenario, c0, new_warm.U[0], u_ref[0])
    return ControlOutput(
        u_phys=alloc.u_phys,
        wrench=u_res,
        c0=c0,
        warm=new_warm,
        info=info,
        alloc=alloc,
    )
