"""Per-stage state-box and input-rate constraints vs the independent golden.

The reference's NLP optionally adds per-stage state bounds
(`ft_mpc/controllers/spiraling_mpc.py:180-185`); the rate rows are a
framework extra (BASELINE config 4).  Each test constructs bounds that BIND
at the solution (tighter than the unconstrained optimum), solves with the
deployed backends, and checks (a) the bound saturates, (b) the solution
matches `solve_reference` (scipy SLSQP, float64, independent algorithm
family) to the 1e-4 BASELINE bar.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
from ft_mpc_tpu.controllers.reference_solver import solve_reference
from ft_mpc_tpu.controllers.spiraling import (
    MPCConfig,
    MPCWeights,
    _assemble_condensed,
    _assemble_condensed_batch,
    _masked_geometry,
    init_warmstart,
    n_extra_rows,
    sqp_solve,
)
from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
from ft_mpc_tpu.solvers.mpc_qp_stagewise import StagewiseConfig
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory

DT = 0.1
NT = 15
FAULTS = [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)]
_BIG = 1e8

TIGHT = MPCConfig(
    horizon=NT, sqp_iters=25,
    admm=StructuredADMMConfig(iters=150, phases=6, rho=10.0),
)


@pytest.fixture(scope="module")
def problem():
    params = BodyParams.default(DT)
    sc = _build_scenario_with_terminal(
        params, FAULTS, DEFAULT_TUNING, terminal_mode="quadratic"
    )
    traj = generate_trajectory("hover", DT, 30)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.asarray(sc.omega_des), 16.8, DT, NT + 1
    )
    x_ref = jnp.asarray(x_ref[: NT + 1])
    u_ref = jnp.asarray(u_ref[: NT + 1])
    x0 = np.zeros(13)
    x0[0:3] = [0.4, 0.1, 0.3]
    x0[3:6] = [0.25, 0.1, 0.0]
    x0[6:10] = [0, 0, 0, 1]
    x0[10:13] = np.asarray(sc.omega_des)
    c0 = robot_to_center(sc.r, jnp.asarray(x0, jnp.float64))

    weights0 = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    warm = init_warmstart(params, sc, TIGHT, c0)
    base, _ = sqp_solve(params, sc, weights0, TIGHT, c0, x_ref, u_ref, warm)
    return params, sc, c0, x_ref, u_ref, weights0, base


def _solve_with(problem, weights, cfg=TIGHT):
    params, sc, c0, x_ref, u_ref, _, _ = problem
    warm = init_warmstart(params, sc, cfg, c0, weights=weights)
    point, info = sqp_solve(params, sc, weights, cfg, c0, x_ref, u_ref, warm)
    return point, info


def _golden(problem, weights, U0):
    params, sc, c0, x_ref, u_ref, _, _ = problem
    return solve_reference(
        params, sc, weights, NT, c0, x_ref, u_ref,
        U0=np.asarray(U0) + 1e-3,
    )


def test_state_box_binds_and_matches_golden(problem):
    params, sc, c0, x_ref, u_ref, weights0, base = problem
    # The unconstrained controller brakes hard: the x-velocity dips to a
    # negative minimum over the horizon.  A lower bound slightly above that
    # minimum binds, and is dynamically reachable (brake less).
    vmin_free = float(jnp.min(base.X[1:-1, 3]))
    assert vmin_free < 0
    x_lb = np.full(13, -_BIG)
    x_lb[3] = 0.9 * vmin_free
    weights = weights0._replace(x_lb=jnp.asarray(x_lb, jnp.float64))
    assert n_extra_rows(weights, NT) == 2 * 13 * (NT - 1)

    point, info = _solve_with(problem, weights)
    vmin_con = float(jnp.min(point.X[1:-1, 3]))
    # binds: saturates the bound, clearly above the unconstrained optimum
    assert vmin_con >= x_lb[3] - 1e-5
    assert vmin_con <= x_lb[3] + 1e-3
    assert float(jnp.max(jnp.abs(point.U - base.U))) > 1e-4

    ref = _golden(problem, weights, point.U)
    assert ref.success and ref.max_violation < 1e-7
    du0 = float(np.max(np.abs(np.asarray(point.U[0]) - ref.U[0])))
    assert du0 < 1e-4, du0


def test_rate_limit_binds_and_matches_golden(problem):
    params, sc, c0, x_ref, u_ref, weights0, base = problem
    # Reconstruct the unconstrained total-wrench steps and bound them.
    from ft_mpc_tpu.ops.quaternion import rot_full_inv

    u_r = jnp.einsum(
        "tij,tj->ti", rot_full_inv(base.X[:-1, 9:13]), u_ref[:NT]
    )
    w = base.U + u_r + sc.u_comp + sc.faulty_force_gen
    dw_free = float(jnp.max(jnp.abs(w[1:] - w[:-1])))
    du_max = np.full(6, 0.8 * dw_free)
    weights = weights0._replace(du_max=jnp.asarray(du_max, jnp.float64))

    point, info = _solve_with(problem, weights)
    u_r_c = jnp.einsum(
        "tij,tj->ti", rot_full_inv(point.X[:-1, 9:13]), u_ref[:NT]
    )
    w_c = point.U + u_r_c + sc.u_comp + sc.faulty_force_gen
    dw_con = float(jnp.max(jnp.abs(w_c[1:] - w_c[:-1])))
    assert dw_con <= du_max[0] + 1e-4
    assert dw_con >= du_max[0] - 1e-3  # saturates
    assert float(jnp.max(jnp.abs(point.U - base.U))) > 1e-4

    ref = _golden(problem, weights, point.U)
    assert ref.success and ref.max_violation < 1e-7
    du0 = float(np.max(np.abs(np.asarray(point.U[0]) - ref.U[0])))
    assert du0 < 1e-4, du0


def test_state_box_stagewise_matches_condensed(problem):
    params, sc, c0, x_ref, u_ref, weights0, base = problem
    vmin_free = float(jnp.min(base.X[1:-1, 3]))
    x_lb = np.full(13, -_BIG)
    x_lb[3] = 0.9 * vmin_free
    weights = weights0._replace(x_lb=jnp.asarray(x_lb, jnp.float64))

    cond, _ = _solve_with(problem, weights)
    sw_cfg = TIGHT._replace(
        qp_backend="stagewise",
        stagewise=StagewiseConfig(iters=150, phases=6, rho=10.0),
    )
    sw, info = _solve_with(problem, weights, cfg=sw_cfg)
    assert float(info.r_prim) < 1e-4
    du = float(jnp.max(jnp.abs(sw.U - cond.U)))
    assert du < 5e-4, du
    assert float(jnp.min(sw.X[1:-1, 3])) >= x_lb[3] - 1e-4


def test_batched_assembly_matches_single(problem):
    """The vmapped ext-row build (lanes/batched path) equals per-scenario."""
    params, sc, c0, x_ref, u_ref, weights0, base = problem
    x_ub = np.full(13, _BIG)
    x_ub[3] = 0.2
    weights = weights0._replace(
        x_ub=jnp.asarray(x_ub, jnp.float64),
        du_max=jnp.asarray(np.full(6, 0.5), jnp.float64),
    )
    cfg = MPCConfig(horizon=NT)
    hull_A, hull_b, term_A, term_b = _masked_geometry(sc)
    x_ref_o = x_ref.at[:, 6:9].set(sc.omega_des)
    qp1, _, _, _ = _assemble_condensed(
        params, sc, weights, cfg, base.X, base.U, x_ref_o, u_ref,
        hull_A, hull_b, term_A, term_b,
    )
    bank = jax.tree.map(lambda a: jnp.asarray(a)[None], sc)
    qpb, _, _, _ = _assemble_condensed_batch(
        params, bank, weights, cfg, base.X[None], base.U[None],
        x_ref_o[None], u_ref, hull_A[None], hull_b[None],
        term_A[None], term_b[None],
    )
    # contraction-order differences between the batched einsums and the
    # single-scenario path leave ~1e-7 float noise; structure must agree
    np.testing.assert_allclose(
        np.asarray(qpb.G_term[0]), np.asarray(qp1.G_term), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(qpb.h_term[0]), np.asarray(qp1.h_term), atol=1e-5
    )


def test_refine_converges_transient(problem):
    """Convergence-gated refinement (MPCConfig.refine_*): with a weak base
    budget plus refine, the transient solve reaches the SQP tolerance the
    base budget alone misses, and matches the tight-config solution."""
    params, sc, c0, x_ref, u_ref, weights0, base = problem
    from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig

    weak = MPCConfig(
        horizon=NT, sqp_iters=2,
        admm=StructuredADMMConfig(iters=60, phases=1, rho=50.0),
    )
    refined = weak._replace(
        refine_iters=10, refine_tol=1e-5,
        refine_admm=StructuredADMMConfig(iters=150, phases=6, rho=10.0),
    )
    warm_r = init_warmstart(params, sc, refined, c0)
    pt_r, info_r = sqp_solve(params, sc, weights0, refined, c0, x_ref, u_ref, warm_r)
    assert float(jnp.maximum(info_r.r_prim, info_r.du_norm)) <= 1e-5
    du = float(jnp.max(jnp.abs(pt_r.U - base.U)))
    assert du < 5e-4, du  # same solution as the tight config
