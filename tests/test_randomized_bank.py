"""Per-scenario plant parameters (BASELINE config 5 plumbing).

`build_randomized_bank` draws (fault pattern, initial state, inertia) per
row around the `data/InertialProperties.md` constants (the values the
reference hard-codes at `ft_mpc/models/sys_model.py:51-60`); the batched
SQP paths map over the batched BodyParams leaves via `params_batch_axes`.
The batched solve of row i must equal the single-scenario solve with row
i's plant -- that is the whole point (a shared-plant batch would silently
use the wrong inertia everywhere).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.controllers.spiraling import (
    MPCConfig,
    MPCWeights,
    _params_row,
    _sqp_batch_stagewise_core,
    init_warmstart,
    params_batch_axes,
    sqp_solve,
)
from ft_mpc_tpu.geometry.scenario import build_randomized_bank
from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
from ft_mpc_tpu.solvers.mpc_qp_stagewise import StagewiseConfig
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory

DT = 0.1
NT = 10
N_ROWS = 5


def _setup():
    params0 = BodyParams.default(DT)
    bank, params, x0 = build_randomized_bank(params0, N_ROWS, seed=3)
    traj = generate_trajectory("hover", DT, 10)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.array([0.0, 0.0, 0.6]), float(params0.mass), DT, NT + 1
    )
    return bank, params, x0, jnp.asarray(x_ref[: NT + 1]), jnp.asarray(u_ref[: NT + 1])


def test_bank_rows_use_their_own_plant():
    bank, params, x0, x_ref, u_ref = _setup()
    p_ax = params_batch_axes(params)
    assert p_ax.mass == 0 and p_ax.inertia == 0 and p_ax.inertia_inv == 0
    assert p_ax.D is None and p_ax.max_thrust is None
    # per-row masses differ and per-row compensation wrenches reflect them
    assert np.unique(np.asarray(params.mass)).size == N_ROWS
    # orbit radius r = |f_virt| / (m |omega|^2): heavier row -> smaller r
    r_norm = np.linalg.norm(np.asarray(bank.scenarios.r), axis=1)
    order_m = np.argsort(np.asarray(params.mass))
    assert (np.diff(r_norm[order_m]) < 1e-12).all()


def test_batched_solve_matches_per_row_plant():
    bank, params, x0, x_ref, u_ref = _setup()
    weights = MPCWeights.from_diagonals(
        [1, 1, 1, 1, 1, 1, 2, 2, 2], [0.1, 0.1, 0.1, 0.01, 0.01, 0.01]
    )
    # stagewise 'scan' mode routes the batch through vmap(sqp_solve) with
    # params in_axes -- exercising the batched-params plumbing end to end
    # without the (CPU-interpreted) Pallas kernels.
    cfg = MPCConfig(
        horizon=NT, sqp_iters=2, qp_backend="stagewise",
        stagewise=StagewiseConfig(iters=40, phases=2, rho=20.0, mode="scan"),
    )
    sc0 = jax.tree.map(lambda a: a[0], bank.scenarios)
    c0 = jax.vmap(robot_to_center)(bank.scenarios.r, jnp.asarray(x0))
    p_ax = params_batch_axes(params)
    warm = jax.vmap(
        lambda p, sc, c: init_warmstart(p, sc, cfg, c),
        in_axes=(p_ax, 0, 0),
    )(params, bank.scenarios, c0)

    new_warm, info = _sqp_batch_stagewise_core(
        params, bank.scenarios, weights, cfg, c0, x_ref, u_ref, warm
    )

    for row in (0, N_ROWS - 1):
        params_i = _params_row(params, p_ax, row)
        sc_i = jax.tree.map(lambda a: a[row], bank.scenarios)
        warm_i = jax.tree.map(lambda a: a[row], warm)
        single, _ = sqp_solve(
            params_i, sc_i, weights, cfg, c0[row], x_ref, u_ref, warm_i
        )
        np.testing.assert_allclose(
            np.asarray(new_warm.U[row]), np.asarray(single.U), atol=1e-10
        )

    # wrong-plant check: solving row 0 with row 1's inertia must differ
    params_other = _params_row(params, p_ax, 1)
    sc_0 = jax.tree.map(lambda a: a[0], bank.scenarios)
    warm_0 = jax.tree.map(lambda a: a[0], warm)
    wrong, _ = sqp_solve(
        params_other, sc_0, weights, cfg, c0[0], x_ref, u_ref, warm_0
    )
    assert float(jnp.max(jnp.abs(wrong.U - new_warm.U[0]))) > 1e-6
