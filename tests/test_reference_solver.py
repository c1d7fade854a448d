"""Accuracy loop against an independent solver (BASELINE.md <=1e-4 bar).

The deployed RTI-SQP/ADMM solver's converged solutions are compared against
scipy SLSQP (independent algorithm family: BFGS-class SQP with an
active-set QP core, float64, JAX-exact derivatives) on the reference demo
scenario -- 30 s hover under thrusters 10+11 fully failed
(`ft_mpc/config/reactive.yaml:3-15`).  States are sampled along the closed
loop; at each, both solvers solve the same NLP to convergence and the
resulting control must agree to <= 1e-4.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
from ft_mpc_tpu.controllers.reference_solver import _build_funcs, solve_reference
from ft_mpc_tpu.controllers.spiraling import (
    MPCConfig,
    MPCWeights,
    init_warmstart,
    sqp_solve,
)
from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
from ft_mpc_tpu.sim.env import SimConfig, rollout
from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory

DT = 0.1
FAULTS = [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)]


def test_sqp_matches_independent_solver():
    params = BodyParams.default(DT)
    sc = _build_scenario_with_terminal(params, FAULTS, DEFAULT_TUNING)
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    Nt = 15
    traj = generate_trajectory("hover", DT, 30)
    x_ref_full, u_ref_full = prepare_center_trajectory(
        traj, np.asarray(sc.omega_des), 16.8, DT, Nt + 1
    )
    x_ref_full = jnp.asarray(x_ref_full)
    u_ref_full = jnp.asarray(u_ref_full)

    # Sample states along the deployed closed loop (reference demo init).
    x0 = np.zeros(13)
    x0[0:3] = [1, 0, 1]
    x0[3:6] = [1, 0.5, 0]
    x0[6:10] = [0, 0, 0, 1]
    x0[10:13] = [0.3, 0.8, -0.1]
    sim = SimConfig(steps=100, noise_mode="none")
    hist = rollout(
        params, sc, weights, MPCConfig(horizon=Nt), sim,
        jnp.asarray(x0), x_ref_full, u_ref_full, jax.random.key(0),
    )

    tight = MPCConfig(
        horizon=Nt, sqp_iters=30,
        admm=StructuredADMMConfig(iters=150, phases=6, rho=10.0),
    )
    # Steady-state samples: inside the certified region of attraction the
    # NLP has a well-isolated local solution for both solvers to find.
    for step_idx in (60, 90):
        c0 = jnp.asarray(hist.c0[step_idx], jnp.float64)
        i = step_idx
        x_ref = x_ref_full[i : i + Nt + 1] if x_ref_full.shape[0] >= i + Nt + 1 \
            else x_ref_full[-Nt - 1 :]
        u_ref = u_ref_full[i : i + Nt + 1] if u_ref_full.shape[0] >= i + Nt + 1 \
            else u_ref_full[-Nt - 1 :]

        warm = init_warmstart(params, sc, tight, c0)
        point, info = sqp_solve(
            params, sc, weights, tight, c0, x_ref, u_ref, warm
        )
        ref = solve_reference(
            params, sc, weights, Nt, c0, x_ref, u_ref,
            U0=np.asarray(point.U) + 1e-3,  # near-warm but perturbed start
        )
        assert ref.success and ref.max_violation < 1e-8
        du0 = float(np.max(np.abs(np.asarray(point.U[0]) - ref.U[0])))
        assert du0 < 1e-4, (step_idx, du0)
        # same-objective comparison (SQPInfo.cost includes the constant
        # stage-0 error term, the condensed NLP objective does not)
        _, objective, _ = _build_funcs(
            params, sc, weights, Nt, c0, x_ref, u_ref
        )
        j_ours = float(objective(jnp.asarray(point.U).ravel()))
        cost_gap = abs(j_ours - ref.cost) / max(1.0, abs(ref.cost))
        assert cost_gap < 1e-6, (step_idx, cost_gap)
