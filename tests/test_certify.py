"""KKT certificate: the SQP's converged solutions satisfy the NLP's
optimality conditions (solver-independent accuracy gate)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
from ft_mpc_tpu.controllers.certify import kkt_residuals
from ft_mpc_tpu.controllers.spiraling import (
    MPCConfig,
    MPCWeights,
    init_warmstart,
    sqp_solve,
)
from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory

DT = 0.1


def test_converged_solution_is_kkt_point():
    # quadratic mode: the box terminal set admits this aggressive initial
    # state; the certified (MCAIS) set's region of attraction is exercised
    # by test_kkt_certified_terminal below.
    params = BodyParams.default(DT)
    sc = _build_scenario_with_terminal(
        params, [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)], DEFAULT_TUNING,
        terminal_mode="quadratic",
    )
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    traj = generate_trajectory("hover", DT, 30)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.asarray(sc.omega_des), 16.8, DT, 16
    )
    x_ref = jnp.asarray(x_ref[:16])
    u_ref = jnp.asarray(u_ref[:16])

    x0 = np.zeros(13)
    x0[0:3] = [1, 0, 1]
    x0[3:6] = [1, 0.5, 0]
    x0[6:10] = Rotation.from_euler("zyx", [50, 30, -10], degrees=True).as_quat()
    x0[10:13] = [0.3, 0.8, -0.1]
    c0 = robot_to_center(sc.r, jnp.asarray(x0))

    cfg = MPCConfig(
        horizon=15, sqp_iters=20,
        admm=StructuredADMMConfig(iters=100, phases=4, rho=50.0),
    )
    warm = init_warmstart(params, sc, cfg, c0)
    point, info = sqp_solve(params, sc, weights, cfg, c0, x_ref, u_ref, warm)

    res = kkt_residuals(params, sc, weights, cfg, c0, x_ref, u_ref, point)
    assert float(res.defect) < 1e-6
    assert float(res.hull_violation) < 1e-5
    assert float(res.term_violation) < 1e-5
    # stationarity of the projected reduced gradient (problem scale ~ 1e2)
    assert float(res.stationarity) < 0.5


def test_kkt_certified_terminal():
    """KKT certificate with the certified (eMPC + cross-term) ingredients,
    starting inside the region of attraction.  The terminal rows are exact
    (h_term >= 0) at the solution, so the restoration relaxation
    (MPCConfig.term_relax) is inactive and the certificate applies to the
    original hard-constrained NLP."""
    params = BodyParams.default(DT)
    sc = _build_scenario_with_terminal(
        params, [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)], DEFAULT_TUNING
    )
    assert bool(np.any(np.asarray(sc.term.sqrt_c) != 0))  # certified cost loaded
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    traj = generate_trajectory("hover", DT, 30)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.asarray(sc.omega_des), 16.8, DT, 16
    )
    x_ref = jnp.asarray(x_ref[:16])
    u_ref = jnp.asarray(u_ref[:16])

    x0 = np.zeros(13)
    x0[0:3] = [0.05, 0.0, 0.05]
    x0[3:6] = [0.02, 0.01, 0.0]
    x0[6:10] = [0, 0, 0, 1]
    x0[10:13] = [0.0, 0.0, 0.55]  # near the spiral rate
    c0 = robot_to_center(sc.r, jnp.asarray(x0))

    cfg = MPCConfig(
        horizon=15, sqp_iters=20,
        admm=StructuredADMMConfig(iters=100, phases=4, rho=50.0),
    )
    warm = init_warmstart(params, sc, cfg, c0)
    point, info = sqp_solve(params, sc, weights, cfg, c0, x_ref, u_ref, warm)

    res = kkt_residuals(params, sc, weights, cfg, c0, x_ref, u_ref, point)
    assert float(res.defect) < 1e-6
    assert float(res.hull_violation) < 1e-5
    assert float(res.term_violation) < 1e-5
    assert float(res.stationarity) < 0.5
