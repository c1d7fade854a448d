"""Stagewise (Riccati-in-ADMM) QP backend vs the condensed backend."""

import jax
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
from ft_mpc_tpu.controllers.spiraling import (
    MPCConfig,
    MPCWeights,
    init_warmstart,
    sqp_solve,
)
from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
from ft_mpc_tpu.sim.env import SimConfig, rollout
from ft_mpc_tpu.solvers.mpc_qp_stagewise import StagewiseConfig
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory

DT = 0.1
FAULTS = [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)]


def setup(horizon):
    # quadratic terminal mode: these are solver-equivalence tests; under
    # the certified (small MCAIS) terminal set this initial state is in
    # feasibility-restoration mode, where loosely-converged backends
    # legitimately differ (see tests/test_lanes.py for discussion).
    params = BodyParams.default(DT)
    sc = _build_scenario_with_terminal(
        params, FAULTS, DEFAULT_TUNING, terminal_mode="quadratic"
    )
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    traj = generate_trajectory("hover", DT, 30)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.asarray(sc.omega_des), 16.8, DT, horizon + 1
    )
    x0 = np.zeros(13)
    x0[0:3] = [0.5, 0.2, -0.3]
    x0[9] = 1.0
    x0[10:13] = [0, 0, 0.4]
    return params, sc, weights, jnp.asarray(x_ref), jnp.asarray(u_ref), x0


def test_stagewise_matches_condensed_open_loop():
    params, sc, weights, x_ref, u_ref, x0 = setup(15)
    c0 = robot_to_center(sc.r, jnp.asarray(x0))
    base = dict(horizon=15, sqp_iters=4)
    cfg_c = MPCConfig(**base)
    cfg_s = MPCConfig(
        **base, qp_backend="stagewise",
        stagewise=StagewiseConfig(iters=60, rho=50.0),
    )
    warm_c = init_warmstart(params, sc, cfg_c, c0)
    out_c, info_c = sqp_solve(
        params, sc, weights, cfg_c, c0, x_ref[:16], u_ref[:16], warm_c
    )
    out_s, info_s = sqp_solve(
        params, sc, weights, cfg_s, c0, x_ref[:16], u_ref[:16], warm_c
    )
    # Same nonconvex problem, same warm start -> same local solution.
    np.testing.assert_allclose(
        np.asarray(out_s.U), np.asarray(out_c.U), atol=5e-3
    )
    assert float(info_s.cost) <= float(info_c.cost) * 1.02 + 1e-6


def test_stagewise_long_horizon_closed_loop():
    """Nt = 60: the condensed path would build (360, 360) dense systems;
    the stagewise path stays banded and tracks the hover reference."""
    params, sc, weights, x_ref, u_ref, x0 = setup(60)
    cfg = MPCConfig(
        horizon=60, sqp_iters=2, qp_backend="stagewise",
        stagewise=StagewiseConfig(iters=40, rho=50.0),
    )
    sim_cfg = SimConfig(steps=40, noise_mode="none")
    hist = rollout(
        params, sc, weights, cfg, sim_cfg,
        jnp.asarray(x0), x_ref, u_ref, jax.random.key(0),
    )
    assert not bool(jnp.any(jnp.isnan(hist.state)))
    err0 = np.linalg.norm(np.asarray(hist.c0[0, 0:3] - hist.x_ref0[0, 0:3]))
    errN = np.linalg.norm(np.asarray(hist.c0[-1, 0:3] - hist.x_ref0[-1, 0:3]))
    assert errN < err0  # converging
    u = np.asarray(hist.u_phys)
    assert np.abs(u[:, 10:12]).max() < 1e-6  # fault respected


def test_stagewise_adaptive_rho_and_carry():
    """Multi-phase adaptive rho converges from a bad rho0 and reports the
    adapted value for cross-solve carry (VERDICT r1 weak #5)."""
    from ft_mpc_tpu.controllers.spiraling import _masked_geometry, init_warmstart

    params, sc, weights, x_ref, u_ref, x0 = setup(15)
    c0 = robot_to_center(sc.r, jnp.asarray(x0))
    base = dict(horizon=15, sqp_iters=3)
    # Deliberately bad rho0 (1e3): fixed-rho solve should be visibly worse
    # converged than the 3-phase adaptive one at equal total iterations.
    cfg_fixed = MPCConfig(
        **base, qp_backend="stagewise",
        stagewise=StagewiseConfig(iters=60, phases=1, rho=1000.0),
    )
    cfg_adapt = MPCConfig(
        **base, qp_backend="stagewise",
        stagewise=StagewiseConfig(iters=20, phases=3, rho=1000.0),
    )
    warm = init_warmstart(params, sc, cfg_fixed, c0)
    out_f, info_f = sqp_solve(
        params, sc, weights, cfg_fixed, c0, x_ref[:16], u_ref[:16], warm
    )
    out_a, info_a = sqp_solve(
        params, sc, weights, cfg_adapt, c0, x_ref[:16], u_ref[:16], warm
    )
    # rho adapted away from its (bad) initial value and was carried out.
    assert float(out_a.rho) != 1000.0
    assert float(info_a.r_prim) <= float(info_f.r_prim) * 1.001


def test_stagewise_nt512_tractable():
    """Substantiates the Nt = 512 claim (solvers/riccati.py docstring): one
    stagewise QP solve at Nt = 512 stays finite, feasible, and converged."""
    from ft_mpc_tpu.controllers.spiraling import init_warmstart

    params, sc, weights, x_ref, u_ref, x0 = setup(512)
    c0 = robot_to_center(sc.r, jnp.asarray(x0))
    cfg = MPCConfig(
        horizon=512, sqp_iters=1, qp_backend="stagewise",
        stagewise=StagewiseConfig(iters=40, phases=2, rho=50.0),
    )
    warm = init_warmstart(params, sc, cfg, c0)
    out, info = sqp_solve(
        params, sc, weights, cfg, c0, x_ref[:513], u_ref[:513], warm
    )
    assert np.isfinite(np.asarray(out.U)).all()
    assert float(info.r_prim) < 5e-2


def test_stagewise_batched_api_matches_per_scenario():
    """`get_control_batch` with qp_backend='stagewise' (the deployed
    long-horizon path, VERDICT r2 next-step 3) must equal the
    per-scenario `get_control` it routes around."""
    from ft_mpc_tpu.controllers.spiraling import (
        get_control,
        get_control_batch,
        init_warmstart_batch,
    )

    horizon = 20
    params, sc, weights, x_ref, u_ref, x0 = setup(horizon)
    cfg = MPCConfig(
        horizon=horizon, sqp_iters=2, qp_backend="stagewise",
        stagewise=StagewiseConfig(iters=30, rho=50.0),
    )
    B = 3
    bank = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x)), sc
    )
    x0s = jnp.asarray(np.tile(x0, (B, 1)) + np.linspace(0, 0.01, B)[:, None])
    c0s = jax.vmap(robot_to_center)(bank.r, x0s)
    warm = init_warmstart_batch(
        params, bank, weights, cfg, c0s, x_ref[: horizon + 1],
        u_ref[: horizon + 1],
    )
    assert warm.kinv is None  # no condensed metric on the stagewise path

    out_b = jax.jit(
        lambda b, x, w: get_control_batch(
            params, b, weights, cfg, x, x_ref[: horizon + 1],
            u_ref[: horizon + 1], w,
        )
    )(bank, x0s, warm)

    warm1 = jax.vmap(lambda sc_, c: init_warmstart(params, sc_, cfg, c))(
        bank, c0s
    )
    out_1 = jax.vmap(
        lambda sc_, x, w: get_control(
            params, sc_, weights, cfg, x, x_ref[: horizon + 1],
            u_ref[: horizon + 1], w,
        )
    )(bank, x0s, warm1)

    np.testing.assert_allclose(
        np.asarray(out_b.wrench), np.asarray(out_1.wrench), rtol=0, atol=1e-8
    )
    # u_phys: batched allocation runs the lane-fused FISTA kernel, the
    # per-scenario path the XLA allocator; iteration scheduling differs at
    # the ~5e-5 N level (<<0.05 N accuracy gate), wrench parity above is
    # the exact check.
    np.testing.assert_allclose(
        np.asarray(out_b.u_phys), np.asarray(out_1.u_phys), rtol=0, atol=1e-3
    )
    assert np.isfinite(np.asarray(out_b.info.r_prim)).all()
