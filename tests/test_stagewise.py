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


def _synthetic_stagewise_qp(rng, Nt=10, n=4, m=2, F=3, Tm=2, infeasible=False):
    """Small random stagewise QP; optionally with terminal rows no input
    sequence can satisfy (restoration-infeasible)."""
    from ft_mpc_tpu.solvers.mpc_qp_stagewise import StagewiseMPCQP

    A = np.tile(np.eye(n) * 0.95, (Nt, 1, 1)) + rng.standard_normal((Nt, n, n)) * 0.02
    B = rng.standard_normal((Nt, n, m)) * 0.3
    c = rng.standard_normal((Nt, n)) * 0.01
    Qx = np.eye(n) * 0.5
    gx = rng.standard_normal((Nt + 1, n)) * 0.1
    Ru = np.eye(m) * 0.2
    gu = rng.standard_normal((Nt, m)) * 0.1
    QxN = np.eye(n)
    hull_A = rng.standard_normal((F, m))
    h_hull = np.tile(np.abs(rng.standard_normal(F)) + 0.5, (Nt, 1))
    T = np.zeros((Tm, n))
    T[:, 0] = [1.0, -1.0]  # dx_N[0] <= h1 and -dx_N[0] <= h2
    if infeasible:
        h_term = np.array([-5.0, -5.0])  # dx_N[0] >= 5 AND <= -5: impossible
    else:
        h_term = np.array([10.0, 10.0])
    return StagewiseMPCQP(
        *map(jnp.asarray, (A, B, c, Qx, gx, Ru, gu, QxN, hull_A, h_hull, T, h_term))
    )


def test_stagewise_elastic_matches_hard_on_feasible():
    """Exact-penalty property: on a feasible QP whose terminal duals stay
    below the clamp, elastic and hard rows give the same solution and
    term_gap == 0 (same semantics as the condensed backend's elastic)."""
    from ft_mpc_tpu.solvers.mpc_qp_stagewise import (
        StagewiseConfig,
        solve_mpc_qp_stagewise,
    )

    rng = np.random.default_rng(3)
    qp = _synthetic_stagewise_qp(rng, infeasible=False)
    cfg_h = StagewiseConfig(iters=80, phases=2, rho=10.0, elastic_y_max=0.0)
    cfg_e = StagewiseConfig(iters=80, phases=2, rho=10.0, elastic_y_max=1e3)
    sol_h = solve_mpc_qp_stagewise(qp, cfg_h)
    sol_e = solve_mpc_qp_stagewise(qp, cfg_e)
    np.testing.assert_allclose(
        np.asarray(sol_e.dU), np.asarray(sol_h.dU), atol=1e-9
    )
    assert float(sol_e.term_gap) == 0.0
    assert float(sol_h.term_gap) == 0.0  # hard rows: gap defined as 0


def test_stagewise_elastic_infeasible_converges_with_gap():
    """Restoration-infeasible terminal rows: hard rows floor r_prim at the
    infeasibility gap; elastic rows converge (small r_prim) and report the
    violation honestly as term_gap (VERDICT r3 next-step 1)."""
    from ft_mpc_tpu.solvers.mpc_qp_stagewise import (
        StagewiseConfig,
        solve_mpc_qp_stagewise,
    )

    rng = np.random.default_rng(5)
    qp = _synthetic_stagewise_qp(rng, infeasible=True)
    sol_h = solve_mpc_qp_stagewise(
        qp, StagewiseConfig(iters=150, phases=3, rho=10.0, elastic_y_max=0.0)
    )
    sol_e = solve_mpc_qp_stagewise(
        qp, StagewiseConfig(iters=150, phases=3, rho=10.0, elastic_y_max=1e2)
    )
    # the two contradictory rows are 5 apart: gap >= 5 split across rows
    assert float(sol_h.r_prim) > 1.0  # hard: stuck at the infeasibility floor
    assert float(sol_e.r_prim) < 1e-2  # elastic: converged
    assert float(sol_e.term_gap) > 4.0  # honest minimum-violation report


def test_stagewise_scan_assoc_matches_scan():
    """mode='scan-assoc' (parallel-in-horizon factor + resolve) is the same
    solver as mode='scan' to fp tolerance."""
    from ft_mpc_tpu.solvers.mpc_qp_stagewise import (
        StagewiseConfig,
        solve_mpc_qp_stagewise,
    )

    rng = np.random.default_rng(7)
    qp = _synthetic_stagewise_qp(rng, Nt=17)
    cfg_s = StagewiseConfig(iters=50, phases=2, rho=10.0)
    cfg_a = cfg_s._replace(mode="scan-assoc")
    sol_s = solve_mpc_qp_stagewise(qp, cfg_s)
    sol_a = solve_mpc_qp_stagewise(qp, cfg_a)
    np.testing.assert_allclose(
        np.asarray(sol_a.dU), np.asarray(sol_s.dU), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sol_a.dX), np.asarray(sol_s.dX), atol=1e-7
    )
    assert abs(float(sol_a.r_prim) - float(sol_s.r_prim)) < 1e-7


def test_term_gap_finite_across_backends():
    """SQPInfo.term_gap is never NaN on any backend (VERDICT r3 item 1
    done-criterion): condensed, stagewise, and the batched lanes path."""
    from ft_mpc_tpu.controllers.spiraling import (
        get_control_batch,
        init_warmstart_batch,
    )

    horizon = 10
    params, sc, weights, x_ref, u_ref, x0 = setup(horizon)
    for backend, stage_cfg in (
        ("condensed", StagewiseConfig()),
        ("stagewise", StagewiseConfig(iters=30, rho=50.0)),
    ):
        cfg = MPCConfig(
            horizon=horizon, sqp_iters=1, qp_backend=backend,
            stagewise=stage_cfg,
        )
        c0 = robot_to_center(sc.r, jnp.asarray(x0))
        warm = init_warmstart(params, sc, cfg, c0)
        _, info = sqp_solve(
            params, sc, weights, cfg, c0, x_ref[: horizon + 1],
            u_ref[: horizon + 1], warm,
        )
        assert np.isfinite(float(info.term_gap)), backend

    # batched lanes path (the deployed backend)
    cfg = MPCConfig(horizon=horizon, sqp_iters=1)
    B = 2
    bank = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x)), sc
    )
    x0s = jnp.asarray(np.tile(x0, (B, 1)))
    c0s = jax.vmap(robot_to_center)(bank.r, x0s)
    warm = init_warmstart_batch(
        params, bank, weights, cfg, c0s, x_ref[: horizon + 1],
        u_ref[: horizon + 1],
    )
    out = get_control_batch(
        params, bank, weights, cfg, x0s, x_ref[: horizon + 1],
        u_ref[: horizon + 1], warm,
    )
    assert np.isfinite(np.asarray(out.info.term_gap)).all()


def test_stagewise_batched_cleanup_improves_tail():
    """The stagewise worst-K cleanup pass lowers the batch's worst QP
    residual (long-horizon deployed-parity machinery, VERDICT r3 item 1)."""
    from ft_mpc_tpu.controllers.spiraling import (
        get_control_batch,
        init_warmstart_batch,
    )

    horizon = 30
    params, sc, weights, x_ref, u_ref, x0 = setup(horizon)
    B = 4
    bank = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x)), sc
    )
    rng = np.random.default_rng(0)
    x0s = np.tile(x0, (B, 1))
    x0s[:, 0:3] += rng.uniform(-1.5, 1.5, (B, 3))
    x0s[:, 3:6] += rng.uniform(-0.5, 0.5, (B, 3))
    x0s = jnp.asarray(x0s)
    # deliberately under-budgeted baseline (bad rho, few iterations) so the
    # batch has a genuinely unconverged tail for the cleanup to fix
    base = dict(
        horizon=horizon, sqp_iters=1, qp_backend="stagewise",
        stagewise=StagewiseConfig(iters=5, rho=2000.0, adapt_clip=1.5),
    )
    cfg0 = MPCConfig(**base)
    cfg1 = MPCConfig(**base, cleanup_iters=120, cleanup_k=2, cleanup_phases=2)
    c0s = jax.vmap(robot_to_center)(bank.r, x0s)
    warm = init_warmstart_batch(
        params, bank, weights, cfg0, c0s, x_ref[: horizon + 1],
        u_ref[: horizon + 1],
    )
    out0 = get_control_batch(
        params, bank, weights, cfg0, x0s, x_ref[: horizon + 1],
        u_ref[: horizon + 1], warm,
    )
    out1 = get_control_batch(
        params, bank, weights, cfg1, x0s, x_ref[: horizon + 1],
        u_ref[: horizon + 1], warm,
    )
    top0 = np.sort(np.asarray(out0.info.r_prim))[-2:]
    top1 = np.sort(np.asarray(out1.info.r_prim))[-2:]
    assert top1.max() < top0.max()
    assert np.isfinite(np.asarray(out1.u_phys)).all()


def test_stagewise_lanes_solver_matches_vmapped_scan():
    """`solve_mpc_qp_stagewise_lanes` (Pallas LQR resolve, interpret mode
    on CPU) == vmap(solve_mpc_qp_stagewise) with mode='scan'."""
    from ft_mpc_tpu.solvers.mpc_qp_stagewise import (
        StagewiseConfig,
        solve_mpc_qp_stagewise,
        solve_mpc_qp_stagewise_lanes,
    )

    rng = np.random.default_rng(11)
    qps = [_synthetic_stagewise_qp(rng, Nt=9, n=13, m=6, F=4, Tm=2)
           for _ in range(3)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
    cfg = StagewiseConfig(iters=40, phases=2, rho=10.0)
    sol_l = solve_mpc_qp_stagewise_lanes(batch, cfg)
    sol_s = jax.vmap(
        lambda q: solve_mpc_qp_stagewise(q, cfg)
    )(batch)
    np.testing.assert_allclose(
        np.asarray(sol_l.dU), np.asarray(sol_s.dU), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.r_prim), np.asarray(sol_s.r_prim), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.rho), np.asarray(sol_s.rho), rtol=1e-4
    )


def test_stagewise_lanes_controller_matches_scan():
    """get_control_batch with stagewise mode='lanes' == mode='scan' (the
    deployed long-horizon batched path vs the per-scenario reference)."""
    from ft_mpc_tpu.controllers.spiraling import (
        get_control_batch,
        init_warmstart_batch,
    )

    horizon = 20
    params, sc, weights, x_ref, u_ref, x0 = setup(horizon)
    B = 3
    bank = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x)), sc
    )
    x0s = jnp.asarray(np.tile(x0, (B, 1)) + np.linspace(0, 0.01, B)[:, None])
    outs = {}
    for mode in ("scan", "lanes"):
        cfg = MPCConfig(
            horizon=horizon, sqp_iters=2, qp_backend="stagewise",
            stagewise=StagewiseConfig(iters=30, rho=50.0, mode=mode),
            cleanup_iters=50, cleanup_k=1, cleanup_phases=1,
        )
        c0s = jax.vmap(robot_to_center)(bank.r, x0s)
        warm = init_warmstart_batch(
            params, bank, weights, cfg, c0s, x_ref[: horizon + 1],
            u_ref[: horizon + 1],
        )
        outs[mode] = get_control_batch(
            params, bank, weights, cfg, x0s, x_ref[: horizon + 1],
            u_ref[: horizon + 1], warm,
        )
    np.testing.assert_allclose(
        np.asarray(outs["lanes"].wrench), np.asarray(outs["scan"].wrench),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(outs["lanes"].u_phys), np.asarray(outs["scan"].u_phys),
        rtol=0, atol=1e-3,
    )
    assert np.isfinite(np.asarray(outs["lanes"].info.term_gap)).all()
