"""Multi-device scenario sharding on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
from ft_mpc_tpu.controllers.spiraling import MPCConfig, MPCWeights, init_warmstart
from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
from ft_mpc_tpu.parallel.mesh import (
    make_scenario_mesh,
    shard_scenario_batch,
    sharded_control_step,
    sharded_rollout,
)
from ft_mpc_tpu.sim.env import SimConfig
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory

DT = 0.1


def build_bank(params, n):
    """n scenarios: rotate through single-fault patterns."""
    banks = []
    for i in range(n):
        faults = [] if i == 0 else [BrokenThruster(i % 16, 1.0)]
        banks.append(_build_scenario_with_terminal(params, faults, DEFAULT_TUNING))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *banks)


def test_sharded_control_step_8dev():
    assert jax.device_count() >= 8
    params = BodyParams.default(DT)
    mesh = make_scenario_mesh()
    B = 8
    scenarios = shard_scenario_batch(mesh, build_bank(params, B))
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(horizon=8, sqp_iters=2)

    traj = generate_trajectory("hover", DT, 5)
    x_ref, u_ref = prepare_center_trajectory(traj, np.array([0, 0, 0.6]), 16.8, DT, 9)
    x_ref = jnp.asarray(x_ref[: cfg.horizon + 1])
    u_ref = jnp.asarray(u_ref[: cfg.horizon + 1])

    x0 = np.zeros((B, 13))
    x0[:, 9] = 1.0
    x0[:, 0] = np.linspace(0.1, 0.8, B)
    x0 = shard_scenario_batch(mesh, jnp.asarray(x0))

    warm = jax.vmap(
        lambda sc, x: init_warmstart(params, sc, cfg, robot_to_center(sc.r, x))
    )(scenarios, x0)

    out, metrics = sharded_control_step(
        mesh, params, scenarios, weights, cfg, x0, x_ref, u_ref, warm
    )
    assert metrics.u_phys.shape == (B, 16)
    assert np.isfinite(np.asarray(metrics.u_phys)).all()
    assert float(metrics.mean_cost) > 0
    # outputs actually sharded over devices
    assert len(metrics.u_phys.sharding.device_set) == 8


def test_sharded_rollout_matches_unsharded():
    params = BodyParams.default(DT)
    mesh = make_scenario_mesh()
    B = 8
    bank = build_bank(params, B)
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(horizon=8, sqp_iters=2)
    sim_cfg = SimConfig(steps=5, noise_mode="none")

    traj = generate_trajectory("hover", DT, 5)
    x_ref, u_ref = prepare_center_trajectory(traj, np.array([0, 0, 0.6]), 16.8, DT, 10)
    x_ref = jnp.asarray(x_ref)
    u_ref = jnp.asarray(u_ref)

    x0 = np.zeros((B, 13))
    x0[:, 9] = 1.0
    x0[:, 2] = np.linspace(-0.5, 0.5, B)
    keys = jax.random.split(jax.random.key(3), B)

    hist_sharded = sharded_rollout(
        mesh, params, shard_scenario_batch(mesh, bank), weights, cfg, sim_cfg,
        shard_scenario_batch(mesh, jnp.asarray(x0)), x_ref, u_ref,
        shard_scenario_batch(mesh, keys),
    )
    from ft_mpc_tpu.sim.env import batched_rollout

    hist_local = batched_rollout(
        params, bank, weights, cfg, sim_cfg, jnp.asarray(x0), x_ref, u_ref, keys
    )
    np.testing.assert_allclose(
        np.asarray(hist_sharded.state), np.asarray(hist_local.state),
        atol=1e-8,
    )


def test_sharded_lanes_step_matches_unsharded():
    """The sharded lane-fused control step (the deployed backend under
    shard_map) equals the unsharded get_control_batch on the same bank:
    lanes are independent, so device partitioning must not change values."""
    from ft_mpc_tpu.controllers.spiraling import (
        MPCConfig,
        MPCWeights,
        get_control_batch,
        init_warmstart_batch,
    )
    from ft_mpc_tpu.ops.dynamics import robot_to_center
    from ft_mpc_tpu.parallel.mesh import (
        make_scenario_mesh,
        shard_scenario_batch,
        sharded_control_step_lanes,
    )
    from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
    from ft_mpc_tpu.utils.trajectory import (
        generate_trajectory,
        prepare_center_trajectory,
    )

    params = BodyParams.default(DT)
    B = 8
    bank = build_bank(params, B)
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(
        horizon=6, sqp_iters=2,
        admm=StructuredADMMConfig(iters=20, phases=1, rho=50.0, adapt_clip=1.5),
    )
    traj = generate_trajectory("hover", DT, 5)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.array([0.0, 0.0, 0.6]), 16.8, DT, cfg.horizon + 1
    )
    x_ref = jnp.asarray(x_ref[: cfg.horizon + 1])
    u_ref = jnp.asarray(u_ref[: cfg.horizon + 1])
    rng = np.random.default_rng(3)
    x0 = np.zeros((B, 13))
    x0[:, 0:3] = rng.uniform(-0.2, 0.2, (B, 3))
    x0[:, 9] = 1.0
    x0[:, 12] = 0.5
    x0 = jnp.asarray(x0)

    c0 = jax.vmap(robot_to_center)(bank.r, x0)
    warm = init_warmstart_batch(params, bank, weights, cfg, c0, x_ref, u_ref)
    out_ref = get_control_batch(
        params, bank, weights, cfg, x0, x_ref, u_ref, warm
    )

    mesh = make_scenario_mesh()
    out_sh, metrics = sharded_control_step_lanes(
        mesh, params,
        shard_scenario_batch(mesh, bank),
        weights, cfg,
        shard_scenario_batch(mesh, x0),
        x_ref, u_ref,
        shard_scenario_batch(mesh, warm),
    )
    # Not bitwise: the Newton-metric rescue predicate is batch-global
    # (any-lane), so shard-local batches can legitimately pick the exact
    # factorization where the full batch refreshed (and vice versa) --
    # solutions then agree to ADMM tolerance, not ULP.
    np.testing.assert_allclose(
        np.asarray(out_sh.u_phys), np.asarray(out_ref.u_phys), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_sh.wrench), np.asarray(out_ref.wrench), atol=5e-3
    )
    assert np.isfinite(float(metrics.mean_cost))
