"""Ablation timing for the batched control step (trustworthy under the axon
tunnel: every repetition chains warm-start state and perturbs x0, so no two
executions see identical inputs)."""

import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
from ft_mpc_tpu.controllers.spiraling import (
    MPCConfig,
    MPCWeights,
    get_control,
    init_warmstart,
    sqp_solve,
)
from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory

B = 2048
DT = 0.1
HORIZON = 15


def setup():
    params = BodyParams.default(DT)
    uniq = [
        _build_scenario_with_terminal(params, f, DEFAULT_TUNING)
        for f in [[], [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)]]
    ]
    bank = jax.tree.map(lambda *xs: np.stack(xs), *uniq)
    bank = jax.tree.map(lambda x: np.tile(x, (B // 2,) + (1,) * (x.ndim - 1)), bank)
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    traj = generate_trajectory("hover", DT, 5)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.array([0, 0, 0.6]), 16.8, DT, HORIZON + 1
    )
    x_ref = jnp.asarray(x_ref[: HORIZON + 1], jnp.float32)
    u_ref = jnp.asarray(u_ref[: HORIZON + 1], jnp.float32)
    rng = np.random.default_rng(0)
    x0 = np.zeros((B, 13), np.float32)
    x0[:, 9] = 1.0
    x0[:, 0:3] = rng.uniform(-1, 1, (B, 3))
    return params, bank, weights, jnp.asarray(x0), x_ref, u_ref


def timed_chain(step_fn, bank, x0, warm, reps=8):
    out = step_fn(bank, x0, warm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    w = warm
    for i in range(reps):
        out = step_fn(bank, x0 + 1e-4 * (i + 1), w)
        w = out.warm
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    params, bank, weights, x0, x_ref, u_ref = setup()

    variants = {
        "full (3 sqp, admm 25x2)": MPCConfig(horizon=HORIZON, sqp_iters=3),
        "sqp=1": MPCConfig(horizon=HORIZON, sqp_iters=1),
        "admm 1x1": MPCConfig(
            horizon=HORIZON, sqp_iters=3,
            admm=StructuredADMMConfig(iters=1, phases=1, rho=1.0),
        ),
        "no line search": MPCConfig(
            horizon=HORIZON, sqp_iters=3, ls_alphas=(1.0,)
        ),
    }

    base_cfg = variants["full (3 sqp, admm 25x2)"]
    warm = jax.jit(
        jax.vmap(
            lambda sc, x: init_warmstart(params, sc, base_cfg, robot_to_center(sc.r, x))
        )
    )(bank, x0)

    for name, cfg in variants.items():
        step = jax.jit(
            jax.vmap(
                lambda sc, x, w: get_control(
                    params, sc, weights, cfg, x, x_ref, u_ref, w
                )
            )
        )
        ms = timed_chain(step, bank, x0, warm)
        print(f"{name:28s}: {ms:8.2f} ms/batch-step  ({B/ms*1e3:8.0f} solves/s)")

    # sqp only (no allocation)
    c0 = jax.jit(jax.vmap(lambda sc, x: robot_to_center(sc.r, x)))(bank, x0)
    sqp = jax.jit(
        jax.vmap(
            lambda sc, c, w: sqp_solve(
                params, sc, weights, base_cfg, c, x_ref, u_ref, w
            )
        )
    )
    out = sqp(bank, c0, warm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    w = warm
    for i in range(8):
        w, info = sqp(bank, c0 + 1e-4 * (i + 1), w)
    jax.block_until_ready(w)
    ms = (time.perf_counter() - t0) / 8 * 1e3
    print(f"{'sqp only (no alloc)':28s}: {ms:8.2f} ms/batch-step")


if __name__ == "__main__":
    main()
