"""Residual-distribution diagnostic for the tail-cleanup pass at B=2048."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
    from ft_mpc_tpu.controllers.spiraling import (
        MPCConfig,
        MPCWeights,
        get_control_batch,
        init_warmstart_batch,
    )
    from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
    from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
    from ft_mpc_tpu.utils.faults import BrokenThruster
    from ft_mpc_tpu.utils.trajectory import (
        generate_trajectory,
        prepare_center_trajectory,
    )

    dt = 0.1
    horizon = 15
    B = 2048

    params = BodyParams.default(dt)
    fault_patterns = [[]]
    fault_patterns += [[BrokenThruster(i, 1.0)] for i in range(16)]
    fault_patterns += [
        [BrokenThruster(i, 1.0), BrokenThruster(j, 1.0)]
        for i in range(16)
        for j in range(i + 1, 16)
    ]
    uniq = [
        _build_scenario_with_terminal(params, f, DEFAULT_TUNING)
        for f in fault_patterns[:32]
    ]
    bank_small = jax.tree.map(lambda *xs: np.stack(xs), *uniq)
    reps = B // 32
    bank = jax.tree.map(lambda x: np.tile(x, (reps,) + (1,) * (x.ndim - 1)), bank_small)

    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    traj = generate_trajectory("hover", dt, 5)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.array([0.0, 0.0, 0.6]), 16.8, dt, horizon + 1
    )
    x_ref = jnp.asarray(x_ref[: horizon + 1])
    u_ref = jnp.asarray(u_ref[: horizon + 1])

    rng = np.random.default_rng(0)
    x0 = np.zeros((B, 13), dtype=np.float32)
    x0[:, 0:3] = rng.uniform(-1, 1, (B, 3))
    x0[:, 3:6] = rng.uniform(-0.3, 0.3, (B, 3))
    q = rng.standard_normal((B, 4))
    x0[:, 6:10] = q / np.linalg.norm(q, axis=1, keepdims=True)
    x0[:, 10:13] = rng.uniform(-0.3, 0.3, (B, 3))
    x0 = jnp.asarray(x0)

    def run(iters, cl_iters, cl_k, cl_ph, n_reps=10):
        cfg = MPCConfig(
            horizon=horizon, sqp_iters=2,
            admm=StructuredADMMConfig(iters=iters, phases=1, rho=50.0,
                                      adapt_clip=1.5),
            newton_iters=3,
            cleanup_iters=cl_iters, cleanup_k=cl_k, cleanup_phases=cl_ph,
        )
        warm = jax.jit(
            lambda b, x: init_warmstart_batch(
                params, b, weights, cfg,
                jax.vmap(robot_to_center)(b.r, x), x_ref, u_ref,
            )
        )(bank, x0)

        @jax.jit
        def run_n(b, x, w):
            def body(i, w):
                return get_control_batch(
                    params, b, weights, cfg, x, x_ref, u_ref, w
                ).warm
            w = jax.lax.fori_loop(0, n_reps - 1, body, w)
            return get_control_batch(params, b, weights, cfg, x, x_ref, u_ref, w)

        out = run_n(bank, x0, warm)
        jax.block_until_ready(out)
        rp = np.sort(np.asarray(out.info.r_prim))[::-1]
        print(
            f"iters={iters} cleanup={cl_iters}x{cl_ph}@K{cl_k}: "
            f"max={rp[0]:.2e} top[{rp[0]:.1e},{rp[1]:.1e},{rp[4]:.1e},"
            f"{rp[16]:.1e},{rp[64]:.1e},{rp[255]:.1e},{rp[511]:.1e}] "
            f"n>1e-3={np.sum(rp > 1e-3)} n>1e-2={np.sum(rp > 1e-2)}"
        )
        sys.stdout.flush()

    run(60, 0, 0, 1)          # no cleanup: the raw tail
    run(60, 300, 256, 1)      # cleanup, single phase (no rho jumps)
    run(60, 300, 256, 2)      # what bench just ran
    run(60, 300, 512, 1)      # wider K
    run(80, 400, 512, 1)      # more everywhere


if __name__ == "__main__":
    main()
