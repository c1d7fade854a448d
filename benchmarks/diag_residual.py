"""Diagnose the max_r_prim floor of the benched lanes config.

Breaks the batch residual down per fault geometry and compares the lanes
kernel against the condensed XLA backend at identical budgets, so we can
tell apart (a) fp32 kernel floor, (b) inexact Newton-refreshed K^{-1},
(c) a few hard scenarios dominating the max.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("FT_MPC_BENCH_BATCH", "128")


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
    B = int(os.environ["FT_MPC_BENCH_BATCH"])

    params = BodyParams.default(dt)
    fault_patterns = [[]]
    fault_patterns += [[BrokenThruster(i, 1.0)] for i in range(16)]
    fault_patterns += [
        [BrokenThruster(i, 1.0), BrokenThruster(j, 1.0)]
        for i in range(16)
        for j in range(i + 1, 16)
    ]
    n_geo = 32
    uniq = [
        _build_scenario_with_terminal(params, f, DEFAULT_TUNING)
        for f in fault_patterns[:n_geo]
    ]
    bank_small = jax.tree.map(lambda *xs: np.stack(xs), *uniq)
    reps = B // n_geo
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

    def run(backend, sqp, iters, phases, newton, rho=50.0, clip=1.5, n_reps=10):
        cfg = MPCConfig(
            horizon=horizon,
            sqp_iters=sqp,
            admm=StructuredADMMConfig(
                iters=iters, phases=phases, rho=rho, adapt_clip=clip
            ),
            newton_iters=newton,
            qp_backend=backend,
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
                return get_control_batch(params, b, weights, cfg, x, x_ref, u_ref, w).warm
            w = jax.lax.fori_loop(0, n_reps - 1, body, w)
            return get_control_batch(params, b, weights, cfg, x, x_ref, u_ref, w)

        out = run_n(bank, x0, warm)
        jax.block_until_ready(out)
        rp = np.asarray(out.info.r_prim)
        rd = np.asarray(out.info.r_dual)
        per_geo = rp.reshape(reps, n_geo).max(axis=0)
        worst = np.argsort(per_geo)[::-1][:5]
        print(
            f"[{backend:9s}] sqp={sqp} iters={iters} ph={phases} nw={newton} "
            f"rho={rho} clip={clip}: max={rp.max():.2e} p50={np.median(rp):.2e} "
            f"p95={np.percentile(rp, 95):.2e} r_dual_max={rd.max():.2e}"
        )
        print(f"    worst geometries: {[(int(g), f'{per_geo[g]:.2e}') for g in worst]}")
        sys.stdout.flush()
        return rp

    # baseline benched config on both backends
    run("lanes", 2, 40, 1, 3)
    run("condensed", 2, 40, 1, 3)
    # iteration scaling on each backend
    run("lanes", 2, 160, 1, 3)
    run("condensed", 2, 160, 1, 3)
    run("lanes", 2, 160, 2, 3)
    run("condensed", 2, 160, 2, 3)
    # does exact refactor (more newton) help lanes?
    run("lanes", 2, 160, 2, 8)
    # rho sensitivity
    run("lanes", 2, 80, 1, 3, rho=200.0, clip=5.0)
    run("condensed", 2, 80, 1, 3, rho=200.0, clip=5.0)


if __name__ == "__main__":
    main()
