"""Isolate the one stubborn scenario and probe its QP directly:
rho sweep x iteration sweep on the exact condensed QP, plus a feasibility
check (is the residual floor an ADMM artifact or actual infeasibility?)."""

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
        _assemble_condensed_batch,
        _masked_geometry,
    )
    from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
    from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig, solve_mpc_qp
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

    cfg = MPCConfig(
        horizon=horizon, sqp_iters=2,
        admm=StructuredADMMConfig(iters=60, phases=1, rho=50.0, adapt_clip=1.5),
        newton_iters=3, cleanup_iters=300, cleanup_k=256, cleanup_phases=1,
    )
    warm = jax.jit(
        lambda b, x: init_warmstart_batch(
            params, b, weights, cfg,
            jax.vmap(robot_to_center)(b.r, x), x_ref, u_ref,
        )
    )(bank, x0)

    n_reps = 10

    @jax.jit
    def run_n(b, x, w):
        def body(i, w):
            return get_control_batch(params, b, weights, cfg, x, x_ref, u_ref, w).warm
        w = jax.lax.fori_loop(0, n_reps - 1, body, w)
        return get_control_batch(params, b, weights, cfg, x, x_ref, u_ref, w)

    out = run_n(bank, x0, warm)
    jax.block_until_ready(out)
    rp = np.asarray(out.info.r_prim)
    i_bad = int(np.argmax(rp))
    geo = i_bad % 32
    print(f"stubborn scenario: idx={i_bad} geometry={geo} "
          f"faults={fault_patterns[geo]} r_prim={rp[i_bad]:.3e} "
          f"r_dual={np.asarray(out.info.r_dual)[i_bad]:.3e} "
          f"rho={np.asarray(out.warm.rho)[i_bad]:.3g}")

    # Reassemble its QP at the final iterate and probe with the XLA solver.
    w = out.warm
    hull_A, hull_b, term_A, term_b = jax.vmap(_masked_geometry)(bank)
    qp, *_ = _assemble_condensed_batch(
        params, bank, weights, cfg, w.X, w.U, x_ref, u_ref,
        hull_A, hull_b, term_A, term_b,
    )
    qp1 = jax.tree.map(lambda a: a[i_bad], qp)
    tm = np.asarray(jax.tree.map(lambda a: a[i_bad], bank).term_mask) > 0.5
    ht = np.asarray(qp1.h_term)
    print(f"h_term (active rows): min={ht[tm].min():.3e} "
          f"n_negative={(ht[tm] < 0).sum()}")

    for rho in [1.0, 10.0, 50.0, 250.0, 1000.0]:
        for iters, phases in [(300, 1), (300, 4), (1000, 4)]:
            c = StructuredADMMConfig(iters=iters, phases=phases, rho=rho,
                                     adapt_clip=5.0)
            sol = solve_mpc_qp(qp1, c)
            print(f"  rho={rho:6.1f} {iters}x{phases}: "
                  f"r_prim={float(sol.r_prim):.3e} r_dual={float(sol.r_dual):.3e} "
                  f"rho_out={float(sol.rho):.3g}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
