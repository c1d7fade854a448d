"""Honest sub-stage timing of the lanes-backend batched control step.

All loops run inside one jit with a dependency chain (the axon tunnel
memoizes identical executions, and per-call dispatch round-trips dwarf
device time), so numbers are per-call device time.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 8


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
    from ft_mpc_tpu.controllers.spiraling import (
        MPCConfig,
        MPCWeights,
        _assemble_condensed,
        _masked_geometry,
        _merit_alpha,
        get_control_batch,
        init_warmstart_batch,
    )
    from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
    from ft_mpc_tpu.solvers.allocation import allocate_thrusters
    from ft_mpc_tpu.solvers.lanes_qp import build_K, newton_kinv, solve_mpc_qp_lanes
    from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
    from ft_mpc_tpu.utils.faults import BrokenThruster
    from ft_mpc_tpu.utils.trajectory import (
        generate_trajectory,
        prepare_center_trajectory,
    )

    dt, horizon, B = 0.1, 15, 2048
    params = BodyParams.default(dt)
    fault_patterns = [[]] + [[BrokenThruster(i, 1.0)] for i in range(16)]
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
    reps = B // len(uniq)
    bank = jax.tree.map(lambda x: np.tile(x, (reps,) + (1,) * (x.ndim - 1)), bank_small)

    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(
        horizon=horizon, sqp_iters=3,
        admm=StructuredADMMConfig(iters=30, phases=1, rho=50.0, adapt_clip=1.5),
        newton_iters=3,
    )
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
    c0 = jax.vmap(robot_to_center)(bank.r, x0)

    warm = jax.jit(
        lambda b, x: init_warmstart_batch(
            params, b, weights, cfg, jax.vmap(robot_to_center)(b.r, x), x_ref, u_ref
        )
    )(bank, x0)

    def dev_time(make_loop, *args):
        f = jax.jit(make_loop)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / REPS

    # --- full control step, chained warm ------------------------------
    def loop_full(x, w):
        def body(i, w):
            out = get_control_batch(params, bank, weights, cfg, x, x_ref, u_ref, w)
            return out.warm
        return jax.lax.fori_loop(0, REPS, body, w)

    t = dev_time(loop_full, x0, warm)
    print(f"full step      {1e3*t:8.2f} ms  ({B/t:8.0f} solves/s)")

    hull_A, hull_b, term_A, term_b = jax.vmap(_masked_geometry)(bank)
    assemble = jax.vmap(
        lambda sc, X, U, hA, hb, tA, tb: _assemble_condensed(
            params, sc, weights, cfg, X, U, x_ref, u_ref, hA, hb, tA, tb
        )
    )

    # --- assembly (linearize + condense + H/g) , chained ---------------
    def loop_asm(X, U):
        def body(i, carry):
            X, U = carry
            qp, S_all, phi_all, defects = assemble(
                bank, X, U, hull_A, hull_b, term_A, term_b
            )
            return (
                X + 1e-7 * defects.mean(),
                U + 1e-7 * qp.g.reshape(U.shape[0], -1, 6)[:, : U.shape[1]],
            )
        return jax.lax.fori_loop(0, REPS, body, (X, U))

    X0w = warm.X.at[:, 0].set(c0)
    t_asm = dev_time(loop_asm, X0w, warm.U)
    print(f"assemble (x1)  {1e3*t_asm:8.2f} ms  x3 = {3e3*t_asm:.1f}")

    qp, S_all, phi_all, defects = jax.jit(
        lambda X, U: assemble(bank, X, U, hull_A, hull_b, term_A, term_b)
    )(X0w, warm.U)

    # --- QP solve (K build + newton + admm kernel), chained -------------
    def loop_qp(yh, yt, rho, kinv):
        def body(i, carry):
            yh, yt, rho, kinv = carry
            s = solve_mpc_qp_lanes(
                qp, cfg.admm, y_hull0=yh, y_term0=yt, rho0=rho, kinv0=kinv,
                newton_iters=cfg.newton_iters,
            )
            return (s.y_hull, s.y_term, s.rho, s.kinv)
        return jax.lax.fori_loop(
            0, REPS, body, (yh, yt, rho, kinv)
        )

    t_qp = dev_time(loop_qp, warm.y_hull, warm.y_term, warm.rho, warm.kinv)
    print(f"qp solve (x1)  {1e3*t_qp:8.2f} ms  x3 = {3e3*t_qp:.1f}")

    # --- K build + newton only, chained ---------------------------------
    def loop_newton(kinv):
        def body(i, kinv):
            K, _ = build_K(qp, warm.rho + 1e-6 * i, cfg.admm.sigma)
            return newton_kinv(K, kinv, cfg.newton_iters)
        return jax.lax.fori_loop(0, REPS, body, kinv)

    t_nt = dev_time(loop_newton, warm.kinv)
    print(f"K+newton (x1)  {1e3*t_nt:8.2f} ms  x3 = {3e3*t_nt:.1f}")

    # --- line search, chained -------------------------------------------
    line_search = jax.vmap(
        lambda sc, X, U, dX, dU, hA, hb, tA, tb: _merit_alpha(
            params, sc, weights, cfg, X, U, dX, dU, x_ref, u_ref, hA, hb, tA, tb
        )
    )
    dU = jnp.asarray(rng.standard_normal((B, horizon, 6)) * 0.01, jnp.float32)
    dX = jnp.asarray(rng.standard_normal((B, horizon, 13)) * 0.01, jnp.float32)

    def loop_ls(U):
        def body(i, U):
            a = line_search(bank, X0w, U, dX, dU, hull_A, hull_b, term_A, term_b)
            return U + 1e-7 * a[:, None, None]
        return jax.lax.fori_loop(0, REPS, body, U)

    t_ls = dev_time(loop_ls, warm.U)
    print(f"line srch (x1) {1e3*t_ls:8.2f} ms  x3 = {3e3*t_ls:.1f}")

    # --- allocation, chained ---------------------------------------------
    wr = jnp.asarray(rng.uniform(-1, 1, (B, 6)), jnp.float32)

    def loop_alloc(w):
        def body(i, w):
            _, alloc = jax.vmap(
                lambda sc, ww: (0, allocate_thrusters(
                    ww, params.D, sc.u_ub, sc.faulty_force_gen, sc.hull_A,
                    sc.hull_b, sc.hull_mask, gen_G=sc.gen_G, gen_c=sc.gen_c,
                    gen_L=sc.gen_L, max_thrust=params.max_thrust))
            )(bank, w)
            return w + 1e-7 * alloc.u_phys[:, :6]
        return jax.lax.fori_loop(0, REPS, body, w)

    t_al = dev_time(loop_alloc, wr)
    print(f"allocation     {1e3*t_al:8.2f} ms")


if __name__ == "__main__":
    main()
