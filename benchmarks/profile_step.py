"""Component-level timing of the batched control step on one chip.

Times, at the bench batch size: (a) full get_control, (b) sqp_solve only,
(c) allocation only, (d) linearize only, (e) condense+assemble only,
(f) ADMM only (fixed QP), (g) Cholesky+inverse only, (h) batch-size sweep.
Used to find what dominates the 1-chip solves/s benchmark.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *a, n=5):
    import jax

    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
    from ft_mpc_tpu.controllers.spiraling import (
        MPCConfig,
        MPCWeights,
        get_control,
        init_warmstart,
        sqp_solve,
        _condense,
        _stage_dynamics,
    )
    from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
    from ft_mpc_tpu.solvers.allocation import allocate_thrusters
    from ft_mpc_tpu.solvers.mpc_qp import (
        StructuredADMMConfig,
        StructuredMPCQP,
        solve_mpc_qp,
    )
    from ft_mpc_tpu.utils.faults import BrokenThruster
    from ft_mpc_tpu.utils.trajectory import (
        generate_trajectory,
        prepare_center_trajectory,
    )
    from functools import partial

    dt, horizon, B = 0.1, 15, 2048
    params = BodyParams.default(dt)
    fault_patterns = [[]] + [[BrokenThruster(i, 1.0)] for i in range(16)]
    uniq = [
        _build_scenario_with_terminal(params, f, DEFAULT_TUNING)
        for f in fault_patterns[:16]
    ]
    bank_small = jax.tree.map(lambda *xs: np.stack(xs), *uniq)
    reps = B // len(uniq)
    bank = jax.tree.map(lambda x: np.tile(x, (reps,) + (1,) * (x.ndim - 1)), bank_small)

    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(
        horizon=horizon, sqp_iters=3,
        admm=StructuredADMMConfig(iters=30, phases=1, rho=50.0),
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

    warm = jax.jit(
        jax.vmap(lambda sc, x: init_warmstart(params, sc, cfg, robot_to_center(sc.r, x)))
    )(bank, x0)

    # (a) full step
    step = jax.jit(jax.vmap(
        lambda sc, x, w: get_control(params, sc, weights, cfg, x, x_ref, u_ref, w)))
    t_full = timeit(step, bank, x0, warm)
    print(f"full get_control          {1e3*t_full:8.2f} ms   ({B/t_full:8.0f} solves/s)")

    # (b) sqp only
    sqp = jax.jit(jax.vmap(
        lambda sc, x, w: sqp_solve(params, sc, weights, cfg,
                                   robot_to_center(sc.r, x), x_ref, u_ref, w)))
    t_sqp = timeit(sqp, bank, x0, warm)
    print(f"sqp_solve only            {1e3*t_sqp:8.2f} ms")

    # (c) allocation only
    wr = np.asarray(rng.uniform(-1, 1, (B, 6)), np.float32)
    alloc = jax.jit(jax.vmap(
        lambda sc, w: allocate_thrusters(
            w, params.D, sc.u_ub, sc.faulty_force_gen, sc.hull_A, sc.hull_b,
            sc.hull_mask, gen_G=sc.gen_G, gen_c=sc.gen_c, gen_L=sc.gen_L,
            max_thrust=params.max_thrust)))
    t_alloc = timeit(alloc, bank, jnp.asarray(wr))
    print(f"allocation only           {1e3*t_alloc:8.2f} ms")

    # (d) linearize only (one SQP iteration's jacobians, x3 to compare)
    def lin_once(sc, w):
        stage_dyn = partial(_stage_dynamics, params, sc)
        f_vals = jax.vmap(stage_dyn)(w.X[:-1], w.U, u_ref[:horizon])
        A, Bm = jax.vmap(jax.jacfwd(stage_dyn, argnums=(0, 1)))(
            w.X[:-1], w.U, u_ref[:horizon])
        return f_vals, A, Bm

    lin = jax.jit(jax.vmap(lin_once))
    t_lin = timeit(lin, bank, warm)
    print(f"linearize (1 SQP iter)    {1e3*t_lin:8.2f} ms  x3 = {3e3*t_lin:.2f}")

    # (e) condense only
    f_vals, A_stack, B_stack = jax.jit(jax.vmap(lin_once))(bank, warm)
    defects = f_vals - warm.X[:, 1:]
    cond = jax.jit(jax.vmap(lambda A, Bm, d: _condense(A, Bm, d, horizon)))
    t_cond = timeit(cond, A_stack, B_stack, defects)
    print(f"condense (1 SQP iter)     {1e3*t_cond:8.2f} ms  x3 = {3e3*t_cond:.2f}")

    # (f) ADMM only on a fixed QP (build one from the real path)
    n_dec = horizon * 6
    Hq = np.asarray(rng.standard_normal((B, n_dec, 24)), np.float32)
    H = jnp.einsum("bik,bjk->bij", Hq, Hq) * 0.1 + 2.0 * jnp.eye(n_dec)[None]
    g = jnp.asarray(rng.standard_normal((B, n_dec)), np.float32)
    F = int(bank.hull_A.shape[1])
    Tn = int(bank.term_A.shape[1])
    h_hull = jnp.abs(jnp.asarray(rng.standard_normal((B, horizon, F)), np.float32)) + 0.5
    G_term = jnp.asarray(rng.standard_normal((B, Tn, n_dec)), np.float32) * 0.1
    h_term = jnp.abs(jnp.asarray(rng.standard_normal((B, Tn)), np.float32)) + 0.5
    qps = jax.vmap(StructuredMPCQP)(H, g, bank.hull_A, h_hull, G_term, h_term)
    admm = jax.jit(jax.vmap(lambda qp: solve_mpc_qp(qp, cfg.admm)))
    t_admm = timeit(admm, qps)
    print(f"ADMM 30it 1ph (1 QP)      {1e3*t_admm:8.2f} ms  x3 = {3e3*t_admm:.2f}")

    # (g) cholesky+inverse only
    def chol_inv(Hb):
        chol = jnp.linalg.cholesky(Hb)
        return jax.scipy.linalg.cho_solve((chol, True), jnp.eye(n_dec, dtype=Hb.dtype))
    ci = jax.jit(jax.vmap(chol_inv))
    t_ci = timeit(ci, H)
    print(f"cholesky+inv 90x90        {1e3*t_ci:8.2f} ms  x3 = {3e3*t_ci:.2f}")

    # (h) batch sweep of the full step
    for Bs in (4096, 8192):
        reps2 = Bs // len(uniq)
        bank2 = jax.tree.map(
            lambda x: np.tile(x, (reps2,) + (1,) * (x.ndim - 1)), bank_small)
        x02 = jnp.asarray(np.tile(np.asarray(x0[: len(uniq)]), (reps2, 1)))
        warm2 = jax.jit(jax.vmap(
            lambda sc, x: init_warmstart(params, sc, cfg, robot_to_center(sc.r, x))
        ))(bank2, x02)
        t2 = timeit(step, bank2, x02, warm2, n=3)
        print(f"full step B={Bs:5d}         {1e3*t2:8.2f} ms   ({Bs/t2:8.0f} solves/s)")


if __name__ == "__main__":
    main()
