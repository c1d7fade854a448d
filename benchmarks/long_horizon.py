"""Long-horizon backend benchmark: condensed vs stagewise at Nt in {15,60,240}.

Substantiates the long-horizon story (VERDICT r1 weak #5 / SURVEY.md section
5 "long-context" axis): the condensed backend's factorization is
O((Nt nu)^3) and its prediction matrices O(Nt^2), so there must be a
crossover horizon beyond which the O(Nt) factored Riccati-in-ADMM stagewise
backend wins.  This harness measures both on the same hardware and prints
the table.

Run on the TPU chip:  python benchmarks/long_horizon.py [--batch 256]
(The lane-fused Pallas backend is condensed-only and benched in bench.py;
here both contenders run the vmapped XLA paths so the comparison isolates
the QP structure, not the kernel style.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np


def run(horizon: int, backend: str, B: int, reps: int = 3):
    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
    from ft_mpc_tpu.controllers.spiraling import (
        MPCConfig,
        MPCWeights,
        init_warmstart,
        sqp_solve,
    )
    from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
    from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
    from ft_mpc_tpu.solvers.mpc_qp_stagewise import StagewiseConfig
    from ft_mpc_tpu.utils.faults import BrokenThruster
    from ft_mpc_tpu.utils.trajectory import (
        generate_trajectory,
        prepare_center_trajectory,
    )

    dt = 0.1
    params = BodyParams.default(dt)
    uniq = [
        _build_scenario_with_terminal(params, f, DEFAULT_TUNING)
        for f in [[], [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)]]
    ]
    bank = jax.tree.map(lambda *xs: np.stack(xs), *uniq)
    bank = jax.tree.map(lambda x: np.tile(x, (B // 2,) + (1,) * (x.ndim - 1)), bank)
    bank = jax.tree.map(jnp.asarray, bank)

    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    # Equal total ADMM iteration budget for a fair structure comparison.
    cfg = MPCConfig(
        horizon=horizon,
        sqp_iters=2,
        qp_backend=backend,
        admm=StructuredADMMConfig(iters=40, phases=1, rho=50.0, adapt_clip=1.5),
        stagewise=StagewiseConfig(iters=40, phases=1, rho=50.0, adapt_clip=1.5),
    )

    traj = generate_trajectory("hover", dt, max(30, (horizon + 2) * dt))
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.array([0.0, 0.0, 0.6]), 16.8, dt, horizon + 1
    )
    x_ref = jnp.asarray(x_ref[: horizon + 1], jnp.float32)
    u_ref = jnp.asarray(u_ref[: horizon + 1], jnp.float32)

    rng = np.random.default_rng(0)
    x0 = np.zeros((B, 13), dtype=np.float32)
    x0[:, 0:3] = rng.uniform(-1, 1, (B, 3))
    x0[:, 9] = 1.0
    x0 = jnp.asarray(x0)

    c0 = jax.jit(jax.vmap(robot_to_center))(bank.r, x0)
    warm = jax.jit(jax.vmap(lambda sc, c: init_warmstart(params, sc, cfg, c)))(
        bank, c0
    )

    solve = jax.vmap(
        lambda sc, c, w: sqp_solve(params, sc, weights, cfg, c, x_ref, u_ref, w)
    )

    @jax.jit
    def run_n(b, c, w):
        def body(i, w):
            out, _ = solve(b, c, w)
            return out
        w = jax.lax.fori_loop(0, reps - 1, body, w)
        return solve(b, c, w)

    out, _ = run_n(bank, c0, warm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out, info = run_n(bank, c0, out)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    assert np.isfinite(np.asarray(out.U)).all()
    return B * reps / elapsed, float(jnp.max(info.r_prim))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--horizons", type=int, nargs="+", default=[15, 60, 240])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    results = {}
    for nt in args.horizons:
        row = {}
        for backend in ("condensed", "stagewise"):
            sps, rp = run(nt, backend, args.batch, args.reps)
            row[backend] = {"solves_per_s": round(sps, 1), "max_r_prim": rp}
            print(f"Nt={nt:4d} {backend:10s}: {sps:10.1f} solves/s  "
                  f"(max_r_prim {rp:.2e})")
        row["winner"] = max(row, key=lambda k: row[k]["solves_per_s"]
                            if isinstance(row[k], dict) else -1)
        results[nt] = row
    print(json.dumps({"long_horizon": results,
                      "device": str(jax.devices()[0]), "batch": args.batch}))


if __name__ == "__main__":
    main()
