"""Long-horizon backend benchmark at DEPLOYMENT accuracy (round 4).

Measures the deployed batched control step (`get_control_batch`: SQP +
QP + lane-fused allocation, warm-started steady state) at Nt in
{15, 60, 240} on three QP backends:

  * condensed      -- lane-fused Pallas ADMM + worst-K cleanup (the Nt=15
                      deployed backend; its metric is (Nt*nu)^2 dense, so
                      it is skipped where that exceeds --condensed-max-n).
  * stagewise      -- Riccati-in-ADMM, sequential factored resolve
                      (mode='scan') + worst-K cleanup.
  * stagewise-lanes-- same solver with the lane-fused Pallas LQR resolve
                      (mode='lanes', solvers/lanes_riccati.py): every ADMM
                      x-update is 2 kernel launches for the whole bank
                      (batch in lanes, stages streamed through VMEM)
                      instead of 2*Nt vmapped XLA dispatches.

All backends run ELASTIC terminal rows + cleanup (identical semantics, so
max_r_prim is apples-to-apples -- ADVICE r3 fix) with budgets sized to
land max_r_prim <= 1e-3 at every horizon (VERDICT r3 next-step 1).

Run on the TPU chip:
    PYTHONPATH=/root/repo python benchmarks/long_horizon.py --batch 512 \
        --out benchmarks/long_horizon_r04.json
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


def run(horizon: int, backend: str, B: int, args):
    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
    from ft_mpc_tpu.controllers.spiraling import (
        MPCConfig,
        MPCWeights,
        get_control_batch,
        init_warmstart_batch,
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
    qp_backend = "condensed" if backend == "condensed" else "stagewise"
    mode = "lanes" if backend == "stagewise-lanes" else "scan"
    cleanup_k = max(1, B // 8)
    cfg = MPCConfig(
        horizon=horizon,
        sqp_iters=args.sqp_iters,
        qp_backend=qp_backend,
        admm=StructuredADMMConfig(
            iters=args.iters, phases=1, rho=50.0, adapt_clip=1.5
        ),
        stagewise=StagewiseConfig(
            iters=args.iters, phases=1, rho=50.0, adapt_clip=1.5, mode=mode
        ),
        newton_iters=3,
        cleanup_iters=args.cleanup,
        cleanup_k=cleanup_k,
        cleanup_phases=2,
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
    warm = jax.jit(
        lambda b, c: init_warmstart_batch(
            params, b, weights, cfg, c, x_ref, u_ref
        )
    )(bank, c0)

    @jax.jit
    def run_n(b, x, w):
        def body(i, w):
            out = get_control_batch(params, b, weights, cfg, x, x_ref, u_ref, w)
            return out.warm
        w = jax.lax.fori_loop(0, args.reps - 1, body, w)
        return get_control_batch(params, b, weights, cfg, x, x_ref, u_ref, w)

    out = run_n(bank, x0, warm)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run_n(bank, x0, out.warm)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    assert np.isfinite(np.asarray(out.u_phys)).all()
    return {
        "solves_per_s": round(B * args.reps / elapsed, 1),
        "max_r_prim": float(jnp.max(out.info.r_prim)),
        "max_term_gap": float(jnp.max(out.info.term_gap)),
        "ms_per_step": round(1e3 * elapsed / args.reps, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--horizons", type=int, nargs="+", default=[15, 60, 240])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sqp-iters", type=int, default=2)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--cleanup", type=int, default=300)
    ap.add_argument(
        "--condensed-max-n", type=int, default=120,
        help="skip the condensed backend when Nt*nu exceeds this (its dense "
        "(Nt*nu)^2 carried metric would dominate HBM at long horizons)",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = {}
    for nt in args.horizons:
        row = {}
        backends = ["stagewise", "stagewise-lanes"]
        if nt * 6 <= args.condensed_max_n:
            backends.insert(0, "condensed")
        else:
            row["condensed"] = "skipped: (Nt*nu)^2 metric impractical"
        for backend in backends:
            r = run(nt, backend, args.batch, args)
            row[backend] = r
            print(f"Nt={nt:4d} {backend:16s}: {r['solves_per_s']:10.1f} solves/s  "
                  f"(max_r_prim {r['max_r_prim']:.2e}, "
                  f"term_gap {r['max_term_gap']:.2e})")
        results[nt] = row
    payload = {
        "long_horizon": results,
        "device": str(jax.devices()[0]),
        "batch": args.batch,
        "budgets": {
            "sqp_iters": args.sqp_iters, "iters": args.iters,
            "cleanup": args.cleanup, "cleanup_k": max(1, args.batch // 8),
        },
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
