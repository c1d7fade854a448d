"""Multi-device scaling-efficiency benchmark (scenario-sharded batches).

On a TPU pod slice this measures the BASELINE.md target "scaling efficiency
at 2+ hosts": weak scaling of batched MPC control steps on the DEPLOYED
lane-fused backend (the one bench.py measures), with the scenario axis
sharded over the mesh (`ft_mpc_tpu.parallel.sharded_control_step_lanes`).  Scenarios are
embarrassingly parallel -- cross-chip traffic is one scalar psum per step --
so efficiency should be near 1.0; this harness exists to *verify* that on
real hardware and catch regressions (e.g. accidental resharding).

Run:  PYTHONPATH=/root/repo python benchmarks/scaling.py --out SCALING_r04.json

Two sections (VERDICT r3 next-step 5):
  * batch sweep -- single-chip throughput vs batch size B = 128..4096 on
    the deployed lane-fused backend (catches lane-kernel regressions);
  * device sweep -- weak scaling over the available (virtual) devices via
    the scenario-sharded shard_map path.  On a single-chip or CPU
    environment the device sweep validates correctness of the scaling
    path, not speedup.
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


def run(n_devices: int, per_device: int, horizon: int = 15, reps: int = 5):
    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
    from ft_mpc_tpu.controllers.spiraling import (
        MPCConfig,
        MPCWeights,
        init_warmstart_batch,
    )
    from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
    from ft_mpc_tpu.parallel.mesh import (
        make_scenario_mesh,
        shard_scenario_batch,
        sharded_control_step_lanes,
    )
    from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
    from ft_mpc_tpu.utils.faults import BrokenThruster
    from ft_mpc_tpu.utils.trajectory import (
        generate_trajectory,
        prepare_center_trajectory,
    )

    devices = jax.devices()[:n_devices]
    mesh = make_scenario_mesh(devices)
    B = per_device * n_devices

    dt = 0.1
    params = BodyParams.default(dt)
    uniq = [
        _build_scenario_with_terminal(params, f, DEFAULT_TUNING)
        for f in [[], [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)]]
    ]
    bank = jax.tree.map(lambda *xs: np.stack(xs), *uniq)
    bank = jax.tree.map(lambda x: np.tile(x, (B // 2,) + (1,) * (x.ndim - 1)), bank)

    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    # deployed fast config (same as bench.py) on the lane-fused backend
    cfg = MPCConfig(
        horizon=horizon, sqp_iters=2,
        admm=StructuredADMMConfig(iters=40, phases=1, rho=50.0, adapt_clip=1.5),
        newton_iters=3,
    )

    traj = generate_trajectory("hover", dt, 5)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.array([0, 0, 0.6]), 16.8, dt, horizon + 1
    )
    x_ref = jnp.asarray(x_ref[: horizon + 1], jnp.float32)
    u_ref = jnp.asarray(u_ref[: horizon + 1], jnp.float32)

    rng = np.random.default_rng(0)
    x0 = np.zeros((B, 13), np.float32)
    x0[:, 9] = 1.0
    x0[:, 0:3] = rng.uniform(-1, 1, (B, 3))

    # warm start on the unsharded bank (fresh zero arrays inside the
    # builder would otherwise mix shardings under vmap), then shard all.
    x0 = jnp.asarray(x0)
    warm = jax.jit(
        lambda b, x: init_warmstart_batch(
            params, b, weights, cfg,
            jax.vmap(robot_to_center)(b.r, x), x_ref, u_ref,
        )
    )(jax.tree.map(jnp.asarray, bank), x0)
    scenarios = shard_scenario_batch(mesh, bank)
    x0 = shard_scenario_batch(mesh, x0)
    warm = shard_scenario_batch(mesh, warm)

    out, metrics = sharded_control_step_lanes(
        mesh, params, scenarios, weights, cfg, x0, x_ref, u_ref, warm
    )
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    w = out.warm
    for i in range(reps):
        out, metrics = sharded_control_step_lanes(
            mesh, params, scenarios, weights, cfg, x0 + 1e-4 * (i + 1), x_ref,
            u_ref, w,
        )
        w = out.warm
    jax.block_until_ready(metrics)
    elapsed = (time.perf_counter() - t0) / reps
    return B / elapsed


def batch_sweep(batches):
    """Single-chip solves/s vs batch size on the deployed benched config."""
    import importlib

    import bench

    results = {}
    for B in batches:
        # bench.main prints one JSON line; capture it via its internals by
        # re-running with the batch override (cheap: compile cache shared
        # across sizes only when shapes match, so each B recompiles once).
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main(B=B)
        r = json.loads(buf.getvalue().strip().splitlines()[-1])
        results[B] = {
            "solves_per_s": r["value"],
            "ms_per_step": r["per_step_latency_ms"],
            "max_r_prim": r["max_r_prim"],
        }
        print(f"B={B:5d}: {r['value']:10.1f} solves/s  "
              f"({r['per_step_latency_ms']} ms/step, "
              f"max_r_prim {r['max_r_prim']:.2e})")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--per-device", type=int, default=256)
    ap.add_argument(
        "--batches", type=int, nargs="+",
        default=[256, 512, 1024, 2048, 4096],
    )
    ap.add_argument("--skip-batch-sweep", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    payload = {"platform": jax.default_backend(),
               "device": str(jax.devices()[0])}

    if not args.skip_batch_sweep:
        payload["batch_sweep"] = batch_sweep(args.batches)

    avail = len(jax.devices())
    counts = args.devices or sorted(
        {d for d in (1, 2, 4, 8) if d <= avail} | {avail}
    )
    results = {}
    base = None
    for n in counts:
        sps = run(n, args.per_device)
        if base is None:
            base = sps
        eff = sps / (base * n / counts[0])
        results[n] = {"solves_per_s": round(sps, 1), "efficiency": round(eff, 3)}
        print(
            f"{n} device(s): {sps:10.1f} solves/s   weak-scaling efficiency "
            f"{eff:.2%}"
        )
    payload["device_sweep"] = {"per_device": args.per_device, "results": results}
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
