"""Multi-host launch entry for scenario-sharded MPC (run one per host).

The reference is single-process only (SURVEY.md section 2.2); this is the
framework's 2+ host harness for the BASELINE scaling target.  Each process
builds ONLY its own rows of the global scenario bank, the bank is assembled
into one globally-sharded array (`jax.make_array_from_process_local_data`),
and every step runs the deployed lane-fused backend on local chips with a
single scalar psum crossing DCN.

On a pod slice / multi-host cluster:

    # host 0                                  # host 1
    python -m ft_mpc_tpu.parallel.launch \\    python -m ft_mpc_tpu.parallel.launch \\
        --coordinator host0:1234 \\               --coordinator host0:1234 \\
        --num-processes 2 --process-id 0          --num-processes 2 --process-id 1

Single-process invocation (no flags) degrades to the one-host benchmark on
all local devices.  This environment has one tunneled chip, so multi-host
numbers cannot be measured here; `tests/test_distributed.py` validates the
code path with a real 1-process jax.distributed service on a virtual
8-device CPU mesh.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None, help="host:port of process 0")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--per-device", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=15)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--sqp-iters", type=int, default=2)
    ap.add_argument("--admm-iters", type=int, default=40)
    ap.add_argument("--admm-phases", type=int, default=1)
    ap.add_argument(
        "--cpu-devices", type=int, default=None,
        help="force N virtual CPU devices per process (multi-process CPU "
        "testing; uses gloo cross-process collectives)",
    )
    ap.add_argument(
        "--dump", default=None,
        help="process 0 writes the globally-gathered u_phys/wrench and "
        "metrics to this .npz (cross-configuration equality checks)",
    )
    args = ap.parse_args(argv)

    import jax

    if args.cpu_devices:
        # Must precede backend init; the harness sitecustomize pins
        # JAX_PLATFORMS=axon, so env vars cannot select CPU here.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from ft_mpc_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
    from ft_mpc_tpu.controllers.spiraling import MPCConfig, MPCWeights
    from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
    from ft_mpc_tpu.parallel.distributed import (
        global_scenario_array,
        local_scenario_range,
        make_host_scenario_mesh,
    )
    from ft_mpc_tpu.parallel.mesh import (
        sharded_control_step_lanes,
        sharded_init_warmstart,
    )
    from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
    from ft_mpc_tpu.utils.faults import BrokenThruster
    from ft_mpc_tpu.utils.trajectory import (
        generate_trajectory,
        prepare_center_trajectory,
    )

    mesh = make_host_scenario_mesh()
    B = args.per_device * len(jax.devices())
    lo, hi = local_scenario_range(B)

    dt = 0.1
    params = BodyParams.default(dt)
    # Two geometries (healthy + the reference's double fault), tiled; each
    # process materializes only rows [lo, hi) of the global bank.
    uniq = [
        _build_scenario_with_terminal(params, f, DEFAULT_TUNING)
        for f in [[], [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)]]
    ]
    local_rows = [uniq[i % 2] for i in range(lo, hi)]
    bank_local = jax.tree.map(lambda *xs: np.stack(xs), *local_rows)

    rng = np.random.default_rng(0)
    x0_g = np.zeros((B, 13), np.float32)
    x0_g[:, 9] = 1.0
    x0_g[:, 0:3] = rng.uniform(-1, 1, (B, 3))

    scenarios = global_scenario_array(mesh, bank_local)
    x0 = global_scenario_array(mesh, x0_g[lo:hi])

    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(
        horizon=args.horizon, sqp_iters=args.sqp_iters,
        admm=StructuredADMMConfig(
            iters=args.admm_iters, phases=args.admm_phases,
            rho=50.0, adapt_clip=1.5,
        ),
        newton_iters=3,
    )
    traj = generate_trajectory("hover", dt, 5)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.array([0, 0, 0.6]), 16.8, dt, args.horizon + 1
    )
    x_ref = jnp.asarray(x_ref[: args.horizon + 1], jnp.float32)
    u_ref = jnp.asarray(u_ref[: args.horizon + 1], jnp.float32)

    c0 = jax.jit(jax.vmap(robot_to_center))(scenarios.r, x0)
    warm = sharded_init_warmstart(
        mesh, params, scenarios, weights, cfg, c0, x_ref, u_ref
    )

    out, metrics = sharded_control_step_lanes(
        mesh, params, scenarios, weights, cfg, x0, x_ref, u_ref, warm
    )
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    w = out.warm
    for i in range(args.reps):
        out, metrics = sharded_control_step_lanes(
            mesh, params, scenarios, weights, cfg, x0, x_ref, u_ref, w
        )
        w = out.warm
    jax.block_until_ready(metrics)
    elapsed = (time.perf_counter() - t0) / args.reps

    if args.dump:
        # Gather the full sharded outputs onto every process; process 0
        # writes them so a test can assert 2-process == 1-process exactly.
        from jax.experimental import multihost_utils

        u_phys_g = multihost_utils.process_allgather(metrics.u_phys, tiled=True)
        wrench_g = multihost_utils.process_allgather(metrics.wrench, tiled=True)
        if jax.process_index() == 0:
            np.savez(
                args.dump,
                u_phys=np.asarray(u_phys_g),
                wrench=np.asarray(wrench_g),
                mean_cost=float(metrics.mean_cost),
                max_r_prim=float(metrics.max_r_prim),
                max_term_gap=float(metrics.max_term_gap),
            )

    if jax.process_index() == 0:
        print(json.dumps({
            "processes": jax.process_count(),
            "devices": len(jax.devices()),
            "global_batch": B,
            "solves_per_s": round(B / elapsed, 1),
            "mean_cost": float(metrics.mean_cost),
            "max_r_prim": float(metrics.max_r_prim),
            "max_term_gap": float(metrics.max_term_gap),
        }))


if __name__ == "__main__":
    main()
