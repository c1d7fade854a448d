"""Benchmark: batched fault-scenario MPC solves/s on one TPU chip.

One "solve" = one full control step for one scenario: SQP (linearize ->
condense -> ADMM QP) + wrench clip + thruster allocation -- the unit of work
the reference performs with one IPOPT call + two CVXPY/daqp solves per step
(`spiraling_mpc.py:346`, `control_allocator.py:63,86`).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 10_000 solves/s (the BASELINE.json target for one
v5e host).
"""

import json
import os
import time

import numpy as np

# Persistent compile cache: tunnel compiles take minutes per program and
# are not reused across processes otherwise; with the cache a rerun of
# this benchmark is ~70 s end to end.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_tpu_cache"),
)


def main(B: int | None = None):
    import jax

    # fp32 matmuls must run at full precision on the MXU: the ADMM normal
    # matrix has condition ~1e5 and bf16 passes produce NaNs downstream.
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
    if B is None:
        B = int(os.environ.get("FT_MPC_BENCH_BATCH", 2048))  # scenarios per chip

    params = BodyParams.default(dt)

    # Scenario bank: healthy + all 16 single faults + double faults, cycled to B.
    fault_patterns = [[]]
    fault_patterns += [[BrokenThruster(i, 1.0)] for i in range(16)]
    fault_patterns += [
        [BrokenThruster(i, 1.0), BrokenThruster(j, 1.0)]
        for i in range(16)
        for j in range(i + 1, 16)
    ]
    uniq = [
        _build_scenario_with_terminal(params, f, DEFAULT_TUNING)
        for f in fault_patterns[:32]  # 32 distinct geometries, tiled below
    ]
    bank_small = jax.tree.map(lambda *xs: np.stack(xs), *uniq)
    reps = B // len(uniq)
    bank = jax.tree.map(lambda x: np.tile(x, (reps,) + (1,) * (x.ndim - 1)), bank_small)
    # Device-resident bank (as deployed: scenario tensors live in HBM).
    # Left as numpy, every timed call would re-ship the ~11 MB bank
    # through the axon HTTP tunnel, inflating per-step latency ~10-35 ms.
    bank = jax.device_put(bank)

    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    # Deployed fast config: 2 warm-started RTI-SQP iterations, 60 lane-fused
    # ADMM iterations, Newton-refreshed inverse metric (tight adapt_clip
    # keeps the carried metric trackable), plus the worst-K tail-cleanup
    # pass (cleanup_* below; 600x3 since r4 -- the full-census certified
    # terminal sets make the tail harder than r3's bank, where 13 of these
    # 32 patterns had no terminal rows at all).  Gated by
    # benchmarks/accuracy.py (same config): steady-state thruster
    # deviation vs the float64 5-SQP-iteration golden is <= 5e-3 N.
    cfg = MPCConfig(
        horizon=horizon,
        sqp_iters=int(os.environ.get("FT_MPC_BENCH_SQP", 2)),
        admm=StructuredADMMConfig(
            iters=int(os.environ.get("FT_MPC_BENCH_ITERS", 60)),
            phases=int(os.environ.get("FT_MPC_BENCH_PHASES", 1)),
            rho=float(os.environ.get("FT_MPC_BENCH_RHO", 50.0)),
            adapt_clip=float(os.environ.get("FT_MPC_BENCH_CLIP", 1.5)),
        ),
        newton_iters=int(os.environ.get("FT_MPC_BENCH_NEWTON", 3)),
        # Tail cleanup: re-solve the worst-residual K scenarios with an
        # exact factorization and a big ADMM budget (~K/B of a full step).
        # This is what moves max_r_prim from the ~2e-2 plateau of a flat
        # iteration budget to <=1e-3 while keeping >>10k solves/s.
        cleanup_iters=int(os.environ.get("FT_MPC_BENCH_CLEANUP", 600)),
        cleanup_k=int(os.environ.get("FT_MPC_BENCH_CLEANUP_K", 256)),
        cleanup_phases=int(os.environ.get("FT_MPC_BENCH_CLEANUP_PHASES", 3)),
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
        lambda b, x: init_warmstart_batch(
            params, b, weights, cfg,
            jax.vmap(robot_to_center)(b.r, x), x_ref, u_ref,
        )
    )(bank, x0)

    # Timed: repeated batched control steps with warm-start carry (the
    # steady-state regime of a deployed controller).  The rep loop runs
    # inside ONE jitted program: the TPU here sits behind an HTTP tunnel
    # whose per-dispatch round trip is large and highly variable, so
    # per-call timing measures the tunnel, not the device.  Each rep
    # chains the previous rep's warm start, so no rep can be served from
    # the tunnel's identical-execution cache.
    n_reps = 10

    @jax.jit
    def run_n(b, x, w):
        def body(i, w):
            out = get_control_batch(params, b, weights, cfg, x, x_ref, u_ref, w)
            return out.warm
        w = jax.lax.fori_loop(0, n_reps - 1, body, w)
        return get_control_batch(params, b, weights, cfg, x, x_ref, u_ref, w)

    # Warm-up / compile.  The timed call takes the warm-up's output warm
    # start (steady-state regime), which also guarantees its inputs differ
    # from the warm-up call's -- the tunnel memoizes identical executions.
    out = run_n(bank, x0, warm)
    jax.block_until_ready(out)

    # Latency distribution (BASELINE.json: "p50 per-step solve latency
    # tracked"): n_windows timed invocations, each an n_reps-step chained
    # window.  A single on-device step is one fixed static-shape program,
    # so step-to-step device variance lives in dispatch/queueing, which
    # the window amortizes to <~1 ms/step of tunnel overhead; each sample
    # is the per-step mean of its window.
    n_windows = int(os.environ.get("FT_MPC_BENCH_WINDOWS", 12))
    samples_ms = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        out = run_n(bank, x0, out.warm)
        jax.block_until_ready(out)
        samples_ms.append(1e3 * (time.perf_counter() - t0) / n_reps)
    samples_ms = np.asarray(samples_ms)
    p50_ms = float(np.percentile(samples_ms, 50))
    p99_ms = float(np.percentile(samples_ms, 99))
    solves_per_s = B * 1e3 / p50_ms

    # Sanity: outputs finite, residuals small.
    assert np.isfinite(np.asarray(out.u_phys)).all(), "non-finite thruster commands"
    max_rp = float(jnp.max(out.info.r_prim))
    # Elastic terminal-restoration gap (see StructuredADMMConfig.elastic_y_max):
    # scenarios whose faulted input hull cannot shrink the terminal-set
    # violation at the configured rate have a genuinely infeasible
    # restoration QP; their minimum violation is reported here, separately
    # from solver convergence (max_r_prim).
    gaps = np.asarray(out.info.term_gap)
    max_gap = float(np.nanmax(gaps))
    gap_rows = np.flatnonzero(gaps > 1e-3)
    n_gap = int(gap_rows.size)
    # Every pattern in this bank is certifiable (fault-aware orbit
    # selection, controllers/orbit_search.py) -- the 4 physically
    # uncertifiable double-fault geometries ([12,13],[12,15],[13,14],
    # [14,15]) are NOT in the 32-pattern tile at all (healthy + 16 singles
    # + doubles (0,j)).  Any gap row here is therefore STATE-rate
    # infeasibility: one of the 2048 seeded tumbling initial attitudes so
    # far outside the terminal set that the faulted hull cannot contract
    # its violation at the configured rate within one 1.5 s horizon.  The
    # bench inputs are fully deterministic (seed 0, fixed tile), so the
    # gap-row set is pinned exactly: a regression that makes ANY certified
    # (pattern, state) row newly gap -- or widens an existing gap -- fails
    # the bench.  Closed-loop contraction of these rows to zero gap is
    # gated separately (benchmarks/sanitizer_onchip.py, SANITIZER_r04).
    gap_patterns = sorted({int(r) % len(uniq) for r in gap_rows})
    gap_gate = float(os.environ.get("FT_MPC_BENCH_GAP_GATE", 0.4))
    assert max_gap <= gap_gate, f"max_term_gap {max_gap:.2e} > {gap_gate}"
    # The pinned set: 5 rows over 4 distinct certified double-fault
    # geometries (patterns 17, 20, 24, 28 of the tile; rows 209 and 1713
    # are the SAME geometry at different seeded states -- the gap count
    # exceeding the distinct-pattern count is exactly the state-driven
    # signature).  None is one of the 4 physically uncertifiable patterns.
    if B == 2048 and "FT_MPC_BENCH_SQP" not in os.environ:
        expected_rows = {209, 828, 1204, 1400, 1713}
        unexpected = set(int(r) for r in gap_rows) - expected_rows
        assert not unexpected, (
            f"restoration gap on previously gap-free certified rows "
            f"{sorted(unexpected)} (patterns "
            f"{sorted({r % len(uniq) for r in unexpected})})"
        )
    assert p50_ms <= 100.0, (
        f"p50 per-step latency {p50_ms:.1f} ms exceeds the 0.1 s (10 Hz) "
        "real-time budget at the deployed config"
    )

    result = {
        "metric": "batched fault-scenario MPC solves/s (1 chip, B=%d, Nt=%d)"
        % (B, horizon),
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 10_000.0, 3),
        "batch": B,
        "per_step_latency_ms": round(p50_ms, 2),
        "latency_p50_ms": round(p50_ms, 2),
        "latency_p99_ms": round(p99_ms, 2),
        "latency_windows": n_windows,
        "max_r_prim": max_rp,
        "max_term_gap": max_gap,
        "n_restoration_gap": n_gap,
        "gap_rows": [int(r) for r in gap_rows],
        "gap_patterns": gap_patterns,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
