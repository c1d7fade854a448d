"""End-to-end demo: closed-loop micro-orbiting MPC under thruster faults.

The TPU-native counterpart of the reference's `examples/sim.py`: loads a
reactive.yaml-style config, builds the faulted plant + spiraling controller,
runs the closed loop (as ONE jitted lax.scan -- not a Python loop around an
NLP solver), exports the 67-column CSV, and renders the 3D animation.

    python examples/sim.py [--config path.yaml] [--batch N] [--no-anim]

With --batch N > 1 the same run executes N fault scenarios simultaneously
(healthy + random single/double faults) -- the feature the reference cannot
express at all.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="reactive.yaml-style config")
    ap.add_argument("--batch", type=int, default=None, help="scenario batch size")
    ap.add_argument("--no-anim", action="store_true")
    ap.add_argument("--csv", default="data/debug_data.csv")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as R

    from ft_mpc_tpu.api import _build_scenario_with_terminal, DEFAULT_TUNING
    from ft_mpc_tpu.controllers.spiraling import MPCConfig, MPCWeights
    from ft_mpc_tpu.ops.dynamics import BodyParams
    from ft_mpc_tpu.sim.env import SimConfig, batched_rollout, rollout
    from ft_mpc_tpu.sim.history import export_csv
    from ft_mpc_tpu.utils.config import load_config
    from ft_mpc_tpu.utils.faults import BrokenThruster
    from ft_mpc_tpu.utils.trajectory import (
        generate_trajectory,
        prepare_center_trajectory,
    )

    cfg_run = load_config(args.config)
    if args.batch is not None:
        cfg_run.batch = args.batch
    cfg_run.apply_debug_flags()  # tpu.debug_nans: NaN sanitizer mode

    params = BodyParams.default(cfg_run.time_step)
    tuning = {**DEFAULT_TUNING, **cfg_run.tuning}

    t0_faults = [f for f in cfg_run.faults if f.start_time == 0]
    later = [f for f in cfg_run.faults if f.start_time != 0]
    if later:
        print(
            f"note: {len(later)} fault(s) with start_time != 0; use the "
            "SimulationEnvironment API for mid-run injection."
        )

    scenario = _build_scenario_with_terminal(params, t0_faults, tuning)
    weights = MPCWeights.from_diagonals(tuning["Q"], tuning["R"])
    mpc_cfg = MPCConfig(horizon=int(tuning["horizon"]))

    traj = generate_trajectory(
        cfg_run.traj_shape, cfg_run.time_step, cfg_run.traj_duration
    )
    x_ref, u_ref = prepare_center_trajectory(
        traj,
        np.asarray(scenario.omega_des),
        float(params.mass),
        cfg_run.time_step,
        mpc_cfg.horizon + 1,
    )

    x0 = np.zeros(13)
    x0[0:3] = [1, 0, 1]
    x0[3:6] = [1, 0.5, 0]
    x0[6:10] = R.from_euler("zyx", [50, 30, -10], degrees=True).as_quat()
    x0[10:13] = [0.3, 0.8, -0.1]

    sim_cfg = SimConfig(steps=cfg_run.steps, noise_mode=cfg_run.noise_mode)

    t_start = time.perf_counter()
    if cfg_run.batch <= 1:
        hist = rollout(
            params, scenario, weights, mpc_cfg, sim_cfg,
            jnp.asarray(x0, dtype=jnp.float32),
            jnp.asarray(x_ref, dtype=jnp.float32),
            jnp.asarray(u_ref, dtype=jnp.float32),
            jax.random.key(cfg_run.seed),
        )
        jax.block_until_ready(hist.state)
        hist0 = hist
    else:
        B = cfg_run.batch
        rng = np.random.default_rng(cfg_run.seed)
        patterns = [t0_faults]
        for _ in range(B - 1):
            k = rng.integers(0, 3)
            idx = rng.choice(16, size=k, replace=False)
            patterns.append([BrokenThruster(int(i), 1.0) for i in idx])
        banks = [
            _build_scenario_with_terminal(params, p, tuning) for p in patterns
        ]
        scenarios = jax.tree.map(lambda *xs: np.stack(xs), *banks)
        x0s = jnp.asarray(np.tile(x0, (B, 1)), dtype=jnp.float32)
        keys = jax.random.split(jax.random.key(cfg_run.seed), B)
        hist = batched_rollout(
            params, scenarios, weights, mpc_cfg, sim_cfg, x0s,
            jnp.asarray(x_ref, dtype=jnp.float32),
            jnp.asarray(u_ref, dtype=jnp.float32), keys,
        )
        jax.block_until_ready(hist.state)
        hist0 = jax.tree.map(lambda x: x[0], hist)
    elapsed = time.perf_counter() - t_start

    n_solves = cfg_run.steps * max(cfg_run.batch, 1)
    print(
        f"simulated {cfg_run.traj_duration}s x {max(cfg_run.batch,1)} scenario(s) "
        f"in {elapsed:.2f}s ({n_solves/elapsed:.0f} MPC solves/s) on "
        f"{jax.devices()[0].platform}"
    )
    final_err = np.linalg.norm(
        np.asarray(hist0.c0[-1, 0:3]) - np.asarray(hist0.x_ref0[-1, 0:3])
    )
    print(f"final orbit-center position error: {final_err:.4f} m")

    csv_path = Path(args.csv)
    csv_path.parent.mkdir(parents=True, exist_ok=True)
    export_csv(hist0, np.asarray(params.D), str(csv_path))
    print(f"history exported to {csv_path}")

    if not args.no_anim:
        try:
            from ft_mpc_tpu.viz.animate import animate_rollout

            animate_rollout(hist0, scenario, save_path="data/sim_anim.gif")
            print("animation saved to data/sim_anim.gif")
        except Exception as e:  # headless environments
            print(f"animation skipped: {e}")


if __name__ == "__main__":
    main()
