"""Closed-loop simulation environment as one jitted lax.scan.

The reference steps a Python loop calling IPOPT per iteration
(`ft_mpc/simulation/sim_env.py:102-112`); here an entire closed-loop rollout
(controller SQP solve -> allocation -> plant RK4 -> noise -> quaternion
renormalize, `sim_env.py:77-99` semantics) is a single compiled program, and
a leading scenario axis turns it into thousands of simultaneous rollouts.

Noise: the reference adds `uniform(0, 1e-3)` per state block
(`sim_env.py:88-91`) -- a *positively biased* disturbance (SURVEY.md
quirk 4).  `noise_mode` selects 'reference' (bias-faithful), 'zero_mean'
(the physically sensible variant), or 'none' (for exact accuracy gating).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ft_mpc_tpu.controllers.spiraling import (
    ControlOutput,
    MPCConfig,
    MPCWeights,
    WarmStart,
    get_control,
    get_control_batch,
    init_warmstart,
    init_warmstart_batch,
    shift_warmstart,
)
from ft_mpc_tpu.geometry.scenario import Scenario
from ft_mpc_tpu.ops.dynamics import BodyParams, robot_step, robot_to_center
from ft_mpc_tpu.ops.quaternion import quat_normalize


class SimConfig(NamedTuple):
    """Static rollout configuration."""

    steps: int
    noise_mode: str = "reference"  # 'reference' | 'zero_mean' | 'none'
    noise_position: float = 1e-3
    noise_velocity: float = 1e-3
    noise_orientation: float = 1e-3
    noise_angular_velocity: float = 1e-3


class RolloutHistory(NamedTuple):
    """Per-step records (leading axis = time), superset of the reference's
    67-column CSV schema (`controller_debug.py:239-258`)."""

    time: jnp.ndarray  # (T,)
    state: jnp.ndarray  # (T, 13) robot state at solve time
    c0: jnp.ndarray  # (T, 13) center state at solve time
    u_phys: jnp.ndarray  # (T, 16)
    wrench: jnp.ndarray  # (T, 6) commanded generalized force
    x_ref0: jnp.ndarray  # (T, 9) active reference
    cost: jnp.ndarray  # (T,)
    r_prim: jnp.ndarray  # (T,)
    r_dual: jnp.ndarray  # (T,)
    defect: jnp.ndarray  # (T,)
    term_gap: jnp.ndarray  # (T,) elastic terminal-restoration gap (see SQPInfo)
    was_clipped: jnp.ndarray  # (T,)


def _noise_vector(cfg: SimConfig, key: jnp.ndarray, dtype) -> jnp.ndarray:
    scales = jnp.concatenate(
        [
            jnp.full(3, cfg.noise_position, dtype),
            jnp.full(3, cfg.noise_velocity, dtype),
            jnp.full(4, cfg.noise_orientation, dtype),
            jnp.full(3, cfg.noise_angular_velocity, dtype),
        ]
    )
    if cfg.noise_mode == "none":
        return jnp.zeros(13, dtype)
    u = jax.random.uniform(key, (13,), dtype)
    if cfg.noise_mode == "reference":
        return u * scales  # positively biased, as in sim_env.py:88-91
    if cfg.noise_mode == "zero_mean":
        return (u - 0.5) * scales
    raise ValueError(f"unknown noise_mode {cfg.noise_mode}")


@partial(jax.jit, static_argnames=("mpc_cfg", "sim_cfg"))
def rollout(
    params: BodyParams,
    scenario: Scenario,
    weights: MPCWeights,
    mpc_cfg: MPCConfig,
    sim_cfg: SimConfig,
    x_init: jnp.ndarray,  # (13,) robot state
    x_ref_full: jnp.ndarray,  # (T_ref, 9) center reference (T_ref >= steps+Nt+1)
    u_ref_full: jnp.ndarray,  # (T_ref, 6)
    key: jnp.ndarray,
) -> RolloutHistory:
    """Run one closed-loop simulation; the whole loop is a lax.scan."""
    Nt = mpc_cfg.horizon
    dtype = x_ref_full.dtype
    x_init = x_init.astype(dtype)

    c_init = robot_to_center(scenario.r, x_init)
    warm0 = init_warmstart(params, scenario, mpc_cfg, c_init, weights=weights)

    def step(carry, i):
        state, warm, key = carry
        key, sub = jax.random.split(key)

        x_ref = jax.lax.dynamic_slice(x_ref_full, (i, 0), (Nt + 1, 9))
        u_ref = jax.lax.dynamic_slice(u_ref_full, (i, 0), (Nt + 1, 6))

        out: ControlOutput = get_control(
            params, scenario, weights, mpc_cfg, state, x_ref, u_ref, warm
        )

        x_new = robot_step(params, scenario.fault, state, out.u_phys)
        x_new = x_new + _noise_vector(sim_cfg, sub, dtype)
        x_new = x_new.at[6:10].set(quat_normalize(x_new[6:10]))

        warm_next = shift_warmstart(out.warm, robot_to_center(scenario.r, x_new))

        rec = (
            i.astype(dtype) * params.dt,
            state,
            out.c0,
            out.u_phys,
            out.wrench,
            x_ref[0],
            out.info.cost,
            out.info.r_prim,
            out.info.r_dual,
            out.info.defect,
            out.info.term_gap,
            out.alloc.was_clipped,
        )
        return (x_new, warm_next, key), rec

    (_, _, _), recs = jax.lax.scan(
        step, (x_init, warm0, key), jnp.arange(sim_cfg.steps)
    )
    return RolloutHistory(*recs)


@partial(jax.jit, static_argnames=("mpc_cfg", "sim_cfg"))
def rollout_with_fault_schedule(
    params: BodyParams,
    scenario_schedule: Scenario,  # leading axis S: scenario per phase
    switch_steps: jnp.ndarray,  # (S,) step at which each scenario activates
    weights: MPCWeights,
    mpc_cfg: MPCConfig,
    sim_cfg: SimConfig,
    x_init: jnp.ndarray,
    x_ref_full: jnp.ndarray,
    u_ref_full: jnp.ndarray,
    key: jnp.ndarray,
) -> RolloutHistory:
    """Closed loop with mid-trajectory fault injection.

    The reference stubs runtime faults (`examples/sim.py:25-27` warns and
    skips; `sim_env.py:67-75` calls a `set_fault` the controllers lack).
    Here faults are scenario *data*, so switching is a time-indexed gather
    from a schedule of precompiled scenarios: at step i the active scenario
    is the last entry of `scenario_schedule` whose switch step is <= i.
    Model, constraint geometry, compensation input, and terminal
    ingredients all reshape at once -- inside the jitted scan.
    """
    Nt = mpc_cfg.horizon
    dtype = x_ref_full.dtype
    x_init = x_init.astype(dtype)

    def active_scenario(i):
        idx = jnp.sum(switch_steps <= i) - 1
        idx = jnp.clip(idx, 0, switch_steps.shape[0] - 1)
        return jax.tree.map(lambda leaf: leaf[idx], scenario_schedule)

    sc0 = active_scenario(jnp.asarray(0))
    c_init = robot_to_center(sc0.r, x_init)
    warm0 = init_warmstart(params, sc0, mpc_cfg, c_init, weights=weights)

    def step(carry, i):
        state, warm, key = carry
        key, sub = jax.random.split(key)
        sc = active_scenario(i)

        x_ref = jax.lax.dynamic_slice(x_ref_full, (i, 0), (Nt + 1, 9))
        u_ref = jax.lax.dynamic_slice(u_ref_full, (i, 0), (Nt + 1, 6))

        out = get_control(params, sc, weights, mpc_cfg, state, x_ref, u_ref, warm)

        x_new = robot_step(params, sc.fault, state, out.u_phys)
        x_new = x_new + _noise_vector(sim_cfg, sub, dtype)
        x_new = x_new.at[6:10].set(quat_normalize(x_new[6:10]))

        warm_next = shift_warmstart(out.warm, robot_to_center(sc.r, x_new))

        rec = (
            i.astype(dtype) * params.dt,
            state,
            out.c0,
            out.u_phys,
            out.wrench,
            x_ref[0],
            out.info.cost,
            out.info.r_prim,
            out.info.r_dual,
            out.info.defect,
            out.info.term_gap,
            out.alloc.was_clipped,
        )
        return (x_new, warm_next, key), rec

    (_, _, _), recs = jax.lax.scan(
        step, (x_init, warm0, key), jnp.arange(sim_cfg.steps)
    )
    return RolloutHistory(*recs)


def batched_rollout(
    params: BodyParams,
    scenarios: Scenario,  # leading scenario axis on every leaf
    weights: MPCWeights,
    mpc_cfg: MPCConfig,
    sim_cfg: SimConfig,
    x_inits: jnp.ndarray,  # (B, 13)
    x_ref_full: jnp.ndarray,  # shared (T_ref, 9)
    u_ref_full: jnp.ndarray,
    keys: jnp.ndarray,  # (B, 2) PRNG keys
) -> RolloutHistory:
    """vmap the closed loop over a scenario bank: B simultaneous rollouts."""
    fn = lambda sc, x0, k: rollout(
        params, sc, weights, mpc_cfg, sim_cfg, x0, x_ref_full, u_ref_full, k
    )
    return jax.vmap(fn)(scenarios, x_inits, keys)


@partial(jax.jit, static_argnames=("mpc_cfg", "sim_cfg"))
def batched_rollout_lanes(
    params: BodyParams,
    scenarios: Scenario,  # leading scenario axis on every leaf
    weights: MPCWeights,
    mpc_cfg: MPCConfig,
    sim_cfg: SimConfig,
    x_inits: jnp.ndarray,  # (B, 13)
    x_ref_full: jnp.ndarray,  # shared (T_ref, 9)
    u_ref_full: jnp.ndarray,
    keys: jnp.ndarray,  # (B,) PRNG keys
) -> RolloutHistory:
    """B simultaneous closed loops on the lane-fused QP backend.

    Same semantics as `batched_rollout`, but the scan step calls
    `get_control_batch` (fused Pallas ADMM over 128-scenario lane tiles,
    Newton-refreshed inverse metric carried in the warm start), which a
    vmap over `rollout` cannot express.  Returns (B, T, ...) histories.
    """
    Nt = mpc_cfg.horizon
    dtype = x_ref_full.dtype
    x_inits = x_inits.astype(dtype)

    c_init = jax.vmap(robot_to_center)(scenarios.r, x_inits)
    warm0 = init_warmstart_batch(
        params, scenarios, weights, mpc_cfg, c_init,
        x_ref_full[: Nt + 1], u_ref_full[: Nt + 1],
    )

    def step(carry, i):
        state, warm, keys = carry
        splits = jax.vmap(lambda k: jax.random.split(k))(keys)
        keys, subs = splits[:, 0], splits[:, 1]

        x_ref = jax.lax.dynamic_slice(x_ref_full, (i, 0), (Nt + 1, 9))
        u_ref = jax.lax.dynamic_slice(u_ref_full, (i, 0), (Nt + 1, 6))

        out: ControlOutput = get_control_batch(
            params, scenarios, weights, mpc_cfg, state, x_ref, u_ref, warm
        )

        x_new = jax.vmap(lambda f, s, u: robot_step(params, f, s, u))(
            scenarios.fault, state, out.u_phys
        )
        x_new = x_new + jax.vmap(lambda k: _noise_vector(sim_cfg, k, dtype))(subs)
        x_new = x_new.at[:, 6:10].set(
            jax.vmap(quat_normalize)(x_new[:, 6:10])
        )

        c_new = jax.vmap(robot_to_center)(scenarios.r, x_new)
        warm_next = jax.vmap(shift_warmstart)(out.warm, c_new)

        rec = (
            jnp.broadcast_to(i.astype(dtype) * params.dt, state.shape[:1]),
            state,
            out.c0,
            out.u_phys,
            out.wrench,
            jnp.broadcast_to(x_ref[0], (state.shape[0], 9)),
            out.info.cost,
            out.info.r_prim,
            out.info.r_dual,
            out.info.defect,
            out.info.term_gap,
            out.alloc.was_clipped,
        )
        return (x_new, warm_next, keys), rec

    (_, _, _), recs = jax.lax.scan(
        step, (x_inits, warm0, keys), jnp.arange(sim_cfg.steps)
    )
    # (T, B, ...) -> (B, T, ...) to match batched_rollout
    return RolloutHistory(*jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), recs))
