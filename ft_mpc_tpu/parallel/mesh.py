"""Scenario-parallel execution over a device mesh.

The reference is strictly single-process/single-solve
(`ft_mpc/controllers/spiraling_mpc.py:346`, `sim_env.py:109-112`; SURVEY.md
section 2.2).  The natural TPU scaling axis for this workload is the
*scenario* batch: fault patterns x initial states are embarrassingly
parallel, so we shard the leading scenario axis across the mesh with
`shard_map`, each chip runs its shard of vmapped SQP solves / rollouts, and
only scalar metrics cross chips (one `psum` per call).  Collectives ride ICI;
host<->device traffic is zero inside the loop.

Design notes:
  * `in_specs=P("scenario")` on every scenario-batched leaf; plant params,
    weights and the reference trajectory are replicated (`P()`).
  * Metric reduction (`mean cost`, `max residual`) uses `jax.lax.pmean` /
    `pmax` inside the shard_map body so the caller sees globally-reduced
    scalars without a separate collective round.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ft_mpc_tpu.controllers.spiraling import (
    MPCConfig,
    MPCWeights,
    get_control,
    get_control_batch,
)
from ft_mpc_tpu.geometry.scenario import Scenario
from ft_mpc_tpu.ops.dynamics import BodyParams
from ft_mpc_tpu.sim.env import (
    RolloutHistory,
    SimConfig,
    batched_rollout_lanes,
    rollout,
)

SCENARIO_AXIS = "scenario"


def make_scenario_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name 'scenario'."""
    devices = jax.devices() if devices is None else devices
    return jax.make_mesh((len(devices),), (SCENARIO_AXIS,), devices=devices)


def shard_scenario_batch(mesh: Mesh, tree):
    """Place a scenario-batched pytree with its leading axis sharded."""
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_init_warmstart(
    mesh: Mesh,
    params: BodyParams,
    scenarios: Scenario,  # leading axis B, sharded
    weights: MPCWeights,
    cfg: MPCConfig,
    c0: jnp.ndarray,  # (B, 13) center-frame states, sharded
    x_ref: jnp.ndarray,  # replicated
    u_ref: jnp.ndarray,
):
    """Batched warm-start initialization, scenario-sharded.

    `init_warmstart_batch` vmaps internally, which rejects inputs whose
    mapped axis carries mixed shardings; under shard_map each device sees
    plain local shards, so this is the multi-host-safe way to build the
    initial carry (plain `jit(init_warmstart_batch)` works only when the
    whole bank lives on one process).
    """
    from ft_mpc_tpu.controllers.spiraling import init_warmstart_batch

    def body(sc_shard, c0_shard):
        return init_warmstart_batch(
            params, sc_shard, weights, cfg, c0_shard, x_ref, u_ref
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS)),
        out_specs=P(SCENARIO_AXIS),
        check_vma=False,
    )
    return jax.jit(fn)(scenarios, c0)


class StepMetrics(NamedTuple):
    mean_cost: jnp.ndarray  # psum-averaged over the global batch
    max_r_prim: jnp.ndarray  # pmax over the global batch
    # pmax of the elastic terminal-restoration gap (SQPInfo.term_gap):
    # nonzero only for scenarios whose restoration QP is genuinely
    # infeasible -- gated separately from solver convergence (max_r_prim)
    max_term_gap: jnp.ndarray
    u_phys: jnp.ndarray  # (B, 16) sharded outputs
    wrench: jnp.ndarray  # (B, 6)


def sharded_control_step(
    mesh: Mesh,
    params: BodyParams,
    scenarios: Scenario,  # leading axis B, sharded
    weights: MPCWeights,
    cfg: MPCConfig,
    x0: jnp.ndarray,  # (B, 13)
    x_ref: jnp.ndarray,  # (Nt+1, 9) replicated
    u_ref: jnp.ndarray,  # (Nt+1, 6) replicated
    warm,
):
    """One batched MPC control step, scenario-sharded across the mesh."""

    def body(sc_shard, x0_shard, warm_shard):
        out = jax.vmap(
            lambda sc, x, w: get_control(params, sc, weights, cfg, x, x_ref, u_ref, w)
        )(sc_shard, x0_shard, warm_shard)
        mean_cost = jax.lax.pmean(jnp.mean(out.info.cost), SCENARIO_AXIS)
        max_rp = jax.lax.pmax(jnp.max(out.info.r_prim), SCENARIO_AXIS)
        max_gap = jax.lax.pmax(jnp.max(out.info.term_gap), SCENARIO_AXIS)
        return out, StepMetrics(
            mean_cost=mean_cost,
            max_r_prim=max_rp,
            max_term_gap=max_gap,
            u_phys=out.u_phys,
            wrench=out.wrench,
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS)),
        out_specs=(
            P(SCENARIO_AXIS),
            StepMetrics(
                mean_cost=P(), max_r_prim=P(), max_term_gap=P(),
                u_phys=P(SCENARIO_AXIS), wrench=P(SCENARIO_AXIS),
            ),
        ),
        check_vma=False,
    )
    return jax.jit(fn)(scenarios, x0, warm)


def sharded_control_step_lanes(
    mesh: Mesh,
    params: BodyParams,
    scenarios: Scenario,  # leading axis B, sharded
    weights: MPCWeights,
    cfg: MPCConfig,
    x0: jnp.ndarray,  # (B, 13)
    x_ref: jnp.ndarray,  # (Nt+1, 9) replicated
    u_ref: jnp.ndarray,  # (Nt+1, 6)
    warm,  # batched WarmStart incl. kinv, sharded
):
    """One batched MPC control step on the DEPLOYED lane-fused backend,
    scenario-sharded across the mesh.

    Each device runs `get_control_batch` (fused Pallas ADMM over its
    128-lane tiles + Newton-refreshed carried metric) on its shard of the
    bank; only scalar metrics cross chips.  This is the sharded version of
    the exact backend `bench.py` measures -- `sharded_control_step` above
    shards the per-scenario XLA path instead.
    """

    def body(sc_shard, x0_shard, warm_shard):
        out = get_control_batch(
            params, sc_shard, weights, cfg, x0_shard, x_ref, u_ref, warm_shard
        )
        mean_cost = jax.lax.pmean(jnp.mean(out.info.cost), SCENARIO_AXIS)
        max_rp = jax.lax.pmax(jnp.max(out.info.r_prim), SCENARIO_AXIS)
        max_gap = jax.lax.pmax(jnp.max(out.info.term_gap), SCENARIO_AXIS)
        return out, StepMetrics(
            mean_cost=mean_cost,
            max_r_prim=max_rp,
            max_term_gap=max_gap,
            u_phys=out.u_phys,
            wrench=out.wrench,
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS)),
        out_specs=(
            P(SCENARIO_AXIS),
            StepMetrics(
                mean_cost=P(), max_r_prim=P(), max_term_gap=P(),
                u_phys=P(SCENARIO_AXIS), wrench=P(SCENARIO_AXIS),
            ),
        ),
        check_vma=False,
    )
    return jax.jit(fn)(scenarios, x0, warm)


def sharded_rollout_lanes(
    mesh: Mesh,
    params: BodyParams,
    scenarios: Scenario,  # leading axis B, sharded
    weights: MPCWeights,
    mpc_cfg: MPCConfig,
    sim_cfg: SimConfig,
    x_inits: jnp.ndarray,  # (B, 13)
    x_ref_full: jnp.ndarray,  # replicated
    u_ref_full: jnp.ndarray,
    keys: jnp.ndarray,  # (B,) keys
) -> RolloutHistory:
    """Closed-loop rollouts on the lane-fused backend, scenario-sharded:
    each device runs `batched_rollout_lanes` on its shard of the bank."""

    def body(sc_shard, x0_shard, key_shard):
        return batched_rollout_lanes(
            params, sc_shard, weights, mpc_cfg, sim_cfg,
            x0_shard, x_ref_full, u_ref_full, key_shard,
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS)),
        out_specs=P(SCENARIO_AXIS),
        check_vma=False,
    )
    return jax.jit(fn)(scenarios, x_inits, keys)


def sharded_rollout(
    mesh: Mesh,
    params: BodyParams,
    scenarios: Scenario,  # leading axis B, sharded
    weights: MPCWeights,
    mpc_cfg: MPCConfig,
    sim_cfg: SimConfig,
    x_inits: jnp.ndarray,  # (B, 13)
    x_ref_full: jnp.ndarray,  # replicated
    u_ref_full: jnp.ndarray,
    keys: jnp.ndarray,  # (B,) keys
) -> RolloutHistory:
    """Full closed-loop rollouts, scenario-sharded: B rollouts over the mesh."""

    def body(sc_shard, x0_shard, key_shard):
        return jax.vmap(
            lambda sc, x0, k: rollout(
                params, sc, weights, mpc_cfg, sim_cfg, x0, x_ref_full, u_ref_full, k
            )
        )(sc_shard, x0_shard, key_shard)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS), P(SCENARIO_AXIS)),
        out_specs=P(SCENARIO_AXIS),
        check_vma=False,
    )
    return jax.jit(
        fn, static_argnames=()
    )(scenarios, x_inits, keys)
