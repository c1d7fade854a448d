"""Multi-host (multi-process) execution scaffolding.

The reference has no distributed story of any kind (SURVEY.md section 2.2);
the BASELINE target of >=80% scaling efficiency at 2+ hosts needs a runnable
multi-process entry even though this environment exposes a single chip.  This
module provides it:

  * `initialize_distributed()` -- `jax.distributed.initialize` wrapper with
    env-var / explicit-arg plumbing, idempotent, safe to call unconditionally
    at program start (no-op in single-process runs).
  * `make_host_scenario_mesh()` -- a process-aware 1-D scenario mesh over all
    *global* devices, ordered host-major so each process's local chips own a
    contiguous scenario range (scenario traffic never crosses DCN; only the
    scalar metric psum does).
  * `global_scenario_array()` -- assembles a globally-sharded scenario batch
    from per-process host data via `jax.make_array_from_process_local_data`,
    so each host only materializes its own shard (banks of 100k+ scenarios
    never exist on one host).
  * `local_scenario_range()` -- the [start, stop) rows of the global batch a
    given process must build host-side.

Measured scaling on 2+ real hosts is not possible in this environment (one
tunneled chip); the path is validated functionally by
`tests/test_distributed.py`, which boots a real 1-process
`jax.distributed` service plus an 8-device virtual CPU mesh in a subprocess
and runs the sharded lane-fused control step through these helpers.

Usage on a real pod slice (one command per host):

    python -m ft_mpc_tpu.parallel.launch --coordinator=HOST0:1234 \
        --num-processes=2 --process-id=$SLURM_PROCID ...
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ft_mpc_tpu.parallel.mesh import SCENARIO_AXIS

_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> bool:
    """Initialize `jax.distributed` for a multi-host run. Idempotent.

    Resolution order for each field: explicit argument, then environment
    (`FT_MPC_COORDINATOR`, `FT_MPC_NUM_PROCESSES`, `FT_MPC_PROCESS_ID`),
    then JAX's own auto-detection (SLURM / Open MPI / cloud TPU metadata).
    Returns True if a distributed service was (or already is) initialized,
    False for single-process runs (nothing to do).
    """
    global _initialized
    if _initialized:
        return True

    coordinator_address = coordinator_address or os.environ.get("FT_MPC_COORDINATOR")
    if num_processes is None and "FT_MPC_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["FT_MPC_NUM_PROCESSES"])
    if process_id is None and "FT_MPC_PROCESS_ID" in os.environ:
        process_id = int(os.environ["FT_MPC_PROCESS_ID"])

    auto_detectable = any(
        v in os.environ
        for v in ("SLURM_JOB_ID", "OMPI_MCA_orte_hnp_uri", "TPU_WORKER_HOSTNAMES")
    )
    if coordinator_address is None and not auto_detectable:
        return False  # single-process run

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except ValueError:
        # Cluster-ish env vars present but auto-detection could not produce
        # a coordinator spec (e.g. the single-chip axon tunnel sets
        # TPU_WORKER_HOSTNAMES at jax import): single-process run.
        if coordinator_address is not None:
            raise
        return False
    _initialized = True
    return True


def make_host_scenario_mesh(devices=None) -> Mesh:
    """1-D scenario mesh over all global devices, host-major order.

    `jax.devices()` already enumerates devices grouped by process; we sort
    explicitly by (process_index, id) so each host's chips are contiguous on
    the scenario axis regardless of backend enumeration quirks.  With the
    scenario batch sharded along this axis, all per-scenario work is local
    to a chip and inter-host (DCN) traffic is one scalar psum per step.
    """
    devices = list(jax.devices() if devices is None else devices)
    devices.sort(key=lambda d: (d.process_index, d.id))
    return jax.make_mesh((len(devices),), (SCENARIO_AXIS,), devices=devices)


def local_scenario_range(global_batch: int, mesh: Mesh | None = None) -> tuple[int, int]:
    """[start, stop) rows of the global scenario batch this process owns.

    The global batch must divide evenly over processes (pad the bank to a
    multiple of `jax.process_count() * local_device_count` first).
    """
    nproc = jax.process_count()
    if global_batch % nproc:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {nproc}"
        )
    per = global_batch // nproc
    pid = jax.process_index()
    return pid * per, (pid + 1) * per


def global_scenario_array(mesh: Mesh, local_tree):
    """Assemble a globally-sharded pytree from per-process local shards.

    `local_tree` holds only this process's rows (see `local_scenario_range`);
    the result behaves as a single global array sharded along the scenario
    axis.  Single-process runs degrade to a plain device_put.
    """
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), local_tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_tree,
    )
