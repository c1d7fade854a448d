"""Multi-chip scaling: scenario-axis sharding over a TPU mesh."""

from ft_mpc_tpu.parallel.mesh import (  # noqa: F401
    make_scenario_mesh,
    shard_scenario_batch,
    sharded_rollout,
    sharded_control_step,
)
