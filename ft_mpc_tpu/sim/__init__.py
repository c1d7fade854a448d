"""Closed-loop simulation: jitted lax.scan rollouts, batched over scenarios."""

from ft_mpc_tpu.sim.env import SimConfig, RolloutHistory, rollout, batched_rollout  # noqa: F401
