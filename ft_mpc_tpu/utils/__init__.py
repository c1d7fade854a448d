"""Host-side utilities: fault descriptors, trajectory generation, config."""

from ft_mpc_tpu.utils.faults import BrokenThruster  # noqa: F401
