"""Thruster fault descriptors.

`BrokenThruster` mirrors the reference's value object
(`ft_mpc/util/broken_thruster.py:1-11`): a thruster stuck at
`intensity * max_thrust` (intensity 0 = dead) that no longer responds to
commands.  In this framework the descriptor is only a convenience for
humans/configs; the device-side representation is `ops.dynamics.FaultState`
(arrays), and batches of fault patterns live in `geometry.scenario.ScenarioBank`.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class BrokenThruster:
    index: int
    intensity: float  # in [0, 1] of max thrust, stuck-on
    start_time: float = 0.0

    def __post_init__(self):
        if not 0 <= self.index < 16:
            raise ValueError(f"thruster index {self.index} out of range [0, 16)")
        if not 0.0 <= self.intensity <= 1.0:
            raise ValueError(f"intensity {self.intensity} outside [0, 1]")
