"""Constant-input test controller.

Parity with `ft_mpc/controllers/dummy_controller.py:6-49`: same duck-typed
`get_control(state, t)` interface as the MPC, returning a fixed thruster
pattern (thruster 12 on) -- useful for exercising the plant/simulator
without a solver in the loop.  Pure-function core + a thin stateful wrapper
to match the reference workflow.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.ops.dynamics import BodyParams, N_THRUSTERS


def dummy_control(
    params: BodyParams, x: jnp.ndarray, t: jnp.ndarray, thruster: int = 12,
    magnitude: float = 1.0,
) -> jnp.ndarray:
    """(16,) constant test input, independent of state/time."""
    return jnp.zeros(N_THRUSTERS, dtype=x.dtype).at[thruster].set(magnitude)


class DummyController:
    """Stateful wrapper with the reference `Controller` interface."""

    def __init__(self, params: BodyParams, thruster: int = 12, magnitude: float = 1.0):
        self.params = params
        self.thruster = thruster
        self.magnitude = magnitude
        self.history = []

    def get_control(self, state, t) -> np.ndarray:
        u = np.zeros(N_THRUSTERS)
        u[self.thruster] = self.magnitude
        self.history.append((t, np.asarray(state).copy(), u))
        return u

    def set_fault(self, fault) -> None:  # interface parity; nothing to reshape
        pass
