"""ft_mpc_tpu — a TPU-native fault-tolerant MPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DISCOWER/fault-tolerant-mpc (spacecraft micro-orbiting MPC under thruster
faults).  Where the reference runs one sequential CasADi/IPOPT solve per
control step on CPU, this framework expresses the whole control stack --
dynamics, fault-reshaped constraint geometry, SQP/QP solving, control
allocation, and closed-loop simulation -- as jit-compiled, shape-static,
scenario-batched JAX programs that scale over TPU meshes.

Key design decisions (vs the reference, cited per-module):
  * Fault patterns are *data*, not Python object mutation: a `ScenarioBank`
    holds per-scenario tensors (fault forces, padded constraint polytopes,
    compensation terms, terminal ingredients), enabling `vmap`/`shard_map`
    over thousands of fault scenarios at once.
  * The per-step nonlinear MPC is a real-time-iteration SQP whose QP
    subproblem is solved by a batched, device-resident ADMM (OSQP-style)
    with static shapes -- no host round-trips inside the control loop.
  * The 2^16 thruster-corner enumeration + qhull of the reference
    (`ft_mpc/controllers/tools/input_bounds.py`) is replaced by exact
    zonotope facet enumeration of the attainable wrench set.
"""

__version__ = "0.1.0"

from ft_mpc_tpu.utils.faults import BrokenThruster  # noqa: F401
from ft_mpc_tpu.ops.dynamics import BodyParams, build_thruster_matrix  # noqa: F401
