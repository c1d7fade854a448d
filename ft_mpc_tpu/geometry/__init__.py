"""Host-side constraint geometry: polytopes, attainable-wrench zonotopes,
and batched fault-scenario tensor banks.

The combinatorial geometry (facet enumeration, redundancy pruning) runs once
per fault pattern on the host; the results are padded, masked `(A, b)` tensors
stacked along a scenario axis and consumed on-device by the SQP/QP solvers.
"""

from ft_mpc_tpu.geometry.polytope import Polytope  # noqa: F401
from ft_mpc_tpu.geometry.zonotope import attainable_wrench_polytope  # noqa: F401
from ft_mpc_tpu.geometry.scenario import Scenario, ScenarioBank, build_scenario  # noqa: F401
