"""Device-resident optimization: batched ADMM QP, condensing, allocation.

These replace the reference's process-external native solvers (IPOPT/MUMPS at
`spiraling_mpc.py:230,346`, daqp at `control_allocator.py:63`, CVXPY backends
at `control_allocator.py:86`) with jit-compiled, shape-static, vmap-batched
JAX programs that never leave the device inside the control loop.
"""

from ft_mpc_tpu.solvers.admm import QP, ADMMConfig, ADMMSolution, admm_solve  # noqa: F401
from ft_mpc_tpu.solvers.allocation import allocate_thrusters, clip_wrench  # noqa: F401
