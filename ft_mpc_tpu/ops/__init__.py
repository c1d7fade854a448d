"""Core math kernels: quaternions, rigid-body dynamics, integrators.

All functions are pure jnp, shape-static, and batchable with vmap.
"""

from ft_mpc_tpu.ops.quaternion import (  # noqa: F401
    quat_normalize,
    rot_matrix,
    rot_matrix_inv,
    rot_full,
    rot_full_inv,
    omega_operator,
)
from ft_mpc_tpu.ops.dynamics import (  # noqa: F401
    BodyParams,
    FaultState,
    build_thruster_matrix,
    robot_dx_dt,
    center_dx_dt,
    rk4,
    robot_step,
    center_step,
)
