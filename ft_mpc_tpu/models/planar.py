"""2D freeflyer plant, embedded in the 3D engine.

The reference documents (but does not ship code for) a 2D freeflyer:
m = 14.5 kg, J = 0.37 kg m^2, 8 thrusters, 3x8 allocation matrix, f_max =
1.75 N (`data/InertialProperties.md` of the reference; its reactive.yaml
comments mention "the 2D version").  Rather than duplicating the control
stack for a 6-state model, the planar craft is expressed in the 13-state
engine:

  * thrusters 0-7 fire in the body x/y plane with z-lever torques,
  * columns 8-15 of D are zero, and those indices are marked as *dead
    faults* in every scenario (`planar_fault`), so the zonotope geometry,
    MPC constraints and allocation all see an 8-thruster planar craft,
  * out-of-plane inertia entries exist but are never excited (planar
    initial states + zero out-of-plane wrench keep z/roll/pitch invariant;
    asserted in tests).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ft_mpc_tpu.ops.dynamics import BodyParams, N_THRUSTERS
from ft_mpc_tpu.utils.faults import BrokenThruster

PLANAR_ABSENT_THRUSTERS = tuple(range(8, 16))


def build_thruster_matrix_2d(lever: float = 0.12) -> np.ndarray:
    """6x16 allocation matrix with 8 active planar thrusters.

    Layout (forces in body frame, torques about z):
      0,1: -x force, -+lever z-torque     2,3: +x force, +-lever z-torque
      4,5: -y force, -+lever z-torque     6,7: +y force, +-lever z-torque
    Columns 8-15 are zero (absent).
    """
    D = np.zeros((6, N_THRUSTERS))
    # force x
    D[0, 0:2] = -1.0
    D[0, 2:4] = 1.0
    # force y
    D[1, 4:6] = -1.0
    D[1, 6:8] = 1.0
    # torque z: opposing pairs so pure forces and pure torques are attainable
    D[5, 0:8] = [-lever, lever, lever, -lever, -lever, lever, lever, -lever]
    return D


def planar_body_params(dt: float = 0.1) -> BodyParams:
    """BodyParams for the documented 2D freeflyer."""
    import jax

    inertia = np.diag([0.185, 0.185, 0.37])
    f_dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    as_f = lambda x: np.asarray(x, dtype=f_dtype)
    return BodyParams(
        mass=as_f(14.5),
        inertia=as_f(inertia),
        inertia_inv=as_f(np.linalg.inv(inertia)),
        max_thrust=as_f(1.75),
        D=as_f(build_thruster_matrix_2d()),
        dt=as_f(dt),
    )


def planar_fault(faults: Sequence[BrokenThruster] = ()) -> list[BrokenThruster]:
    """Fault list with the absent out-of-plane thrusters marked dead."""
    for f in faults:
        if f.index >= 8:
            raise ValueError("planar craft has thrusters 0-7 only")
    dead = [BrokenThruster(i, 0.0) for i in PLANAR_ABSENT_THRUSTERS]
    return list(faults) + dead
