"""Micro-orbit ("spiraling") parameter selection.

Host-side, runs once per fault pattern when building a scenario bank.
Mirrors the semantics of `SpiralParameters`
(`ft_mpc/controllers/tools/spiral_parameters.py:26-57`):

  * The controller spins the craft at a constant `omega_des` so a stuck-on
    thruster's body-frame force averages out over an orbit.
  * A virtual centripetal force `f_virt` (along `r_dir`) defines the orbit;
    the compensation input turns the *actual* fault force into that virtual
    force:  u_comp = [f_virt; 0] - faulty_force_generalized.
  * Orbit radius r = |f_virt| / (m |omega_des|^2) along r_dir.
  * M maps a generalized force to the 6-d acceleration of the center point
    (with the lever-arm coupling of the off-center rotation).

The reference hard-codes omega_des = [0,0,0.6], r_dir = [0,1,0],
|f_virt| = 3.5 N; those are the defaults here but are plain arguments.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class SpiralParameters:
    omega_des: np.ndarray
    r_dir: np.ndarray
    f_virt: np.ndarray  # (3,) virtual centripetal force
    compensation_force: np.ndarray  # (6,)
    r: np.ndarray  # (3,) orbit-center offset, body frame
    M: np.ndarray  # (6, 6) generalized force -> center acceleration
    beta: np.ndarray  # (4,) xyzw quaternion of the force-aligned frame

    @classmethod
    def compute(
        cls,
        mass: float,
        inertia: np.ndarray,
        faulty_force_generalized: np.ndarray,
        omega_des=(0.0, 0.0, 0.6),
        r_dir=(0.0, 1.0, 0.0),
        f_virt_mag: float = 3.5,
    ) -> "SpiralParameters":
        omega_des = np.asarray(omega_des, dtype=np.float64)
        r_dir = np.asarray(r_dir, dtype=np.float64)
        f_virt = f_virt_mag * r_dir

        compensation = (
            np.concatenate([f_virt, np.zeros(3)]) - np.asarray(faulty_force_generalized)
        )

        r = np.linalg.norm(f_virt) / (mass * np.linalg.norm(omega_des) ** 2) * r_dir

        inertia_inv = np.linalg.inv(inertia)
        # Lever-arm coupling of torque into center-point linear acceleration:
        # a_c += domega x r = -[r]x J^-1 tau, valid for ANY orbit direction.
        # (The reference hard-codes the r-along-+y special case,
        # `spiral_parameters.py:48-57`; fault-aware orbit selection needs the
        # general form -- for r = |r| e_y it reduces to the reference's
        # matrix exactly.)
        rx, ry, rz = r
        skew_r = np.array(
            [
                [0.0, -rz, ry],
                [rz, 0.0, -rx],
                [-ry, rx, 0.0],
            ]
        )
        m_helper = -skew_r @ inertia_inv
        M = np.block(
            [
                [np.eye(3) / mass, m_helper],
                [np.zeros((3, 3)), inertia_inv],
            ]
        )
        return cls(
            omega_des=omega_des,
            r_dir=r_dir,
            f_virt=f_virt,
            compensation_force=compensation,
            r=r,
            M=M,
            beta=np.array([0.0, 0.0, 0.0, 1.0]),
        )
