"""Rigid-body and orbit-center dynamics as pure jnp functions.

Parity notes (symbols in /root/reference):
  * `BodyParams` carries the KTH-freeflyer-like constants of
    `ft_mpc/models/sys_model.py:51-60` (mass 16.8 kg, diagonal inertia,
    16 unidirectional thrusters, max_thrust 3.4 N).
  * `build_thruster_matrix` reproduces the 6x16 allocation matrix `D`
    (`ft_mpc/models/sys_model.py:73-123`) mapping thruster magnitudes to a
    body-frame generalized force [f(3); tau(3)].
  * `robot_dx_dt` is the 13-state robot dynamics of
    `ft_mpc/models/sys_model.py:177-226` with state
    [pos(3) world, vel(3) world, quat(4) xyzw, omega(3) body]; broken
    thrusters are zeroed and their stuck-on force added -- but here the
    fault enters as *data* (`FaultState` arrays), not by rebuilding a
    symbolic graph as `set_fault` does (`sys_model.py:228-243`).
  * `center_dx_dt` is the orbit-center dynamics of
    `ft_mpc/models/spiral_model.py:44-76`, state
    [pos_c(3), vel_c(3), omega(3) body, quat(4) xyzw], 6-d generalized
    force input, with the centripetal `w x (w x r)` and Euler `dw x r`
    coupling terms and the constant generalized fault force offset.
  * `rk4` matches the RK4 discretization of `ft_mpc/models/sys_model.py:138-162`
    (zero-order-hold input, no quaternion renormalization inside the step --
    renormalization is the simulator's job, as in `sim_env.py:93`).

Faults-as-data means a single jitted step serves every fault scenario;
batching is a `vmap` over `FaultState` leaves.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.ops.quaternion import quat_kinematics, rot_matrix

N_STATE = 13
N_THRUSTERS = 16
N_GEN = 6  # generalized force dimension [f(3); tau(3)]


def build_thruster_matrix(
    d1: float = 0.12, d2: float = 0.09, d3: float = 0.05
) -> np.ndarray:
    """6x16 thruster allocation matrix D (body frame).

    Thrusters 0-7 act along +-x with lever arms producing y/z torques,
    8-11 along +-y (z torque), 12-15 along +-z (x torque).  Layout matches
    the reference plant (`ft_mpc/models/sys_model.py:73-123`).
    """
    D = np.zeros((N_GEN, N_THRUSTERS))
    D[0, 0:8] = [-1, -1, 1, 1, -1, -1, 1, 1]
    D[1, 8:12] = [-1, -1, 1, 1]
    D[2, 12:16] = [-1, 1, -1, 1]
    D[3, 12:16] = [-d1, d1, d1, -d1]
    D[4, 0:8] = [-d3, d3, d3, -d3, -d3, d3, d3, -d3]
    D[5, 0:8] = [d1, d1, -d1, -d1, -d1, -d1, d1, d1]
    D[5, 8:12] = [-d2, d2, d2, -d2]
    return D


class BodyParams(NamedTuple):
    """Static plant constants. A pytree of arrays so it can cross jit."""

    mass: jnp.ndarray  # scalar
    inertia: jnp.ndarray  # (3, 3)
    inertia_inv: jnp.ndarray  # (3, 3)
    max_thrust: jnp.ndarray  # scalar
    D: jnp.ndarray  # (6, 16)
    dt: jnp.ndarray  # scalar

    @classmethod
    def default(cls, dt: float = 0.1) -> "BodyParams":
        import jax

        inertia = np.diag([0.2, 0.3, 0.25])
        # numpy leaves: avoids per-field host->device transfers at build time;
        # jit moves the whole pytree once on first call.
        f_dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
        as_f = lambda x: np.asarray(x, dtype=f_dtype)
        return cls(
            mass=as_f(16.8),
            inertia=as_f(inertia),
            inertia_inv=as_f(np.linalg.inv(inertia)),
            max_thrust=as_f(3.4),
            D=as_f(build_thruster_matrix()),
            dt=as_f(dt),
        )


class FaultState(NamedTuple):
    """Thruster fault pattern as data.

    broken:    (16,) 0/1 float mask; 1 = thruster failed (commands ignored).
    intensity: (16,) stuck-on intensity in [0, 1] of max thrust; a dead
               thruster has broken=1, intensity=0.
    """

    broken: jnp.ndarray
    intensity: jnp.ndarray

    @classmethod
    def healthy(cls) -> "FaultState":
        z = np.zeros(N_THRUSTERS)
        return cls(broken=z, intensity=z)

    @classmethod
    def from_faults(cls, faults) -> "FaultState":
        """Build from an iterable of `BrokenThruster`-like (index, intensity)."""
        broken = np.zeros(N_THRUSTERS)
        intensity = np.zeros(N_THRUSTERS)
        for f in faults:
            broken[f.index] = 1.0
            intensity[f.index] = f.intensity
        return cls(broken=broken, intensity=intensity)

    def faulty_force(self, params: BodyParams) -> jnp.ndarray:
        """(16,) constant stuck-on thrust per thruster."""
        return self.broken * self.intensity * params.max_thrust

    def faulty_force_generalized(self, params: BodyParams) -> jnp.ndarray:
        """(6,) body-frame generalized force of the stuck-on thrusters."""
        return params.D @ self.faulty_force(params)

    def u_upper_bound(self, params: BodyParams) -> jnp.ndarray:
        """(16,) per-thruster command upper bound (0 for failed thrusters)."""
        return jnp.where(self.broken > 0.5, 0.0, params.max_thrust)


def body_wrench(
    params: BodyParams, fault: FaultState, u_phys: jnp.ndarray
) -> jnp.ndarray:
    """Generalized body-frame force from physical thruster commands under fault."""
    u_eff = jnp.where(fault.broken > 0.5, 0.0, u_phys) + fault.faulty_force(params)
    return params.D @ u_eff


def robot_dx_dt(
    params: BodyParams, fault: FaultState, x: jnp.ndarray, u_phys: jnp.ndarray
) -> jnp.ndarray:
    """Continuous dynamics of the robot state [pos, vel, quat, omega]."""
    vel = x[3:6]
    q = x[6:10]
    omega = x[10:13]

    gf = body_wrench(params, fault, u_phys)
    force, torque = gf[0:3], gf[3:6]

    dpos = vel
    # Body-frame force expressed in world frame: R(q)^T f  (see module notes).
    dvel = rot_matrix(q).T @ force / params.mass
    dq = quat_kinematics(q, omega)
    domega = params.inertia_inv @ (torque - jnp.cross(omega, params.inertia @ omega))
    return jnp.concatenate([dpos, dvel, dq, domega])


def center_dx_dt(
    params: BodyParams,
    fault_gen_force: jnp.ndarray,
    r: jnp.ndarray,
    c: jnp.ndarray,
    u_gen: jnp.ndarray,
) -> jnp.ndarray:
    """Continuous dynamics of the orbit-center state [pos_c, vel_c, omega, quat].

    Args:
        fault_gen_force: (6,) constant generalized fault force (data).
        r: (3,) body-frame offset from robot to orbit center.
        u_gen: (6,) generalized force input.
    """
    vel = c[3:6]
    omega = c[6:9]
    q = c[9:13]

    gf = u_gen + fault_gen_force
    force, torque = gf[0:3], gf[3:6]

    dpos = vel
    domega = params.inertia_inv @ (torque - jnp.cross(omega, params.inertia @ omega))
    dvel = rot_matrix(q).T @ (
        force / params.mass + jnp.cross(domega, r) + jnp.cross(omega, jnp.cross(omega, r))
    )
    dq = quat_kinematics(q, omega)
    return jnp.concatenate([dpos, dvel, domega, dq])


def rk4(
    f: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    dt: jnp.ndarray,
    x: jnp.ndarray,
    u: jnp.ndarray,
) -> jnp.ndarray:
    """One RK4 step of x' = f(x, u) with zero-order-hold input."""
    k1 = f(x, u)
    k2 = f(x + dt / 2 * k1, u)
    k3 = f(x + dt / 2 * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


def robot_step(
    params: BodyParams, fault: FaultState, x: jnp.ndarray, u_phys: jnp.ndarray
) -> jnp.ndarray:
    """Discrete robot dynamics (RK4)."""
    return rk4(lambda s, uu: robot_dx_dt(params, fault, s, uu), params.dt, x, u_phys)


def center_step(
    params: BodyParams,
    fault_gen_force: jnp.ndarray,
    r: jnp.ndarray,
    c: jnp.ndarray,
    u_gen: jnp.ndarray,
) -> jnp.ndarray:
    """Discrete orbit-center dynamics (RK4)."""
    return rk4(
        lambda s, uu: center_dx_dt(params, fault_gen_force, r, s, uu),
        params.dt,
        c,
        u_gen,
    )


def robot_to_center(r: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Robot state [pos,vel,quat,omega] -> center state [pos_c,vel_c,omega,quat].

    Mirrors `SpiralModel.robot_to_center` (`ft_mpc/models/spiral_model.py:91-109`).
    """
    q = x[6:10]
    omega = x[10:13]
    R_inv = rot_matrix(q).T  # body -> world
    pos = x[0:3] + R_inv @ r
    vel = x[3:6] + R_inv @ jnp.cross(omega, r)
    return jnp.concatenate([pos, vel, omega, q])


def center_to_robot(r: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Center state -> robot state.

    The reference's version (`ft_mpc/models/spiral_model.py:111-129`) is dead
    code with an undefined-variable bug; this is the working inverse of
    `robot_to_center`.
    """
    omega = c[6:9]
    q = c[9:13]
    R_inv = rot_matrix(q).T
    pos = c[0:3] - R_inv @ r
    vel = c[3:6] - R_inv @ jnp.cross(omega, r)
    return jnp.concatenate([pos, vel, q, omega])
