"""Dynamics kernels: independent numpy re-derivation + physics invariants."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from ft_mpc_tpu.ops.dynamics import (
    BodyParams,
    FaultState,
    build_thruster_matrix,
    center_dx_dt,
    center_step,
    center_to_robot,
    robot_dx_dt,
    robot_step,
    robot_to_center,
)
from ft_mpc_tpu.utils.faults import BrokenThruster


def numpy_robot_dx_dt(params, broken, intensity, x, u):
    """Independent numpy formulation of the 13-state dynamics."""
    D = np.asarray(params.D)
    m = float(params.mass)
    J = np.asarray(params.inertia)
    Jinv = np.linalg.inv(J)
    mt = float(params.max_thrust)

    u_eff = np.where(broken > 0.5, 0.0, u) + broken * intensity * mt
    gf = D @ u_eff
    f, tau = gf[:3], gf[3:]

    vel, q, w = x[3:6], x[6:10], x[10:13]
    R_wb = Rotation.from_quat(q / np.linalg.norm(q)).as_matrix()  # body->world
    # note: for non-unit q the closed-form matrix used in the code scales as
    # ||q||^2; use unit q in tests for exact comparison.
    dpos = vel
    dvel = R_wb @ f / m
    # quaternion kinematics xyzw with body omega
    qx, qy, qz, qw = q
    dq = 0.5 * np.array(
        [
            w[2] * qy - w[1] * qz + w[0] * qw,
            -w[2] * qx + w[0] * qz + w[1] * qw,
            w[1] * qx - w[0] * qy + w[2] * qw,
            -w[0] * qx - w[1] * qy - w[2] * qz,
        ]
    )
    domega = Jinv @ (tau - np.cross(w, J @ w))
    return np.concatenate([dpos, dvel, dq, domega])


def random_state(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    return np.concatenate(
        [rng.standard_normal(3), rng.standard_normal(3), q, rng.standard_normal(3)]
    )


def test_thruster_matrix_momentless_pairs():
    # Physical sanity: firing all 16 thrusters at equal magnitude produces
    # zero net force and zero net torque (symmetric layout).
    D = build_thruster_matrix()
    np.testing.assert_allclose(D @ np.ones(16), 0, atol=1e-12)


def test_robot_dx_dt_matches_numpy(rng):
    params = BodyParams.default(dt=0.1)
    fault = FaultState.from_faults([BrokenThruster(10, 1.0), BrokenThruster(3, 0.4)])
    for _ in range(10):
        x = random_state(rng)
        u = rng.uniform(0, 3.4, 16)
        ours = np.asarray(robot_dx_dt(params, fault, jnp.asarray(x), jnp.asarray(u)))
        golden = numpy_robot_dx_dt(
            params, np.asarray(fault.broken), np.asarray(fault.intensity), x, u
        )
        np.testing.assert_allclose(ours, golden, atol=1e-10)


def test_broken_thruster_ignores_command(rng):
    params = BodyParams.default(dt=0.1)
    fault = FaultState.from_faults([BrokenThruster(5, 0.7)])
    x = random_state(rng)
    u1 = rng.uniform(0, 3.4, 16)
    u2 = u1.copy()
    u2[5] = 0.0  # command to broken thruster must not matter
    d1 = robot_dx_dt(params, fault, jnp.asarray(x), jnp.asarray(u1))
    d2 = robot_dx_dt(params, fault, jnp.asarray(x), jnp.asarray(u2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-14)


def test_rk4_energy_free_rotation():
    # Torque-free rigid body: kinetic energy and |angular momentum| conserved.
    params = BodyParams.default(dt=0.01)
    fault = FaultState.healthy()
    J = np.asarray(params.inertia)
    x = np.zeros(13)
    x[6:10] = [0, 0, 0, 1]
    x[10:13] = [0.4, 1.2, -0.7]
    u = jnp.zeros(16)

    def energy(w):
        return 0.5 * w @ J @ w

    e0 = energy(x[10:13])
    h0 = np.linalg.norm(J @ x[10:13])

    @jax.jit
    def rollout(s0):
        return jax.lax.scan(
            lambda s, _: (robot_step(params, fault, s, u), None), s0, length=500
        )[0]

    w = np.asarray(rollout(jnp.asarray(x))[10:13])
    assert abs(energy(w) - e0) < 1e-8
    assert abs(np.linalg.norm(J @ w) - h0) < 1e-8


def test_center_robot_roundtrip(rng):
    r = jnp.asarray([0.0, 0.124, 0.0])
    for _ in range(5):
        x = jnp.asarray(random_state(rng))
        c = robot_to_center(r, x)
        x_back = center_to_robot(r, c)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-12)


def test_center_dynamics_consistent_with_robot(rng):
    """The center point of a rigid body must move per the center dynamics.

    Take a robot state, apply a wrench via 16 thrusters; the center state
    c = robot_to_center(x) must evolve with center_dx_dt under the induced
    generalized force.  This couples the two models exactly as the
    controller assumes (spiral_model vs sys_model in the reference).
    """
    params = BodyParams.default(dt=0.1)
    fault = FaultState.from_faults([BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)])
    r = jnp.asarray([0.0, 0.124, 0.0])

    x = random_state(rng)
    u_phys = rng.uniform(0, 3.4, 16)

    # Finite-difference the transform along the robot flow.
    eps = 1e-6
    dx = np.asarray(robot_dx_dt(params, fault, jnp.asarray(x), jnp.asarray(u_phys)))
    c_plus = np.asarray(robot_to_center(r, jnp.asarray(x + eps * dx)))
    c_minus = np.asarray(robot_to_center(r, jnp.asarray(x - eps * dx)))
    dc_fd = (c_plus - c_minus) / (2 * eps)

    # Analytic center dynamics under the *controllable* wrench (u zeroed on
    # broken thrusters), with the fault wrench as offset data.
    D = np.asarray(params.D)
    u_eff = np.where(np.asarray(fault.broken) > 0.5, 0.0, u_phys)
    w_ctrl = D @ u_eff
    c = robot_to_center(r, jnp.asarray(x))
    dc = np.asarray(
        center_dx_dt(
            params,
            jnp.asarray(fault.faulty_force_generalized(params)),
            r,
            c,
            jnp.asarray(w_ctrl),
        )
    )
    np.testing.assert_allclose(dc, dc_fd, rtol=1e-5, atol=1e-6)
