"""Quaternion/rotation kernels vs scipy.spatial.transform golden values."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from ft_mpc_tpu.ops.quaternion import (
    omega_operator,
    quat_kinematics,
    quat_normalize,
    rot_full,
    rot_full_inv,
    rot_matrix,
    rot_matrix_inv,
)


def random_quats(rng, n=32):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_rot_matrix_matches_scipy(rng):
    for q in random_quats(rng):
        R_scipy = Rotation.from_quat(q).as_matrix()  # body -> world
        R_ours = np.asarray(rot_matrix(jnp.asarray(q)))
        # rot_matrix is world->body = transpose of scipy's body->world.
        np.testing.assert_allclose(R_ours, R_scipy.T, atol=1e-12)


def test_rot_inv_is_transpose(rng):
    q = jnp.asarray(random_quats(rng, 8))
    R = rot_matrix(q)
    Rinv = rot_matrix_inv(q)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,njk->nik", R, Rinv)),
        np.broadcast_to(np.eye(3), (8, 3, 3)),
        atol=1e-12,
    )


def test_rot_full_block_structure(rng):
    q = jnp.asarray(random_quats(rng, 1)[0])
    F = np.asarray(rot_full(q))
    R = np.asarray(rot_matrix(q))
    np.testing.assert_allclose(F[:3, :3], R, atol=1e-15)
    np.testing.assert_allclose(F[3:, 3:], np.eye(3), atol=1e-15)
    np.testing.assert_allclose(F[:3, 3:], 0, atol=1e-15)
    np.testing.assert_allclose(
        np.asarray(rot_full_inv(q)), F.T, atol=1e-15
    )


def test_quat_kinematics_matches_operator(rng):
    q = jnp.asarray(random_quats(rng, 16))
    w = jnp.asarray(rng.standard_normal((16, 3)))
    direct = quat_kinematics(q, w)
    via_matrix = 0.5 * jnp.einsum("nij,nj->ni", omega_operator(w), q)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_matrix), atol=1e-12)


def test_quat_kinematics_preserves_norm(rng):
    # d/dt ||q||^2 = 2 q . qdot = 0 for the correct kinematics.
    q = jnp.asarray(random_quats(rng, 16))
    w = jnp.asarray(rng.standard_normal((16, 3)))
    dq = quat_kinematics(q, w)
    np.testing.assert_allclose(np.asarray(jnp.sum(q * dq, axis=1)), 0, atol=1e-12)


def test_quat_kinematics_integrates_like_scipy(rng):
    # Integrating q' = 0.5 Omega(w) q over dt with small steps should match
    # the exact rotation exp(w dt) composition for constant body-frame w.
    q0 = random_quats(rng, 1)[0]
    w = np.array([0.3, -0.2, 0.5])
    dt = 1e-4
    wj = jnp.asarray(w)

    def step(q, _):
        k1 = quat_kinematics(q, wj)
        k2 = quat_kinematics(q + dt / 2 * k1, wj)
        k3 = quat_kinematics(q + dt / 2 * k2, wj)
        k4 = quat_kinematics(q + dt * k3, wj)
        return quat_normalize(q + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)), None

    q, _ = jax.lax.scan(step, jnp.asarray(q0), length=1000)
    T = 1000 * dt
    # Body-frame constant angular velocity: R_wb(T) = R_wb(0) @ exp([w]x T)
    R0 = Rotation.from_quat(q0)
    R_true = R0 * Rotation.from_rotvec(w * T)
    R_got = Rotation.from_quat(np.array(q))
    np.testing.assert_allclose(
        R_got.as_matrix(), R_true.as_matrix(), atol=1e-8
    )
