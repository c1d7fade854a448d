"""Quaternion and rotation kernels (xyzw convention, matching the reference).

Parity notes (symbols in /root/reference):
  * `rot_matrix(q)` is the world->body rotation matrix, the same object as
    `Rot`/`RotCasadi` in `ft_mpc/util/utils.py:4-55`.  The reference uses
    `Rot(q).T @ f_body` to express a body-frame force in world frame.
  * `omega_operator(w)` matches `OmegaOperator` in
    `ft_mpc/models/sys_model.py:8-29` (quaternion kinematics
    q_dot = 0.5 * Omega(w) @ q with body-frame angular velocity).
  * `rot_full(q)` / `rot_full_inv(q)` match `RotFull`/`RotFullInv`
    (`ft_mpc/util/utils.py:57-74`): block-diagonal action on a 6-d
    generalized force [f(3); tau(3)] that rotates the force part only.

Everything is pure jnp, works on traced values, and vmaps cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Return q / ||q||, safe at very small norms."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, 1e-12)


def rot_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """World->body rotation matrix from an xyzw quaternion. Shape (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = x * x - y * y - z * z + w * w
    r01 = 2.0 * (x * y + z * w)
    r02 = 2.0 * (x * z - y * w)
    r10 = 2.0 * (x * y - z * w)
    r11 = -x * x + y * y - z * z + w * w
    r12 = 2.0 * (y * z + x * w)
    r20 = 2.0 * (x * z + y * w)
    r21 = 2.0 * (y * z - x * w)
    r22 = -x * x - y * y + z * z + w * w
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_matrix_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Body->world rotation matrix (transpose of `rot_matrix`)."""
    return jnp.swapaxes(rot_matrix(q), -1, -2)


def rot_full(q: jnp.ndarray) -> jnp.ndarray:
    """6x6 block rotation acting on a generalized force [f; tau].

    Rotates the translational part by `rot_matrix(q)`, leaves the torque
    part (body frame) untouched.
    """
    R = rot_matrix(q)
    top = jnp.concatenate([R, jnp.zeros_like(R)], axis=-1)
    bot = jnp.concatenate(
        [jnp.zeros_like(R), jnp.broadcast_to(jnp.eye(3), R.shape)], axis=-1
    )
    return jnp.concatenate([top, bot], axis=-2)


def rot_full_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `rot_full` (transpose)."""
    return jnp.swapaxes(rot_full(q), -1, -2)


def omega_operator(w: jnp.ndarray) -> jnp.ndarray:
    """4x4 matrix Omega(w) such that q_dot = 0.5 * Omega(w) @ q (xyzw).

    w is the body-frame angular velocity, shape (..., 3).
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, wz, -wy, wx], axis=-1),
            jnp.stack([-wz, zero, wx, wy], axis=-1),
            jnp.stack([wy, -wx, zero, wz], axis=-1),
            jnp.stack([-wx, -wy, -wz, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_kinematics(q: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """q_dot = 0.5 * Omega(w) @ q without materializing the 4x4 matrix."""
    x, y, z, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    return 0.5 * jnp.stack(
        [
            wz * y - wy * z + wx * qw,
            -wz * x + wx * z + wy * qw,
            wy * x - wx * y + wz * qw,
            -wx * x - wy * y - wz * z,
        ],
        axis=-1,
    )
