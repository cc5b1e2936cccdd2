"""Quaternion / rotation helpers for the rigid-body engine (pure jnp).

Conventions follow MuJoCo: quaternions are (w, x, y, z), rotations are
active, frames compose parent->child.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_rotate(q, v):
    """Rotate vector v by quaternion q."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_inv(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_from_axis_angle(axis, angle):
    half = 0.5 * angle
    return jnp.concatenate([
        jnp.cos(half)[..., None],
        axis * jnp.sin(half)[..., None],
    ], axis=-1)


def quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def quat_from_euler_xyz(rx, ry, rz):
    """Intrinsic x-y-z Euler angles -> quaternion (used for free-joint
    orientation dofs decomposed as 3 hinges)."""
    ex = quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), rx)
    ey = quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), ry)
    ez = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), rz)
    return quat_mul(quat_mul(ex, ey), ez)


def euler_xyz_from_quat(q):
    """Inverse of quat_from_euler_xyz (intrinsic x-y-z)."""
    R = quat_to_mat(q)
    # R = Rx(rx) Ry(ry) Rz(rz)
    ry = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    rx = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    rz = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return rx, ry, rz
