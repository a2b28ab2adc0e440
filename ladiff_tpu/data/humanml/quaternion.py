"""Quaternion math (w, x, y, z convention), jnp-native and differentiable.

Rebuilt against the behavior of
/root/reference/src/ladiff/data/humanml/common/quaternion.py (qinv:16, qmul:33,
qrot:54, qbetween:~250, quaternion_to_cont6d:314).  Works on jax arrays and
numpy arrays alike (jnp dispatches both); fully batched, no reshapes to 2D.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["qinv", "qmul", "qrot", "qnormalize", "qbetween",
           "quaternion_to_matrix", "quaternion_to_cont6d",
           "cont6d_to_matrix", "axis_angle_to_quaternion"]


def qinv(q):
    """Conjugate (inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qmul(q, r):
    """Hamilton product q*r, shapes (..., 4)."""
    qw, qx, qy, qz = jnp.split(q, 4, axis=-1)
    rw, rx, ry, rz = jnp.split(r, 4, axis=-1)
    w = qw * rw - qx * rx - qy * ry - qz * rz
    x = qw * rx + qx * rw + qy * rz - qz * ry
    y = qw * ry - qx * rz + qy * rw + qz * rx
    z = qw * rz + qx * ry - qy * rx + qz * rw
    return jnp.concatenate([w, x, y, z], axis=-1)


def qrot(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qbetween(v0, v1, eps: float = 1e-10):
    """Unit quaternion rotating v0 onto v1 (reference qbetween_np)."""
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0, axis=-1, keepdims=True), eps)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), eps)
    xyz = jnp.cross(v0, v1)
    w = jnp.sqrt(jnp.maximum(
        (v0 ** 2).sum(-1, keepdims=True) * (v1 ** 2).sum(-1, keepdims=True),
        eps)) + (v0 * v1).sum(-1, keepdims=True)
    return qnormalize(jnp.concatenate([w, xyz], axis=-1))


def quaternion_to_matrix(q):
    """(..., 4) -> (..., 3, 3) rotation matrices."""
    w, x, y, z = jnp.split(qnormalize(q), 4, axis=-1)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [jnp.concatenate([r00, r01, r02], -1),
            jnp.concatenate([r10, r11, r12], -1),
            jnp.concatenate([r20, r21, r22], -1)]
    return jnp.stack(rows, axis=-2)


def quaternion_to_cont6d(q):
    """First two matrix columns concatenated (reference :314-317)."""
    m = quaternion_to_matrix(q)
    return jnp.concatenate([m[..., 0], m[..., 1]], axis=-1)


def cont6d_to_matrix(cont6d):
    """Gram-Schmidt 6D -> rotation matrix (columns layout as above)."""
    x_raw = cont6d[..., :3]
    y_raw = cont6d[..., 3:]
    x = x_raw / jnp.linalg.norm(x_raw, axis=-1, keepdims=True)
    z = jnp.cross(x, y_raw)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def axis_angle_to_quaternion(axis_angle):
    """(..., 3) rotation vectors -> (..., 4) unit quaternions."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-6
    sin_half_over = jnp.where(small, 0.5 - angle ** 2 / 48.0,
                              jnp.sin(half) / jnp.maximum(angle, 1e-12))
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over], axis=-1)
