"""Quaternion math (w, x, y, z convention), backend-dispatching.

Rebuilt against the behavior of
/root/reference/src/ladiff/data/humanml/common/quaternion.py (qinv:16, qmul:33,
qrot:54, qbetween:~250, quaternion_to_cont6d:314).  Fully batched, no
reshapes to 2D.  Dispatches on input type: numpy in -> pure numpy math
(host preprocessing must not round-trip through the accelerator), jax array
in -> jnp (differentiable, jit-safe — used by the device-side feature
codec and the joint-reconstruction loss).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["qinv", "qmul", "qrot", "qnormalize", "qbetween",
           "quaternion_to_matrix", "quaternion_to_cont6d",
           "cont6d_to_matrix", "axis_angle_to_quaternion"]


def _xp(*arrays):
    """numpy for numpy inputs, jnp when any input is a jax array (or when
    tracing inside jit)."""
    for a in arrays:
        if isinstance(a, (jax.Array, jax.core.Tracer)):
            return jnp
    return np


def qinv(q):
    """Conjugate (inverse for unit quaternions)."""
    xp = _xp(q)
    return q * xp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q):
    xp = _xp(q)
    return q / xp.linalg.norm(q, axis=-1, keepdims=True)


def qmul(q, r):
    """Hamilton product q*r, shapes (..., 4)."""
    xp = _xp(q, r)
    qw, qx, qy, qz = xp.split(q, 4, axis=-1)
    rw, rx, ry, rz = xp.split(r, 4, axis=-1)
    w = qw * rw - qx * rx - qy * ry - qz * rz
    x = qw * rx + qx * rw + qy * rz - qz * ry
    y = qw * ry - qx * rz + qy * rw + qz * rx
    z = qw * rz + qx * ry - qy * rx + qz * rw
    return xp.concatenate([w, x, y, z], axis=-1)


def qrot(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    xp = _xp(q, v)
    qvec = q[..., 1:]
    uv = xp.cross(qvec, v)
    uuv = xp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qbetween(v0, v1, eps: float = 1e-10):
    """Unit quaternion rotating v0 onto v1 (reference qbetween_np)."""
    xp = _xp(v0, v1)
    v0 = v0 / xp.maximum(xp.linalg.norm(v0, axis=-1, keepdims=True), eps)
    v1 = v1 / xp.maximum(xp.linalg.norm(v1, axis=-1, keepdims=True), eps)
    xyz = xp.cross(v0, v1)
    w = xp.sqrt(xp.maximum(
        (v0 ** 2).sum(-1, keepdims=True) * (v1 ** 2).sum(-1, keepdims=True),
        eps)) + (v0 * v1).sum(-1, keepdims=True)
    return qnormalize(xp.concatenate([w, xyz], axis=-1))


def quaternion_to_matrix(q):
    """(..., 4) -> (..., 3, 3) rotation matrices."""
    xp = _xp(q)
    w, x, y, z = xp.split(qnormalize(q), 4, axis=-1)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [xp.concatenate([r00, r01, r02], -1),
            xp.concatenate([r10, r11, r12], -1),
            xp.concatenate([r20, r21, r22], -1)]
    return xp.stack(rows, axis=-2)


def quaternion_to_cont6d(q):
    """First two matrix columns concatenated (reference :314-317)."""
    xp = _xp(q)
    m = quaternion_to_matrix(q)
    return xp.concatenate([m[..., 0], m[..., 1]], axis=-1)


def cont6d_to_matrix(cont6d):
    """Gram-Schmidt 6D -> rotation matrix (columns layout as above)."""
    xp = _xp(cont6d)
    x_raw = cont6d[..., :3]
    y_raw = cont6d[..., 3:]
    x = x_raw / xp.linalg.norm(x_raw, axis=-1, keepdims=True)
    z = xp.cross(x, y_raw)
    z = z / xp.linalg.norm(z, axis=-1, keepdims=True)
    y = xp.cross(z, x)
    return xp.stack([x, y, z], axis=-1)


def axis_angle_to_quaternion(axis_angle):
    """(..., 3) rotation vectors -> (..., 4) unit quaternions.

    Gradient-safe at angle=0: the untaken branch of a ``where`` still
    propagates NaNs through its cotangent, so the norm input is substituted
    with a safe value before the division (standard safe-where pattern)."""
    xp = _xp(axis_angle)
    sq = (axis_angle ** 2).sum(-1, keepdims=True)
    small = sq < 1e-12
    safe_sq = xp.where(small, xp.ones_like(sq), sq)
    angle = xp.sqrt(safe_sq)
    half = 0.5 * angle
    sin_half_over = xp.where(small, 0.5 - sq / 48.0, xp.sin(half) / angle)
    cos_half = xp.where(small, 1.0 - sq / 8.0, xp.cos(half))
    return xp.concatenate([cos_half, axis_angle * sin_half_over], axis=-1)
