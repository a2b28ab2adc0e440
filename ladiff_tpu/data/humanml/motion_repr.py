"""HumanML3D/KIT motion feature codec — the device-side (inverse) half.

Feature layout (263-dim for 22 joints, 251-dim for 21 joints; reference
/root/reference/src/ladiff/data/humanml/scripts/motion_process.py:355-366):
  [ root rot-vel (1) | root lin-vel xz (2) | root height y (1)
  | ric (J-1)*3 | rot6d (J-1)*6 | local vel J*3 | foot contacts (4) ].

``recover_from_ric`` (reference :415-431) inverts the root-relative encoding:
cumulative y-rotation from rot-vel, cumulative xz translation from rotated
lin-vel, then rigid-transforms the local joint positions.  It is on the
training hot path (joint reconstruction loss) so it is implemented here as
differentiable jnp ops with ``cumsum`` over the frame axis — fully batched,
no Python loops, jit/grad-safe.

The forward direction (``process_file``, joints -> features) is an offline
preprocessing step in the reference; see ``ladiff_tpu/data/humanml/process.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ladiff_tpu.data.humanml.quaternion import qinv, qrot

__all__ = ["recover_root_rot_pos", "recover_from_ric", "n_feats_for_joints",
           "n_joints_for_feats"]


def n_feats_for_joints(joints_num: int) -> int:
    return 1 + 2 + 1 + (joints_num - 1) * 3 + (joints_num - 1) * 6 + joints_num * 3 + 4


def n_joints_for_feats(nfeats: int) -> int:
    return {263: 22, 251: 21}[int(nfeats)]


def recover_root_rot_pos(data: jax.Array):
    """Reference motion_process.py:355-381.

    data: [..., T, F] features -> (r_rot_quat [..., T, 4], r_pos [..., T, 3]).
    """
    rot_vel = data[..., 0]
    # r_rot_ang[t] = sum of rot_vel[:t]  (shift by one, then cumsum)
    shifted = jnp.concatenate(
        [jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], axis=-1)
    r_rot_ang = jnp.cumsum(shifted, axis=-1)

    zeros = jnp.zeros_like(r_rot_ang)
    r_rot_quat = jnp.stack(
        [jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], axis=-1)

    # local xz velocity, shifted by one frame
    vel_xz = data[..., 1:3]
    vel_xz = jnp.concatenate(
        [jnp.zeros_like(vel_xz[..., :1, :]), vel_xz[..., :-1, :]], axis=-2)
    r_pos = jnp.stack(
        [vel_xz[..., 0], jnp.zeros_like(vel_xz[..., 0]), vel_xz[..., 1]],
        axis=-1)
    # rotate the local velocity into world frame, integrate
    r_pos = qrot(qinv(r_rot_quat), r_pos)
    r_pos = jnp.cumsum(r_pos, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])
    return r_rot_quat, r_pos


def recover_from_ric(data: jax.Array, joints_num: int) -> jax.Array:
    """Features [..., T, F] -> joint positions [..., T, J, 3]
    (reference motion_process.py:415-431)."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4:(joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))

    # undo the per-frame facing rotation
    q = jnp.broadcast_to(qinv(r_rot_quat)[..., None, :],
                         positions.shape[:-1] + (4,))
    positions = qrot(q, positions)

    # add root xz translation
    positions = positions.at[..., 0].add(r_pos[..., 0:1])
    positions = positions.at[..., 2].add(r_pos[..., 2:3])

    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)
