"""SMPL-H rotations -> joints / vertices.

Rebuild of /root/reference/src/ladiff/transforms/rots2joints/{smplh.py,
base.py}: run the SMPL-H body model on [..., 22|52, 3, 3] matrix poses (mean
hand pose filled in when hands are absent), then remap the output topology
(``mmm`` / ``mmmns`` / ``smplmmm`` / ``smplnh`` / ``smplh`` / ``vertices``)
with the MMM scaling/axis conventions and root-center the first frame.

The body model is our JAX LBS (ladiff_tpu/smpl/body_model.py) — the batch
loop of the reference (smplh.py:106-123) disappears; all frames evaluate in
one jitted call.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

from ladiff_tpu.smpl.body_model import SMPLModel
from ladiff_tpu.transforms.geometry import axis_angle_to_matrix
from ladiff_tpu.utils.joints import (get_root_idx, smplh_extra_vertex_ids,
                                     smplh_indexes,
                                     smplh_to_mmm_scaling_factor)

__all__ = ["SMPLH", "smplh_to"]


class SMPLH:
    """reference smplh.py:18-133."""

    def __init__(self, path: str = "deps/smplh/SMPLH_NEUTRAL.npz",
                 jointstype: str = "mmm", input_pose_rep: str = "matrix",
                 batch_size: int = 512, gender: str = "neutral",
                 **_kw) -> None:
        self.jointstype = jointstype
        self.input_pose_rep = input_pose_rep
        self.batch_size = batch_size  # kept for API parity; unused (one jit)
        model = SMPLModel.load(path)
        if model is None:
            # keep the pipeline testable without the asset
            model = SMPLModel.synthetic(model_type="smplh")
        self.model = model

    @functools.cached_property
    def _hands_mean_matrix(self) -> np.ndarray:
        hands_mean = self.model.hands_mean
        if hands_mean is None:
            hands_mean = np.zeros((30, 3), np.float32)
        return axis_angle_to_matrix(hands_mean)  # [30, 3, 3]

    def __call__(self, smpl_data, jointstype: Optional[str] = None):
        return self.forward(smpl_data, jointstype)

    def forward(self, smpl_data, jointstype: Optional[str] = None,
                betas: Optional[np.ndarray] = None) -> np.ndarray:
        jointstype = self.jointstype if jointstype is None else jointstype
        poses = np.asarray(smpl_data.rots, np.float64)  # [..., J, 3, 3]
        trans = smpl_data.trans
        save_shape = poses.shape[:-3]
        nposes = int(np.prod(save_shape)) if save_shape else 1

        if poses.shape[-3] == 52:
            matrix_poses = poses.reshape((nposes, 52, 3, 3))
        elif poses.shape[-3] == 22:
            body = poses.reshape((nposes, 22, 3, 3))
            hands = np.broadcast_to(self._hands_mean_matrix,
                                    (nposes, 30, 3, 3))
            matrix_poses = np.concatenate([body, hands], axis=1)
        else:
            raise NotImplementedError("Could not parse the poses.")

        if trans is None:
            trans_all = np.zeros((nposes, 3), np.float32)
            trans = np.zeros(save_shape + (3,), np.float32)
        else:
            trans = np.asarray(trans, np.float64)
            trans_all = trans.reshape((nposes, 3))

        import jax.numpy as jnp
        if betas is None:
            betas = np.zeros((10,), np.float32)
        joints52, verts = self.model.forward_matrices(
            jnp.asarray(matrix_poses, jnp.float32),
            jnp.asarray(betas, jnp.float32),
            jnp.asarray(trans_all, jnp.float32), return_vertices=True)
        if jointstype == "vertices":
            out = np.asarray(verts, np.float64)
        else:
            # append the 21 vertex keypoints (face/feet/fingertips) to the
            # 52 LBS joints (reference vertex_joint_selector.py:73-77)
            extra_ids = smplh_extra_vertex_ids % verts.shape[1]
            extra = np.asarray(verts, np.float64)[:, extra_ids]
            out = np.concatenate([np.asarray(joints52, np.float64), extra],
                                 axis=1)
        out = out.reshape(save_shape + out.shape[1:])
        return smplh_to(jointstype, out, trans)

    def inverse(self, joints):
        raise NotImplementedError("Cannot inverse SMPLH layer.")


def smplh_to(jointstype: str, data: np.ndarray,
             trans: np.ndarray) -> np.ndarray:
    """Topology remap + root-centering (reference smplh.py:136-175)."""
    if "mmm" in jointstype:
        data = data[..., smplh_indexes["mmm"], :]
        if jointstype == "mmm":
            data = data * smplh_to_mmm_scaling_factor
        if jointstype == "smplmmm":
            pass
        elif jointstype in ("mmm", "mmmns"):
            data = data[..., [1, 2, 0]]
            data = data.copy()
            data[..., 2] = -data[..., 2]
    elif jointstype == "smplnh":
        data = data[..., smplh_indexes["smplnh"], :]
    elif jointstype in ("smplh", "vertices"):
        pass
    else:
        raise NotImplementedError(f"SMPLH to {jointstype} is not implemented.")

    if jointstype != "vertices":
        # center on the root of the first frame
        root_joint_idx = get_root_idx(jointstype)
        shift = trans[..., 0, :] - data[..., 0, root_joint_idx, :]
        data = data + shift[..., None, None, :]
    return data
