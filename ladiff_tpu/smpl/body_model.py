"""SMPL body model: linear blend skinning in JAX.

Compact JAX rebuild of the reference's vendored smplx stack
(/root/reference/src/ladiff/smplx/body_models.py + lbs.py, ~3.4k LoC):
shape blendshapes, pose blendshapes, joint regression, kinematic-chain
rigid transforms and LBS, fully differentiable and jittable (the fitting
entry point optimizes through it).

Model data (shapedirs, posedirs, J_regressor, weights, v_template,
kintree) loads from a standard SMPL ``.pkl``/``.npz`` under
``deps/smpl_models/smpl``; without it, ``SMPLModel.synthetic`` builds a
small random-but-consistent model so the code path stays testable.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ladiff_tpu.data.humanml.quaternion import (axis_angle_to_quaternion,
                                                quaternion_to_matrix)

__all__ = ["SMPLModel"]

SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
     18, 19, 20, 21], np.int32)

# SMPLH: 22 body joints (SMPL's minus the two hand roots) + 15 joints per
# hand, three per finger in index/middle/pinky/ring/thumb order
SMPLH_PARENTS = np.concatenate([
    SMPL_PARENTS[:22],
    np.array([20, 22, 23, 20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35,
              21, 37, 38, 21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50],
             np.int32),
])

# SMPLX: SMPLH's 22 body joints + jaw/left_eye/right_eye (children of the
# head, 15) + the same two 15-joint hands shifted by the 3 face joints —
# 55 LBS joints
_smplh_hands = SMPLH_PARENTS[22:]
SMPLX_PARENTS = np.concatenate([
    SMPL_PARENTS[:22],
    np.array([15, 15, 15], np.int32),           # jaw, leye, reye
    np.where(_smplh_hands >= 22, _smplh_hands + 3, _smplh_hands),
]).astype(np.int32)


@dataclasses.dataclass
class SMPLModel:
    v_template: jnp.ndarray     # [V, 3]
    shapedirs: jnp.ndarray      # [V, 3, n_betas]
    posedirs: jnp.ndarray       # [(J-1)*9, V*3]
    J_regressor: jnp.ndarray    # [J, V]
    weights: jnp.ndarray        # [V, J]
    parents: np.ndarray         # [J]
    hands_mean: Optional[np.ndarray] = None  # [30, 3] aa, SMPLH only (L;R)

    @property
    def num_joints(self) -> int:
        return int(self.J_regressor.shape[0])

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, path: str) -> Optional["SMPLModel"]:
        """Load a standard SMPL pickle/npz (e.g. SMPL_NEUTRAL.pkl)."""
        if not os.path.exists(path):
            return None
        if path.endswith(".npz"):
            d = dict(np.load(path, allow_pickle=True))
        else:
            with open(path, "rb") as f:
                d = pickle.load(f, encoding="latin1")
        def arr(x):
            if hasattr(x, "todense"):
                x = np.asarray(x.todense())
            return jnp.asarray(np.asarray(x, np.float64), jnp.float32)
        if "kintree_table" in d:
            parents = np.asarray(d["kintree_table"][0], np.int64)
            parents[0] = -1
        else:
            parents = SMPL_PARENTS
        hands_mean = None
        if "hands_meanl" in d:  # SMPLH
            hands_mean = np.concatenate([
                np.asarray(d["hands_meanl"], np.float64),
                np.asarray(d["hands_meanr"], np.float64),
            ]).reshape(30, 3).astype(np.float32)
        return cls(
            v_template=arr(d["v_template"]),
            shapedirs=arr(np.asarray(d["shapedirs"])[..., :10]),
            posedirs=arr(np.asarray(d["posedirs"]).reshape(
                -1, np.asarray(d["v_template"]).size).T
                if np.asarray(d["posedirs"]).ndim == 3
                else d["posedirs"]),
            J_regressor=arr(d["J_regressor"]),
            weights=arr(d["weights"]),
            parents=parents,
            hands_mean=hands_mean,
        )

    @classmethod
    def synthetic(cls, n_verts: int = 128, seed: int = 0,
                  model_type: str = "smpl") -> "SMPLModel":
        rng = np.random.RandomState(seed)
        parents = {"smpl": SMPL_PARENTS, "smplh": SMPLH_PARENTS,
                   "smplx": SMPLX_PARENTS}[model_type]
        J = len(parents)
        v = rng.randn(n_verts, 3).astype(np.float32) * 0.3
        reg = rng.rand(J, n_verts).astype(np.float32)
        reg /= reg.sum(1, keepdims=True)
        w = rng.rand(n_verts, J).astype(np.float32) ** 4
        w /= w.sum(1, keepdims=True)
        return cls(
            v_template=jnp.asarray(v),
            shapedirs=jnp.asarray(rng.randn(n_verts, 3, 10) * 0.01,
                                  dtype=jnp.float32),
            posedirs=jnp.asarray(rng.randn((J - 1) * 9, n_verts * 3) * 0.001,
                                 dtype=jnp.float32),
            J_regressor=jnp.asarray(reg),
            weights=jnp.asarray(w),
            parents=parents,
            hands_mean=(np.zeros((30, 3), np.float32)
                        if model_type in ("smplh", "smplx") else None),
        )

    # ------------------------------------------------------------------
    def forward(self, pose_aa: jax.Array, betas: jax.Array,
                trans: Optional[jax.Array] = None,
                return_vertices: bool = False):
        """LBS forward from axis-angle pose [T, J, 3] (betas [10],
        trans [T, 3]).  Returns joints [T, J, 3] (+ vertices)."""
        rot = quaternion_to_matrix(
            axis_angle_to_quaternion(pose_aa))                # [T, J, 3, 3]
        return self.forward_matrices(rot, betas, trans,
                                     return_vertices=return_vertices)

    def forward_matrices(self, rot: jax.Array, betas: jax.Array,
                         trans: Optional[jax.Array] = None,
                         return_vertices: bool = False):
        """LBS forward from rotation matrices.

        rot: [T, J, 3, 3]; betas: [10]; trans: [T, 3].
        Returns joints [T, J, 3] (and vertices [T, V, 3] if requested).
        """
        T = rot.shape[0]
        J = self.num_joints
        v_shaped = self.v_template + jnp.einsum(
            "vdb,b->vd", self.shapedirs, betas)
        j_rest = self.J_regressor @ v_shaped                  # [J, 3]

        # pose blendshapes from non-root rotations
        ident = jnp.eye(3)
        pose_feat = (rot[:, 1:] - ident).reshape(T, -1)       # [T, (J-1)*9]
        v_posed = v_shaped[None] + (pose_feat @ self.posedirs).reshape(
            T, -1, 3)

        # rigid transforms down the kinematic chain
        rel_j = j_rest.at[1:].add(-j_rest[self.parents[1:]])  # bone vectors

        def make_tf(R, t):
            tf = jnp.zeros(R.shape[:-2] + (4, 4))
            tf = tf.at[..., :3, :3].set(R)
            tf = tf.at[..., :3, 3].set(t)
            return tf.at[..., 3, 3].set(1.0)

        transforms = [make_tf(rot[:, 0], jnp.broadcast_to(rel_j[0], (T, 3)))]
        for j in range(1, J):
            local = make_tf(rot[:, j], jnp.broadcast_to(rel_j[j], (T, 3)))
            transforms.append(transforms[self.parents[j]] @ local)
        A = jnp.stack(transforms, axis=1)                     # [T, J, 4, 4]

        joints = A[..., :3, 3]                                # [T, J, 3]
        if trans is not None:
            joints = joints + trans[:, None, :]
        if not return_vertices:
            return joints

        # skinning-relative transforms: subtract the rest-pose joint offset
        j_h = jnp.pad(j_rest, ((0, 0), (0, 1)))               # [J, 4]
        correction = jnp.einsum("tjJk,jk->tjJ", A, j_h)       # A @ [j_rest;0]
        A_skin = A.at[..., :3, 3].add(-correction[..., :3])
        W = self.weights                                      # [V, J]
        Tmat = jnp.einsum("vj,tjab->tvab", W, A_skin)         # [T, V, 4, 4]
        v_h = jnp.pad(v_posed, ((0, 0), (0, 0), (0, 1)),
                      constant_values=1.0)
        verts = jnp.einsum("tvab,tvb->tva", Tmat, v_h)[..., :3]
        if trans is not None:
            verts = verts + trans[:, None, :]
        return joints, verts
