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

# MANO: wrist + 15 finger joints, 3 per finger in index/middle/pinky/ring/
# thumb order (reference smplx MANO, body_models.py:1491-1496)
MANO_PARENTS = np.array(
    [-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14], np.int32)

# FLAME: global + neck + jaw/left-eye/right-eye hanging off the neck
# (reference body_models.py:1768-1772, NECK_IDX=0 meaning neck is the
# first articulated joint after the global root)
FLAME_PARENTS = np.array([-1, 0, 1, 1, 1], np.int32)


@dataclasses.dataclass
class SMPLModel:
    v_template: jnp.ndarray     # [V, 3]
    shapedirs: jnp.ndarray      # [V, 3, n_betas]
    posedirs: jnp.ndarray       # [(J-1)*9, V*3]
    J_regressor: jnp.ndarray    # [J, V]
    weights: jnp.ndarray        # [V, J]
    parents: np.ndarray         # [J]
    hands_mean: Optional[np.ndarray] = None  # [30, 3] aa, SMPLH only (L;R)
    # MANO extras (reference body_models.py:1589-1604): PCA basis over the
    # 45-d finger pose and the dataset mean hand pose
    hand_components: Optional[np.ndarray] = None  # [45, 45]
    hand_mean: Optional[np.ndarray] = None        # [45] aa, one hand
    # FLAME extras (body_models.py:1915-1932): expression blendshapes split
    # off the tail of the shape space
    expr_dirs: Optional[jnp.ndarray] = None       # [V, 3, n_expr]

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
            # on-disk posedirs is [V, 3, (J-1)*9]; forward wants
            # [(J-1)*9, V*3] — flatten the (v, c) axes into COLUMNS first,
            # then transpose (reshape(-1, V*3).T would garble the order)
            posedirs=arr(np.asarray(d["posedirs"]).reshape(
                np.asarray(d["v_template"]).size, -1).T
                if np.asarray(d["posedirs"]).ndim == 3
                else d["posedirs"]),
            J_regressor=arr(d["J_regressor"]),
            weights=arr(d["weights"]),
            parents=parents,
            hands_mean=hands_mean,
        )

    @classmethod
    def load_mano(cls, path: str) -> Optional["SMPLModel"]:
        """Load a MANO_RIGHT/LEFT pickle (reference body_models.py:1549-1604).

        Keeps the full 45x45 ``hands_components`` PCA basis and the mean
        hand pose; ``forward_mano`` applies the PCA mapping + mean add.
        """
        base = cls.load(path)
        if base is None:
            return None
        if path.endswith(".npz"):
            d = dict(np.load(path, allow_pickle=True))
        else:
            with open(path, "rb") as f:
                d = pickle.load(f, encoding="latin1")
        return dataclasses.replace(
            base,
            hand_components=np.asarray(d["hands_components"], np.float32),
            hand_mean=np.asarray(d["hands_mean"], np.float32).reshape(-1),
        )

    @classmethod
    def load_flame(cls, path: str,
                   num_expression_coeffs: int = 10) -> Optional["SMPLModel"]:
        """Load a FLAME pickle/npz (reference body_models.py:1846-1937).

        The FLAME shape space is 300 shape + 100 expression columns in one
        ``shapedirs``; the first 10 stay shape blendshapes, and the
        expression block is split into ``expr_dirs`` (reference
        body_models.py:1915-1932, incl. the 10+10 reduced-model fallback).
        """
        base = cls.load(path)
        if base is None:
            return None
        if path.endswith(".npz"):
            d = dict(np.load(path, allow_pickle=True))
        else:
            with open(path, "rb") as f:
                d = pickle.load(f, encoding="latin1")
        shapedirs = np.asarray(d["shapedirs"], np.float64)
        if shapedirs.shape[-1] < 300 + 100:   # reduced 10+10 model
            expr_start, expr_end = 10, 10 + min(num_expression_coeffs, 10)
        else:
            expr_start = 300
            expr_end = 300 + min(num_expression_coeffs, 100)
        return dataclasses.replace(
            base,
            expr_dirs=jnp.asarray(shapedirs[..., expr_start:expr_end],
                                  jnp.float32),
        )

    @classmethod
    def synthetic(cls, n_verts: int = 128, seed: int = 0,
                  model_type: str = "smpl") -> "SMPLModel":
        rng = np.random.RandomState(seed)
        parents = {"smpl": SMPL_PARENTS, "smplh": SMPLH_PARENTS,
                   "smplx": SMPLX_PARENTS, "mano": MANO_PARENTS,
                   "flame": FLAME_PARENTS}[model_type]
        J = len(parents)
        v = rng.randn(n_verts, 3).astype(np.float32) * 0.3
        reg = rng.rand(J, n_verts).astype(np.float32)
        reg /= reg.sum(1, keepdims=True)
        w = rng.rand(n_verts, J).astype(np.float32) ** 4
        w /= w.sum(1, keepdims=True)
        hand_components = hand_mean = expr_dirs = None
        if model_type == "mano":
            # random orthonormal PCA basis over the 45-d finger pose
            q, _ = np.linalg.qr(rng.randn(45, 45))
            hand_components = q.astype(np.float32)
            hand_mean = (rng.randn(45) * 0.05).astype(np.float32)
        if model_type == "flame":
            expr_dirs = jnp.asarray(rng.randn(n_verts, 3, 10) * 0.01,
                                    dtype=jnp.float32)
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
            hand_components=hand_components,
            hand_mean=hand_mean,
            expr_dirs=expr_dirs,
        )

    # ------------------------------------------------------------------
    def forward(self, pose_aa: jax.Array, betas: jax.Array,
                trans: Optional[jax.Array] = None,
                return_vertices: bool = False,
                expression: Optional[jax.Array] = None):
        """LBS forward from axis-angle pose [T, J, 3] (betas [10],
        trans [T, 3]).  Returns joints [T, J, 3] (+ vertices)."""
        rot = quaternion_to_matrix(
            axis_angle_to_quaternion(pose_aa))                # [T, J, 3, 3]
        return self.forward_matrices(rot, betas, trans,
                                     return_vertices=return_vertices,
                                     expression=expression)

    def forward_mano(self, global_orient: jax.Array, hand_pose: jax.Array,
                     betas: jax.Array, trans: Optional[jax.Array] = None,
                     use_pca: bool = True, flat_hand_mean: bool = False,
                     return_vertices: bool = False):
        """MANO forward (reference body_models.py:1646-1700).

        global_orient: [T, 3] aa; hand_pose: [T, P] PCA coords (P<=45) when
        ``use_pca`` else [T, 45] aa; full pose = [global; hand] + pose_mean
        where pose_mean = [0; hands_mean] unless ``flat_hand_mean``.
        """
        if use_pca:
            comps = jnp.asarray(self.hand_components[:hand_pose.shape[-1]])
            hand_pose = jnp.einsum("bi,ij->bj", hand_pose, comps)
        if not flat_hand_mean and self.hand_mean is not None:
            hand_pose = hand_pose + jnp.asarray(self.hand_mean)
        full = jnp.concatenate([global_orient, hand_pose], axis=-1)
        return self.forward(full.reshape(full.shape[0], -1, 3), betas, trans,
                            return_vertices=return_vertices)

    def forward_flame(self, global_orient: jax.Array, neck_pose: jax.Array,
                      jaw_pose: jax.Array, leye_pose: jax.Array,
                      reye_pose: jax.Array, betas: jax.Array,
                      expression: Optional[jax.Array] = None,
                      trans: Optional[jax.Array] = None,
                      return_vertices: bool = False):
        """FLAME forward (reference body_models.py:1960-2040): full pose is
        [global; neck; jaw; leye; reye] aa and expression coefficients blend
        through ``expr_dirs`` exactly like shape betas."""
        full = jnp.stack(
            [global_orient, neck_pose, jaw_pose, leye_pose, reye_pose],
            axis=1)                                           # [T, 5, 3]
        return self.forward(full, betas, trans,
                            return_vertices=return_vertices,
                            expression=expression)

    def forward_matrices(self, rot: jax.Array, betas: jax.Array,
                         trans: Optional[jax.Array] = None,
                         return_vertices: bool = False,
                         expression: Optional[jax.Array] = None):
        """LBS forward from rotation matrices.

        rot: [T, J, 3, 3]; betas: [10]; trans: [T, 3].
        Returns joints [T, J, 3] (and vertices [T, V, 3] if requested).
        """
        T = rot.shape[0]
        J = self.num_joints
        v_shaped = self.v_template + jnp.einsum(
            "vdb,b->vd", self.shapedirs, betas)
        if expression is not None and self.expr_dirs is not None:
            v_shaped = v_shaped + jnp.einsum(
                "vdb,b->vd", self.expr_dirs[..., :expression.shape[-1]],
                expression)
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
