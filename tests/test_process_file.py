"""Golden tests for the forward feature codec (joints -> 263-dim features)
against the reference process_file output, plus round-trip through our
recover_from_ric."""
import os

import jax.numpy as jnp
import numpy as np

from ladiff_tpu.data.humanml.motion_repr import recover_from_ric
from ladiff_tpu.data.humanml.process import process_file
from ladiff_tpu.data.humanml.skeleton import (Skeleton, T2M_KINEMATIC_CHAIN,
                                              T2M_RAW_OFFSETS)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "process_file.npz")


def test_process_file_matches_reference():
    d = np.load(GOLDEN)
    data, glob, pos, lvel = process_file(
        d["joints"].astype(np.float64), 0.002, dataset="humanml3d",
        target_offsets=d["tgt_offsets"])
    assert data.shape == d["data"].shape
    np.testing.assert_allclose(data, d["data"], atol=2e-4)
    np.testing.assert_allclose(glob, d["glob"], atol=2e-4)


def test_process_recover_roundtrip():
    """features -> recover_from_ric reproduces the canonicalized joints."""
    d = np.load(GOLDEN)
    data, glob, pos, lvel = process_file(
        d["joints"].astype(np.float64), 0.002, dataset="humanml3d",
        target_offsets=d["tgt_offsets"])
    rec = np.asarray(recover_from_ric(jnp.asarray(data)[None], 22))[0]
    # recover reproduces the global (canonical-frame) positions frame by frame
    np.testing.assert_allclose(rec, glob[:-1], atol=5e-3)


def test_skeleton_fk_ik_roundtrip():
    rng = np.random.RandomState(1)
    skel = Skeleton(T2M_RAW_OFFSETS, T2M_KINEMATIC_CHAIN)
    bone_len = np.linspace(0.1, 0.4, 22).astype(np.float32)
    bone_len[0] = 0
    skel.set_offset(T2M_RAW_OFFSETS * bone_len[:, None])
    from ladiff_tpu.data.humanml import quaternion as Q
    aa = np.cumsum(rng.randn(8, 22, 3).astype(np.float32) * 0.05, axis=0)
    quats = np.asarray(Q.axis_angle_to_quaternion(aa))
    root = rng.randn(8, 3).astype(np.float32)
    joints = skel.forward_kinematics(quats, root)
    # IK -> FK round trip must reproduce joints
    q2 = skel.inverse_kinematics(joints, [2, 1, 17, 16])
    joints2 = skel.forward_kinematics(q2, joints[:, 0])
    np.testing.assert_allclose(joints2, joints, atol=1e-3)
