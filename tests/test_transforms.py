"""TEMOS transform stack: parity against the reference torch implementation
(/root/reference/src/ladiff/transforms/) and roundtrip invariants."""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# the reference transforms package imports smplx at package-import time.
# smplx is genuinely uninstalled (guard-checked; see tests/_stubs.py), so
# these stubs cannot poison later imports; test_rotation2xyz.py deliberately
# force-overrides them with the reference's real vendored smplx, which is a
# strict superset of what's stubbed here.
from _stubs import stub_missing  # noqa: E402

_smplx = types.ModuleType("smplx")
_smplx.SMPLLayer = object
_smplx_lbs = types.ModuleType("smplx.lbs")
_smplx_lbs.vertices2joints = lambda *a: None
_smplx.lbs = _smplx_lbs
_smplx_bm = types.ModuleType("smplx.body_models")
_smplx_bm.SMPLHLayer = object
stub_missing("smplx", _smplx)
stub_missing("smplx.lbs", _smplx_lbs)
stub_missing("smplx.body_models", _smplx_bm)
sys.path.insert(0, "/root/reference/src")


def _random_rotmats(rng, shape):
    """Random proper rotations via QR."""
    a = rng.randn(*shape, 3, 3)
    q, r = np.linalg.qr(a)
    det = np.linalg.det(q)
    q[..., :, 0] *= det[..., None]
    return q


def test_geometry_matrix_to_axis_angle_roundtrip():
    from ladiff_tpu.transforms.geometry import (axis_angle_to_matrix,
                                                matrix_to_axis_angle)

    rng = np.random.RandomState(0)
    aa = rng.randn(50, 3) * 1.2
    m = axis_angle_to_matrix(aa)
    m2 = axis_angle_to_matrix(matrix_to_axis_angle(m))
    np.testing.assert_allclose(m2, m, atol=1e-6)


def test_geometry_vs_reference_torch():
    import ladiff.utils.rotation_conversions as ref_geo

    from ladiff_tpu.transforms.geometry import (axis_angle_to_matrix,
                                                matrix_to_axis_angle,
                                                matrix_to_rotation_6d,
                                                rotation_6d_to_matrix)

    rng = np.random.RandomState(1)
    aa = rng.randn(20, 3).astype(np.float64)
    want = ref_geo.axis_angle_to_matrix(torch.from_numpy(aa)).numpy()
    got = axis_angle_to_matrix(aa)
    np.testing.assert_allclose(got, want, atol=1e-6)

    m = _random_rotmats(rng, (20,))
    want_aa = ref_geo.matrix_to_axis_angle(torch.from_numpy(m)).numpy()
    got_aa = matrix_to_axis_angle(m)
    # axis-angle is 2π-ambiguous: compare the rotations they encode
    np.testing.assert_allclose(axis_angle_to_matrix(got_aa),
                               axis_angle_to_matrix(want_aa), atol=1e-6)

    d6 = matrix_to_rotation_6d(m)
    want_d6 = ref_geo.matrix_to_rotation_6d(torch.from_numpy(m)).numpy()
    np.testing.assert_allclose(d6, want_d6, atol=1e-8)
    np.testing.assert_allclose(rotation_6d_to_matrix(d6), m, atol=1e-6)


@pytest.mark.parametrize("jointstype", ["mmm", "humanml3d"])
def test_rifke_forward_matches_reference(jointstype):
    from ladiff.transforms.joints2jfeats.rifke import Rifke as RefRifke

    from ladiff_tpu.transforms.joints2jfeats import Rifke

    nj = 21 if jointstype == "mmm" else 22
    rng = np.random.RandomState(2)
    joints = rng.randn(30, nj, 3).astype(np.float64) * 0.5
    ref = RefRifke(jointstype=jointstype, normalization=False)
    want = ref(torch.from_numpy(joints)).numpy()
    got = Rifke(jointstype=jointstype)(joints)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # inverse parity too
    want_inv = ref.inverse(torch.from_numpy(want)).numpy()
    got_inv = Rifke(jointstype=jointstype).inverse(got)
    np.testing.assert_allclose(got_inv, want_inv, rtol=1e-5, atol=1e-6)


def test_rifke_batched_matches_loop():
    from ladiff_tpu.transforms.joints2jfeats import Rifke

    rng = np.random.RandomState(3)
    joints = rng.randn(4, 25, 21, 3) * 0.4
    rifke = Rifke(jointstype="mmm")
    batched = rifke(joints)
    looped = np.stack([rifke(j) for j in joints])
    np.testing.assert_allclose(batched, looped, atol=1e-10)


def _patch_reference_geometry():
    """The reference's temos_utils.matrix_to calls geometry.* conversion
    functions that only exist in its rotation_conversions module (latent
    upstream bug — SMPLVelP/rot6d crashes as shipped); restore the intended
    wiring so we can compare against it."""
    import ladiff.utils.geometry as ref_geo
    import ladiff.utils.rotation_conversions as rc
    for name in ("matrix_to_rotation_6d", "rotation_6d_to_matrix",
                 "matrix_to_axis_angle", "axis_angle_to_matrix",
                 "matrix_to_quaternion", "quaternion_to_matrix",
                 "axis_angle_to_quaternion"):
        if not hasattr(ref_geo, name):
            setattr(ref_geo, name, getattr(rc, name))


@pytest.mark.parametrize("canonicalize", [False, True])
def test_smplvelp_matches_reference(canonicalize):
    _patch_reference_geometry()
    from ladiff.transforms.rots2rfeats.smplvelp import SMPLVelP as RefVelP
    from ladiff.transforms.smpl import \
        RotTransDatastruct as RefRotTransDatastruct

    from ladiff_tpu.transforms.rots2rfeats import SMPLVelP
    from ladiff_tpu.transforms.smpl import RotTransDatastruct

    rng = np.random.RandomState(4)
    rots = _random_rotmats(rng, (18, 22))
    trans = rng.randn(18, 3).astype(np.float64) * 0.3

    ref = RefVelP(normalization=False, canonicalize=canonicalize)
    want = ref(RefRotTransDatastruct(
        rots=torch.from_numpy(rots), trans=torch.from_numpy(trans))).numpy()
    ours = SMPLVelP(canonicalize=canonicalize)
    got = ours(RotTransDatastruct(rots=rots, trans=trans))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_smplvelp_inverse_roundtrip():
    from ladiff_tpu.transforms.rots2rfeats import SMPLVelP
    from ladiff_tpu.transforms.smpl import RotTransDatastruct

    rng = np.random.RandomState(5)
    rots = _random_rotmats(rng, (12, 22))
    trans = rng.randn(12, 3) * 0.3
    trans[..., :2] -= trans[..., [0], :2]  # XY trajectory starts at 0

    velp = SMPLVelP()
    feats = velp(RotTransDatastruct(rots=rots, trans=trans))
    back = velp.inverse(feats)
    np.testing.assert_allclose(back.trans, trans, atol=1e-6)
    np.testing.assert_allclose(back.rots, rots, atol=1e-6)


def test_smplh_topology_map_matches_reference():
    """smplh_to index tables and conventions vs the reference function."""
    from ladiff.transforms.rots2joints.smplh import smplh_to as ref_smplh_to

    from ladiff_tpu.transforms.rots2joints import smplh_to

    rng = np.random.RandomState(6)
    data = rng.randn(2, 9, 73, 3)  # 52 joints + 21 vertex keypoints
    trans = rng.randn(2, 9, 3)
    for jt in ["mmm", "mmmns", "smplnh", "smplh"]:
        want = ref_smplh_to(jt, torch.from_numpy(data.copy()),
                            torch.from_numpy(trans.copy())).numpy()
        got = smplh_to(jt, data.copy(), trans.copy())
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                   err_msg=jt)


def test_smpl_datastruct_lazy_chain():
    from ladiff_tpu.transforms import (RotTransDatastruct, SMPLTransform,
                                       SMPLVelP)

    rng = np.random.RandomState(7)
    rots = _random_rotmats(rng, (6, 22))
    trans = rng.randn(6, 3) * 0.2

    tf = SMPLTransform()  # synthetic SMPLH body (asset absent in CI)
    rfeats = SMPLVelP()(RotTransDatastruct(rots=rots, trans=trans))
    ds = tf.Datastruct(features=rfeats)
    assert ds.rfeats is rfeats
    assert ds.rots.rots.shape == (6, 22, 3, 3)
    joints = ds.joints
    assert joints.shape[:2] == (6, 21)  # mmm topology
    jfeats = ds.jfeats
    assert jfeats.shape == (6, 1 + 20 * 3 + 3)
    assert ds.joints_ is not None  # cached

    # collate pads variable-length datastructs
    batch = tf.collate([tf.Datastruct(features=rfeats),
                        tf.Datastruct(features=rfeats[:4])])
    assert batch.features.shape == (2, 6, rfeats.shape[-1])
    assert np.all(batch.features[1, 4:] == 0)


def test_rot_identity_transform():
    from ladiff_tpu.transforms import RotIdentityTransform

    rng = np.random.RandomState(8)
    ds = RotIdentityTransform().Datastruct(
        rots=rng.randn(5, 22, 3, 3), trans=rng.randn(5, 3))
    assert len(ds) == 5
    assert list(ds.datakeys) == ["rots", "trans"]
