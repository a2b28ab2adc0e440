"""Rotation2xyz parity vs the reference torch implementation.

Drives the ACTUAL reference module
(/root/reference/src/ladiff/transforms/rotation2xyz.py:10-114 on top of the
vendored smplx stack at src/ladiff/smplx/) against our JAX rebuild using a
shared random SMPL pickle — both jointstypes the model path consumes, with
ragged masks and nonzero translations."""
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# the reference transforms package does `from smplx import SMPLLayer` /
# `from smplx.lbs import vertices2joints`; alias its own vendored copy (a
# pip smplx is not installed).  Force-override: other test modules install
# a do-nothing smplx stub that breaks the real import chain.
sys.path.insert(0, "/root/reference/src")
# clip is genuinely uninstalled (guard-checked; see tests/_stubs.py).
from _stubs import stub_missing  # noqa: E402

stub_missing("clip")
import ladiff.smplx as _vendored_smplx  # noqa: E402

# Force-override (not setdefault): this aliases the reference's REAL vendored
# smplx code over any empty stub installed earlier (test_transforms.py).  It
# cannot poison later imports — no pip smplx exists, and the vendored module
# is the genuine implementation, strictly richer than the stub it replaces.
sys.modules["smplx"] = _vendored_smplx
sys.modules["smplx.lbs"] = _vendored_smplx.lbs
for _mod in ("ladiff.transforms.smpl", "ladiff.transforms.rotation2xyz",
             "ladiff.transforms"):
    sys.modules.pop(_mod, None)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ladiff_tpu.smpl.body_model import SMPL_PARENTS, SMPLModel  # noqa: E402
from ladiff_tpu.transforms.rotation2xyz import (  # noqa: E402
    Rotation2xyz, rotation_6d_to_matrix_jnp)

# smplx's VertexJointSelector indexes template vertices up to id 6787, so
# the random model must carry the real SMPL vertex count
N_VERTS = 6890


def _write_random_smpl(dirpath, seed=0):
    """Random-but-valid SMPL_NEUTRAL.pkl + J_regressor_extra.npy that both
    the vendored smplx loader and SMPLModel.load accept."""
    rng = np.random.RandomState(seed)
    reg = rng.rand(24, N_VERTS).astype(np.float64)
    reg /= reg.sum(1, keepdims=True)
    w = rng.rand(N_VERTS, 24).astype(np.float64) ** 4
    w /= w.sum(1, keepdims=True)
    kintree = np.stack([SMPL_PARENTS.astype(np.int64),
                        np.arange(24, dtype=np.int64)])
    kintree[0, 0] = 0  # both loaders force parents[0] = -1 themselves
    data = {
        "v_template": rng.randn(N_VERTS, 3).astype(np.float64) * 0.3,
        "shapedirs": rng.randn(N_VERTS, 3, 10).astype(np.float64) * 0.01,
        "posedirs": rng.randn(N_VERTS, 3, 207).astype(np.float64) * 0.001,
        "J_regressor": reg,
        "weights": w,
        "kintree_table": kintree,
        "f": rng.randint(0, N_VERTS, (64, 3)).astype(np.int64),
    }
    with open(dirpath / "SMPL_NEUTRAL.pkl", "wb") as f:
        pickle.dump(data, f)
    np.save(dirpath / "J_regressor_extra.npy",
            (rng.rand(9, N_VERTS) / N_VERTS).astype(np.float64))
    return dirpath


def _random_feats(rng, B, T):
    """[B, T, 150] rot6d+trans features in the reference channel-major
    layout (feature c*25+v belongs to channel c of node v)."""
    x = rng.randn(B, 25, 6, T).astype(np.float32) * 0.5
    x[:, 24, :3] = rng.randn(B, 3, T) * 0.2  # translation node
    # feats.view(B,T,6,25).permute(0,3,2,1) must reproduce x
    return x.transpose(0, 3, 2, 1).reshape(B, T, 150), x


def test_rot6d_to_matrix_jnp_matches_numpy():
    from ladiff_tpu.transforms.geometry import rotation_6d_to_matrix

    rng = np.random.RandomState(0)
    d6 = rng.randn(4, 7, 6).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(rotation_6d_to_matrix_jnp(jnp.asarray(d6))),
        rotation_6d_to_matrix(d6), atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("jointstype,vertstrans",
                         [("smpl", True), ("vertices", False)])
def test_rotation2xyz_matches_reference(tmp_path, jointstype, vertstrans):
    """Both consumed configurations (reference ladiff.py:151-173):
    feats2joints_eval = (smpl, vertstrans=True),
    feats2joints = (vertices, vertstrans=False)."""
    from ladiff.transforms.rotation2xyz import Rotation2xyz as RefRot2xyz

    _write_random_smpl(tmp_path)
    B, T = 2, 5
    rng = np.random.RandomState(3)
    feats, x_ref_layout = _random_feats(rng, B, T)
    mask = np.ones((B, T), bool)
    mask[1, 3:] = False  # ragged sample

    with torch.no_grad():
        ref = RefRot2xyz(smpl_path=str(tmp_path))
        out_t = ref(torch.tensor(x_ref_layout), mask=torch.tensor(mask),
                    pose_rep="rot6d", glob=True, translation=True,
                    jointstype=jointstype, vertstrans=vertstrans,
                    betas=None, beta=0, glob_rot=None,
                    get_rotations_back=False)
        # reference layout [B, J, 3, T] -> batch-first [B, T, J, 3]
        out_t = out_t.permute(0, 3, 1, 2).numpy()

    ours = Rotation2xyz(
        SMPLModel.load(str(tmp_path / "SMPL_NEUTRAL.pkl")), frame_chunk=0)
    out_j = np.asarray(ours(jnp.asarray(feats), jnp.asarray(mask),
                            jointstype=jointstype, vertstrans=vertstrans))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=2e-4)
    # masked frames: zero + (vertstrans ? translation broadcast : 0), i.e.
    # never NaN despite the zero rot6d rows
    assert np.isfinite(out_j).all()


def test_rotation2xyz_chunked_matches_unchunked():
    model = SMPLModel.synthetic()
    rng = np.random.RandomState(1)
    feats, _ = _random_feats(rng, 2, 8)
    mask = np.ones((2, 8), bool)
    mask[0, 6:] = False
    a = Rotation2xyz(model, frame_chunk=0)
    b = Rotation2xyz(model, frame_chunk=4)   # 16 % 4 == 0: exact chunks
    c = Rotation2xyz(model, frame_chunk=5)   # 16 % 5 != 0: padded + trimmed
    for jt, vt in (("smpl", True), ("vertices", False)):
        ref = np.asarray(a(jnp.asarray(feats), jnp.asarray(mask), jt, vt))
        for r2x in (b, c):
            np.testing.assert_allclose(
                np.asarray(r2x(jnp.asarray(feats), jnp.asarray(mask),
                               jt, vt)),
                ref, atol=1e-5)


def test_action_vae_forward_has_joint_loss():
    """The a2m VAE objective carries the reference's vertex recons_joints
    term (ladiff.py:836-837, LAMBDA_JOINT=1.0 at base.yaml:65)."""
    from ladiff_tpu.models.ladiff import LADiffSystem

    nfeats = 150
    system = LADiffSystem(
        nfeats=nfeats, njoints=24, max_frames=16, latent_dim=(1, 32),
        ff_size=64, num_layers=3, num_heads=4, max_it=0, lad=False,
        condition="action", nclasses=12, vae_type="actor", md_trans=False,
        mean=np.zeros(nfeats, np.float32), std=np.ones(nfeats, np.float32),
        rot2xyz=Rotation2xyz(SMPLModel.synthetic()))
    params = system.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rng.randn(2, 16, nfeats).astype(np.float32)),
        "length": jnp.asarray([16, 10]),
        "mask": jnp.asarray(np.arange(16)[None] < np.array([[16], [10]])),
        "action": jnp.asarray(rng.randint(0, 12, (2, 1))),
    }
    total, (logs, aux) = system.vae_forward(
        params["vae"], batch, jax.random.PRNGKey(1), train=False)
    assert float(logs["recons_joints"]) > 0.0
    assert aux["joints_rst"] is not None
    assert np.isfinite(float(total))
    # gradients flow through the SMPL forward into the VAE
    g = jax.grad(lambda p: system.vae_forward(
        p, batch, jax.random.PRNGKey(1), train=False)[0])(params["vae"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
