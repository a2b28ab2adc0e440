"""Tests for the action-to-motion path: dataset, ActorVae, classifiers,
action metrics, and an end-to-end action-conditioned generation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladiff_tpu.data.a2m import (HumanAct12Dataset, a2m_collate,
                                 axis_angle_to_rot6d,
                                 generate_synthetic_humanact12,
                                 sample_frame_indices)
from ladiff_tpu.metrics.a2m import ActionClassifierMetrics
from ladiff_tpu.models.actor_vae import ActorVae
from ladiff_tpu.models.classifiers import STGCN, MotionDiscriminator


@pytest.fixture(scope="module")
def act12_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("humanact12")
    return generate_synthetic_humanact12(str(root), n_clips=24, seed=0)


def test_rot6d_matches_pytorch3d_convention():
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference/src")
    from ladiff.data.a2m.utils import rotation_conversions as G
    rng = np.random.RandomState(0)
    aa = rng.randn(5, 24, 3).astype(np.float32) * 0.5
    want = G.matrix_to_rotation_6d(
        G.axis_angle_to_matrix(torch.tensor(aa))).numpy()
    got = axis_angle_to_rot6d(aa)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_frame_sampling():
    idx = sample_frame_indices(100, 60)
    assert len(idx) == 60 and idx.max() < 100
    idx = sample_frame_indices(30, 60)  # shorter: repeat last frame
    assert len(idx) == 60 and (idx[30:] == 29).all()


def test_humanact12_dataset_and_collate(act12_root):
    ds = HumanAct12Dataset(act12_root, num_frames=60)
    assert len(ds) == 24
    item = ds[0]
    assert item["motion"].shape == (60, 150)
    assert 0 <= item["action"] < 12
    batch = a2m_collate([ds[i] for i in range(4)], num_frames=60)
    assert batch["motion"].shape == (4, 60, 150)
    assert batch["action"].shape == (4, 1)
    assert batch["mask"].shape == (4, 60)


def test_actor_vae_roundtrip():
    vae = ActorVae(nfeats=150, latent_dim=(1, 32), ff_size=64, num_layers=3,
                   num_heads=4, dropout=0.0)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 60, 150))
    lengths = jnp.array([60, 40])
    params = vae.init(jax.random.PRNGKey(1), feats, lengths,
                      jax.random.PRNGKey(2))
    out, z, mu, logvar, lat_valid = vae.apply(params, feats, lengths,
                                              jax.random.PRNGKey(3))
    assert out.shape == (2, 60, 150)
    assert z.shape == (2, 1, 32)
    assert np.abs(np.asarray(out[1, 40:])).max() == 0.0


def test_gru_classifier_matches_reference():
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference/src")
    from ladiff.models.architectures.humanact12_gru import (
        MotionDiscriminator as RefDisc)

    ref = RefDisc(input_size=24, hidden_size=16, hidden_layer=2,
                  output_size=12).eval()
    sd = {k: v for k, v in ref.state_dict().items()}
    P = {}
    for layer in (0, 1):
        P[f"gru{layer}_w_ih"] = sd[f"recurrent.weight_ih_l{layer}"].numpy()
        P[f"gru{layer}_w_hh"] = sd[f"recurrent.weight_hh_l{layer}"].numpy()
        P[f"gru{layer}_b_ih"] = sd[f"recurrent.bias_ih_l{layer}"].numpy()
        P[f"gru{layer}_b_hh"] = sd[f"recurrent.bias_hh_l{layer}"].numpy()
    P["linear1"] = {"kernel": sd["linear1.weight"].T.numpy(),
                    "bias": sd["linear1.bias"].numpy()}
    P["linear2"] = {"kernel": sd["linear2.weight"].T.numpy(),
                    "bias": sd["linear2.bias"].numpy()}
    params = jax.tree.map(jnp.asarray, P)

    ours = MotionDiscriminator(input_size=24, hidden_size=16, hidden_layer=2,
                               output_size=12)
    rng = np.random.RandomState(1)
    B, T = 3, 20
    x = rng.randn(B, T, 24).astype(np.float32)
    lengths = np.array([20, 15, 8])
    # reference takes [B, J, F, T]; zero hidden for comparability
    xt = torch.tensor(x.transpose(0, 2, 1)[:, :, None, :])  # B, 24, 1, T
    with torch.no_grad():
        want = ref(xt, lengths=torch.tensor(lengths),
                   hidden_unit=torch.zeros(2, B, 16)).numpy()
    _, logits = ours.apply({"params": params}, jnp.asarray(x),
                           jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-5)


def test_stgcn_runs():
    model = STGCN(in_channels=6, num_class=40, num_nodes=24)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 60, 24, 6))
    params = model.init(jax.random.PRNGKey(1), x)
    feat, logits = model.apply(params, x)
    assert feat.shape == (2, 256)
    assert logits.shape == (2, 40)
    assert np.isfinite(np.asarray(logits)).all()


def _fake_kintree(path):
    """kintree_table.pkl with the standard SMPL parent array, in the layout
    the reference Graph expects (uestc_stgcn.py:261-267)."""
    import pickle
    parents = np.full(24, -1)
    from ladiff_tpu.models.classifiers import SMPL_EDGES
    for p, c in SMPL_EDGES:
        parents[c] = p
    kt = np.stack([parents, np.arange(24)])
    with open(path, "wb") as f:
        pickle.dump(kt, f)
    return path


def test_stgcn_matches_reference(tmp_path):
    """Converter + full-forward parity vs the reference UESTC classifier
    (uestc_stgcn.py:8-110), including the channel-major input slicing the
    reference applies at ladiff.py:1475-1483 and randomized BN running
    stats (a frozen eval-mode classifier is an affine BN)."""
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference/src")
    from ladiff.models.architectures.uestc_stgcn import STGCN as RefSTGCN

    from ladiff_tpu.models.classifiers import (load_stgcn_checkpoint,
                                               stgcn_input_from_feats)

    kintree = _fake_kintree(str(tmp_path / "kintree_table.pkl"))
    torch.manual_seed(3)
    ref = RefSTGCN(in_channels=6, num_class=40, kintree_path=kintree,
                   graph_args={"layout": "smpl", "strategy": "spatial"},
                   edge_importance_weighting=True)
    # randomize BN running stats so conversion of mean/var is actually tested
    rs = np.random.RandomState(5)
    for m in ref.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(torch.tensor(
                rs.randn(m.num_features).astype(np.float32) * 0.2))
            m.running_var.copy_(torch.tensor(
                (0.5 + rs.rand(m.num_features)).astype(np.float32)))
    ref = ref.eval()

    ckpt = str(tmp_path / "uestc_rot6d_stgcn.tar")
    torch.save(ref.state_dict(), ckpt)
    params = load_stgcn_checkpoint(ckpt)
    assert params is not None
    ours = STGCN(in_channels=6, num_class=40, num_nodes=24)

    B, T = 3, 40
    feats = rs.randn(B, T, 150).astype(np.float32)  # rot6d + translation
    # reference side: slicing exactly as allsplit_step does
    motion = (torch.tensor(feats).view(B, T, 6, 25)
              .permute(0, 3, 2, 1)[:, :-1])
    with torch.no_grad():
        out = ref(motion)
    want_feat = out["features"].numpy()
    want_logits = out["yhat"].numpy()

    got_feat, got_logits = ours.apply(
        {"params": params}, stgcn_input_from_feats(jnp.asarray(feats)))
    np.testing.assert_allclose(np.asarray(got_feat), want_feat, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits, atol=2e-4)


def test_action_metrics_protocol():
    rng = np.random.RandomState(0)
    m = ActionClassifierMetrics(num_labels=12, diversity_times=20,
                                multimodality_times=3)
    labels = rng.randint(0, 12, 64)
    feats = rng.randn(64, 30).astype(np.float32)
    logits = np.eye(12)[labels] * 10.0  # perfect classifier
    m.update(labels, feats, logits, feats, logits, [60] * 64)
    out = m.compute()
    assert out["accuracy"] == 1.0 and out["gt_accuracy"] == 1.0
    assert out["FID"] < 1e-6  # identical feature sets
    assert out["Diversity"] > 0 and out["Multimodality"] > 0
