"""End-to-end action-conditioned evaluation: action labels -> diffusion ->
ActorVae decode -> GRU classifier -> action metrics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladiff_tpu.data.a2m import HumanAct12Dataset, generate_synthetic_humanact12
from ladiff_tpu.evaluation.a2m_eval import run_a2m_eval
from ladiff_tpu.metrics.a2m import ActionClassifierMetrics
from ladiff_tpu.models.classifiers import MotionDiscriminator
from ladiff_tpu.models.ladiff import LADiffSystem
from ladiff_tpu.smpl.body_model import SMPLModel
from ladiff_tpu.transforms.rotation2xyz import Rotation2xyz

NFEATS = 150  # 25 joints x rot6d


def test_a2m_eval_pipeline(tmp_path):
    root = generate_synthetic_humanact12(str(tmp_path), n_clips=16, seed=0)
    ds = HumanAct12Dataset(root, num_frames=60)

    system = LADiffSystem(
        nfeats=NFEATS, njoints=24, max_frames=60, latent_dim=(1, 32),
        ff_size=64, num_layers=3, num_heads=4, max_it=0, lad=False,
        condition="action", nclasses=12, vae_type="actor",
        num_inference_timesteps=2, md_trans=False,
        mean=np.zeros(NFEATS, np.float32), std=np.ones(NFEATS, np.float32),
        rot2xyz=Rotation2xyz(SMPLModel.synthetic()))
    params = system.init_params(jax.random.PRNGKey(0))
    vae = system.vae

    # HumanAct12 protocol: the GRU classifies 24x3 SMPL joints (input 72),
    # never raw features (reference gru.py:32-36, ladiff.py:1311-1314)
    clf = MotionDiscriminator(input_size=72, hidden_size=16,
                              hidden_layer=2, output_size=12)
    clf_params = clf.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 60, 72)), jnp.array([60]))["params"]

    metrics = ActionClassifierMetrics(num_labels=12, diversity_times=8,
                                      multimodality_times=2)
    out = run_a2m_eval(system, vae, params, ds, clf, clf_params, metrics,
                       batch_size=8, num_frames=60)
    for key in ("accuracy", "gt_accuracy", "FID", "gt_FID"):
        assert key in out and np.isfinite(out[key]), (key, out)


def test_a2m_eval_pipeline_stgcn(tmp_path):
    """UESTC-style path: ST-GCN classifier with the reference channel-major
    slicing (24-node smpl graph, translation node dropped)."""
    from ladiff_tpu.models.classifiers import STGCN

    root = generate_synthetic_humanact12(str(tmp_path), n_clips=12, seed=1)
    ds = HumanAct12Dataset(root, num_frames=32)

    system = LADiffSystem(
        nfeats=NFEATS, njoints=24, max_frames=32, latent_dim=(1, 32),
        ff_size=64, num_layers=3, num_heads=4, max_it=0, lad=False,
        condition="action", nclasses=12, vae_type="actor",
        num_inference_timesteps=2, md_trans=False,
        mean=np.zeros(NFEATS, np.float32), std=np.ones(NFEATS, np.float32))
    params = system.init_params(jax.random.PRNGKey(0))

    clf = STGCN(in_channels=6, num_class=12, num_nodes=24)
    clf_params = clf.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 32, 24, 6)))["params"]

    metrics = ActionClassifierMetrics(num_labels=12, diversity_times=6,
                                      multimodality_times=2)
    out = run_a2m_eval(system, system.vae, params, ds, clf, clf_params,
                       metrics, batch_size=6, num_frames=32,
                       classifier_kind="stgcn")
    for key in ("accuracy", "gt_accuracy", "FID", "gt_FID"):
        assert key in out and np.isfinite(out[key]), (key, out)
