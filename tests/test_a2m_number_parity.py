"""End-to-end reported-metric-NUMBER parity for the ACTION benchmark.

Same recipe as tests/test_eval_number_parity.py, for the a2m branch: both
sides consume identical frozen batches, identical converted random weights
(ActorVae + action-conditioned denoiser + the 72-input GRU classifier + a
random-but-valid SMPL model), identical injected DDIM noise, and identically
seeded diversity/shuffle draws; then

  * the torch side replicates ``a2m_eval``
    (/root/reference/src/ladiff/models/modeltype/ladiff.py:1284-1326)
    driving the ACTUAL reference modules — ActorVae (actor_vae.py),
    LADiffDenoiser condition='action' (ladiff_denoiser.py), Rotation2xyz on
    the vendored smplx (rotation2xyz.py), humanact12_gru.MotionDiscriminator
    — plus the HUMANACTMetrics math (metrics/gru.py:97-183) with the
    reference metric utils loaded from file;
  * our side runs the production ``test._run_a2m_test`` driver end-to-end.

FID / accuracy / diversity / multimodality numbers must agree.

Alignment choices (harness choices, not behavior deltas):
  * GRU h0: the reference draws unseeded torch.randn per call
    (humanact12_gru.py:52-56); both sides pin h0 = 0 (ours is the default,
    the torch side passes hidden_unit explicitly) — an RNG-backend choice.
  * The gt-vs-shuffled-gt FID permutation is torch.randperm in the
    reference; both sides use one injected fixed permutation (pure
    relabeling of an arbitrary shuffle).
  * Diversity/multimodality draws come from identically seeded
    RandomState/np.random MT19937 streams, in the reference's consumption
    order (gen first, then gt — gru.py:118-129).
  * Sampling shapes: the reference's SHIPPED humanact12 eval crashes
    before sampling (config_mld_humanact12.yaml never sets
    ABLATION.MAX_IT/FRAME_PER_LATENT/LAD, so _diffusion_reverse:379-390
    divides by None); both sides here run the intended working shape —
    latents [B, latent_dim[0]=1, D], no latent mask — matching our
    configs/config_ladiff_humanact12.yaml (MAX_IT: 0, LAD: false).
"""
import importlib.util
import logging
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# reference path + vendored-smplx aliasing (shared with the Rotation2xyz
# parity test, which force-installs the REAL vendored smplx over any stub)
import test_rotation2xyz as _r2x  # noqa: E402,F401  (side effects wanted)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

NFEATS = 150
NCLASSES = 12
T_FRAMES = 32
BS = 8
N_CLIPS = 32            # 4 exact batches of BS, no padding
LAT_D = 32
FF, LAYERS, HEADS = 64, 3, 4
N_STEPS = 5
DIV_T, MM_T = 30, 4
DIV_SEED = 4242
GUIDANCE = 7.5


class _Ablation:
    MLP_DIST = False
    PE_TYPE = "mld"
    DIFF_PE_TYPE = "mld"
    DVAE = False
    PERCENTAGE_NOISED = 0.0
    MAX_IT = 0
    FRAME_PER_LATENT = 48
    JOINT_DISTRO_FIX = False
    LAD = False
    TEST_EFFICIENCY = False
    SKIP_CONNECT = True
    VAE_TYPE = "actor"
    IDEA = "ard"
    MD_TRANS = False


class _FrozenDataset:
    """Pins __getitem__ results so both sides see identical items."""

    def __init__(self, items):
        self._items = items

    def __len__(self):
        return len(self._items)

    def __getitem__(self, i):
        return self._items[i]


class _FixedPerm:
    def __init__(self, perm):
        self._perm = np.asarray(perm)

    def permutation(self, n):
        assert n == len(self._perm)
        return self._perm


def _load_reference_metric_utils():
    spec = importlib.util.spec_from_file_location(
        "_ref_metric_utils_a2m",
        "/root/reference/src/ladiff/models/metrics/utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from ladiff.models.architectures.actor_vae import ActorVae as RefActorVae
    from ladiff.models.architectures.humanact12_gru import (
        MotionDiscriminator as RefGRU,
        MotionDiscriminatorForFID as RefGRUFID)
    from ladiff.models.architectures.ladiff_denoiser import LADiffDenoiser
    from ladiff.transforms.rotation2xyz import Rotation2xyz as RefRot2xyz

    from ladiff_tpu.data.a2m import (HumanAct12Dataset, a2m_collate,
                                     generate_synthetic_humanact12)
    from ladiff_tpu.utils.checkpoint import (
        load_reference_action_denoiser_checkpoint,
        load_reference_actor_vae_checkpoint)

    tmp = tmp_path_factory.mktemp("a2m_parity")
    smpl_dir = tmp / "smpl"
    smpl_dir.mkdir()
    _r2x._write_random_smpl(smpl_dir, seed=21)

    root = generate_synthetic_humanact12(str(tmp / "data"), n_clips=N_CLIPS,
                                         seed=7)
    ds = HumanAct12Dataset(root, num_frames=T_FRAMES)
    frozen = _FrozenDataset([ds[i] for i in range(len(ds))])
    batches = [a2m_collate([frozen[i] for i in
                            range(s, min(s + BS, len(frozen)))], T_FRAMES)
               for s in range(0, len(frozen), BS)]
    assert all(len(b["length"]) == BS for b in batches)

    torch.manual_seed(0)
    ref_vae = RefActorVae(ablation=_Ablation(), nfeats=NFEATS,
                          latent_dim=[1, LAT_D], ff_size=FF,
                          num_layers=LAYERS, num_heads=HEADS,
                          dropout=0.0).eval()
    ref_den = LADiffDenoiser(
        ablation=_Ablation(), nfeats=NFEATS, condition="action",
        latent_dim=[1, LAT_D], ff_size=FF, num_layers=LAYERS,
        num_heads=HEADS, dropout=0.0, arch="trans_enc",
        position_embedding="learned", nclasses=NCLASSES,
        guidance_scale=GUIDANCE, guidance_uncondp=0.1,
        text_encoded_dim=LAT_D).eval()
    torch.manual_seed(1)
    ref_gru = RefGRU(input_size=72, hidden_size=128, hidden_layer=2,
                     output_size=NCLASSES).eval()
    ref_gru_fid = RefGRUFID(input_size=72, hidden_size=128, hidden_layer=2,
                            output_size=NCLASSES).eval()
    ref_gru_fid.load_state_dict(ref_gru.state_dict())

    vae_ckpt = str(tmp / "vae.ckpt")
    torch.save({"state_dict": {("vae." + k): v
                               for k, v in ref_vae.state_dict().items()}},
               vae_ckpt)
    den_ckpt = str(tmp / "den.ckpt")
    torch.save({"state_dict": {("denoiser." + k): v
                               for k, v in ref_den.state_dict().items()}},
               den_ckpt)
    gru_ckpt = str(tmp / "humanact12_gru.tar")
    torch.save({"model": ref_gru.state_dict()}, gru_ckpt)

    params = {
        "vae": jax.tree.map(
            jnp.asarray, load_reference_actor_vae_checkpoint(
                vae_ckpt, LAYERS)),
        "denoiser": jax.tree.map(
            jnp.asarray, load_reference_action_denoiser_checkpoint(
                den_ckpt, LAYERS, md_trans=False)),
    }
    ref_rot2xyz = RefRot2xyz(smpl_path=str(smpl_dir))
    perm = np.random.RandomState(99).permutation(N_CLIPS)
    return dict(tmp=tmp, frozen=frozen, batches=batches, params=params,
                ref_vae=ref_vae, ref_den=ref_den, ref_gru=ref_gru,
                ref_gru_fid=ref_gru_fid, ref_rot2xyz=ref_rot2xyz,
                gru_ckpt=gru_ckpt, smpl_dir=smpl_dir, perm=perm,
                ref_utils=_load_reference_metric_utils())


def _make_cfg(env, metric: str = "HUMANACTMetrics", model_extra=None):
    from ladiff_tpu.config import assemble_config
    overrides = {
        "NAME": "a2m_parity", "DEBUG": False, "SEED_VALUE": 0,
        "FOLDER_EXP": str(env["tmp"] / "exp"),
        "TRAIN": {"STAGE": "diffusion"},
        "TEST": {"BATCH_SIZE": BS, "REPLICATION_TIMES": 1,
                 "CHECKPOINTS": ""},
        "METRIC": {"TYPE": [metric]},
        "DATASET": {"NFEATS": NFEATS, "NJOINTS": 24, "NCLASSES": NCLASSES,
                    "SMPL_PATH": str(env["smpl_dir"]),
                    "SAMPLER": {"MAX_LEN": T_FRAMES},
                    "HUMANACT12": {"NUM_FRAMES": T_FRAMES},
                    "UESTC": {"NUM_FRAMES": T_FRAMES}},
        "model": {"ff_size": FF, "num_layers": LAYERS, "num_head": HEADS,
                  "droupout": 0.0, "latent_dim": [1, LAT_D],
                  "humanact12_rec_path": env["gru_ckpt"],
                  **(model_extra or {}),
                  "denoiser": {"params": {"num_layers": LAYERS}},
                  "motion_vae": {"params": {"num_layers": LAYERS}},
                  "scheduler": {"num_inference_timesteps": N_STEPS}},
    }
    (env["tmp"] / "exp").mkdir(exist_ok=True)
    return assemble_config("configs/config_ladiff_humanact12.yaml",
                           "configs/assets.yaml", overrides)


def _run_ours(env, monkeypatch, metric: str = "HUMANACTMetrics",
              model_extra=None):
    import ladiff_tpu.metrics.a2m as a2m_metrics
    from ladiff_tpu.metrics.a2m import ActionClassifierMetrics

    created = []
    perm = env["perm"]

    class _Patched(ActionClassifierMetrics):
        def __init__(self, **kw):
            kw.update(diversity_times=DIV_T, multimodality_times=MM_T,
                      gt_diversity_times=DIV_T, gt_multimodality_times=MM_T)
            super().__init__(**kw)
            self.rng = np.random.RandomState(DIV_SEED)
            self.perm_rng = _FixedPerm(perm)
            created.append(self)

    monkeypatch.setattr(a2m_metrics, "ActionClassifierMetrics", _Patched)

    spec = importlib.util.spec_from_file_location(
        "_repo_test_entry_a2m",
        str(Path(__file__).resolve().parents[1] / "test.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    logger = logging.getLogger("a2m_parity")
    logger.addHandler(logging.NullHandler())
    cfg = _make_cfg(env, metric=metric, model_extra=model_extra)
    summary = entry._run_a2m_test(cfg, logger, env["frozen"],
                                  params=env["params"])
    assert len(created) == 1
    return {k: m for k, (m, c) in summary.items()}, created[0]


# -- torch-side reference replica -------------------------------------------

def _ddim_alphas_cumprod():
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                        dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas).astype(np.float32)


def _torch_action_reverse(env, actions, latents0):
    """_diffusion_reverse non-AR branch (ladiff.py:465-502), action
    conditioning: cond_emb = cat([zeros_like(actions), actions])
    (a2m_eval:1290-1291); EmbedAction force-masks the uncond half in eval
    mode (ladiff_denoiser.py:318-325)."""
    ref_den = env["ref_den"]
    B = actions.shape[0]
    acp = torch.tensor(_ddim_alphas_cumprod())
    cond_emb = torch.cat([torch.zeros_like(actions), actions])
    latents = torch.tensor(np.array(latents0))
    step_ratio = 1000 // N_STEPS
    timesteps = ((np.arange(N_STEPS) * step_ratio).round()[::-1]
                 .astype(np.int64) + 1)
    with torch.no_grad():
        for t in timesteps:
            model_in = torch.cat([latents] * 2)
            eps = ref_den(sample=model_in, timestep=torch.tensor(int(t)),
                          encoder_hidden_states=cond_emb, enclat=None,
                          lengths=None, max_iter_elements=None)[0]
            eps_u, eps_c = eps.chunk(2)
            eps = eps_u + GUIDANCE * (eps_c - eps_u)
            t_prev = int(t) - step_ratio
            a_t = acp[int(t)]
            a_prev = acp[t_prev] if t_prev >= 0 else acp[0]
            x0 = (latents - torch.sqrt(1 - a_t) * eps) / torch.sqrt(a_t)
            latents = torch.sqrt(a_prev) * x0 + torch.sqrt(1 - a_prev) * eps
    return latents.permute(1, 0, 2)  # [1, B, D] (reference memory layout)


def _torch_joints_eval(env, feats, mask):
    """feats2joints_eval: rot6d+trans -> 24x3 SMPL joints
    (ladiff.py:152-162)."""
    B, T, F = feats.shape
    x = feats.view(B, T, 6, F // 6).permute(0, 3, 2, 1)
    with torch.no_grad():
        out = env["ref_rot2xyz"](x, mask=mask, pose_rep="rot6d", glob=True,
                                 translation=True, jointstype="smpl",
                                 vertstrans=True, betas=None, beta=0,
                                 glob_rot=None, get_rotations_back=False)
    return out  # [B, 24, 3, T]


def _torch_a2m_pass(env):
    """a2m_eval over all batches (ladiff.py:1284-1326) + HUMANACTMetrics
    accumulation (gru.py:147-183), h0 pinned to zeros."""
    rng = jax.random.PRNGKey(0)  # run_a2m_eval(seed=0) chain
    labels_all, rec_feats, gt_feats = [], [], []
    confusion = np.zeros((NCLASSES, NCLASSES), int)
    gt_confusion = np.zeros((NCLASSES, NCLASSES), int)
    h0 = torch.zeros(2, BS, 128)
    for batch in env["batches"]:
        rng, step_rng = jax.random.split(rng)
        init_rng, _ = jax.random.split(step_rng)
        latents0 = np.asarray(jax.random.normal(
            init_rng, (BS, 1, LAT_D), jnp.float32))
        actions = torch.tensor(np.asarray(batch["action"], np.int64))
        lengths = torch.tensor(np.asarray(batch["length"], np.int64))
        mask = torch.tensor(np.asarray(batch["mask"]))
        motions = torch.tensor(batch["motion"])

        z = _torch_action_reverse(env, actions, latents0)
        with torch.no_grad():
            feats_rst = env["ref_vae"].decode(z, [int(x) for x in lengths])

        joints_rst = _torch_joints_eval(env, feats_rst, mask)
        joints_ref = _torch_joints_eval(env, motions, mask)

        with torch.no_grad():
            rec_logits = env["ref_gru"](joints_rst, lengths=lengths,
                                        hidden_unit=h0)
            gt_logits = env["ref_gru"](joints_ref, lengths=lengths,
                                       hidden_unit=h0)
            rec_emb = env["ref_gru_fid"](joints_rst, lengths=lengths,
                                         hidden_unit=h0)
            gt_emb = env["ref_gru_fid"](joints_ref, lengths=lengths,
                                        hidden_unit=h0)
        labs = actions[:, 0].numpy()
        for lab, pred in zip(labs, rec_logits.argmax(1).numpy()):
            confusion[lab, pred] += 1
        for lab, pred in zip(labs, gt_logits.argmax(1).numpy()):
            gt_confusion[lab, pred] += 1
        labels_all.append(labs)
        rec_feats.append(rec_emb.numpy())
        gt_feats.append(gt_emb.numpy())
    return (np.concatenate(labels_all), np.concatenate(rec_feats),
            np.concatenate(gt_feats), confusion, gt_confusion)


def _torch_metrics_compute(env, labels, rec, gt, confusion, gt_confusion):
    """HUMANACTMetrics.compute replica (gru.py:97-145) with the injected
    shuffle permutation and the pinned np.random stream."""
    U = env["ref_utils"]
    out = {
        "accuracy": float(np.trace(confusion) / confusion.sum()),
        "gt_accuracy": float(np.trace(gt_confusion) / gt_confusion.sum()),
    }
    gt2 = gt[env["perm"]]
    genstats = U.calculate_activation_statistics(torch.tensor(rec))
    gtstats = U.calculate_activation_statistics(torch.tensor(gt))
    gtstats2 = U.calculate_activation_statistics(torch.tensor(gt2))
    out["FID"] = float(U.calculate_fid(gtstats, genstats))
    out["gt_FID"] = float(U.calculate_fid(gtstats, gtstats2))

    np.random.seed(DIV_SEED)
    div, mm = U.calculate_diversity_multimodality(
        torch.tensor(rec), torch.tensor(labels, dtype=torch.long), NCLASSES,
        diversity_times=DIV_T, multimodality_times=MM_T)
    out["Diversity"], out["Multimodality"] = float(div), float(mm)
    div, mm = U.calculate_diversity_multimodality(
        torch.tensor(gt), torch.tensor(labels, dtype=torch.long), NCLASSES,
        diversity_times=DIV_T, multimodality_times=MM_T)
    out["gt_Diversity"], out["gt_Multimodality"] = float(div), float(mm)
    return out


METRIC_KEYS = ["accuracy", "gt_accuracy", "FID", "gt_FID", "Diversity",
               "gt_Diversity", "Multimodality", "gt_Multimodality"]


@pytest.mark.slow
def test_humanact12_numbers_match(env, monkeypatch):
    ours, metrics_obj = _run_ours(env, monkeypatch)
    labels, rec, gt, confusion, gt_confusion = _torch_a2m_pass(env)

    # embedding-level agreement first (diagnosable granularity)
    np.testing.assert_allclose(
        np.concatenate(metrics_obj.gt_feats), gt, atol=2e-3,
        err_msg="gt classifier features diverge")
    np.testing.assert_allclose(
        np.concatenate(metrics_obj.rec_feats), rec, atol=2e-3,
        err_msg="generated classifier features diverge")
    np.testing.assert_array_equal(metrics_obj.confusion, confusion)
    np.testing.assert_array_equal(metrics_obj.gt_confusion, gt_confusion)

    ref_nums = _torch_metrics_compute(env, labels, rec, gt, confusion,
                                      gt_confusion)
    for k in METRIC_KEYS:
        assert k in ours, f"{k} missing from _run_a2m_test summary"
        np.testing.assert_allclose(
            ours[k], ref_nums[k], rtol=2e-3, atol=1e-3,
            err_msg=f"metric {k}: ours={ours[k]} reference={ref_nums[k]}")


def _make_ref_stgcn(env, tmp_path):
    """Reference ST-GCN, random weights + randomized BN running stats,
    saved in the released-tar layout (metrics/stgcn.py:30-45)."""
    from ladiff.models.architectures.uestc_stgcn import STGCN as RefSTGCN

    from test_a2m import _fake_kintree

    kintree = _fake_kintree(str(tmp_path / "kintree_table.pkl"))
    torch.manual_seed(5)
    ref = RefSTGCN(in_channels=6, num_class=NCLASSES, kintree_path=kintree,
                   graph_args={"layout": "smpl", "strategy": "spatial"},
                   edge_importance_weighting=True)
    rs = np.random.RandomState(6)
    for m in ref.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(torch.tensor(
                rs.randn(m.num_features).astype(np.float32) * 0.2))
            m.running_var.copy_(torch.tensor(
                (0.5 + rs.rand(m.num_features)).astype(np.float32)))
    ref = ref.eval()
    clf_dir = tmp_path / "actionrecognition"
    clf_dir.mkdir(exist_ok=True)
    torch.save(ref.state_dict(), str(clf_dir / "uestc_rot6d_stgcn.tar"))
    return ref, str(clf_dir)


def _stgcn_slice(feats):
    """allsplit_step slicing (ladiff.py:1475-1483): [B, T, 150] ->
    [B, 24, 6, T] channel-major, translation node dropped."""
    B, T, F = feats.shape
    return feats.view(B, T, 6, F // 6).permute(0, 3, 2, 1)[:, :-1]


def _torch_uestc_pass(env, ref_stgcn):
    """a2m_eval + UESTCMetrics accumulation (stgcn.py:148-183): the
    classifier consumes raw rot6d features, no SMPL pass."""
    rng = jax.random.PRNGKey(0)
    labels_all, rec_feats, gt_feats = [], [], []
    confusion = np.zeros((NCLASSES, NCLASSES), int)
    gt_confusion = np.zeros((NCLASSES, NCLASSES), int)
    for batch in env["batches"]:
        rng, step_rng = jax.random.split(rng)
        init_rng, _ = jax.random.split(step_rng)
        latents0 = np.asarray(jax.random.normal(
            init_rng, (BS, 1, LAT_D), jnp.float32))
        actions = torch.tensor(np.asarray(batch["action"], np.int64))
        lengths = [int(x) for x in batch["length"]]
        motions = torch.tensor(batch["motion"])

        z = _torch_action_reverse(env, actions, latents0)
        with torch.no_grad():
            feats_rst = env["ref_vae"].decode(z, lengths)
            rec_out = ref_stgcn(_stgcn_slice(feats_rst))
            gt_out = ref_stgcn(_stgcn_slice(motions))
        labs = actions[:, 0].numpy()
        for lab, pred in zip(labs, rec_out["yhat"].argmax(1).numpy()):
            confusion[lab, pred] += 1
        for lab, pred in zip(labs, gt_out["yhat"].argmax(1).numpy()):
            gt_confusion[lab, pred] += 1
        labels_all.append(labs)
        rec_feats.append(rec_out["features"].numpy())
        gt_feats.append(gt_out["features"].numpy())
    return (np.concatenate(labels_all), np.concatenate(rec_feats),
            np.concatenate(gt_feats), confusion, gt_confusion)


@pytest.mark.slow
def test_uestc_numbers_match(env, monkeypatch, tmp_path):
    ref_stgcn, clf_dir = _make_ref_stgcn(env, tmp_path)
    ours, metrics_obj = _run_ours(env, monkeypatch, metric="UESTCMetrics",
                                  model_extra={"uestc_rec_path": clf_dir})
    labels, rec, gt, confusion, gt_confusion = _torch_uestc_pass(env,
                                                                 ref_stgcn)
    np.testing.assert_allclose(
        np.concatenate(metrics_obj.gt_feats), gt, atol=2e-3,
        err_msg="gt ST-GCN features diverge")
    np.testing.assert_allclose(
        np.concatenate(metrics_obj.rec_feats), rec, atol=2e-3,
        err_msg="generated ST-GCN features diverge")
    np.testing.assert_array_equal(metrics_obj.confusion, confusion)
    np.testing.assert_array_equal(metrics_obj.gt_confusion, gt_confusion)

    ref_nums = _torch_metrics_compute(env, labels, rec, gt, confusion,
                                      gt_confusion)
    for k in METRIC_KEYS:
        assert k in ours, f"{k} missing from _run_a2m_test summary"
        np.testing.assert_allclose(
            ours[k], ref_nums[k], rtol=2e-3, atol=1e-3,
            err_msg=f"metric {k}: ours={ours[k]} reference={ref_nums[k]}")
