"""Full-pipeline integration test: synthetic data -> stage-1 VAE training ->
stage-2 diffusion training (frozen VAE from the stage-1 checkpoint) ->
benchmark eval (test.py protocol) -> generation.  Everything through the
real config YAML tree with tiny overrides."""
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy harness: excluded from the fast lane

from ladiff_tpu.config import assemble_config
from ladiff_tpu.data.datamodule import T2MDataModule
from ladiff_tpu.data.synthetic import generate_synthetic_dataset
from ladiff_tpu.data.word_vectorizer import HashWordVectorizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_run_test():
    """Import run_test from the repo-root test.py by path (other tests put
    /root/reference/src on sys.path, whose test.py would shadow ours)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ladiff_tpu_test_entry", os.path.join(REPO, "test.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.run_test


class _FakeTextEncoder:
    """Deterministic stand-in for CLIP: hash caption -> [B, 1, D]."""

    def __init__(self, dim=48):
        self.dim = dim

    def __call__(self, texts):
        import hashlib
        out = np.zeros((len(texts), 1, self.dim), np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(hashlib.sha256(t.encode()).digest()[:4],
                                  "little")
            out[i, 0] = np.random.RandomState(seed).randn(self.dim)
        return out


def _tiny_cfg(tmp_root, stage):
    name = ("config_vae_humanml3d.yaml" if stage == "vae"
            else "config_ladiff_humanml3d.yaml")
    cfg = assemble_config(
        os.path.join(REPO, "configs", name),
        os.path.join(REPO, "configs", "assets.yaml"),
        overrides={
            "DEBUG": False,
            "FOLDER": str(tmp_root / "experiments"),
            "NAME": f"it_{stage}",
            "TRAIN": {"BATCH_SIZE": 8, "END_EPOCH": 2},
            "TEST": {"BATCH_SIZE": 8, "REPLICATION_TIMES": 1,
                     "MM_NUM_SAMPLES": 2, "MM_NUM_REPEATS": 12,
                     "MM_NUM_TIMES": 4, "DIVERSITY_TIMES": 5},
            "model": {
                "num_layers": 3, "ff_size": 64, "latent_dim": [7, 32],
                "denoiser": {"params": {"text_encoded_dim": 48}},
                "scheduler": {"num_inference_timesteps": 3},
            },
            "LOGGER": {"SACE_CHECKPOINT_EPOCH": 2, "VAL_EVERY_STEPS": 1},
        })
    return cfg


@pytest.fixture(scope="module")
def pipeline_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    generate_synthetic_dataset(str(root / "data"), n_clips=48, seed=0)
    return root


@pytest.fixture(scope="module")
def dm(pipeline_root):
    return T2MDataModule("humanml3d", str(pipeline_root / "data"),
                         HashWordVectorizer(), batch_size=8)


def test_full_two_stage_pipeline(pipeline_root, dm):
    from ladiff_tpu.training.loop import run_training
    from ladiff_tpu.utils.logger import create_logger

    # ---- stage 1
    cfg1 = _tiny_cfg(pipeline_root, "vae")
    logger = create_logger(cfg1, phase="train")
    logger.setLevel(logging.WARNING)
    vae_ckpt_dir = run_training(cfg1, dm, logger, max_steps_per_epoch=3)
    assert os.path.isdir(vae_ckpt_dir)
    assert any(n.startswith("epoch_") for n in os.listdir(vae_ckpt_dir))

    # ---- stage 2 (frozen stage-1 VAE)
    cfg2 = _tiny_cfg(pipeline_root, "diffusion")
    cfg2.TRAIN.PRETRAINED_VAE = vae_ckpt_dir
    logger2 = create_logger(cfg2, phase="train")
    logger2.setLevel(logging.WARNING)
    diff_ckpt_dir = run_training(cfg2, dm, logger2,
                                 text_encoder=_FakeTextEncoder(48),
                                 max_steps_per_epoch=3)
    assert any(n.startswith("epoch_") for n in os.listdir(diff_ckpt_dir))

    # ---- benchmark eval (test.py protocol)
    run_test = _load_run_test()
    cfg2.TEST.CHECKPOINTS = diff_ckpt_dir
    summary = run_test(cfg2, logger2, datamodule=dm,
                       text_encoder=_FakeTextEncoder(48))
    assert "Matching_score" in summary or "APE_root" in summary
    for k, (mean, conf) in summary.items():
        assert np.isfinite(mean), (k, mean)

    # ---- resume path: restart stage 2 from its own checkpoint
    cfg2.TRAIN.RESUME = diff_ckpt_dir
    cfg2.TRAIN.END_EPOCH = 3
    run_training(cfg2, dm, logger2, text_encoder=_FakeTextEncoder(48),
                 max_steps_per_epoch=2)


def test_distill_stage_through_loop(pipeline_root, dm):
    """TRAIN.STAGE=distill through run_training (loop.py wiring, not just
    the step factory): teacher boot from a just-trained stage-2 checkpoint
    directory, student := teacher init, training steps run, and the saved
    checkpoint carries the stage-2 layout (denoiser + frozen vae)."""
    from ladiff_tpu.training.loop import run_training
    from ladiff_tpu.utils.checkpoint import CheckpointManager, \
        latest_checkpoint
    from ladiff_tpu.utils.logger import create_logger

    teacher_dir = os.path.join(str(pipeline_root / "experiments"), "ladiff",
                               "it_diffusion", "checkpoints")
    if not os.path.isdir(teacher_dir):
        pytest.skip("stage-2 test must run first")
    cfg = _tiny_cfg(pipeline_root, "diffusion")
    cfg.NAME = "it_distill"
    cfg.TRAIN.STAGE = "distill"
    cfg.TRAIN.PRETRAINED = teacher_dir
    cfg.TRAIN.DISTILL_STEPS = 2
    logger = create_logger(cfg, phase="train")
    logger.setLevel(logging.WARNING)
    ckpt_dir = run_training(cfg, dm, logger,
                            text_encoder=_FakeTextEncoder(48),
                            max_steps_per_epoch=2, max_epochs=1)
    found = latest_checkpoint(ckpt_dir)
    assert found is not None
    # restores in the stage-2 tree layout: student denoiser + frozen vae
    from ladiff_tpu.data.datamodule import T2MDataModule  # noqa: F401
    from ladiff_tpu.training.loop import build_system
    params = build_system(cfg, dm).init_params(jax.random.PRNGKey(0))
    _, tree = CheckpointManager(ckpt_dir).restore(
        found[0], {"params": params, "epoch": 0})
    assert set(tree["params"]) == {"denoiser", "vae"}
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(tree["params"]))

    # error path (loop.py): distill without a teacher fails loudly
    cfg_bad = _tiny_cfg(pipeline_root, "diffusion")
    cfg_bad.NAME = "it_distill_bad"
    cfg_bad.TRAIN.STAGE = "distill"
    with pytest.raises(ValueError, match="TRAIN.PRETRAINED"):
        run_training(cfg_bad, dm, logger,
                     text_encoder=_FakeTextEncoder(48),
                     max_steps_per_epoch=1, max_epochs=1)


def test_vae_stage_eval(pipeline_root, dm):
    """VAE-stage benchmark path (reconstruction metrics incl. MRMetrics)."""
    run_test = _load_run_test()
    from ladiff_tpu.utils.logger import create_logger

    cfg = _tiny_cfg(pipeline_root, "vae")
    ckpt_dir = os.path.join(str(pipeline_root / "experiments"), "ladiff",
                            "it_vae", "checkpoints")
    if not os.path.isdir(ckpt_dir):
        pytest.skip("stage-1 test must run first")
    cfg.TEST.CHECKPOINTS = ckpt_dir
    # TEST.SAVE_LATENTS: vae-stage eval dumps gt-encoded latents
    # (reference ladiff.py:1175-1191)
    lat_dir = str(pipeline_root / "latents")
    cfg.TEST.SAVE_LATENTS = True
    cfg.TEST.LATENTS_DIR = lat_dir
    logger = create_logger(cfg, phase="test")
    logger.setLevel(logging.WARNING)
    summary = run_test(cfg, logger, datamodule=dm,
                       text_encoder=_FakeTextEncoder(48))
    assert "MPJPE" in summary
    assert np.isfinite(summary["MPJPE"][0])
    lat_files = sorted(f for f in os.listdir(lat_dir) if "latent" in f)
    assert lat_files and lat_files[0] == "latent_000000.npy"
    z = np.load(os.path.join(lat_dir, lat_files[0]))
    assert z.ndim == 3 and z.shape[1:] == (5, 32) and np.isfinite(z).all()


def test_tp_training_through_loop(pipeline_root, dm):
    """run_training with TRAIN.TENSOR_PARALLEL=2 on the (4, 2) CPU mesh:
    the loop builds the 2-D mesh, lays the state out with the TP specs,
    and trains + checkpoints normally."""
    import logging

    from ladiff_tpu.training.loop import run_training
    from ladiff_tpu.utils.logger import create_logger

    cfg = _tiny_cfg(pipeline_root, "vae")
    cfg.NAME = "it_vae_tp"
    cfg.FOLDER_EXP = str(pipeline_root / "experiments" / "it_vae_tp")
    cfg.TRAIN.TENSOR_PARALLEL = 2
    logger = create_logger(cfg, phase="train")
    logger.setLevel(logging.WARNING)
    ckpt_dir = run_training(cfg, dm, logger, max_steps_per_epoch=2,
                            max_epochs=1)
    assert any(n.startswith("epoch_") for n in os.listdir(ckpt_dir))

    cfg.TRAIN.TENSOR_PARALLEL = 3   # does not divide 8
    with pytest.raises(ValueError, match="TENSOR_PARALLEL"):
        run_training(cfg, dm, logger, max_steps_per_epoch=1, max_epochs=1)


def test_sp_training_through_loop(pipeline_root, dm):
    """run_training with TRAIN.SEQUENCE_PARALLEL=2: the loop builds the
    (4, 2) mesh with the model axis reused as the token axis, trains the
    VAE sequence-parallel and checkpoints; invalid configs fail loudly."""
    import logging

    from ladiff_tpu.training.loop import run_training
    from ladiff_tpu.utils.logger import create_logger

    cfg = _tiny_cfg(pipeline_root, "vae")
    cfg.NAME = "it_vae_sp"
    cfg.FOLDER_EXP = str(pipeline_root / "experiments" / "it_vae_sp")
    cfg.TRAIN.SEQUENCE_PARALLEL = 2
    logger = create_logger(cfg, phase="train")
    logger.setLevel(logging.WARNING)
    ckpt_dir = run_training(cfg, dm, logger, max_steps_per_epoch=2,
                            max_epochs=1)
    assert any(n.startswith("epoch_") for n in os.listdir(ckpt_dir))

    # wrong stage: SP shards the VAE token axis only
    cfg_bad = _tiny_cfg(pipeline_root, "diffusion")
    cfg_bad.TRAIN.SEQUENCE_PARALLEL = 2
    with pytest.raises(ValueError, match="SEQUENCE_PARALLEL"):
        run_training(cfg_bad, dm, logger,
                     text_encoder=_FakeTextEncoder(48),
                     max_steps_per_epoch=1, max_epochs=1)
    # mutual exclusion with TP
    cfg.TRAIN.TENSOR_PARALLEL = 2
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_training(cfg, dm, logger, max_steps_per_epoch=1, max_epochs=1)


def test_pp_training_through_loop(pipeline_root, dm):
    """run_training with TRAIN.PIPELINE_STAGES=3: the loop builds the pipe
    mesh, pipelines the 3-layer MD stack via the GPipe train step
    (parallel/pp.py), trains and checkpoints; wrong stage fails loudly."""
    import logging

    from ladiff_tpu.training.loop import run_training
    from ladiff_tpu.utils.logger import create_logger

    cfg = _tiny_cfg(pipeline_root, "diffusion")
    cfg.NAME = "it_diff_pp"
    cfg.FOLDER_EXP = str(pipeline_root / "experiments" / "it_diff_pp")
    cfg.TRAIN.PRETRAINED_VAE = ""       # fresh VAE: the YAML default points
    cfg.TRAIN.PIPELINE_STAGES = 3       # at the released ckpt path; divides
    # the 3 MD layers
    cfg.TRAIN.PIPELINE_MICROBATCHES = 2
    logger = create_logger(cfg, phase="train")
    logger.setLevel(logging.WARNING)
    ckpt_dir = run_training(cfg, dm, logger,
                            text_encoder=_FakeTextEncoder(48),
                            max_steps_per_epoch=2, max_epochs=1)
    assert any(n.startswith("epoch_") for n in os.listdir(ckpt_dir))

    # wrong stage: the pipeline program covers the denoiser MD stack
    cfg_bad = _tiny_cfg(pipeline_root, "vae")
    cfg_bad.TRAIN.PIPELINE_STAGES = 3
    with pytest.raises(ValueError, match="PIPELINE_STAGES"):
        run_training(cfg_bad, dm, logger, max_steps_per_epoch=1,
                     max_epochs=1)
