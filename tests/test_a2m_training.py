"""Action-conditioned training path (HumanAct12): stage-1 ActorVae +
stage-2 action diffusion through run_training on synthetic data."""
import logging
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy harness: excluded from the fast lane

from ladiff_tpu.config import assemble_config
from ladiff_tpu.data.datamodule import get_datasets

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg(tmp_root, name, stage):
    cfg = assemble_config(
        os.path.join(REPO, "configs", name),
        os.path.join(REPO, "configs", "assets.yaml"),
        overrides={
            "DEBUG": False,
            "FOLDER": str(tmp_root / "experiments"),
            "NAME": f"a2m_{stage}",
            "TRAIN": {"BATCH_SIZE": 8, "END_EPOCH": 1},
            "model": {"num_layers": 3, "ff_size": 64,
                      "latent_dim": [1, 32]},
            "LOGGER": {"SACE_CHECKPOINT_EPOCH": 1},
        })
    return cfg


@pytest.fixture(scope="module")
def a2m_env(tmp_path_factory, monkeypatch_module=None):
    root = tmp_path_factory.mktemp("a2m_train")
    os.environ["LADIFF_SYNTHETIC_DATA"] = "1"
    yield root
    os.environ.pop("LADIFF_SYNTHETIC_DATA", None)


def test_action_vae_then_diffusion_training(a2m_env, tmp_path):
    from ladiff_tpu.training.loop import run_training
    from ladiff_tpu.utils.logger import create_logger

    cfg1 = _cfg(a2m_env, "config_vae_humanact12.yaml", "vae")
    dm = get_datasets(cfg1, phase="train")[0]
    assert getattr(dm, "is_a2m", False)
    assert dm.nfeats == 150  # (24 joints + trans) * rot6d
    logger = create_logger(cfg1, phase="train")
    logger.setLevel(logging.WARNING)
    vae_ckpt = run_training(cfg1, dm, logger, max_steps_per_epoch=2)
    assert any(n.startswith("epoch_") for n in os.listdir(vae_ckpt))

    cfg2 = _cfg(a2m_env, "config_ladiff_humanact12.yaml", "diffusion")
    cfg2.TRAIN.PRETRAINED_VAE = vae_ckpt
    logger2 = create_logger(cfg2, phase="train")
    logger2.setLevel(logging.WARNING)
    diff_ckpt = run_training(cfg2, dm, logger2, max_steps_per_epoch=2)
    assert any(n.startswith("epoch_") for n in os.listdir(diff_ckpt))


def test_distill_rejects_action_condition(a2m_env):
    """loop.py's distill guard: the progressive-distillation stage folds
    text guidance into the student, so an action-conditioned config must
    fail loudly at run_training time."""
    from ladiff_tpu.training.loop import run_training
    from ladiff_tpu.utils.logger import create_logger

    cfg = _cfg(a2m_env, "config_ladiff_humanact12.yaml", "distill_bad")
    cfg.TRAIN.STAGE = "distill"
    cfg.TRAIN.PRETRAINED = "/nonexistent"  # guard fires before the restore
    dm = get_datasets(cfg, phase="train")[0]
    logger = create_logger(cfg, phase="train")
    logger.setLevel(logging.WARNING)
    with pytest.raises(ValueError, match="text condition only"):
        run_training(cfg, dm, logger, max_steps_per_epoch=1, max_epochs=1)


def test_action_datamodule_loader(a2m_env):
    cfg = _cfg(a2m_env, "config_vae_humanact12.yaml", "vae")
    dm = get_datasets(cfg, phase="train")[0]
    batches = list(dm.loader("train", batch_size=4, seed=0))
    assert batches, "empty loader"
    b = batches[0]
    assert b["motion"].shape[1:] == (dm.num_frames, dm.nfeats)
    assert b["action"].shape[1] == 1
    assert b["length"].max() <= dm.num_frames
    # test split reachable through the same module
    ds_test = dm.dataset("test")
    assert len(ds_test) > 0
    # deterministic reshuffle by seed
    b2 = list(dm.loader("train", batch_size=4, seed=0))[0]
    np.testing.assert_array_equal(b["action"], b2["action"])
