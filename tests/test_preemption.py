"""Preemption-safe training shutdown: SIGTERM -> checkpoint + clean exit."""
import logging
import os
import signal
import threading

import numpy as np

from ladiff_tpu.config import assemble_config
from ladiff_tpu.data.datamodule import T2MDataModule
from ladiff_tpu.data.synthetic import generate_synthetic_dataset
from ladiff_tpu.data.word_vectorizer import HashWordVectorizer
from ladiff_tpu.training.loop import PreemptionGuard, run_training

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_guard_sets_flag_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.triggered
    assert signal.getsignal(signal.SIGTERM) is prev


def test_sigterm_checkpoints_and_exits(tmp_path):
    generate_synthetic_dataset(str(tmp_path / "data"), n_clips=32, seed=0)
    dm = T2MDataModule("humanml3d", str(tmp_path / "data"),
                       HashWordVectorizer(), batch_size=8)
    cfg = assemble_config(
        os.path.join(REPO, "configs", "config_vae_humanml3d.yaml"),
        os.path.join(REPO, "configs", "assets.yaml"),
        overrides={
            "DEBUG": False,
            "FOLDER": str(tmp_path / "experiments"),
            "NAME": "preempt_vae",
            # far more epochs than can finish before the signal; regular
            # saves only at the very end, so any ckpt must be the
            # preemption save
            "TRAIN": {"BATCH_SIZE": 8, "END_EPOCH": 500},
            "model": {"num_layers": 3, "ff_size": 64,
                      "latent_dim": [7, 32]},
            "LOGGER": {"SACE_CHECKPOINT_EPOCH": 500},
        })
    from ladiff_tpu.utils.logger import create_logger
    logger = create_logger(cfg, phase="train")
    logger.setLevel(logging.WARNING)

    stop = threading.Event()

    def send_once_guarded():
        # fire only after run_training installs the PreemptionGuard handler
        # (a signal during setup would hit the default action instead)
        while not stop.is_set():
            h = signal.getsignal(signal.SIGTERM)
            if getattr(h, "__self__", None).__class__.__name__ == \
                    "PreemptionGuard":
                os.kill(os.getpid(), signal.SIGTERM)
                return
            stop.wait(0.2)

    sender = threading.Thread(target=send_once_guarded, daemon=True)
    sender.start()
    try:
        ckpt_dir = run_training(cfg, dm, logger, max_steps_per_epoch=2)
    finally:
        stop.set()
        sender.join(timeout=5)
    saved = [n for n in os.listdir(ckpt_dir) if n.startswith("epoch_")]
    assert saved, "preemption save missing"
    # the marked epoch is far below END_EPOCH (we exited early)
    epochs = [int(n.split("_")[1]) for n in saved]
    assert max(epochs) < 500
