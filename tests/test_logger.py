"""Experiment-tracking parity: WandB sink + resume-run-id continuity
(reference src/train.py:26-53 scans <resume>/wandb for the newest run id;
:64-83 builds the WandbLogger with it).  The wandb package is absent in the
TPU image, so the sink is exercised through an injected stub module and the
graceful-fallback path is asserted too."""
import json
import os
import types

import numpy as np

from ladiff_tpu.config import ConfigNode
from ladiff_tpu.utils.logger import (MetricsLogger, apply_resume,
                                     resume_wandb_run_id)


class _FakeRun:
    def __init__(self, kwargs):
        self.kwargs = kwargs
        self.logged = []
        self.finished = False

    def log(self, scalars, step=None):
        self.logged.append((step, dict(scalars)))

    def finish(self):
        self.finished = True


def _fake_wandb():
    mod = types.ModuleType("wandb")
    mod.runs = []

    def init(**kwargs):
        run = _FakeRun(kwargs)
        mod.runs.append(run)
        return run

    mod.init = init
    return mod


def test_metrics_logger_fans_out_to_wandb(tmp_path):
    wandb = _fake_wandb()
    cfg = ConfigNode({
        "NAME": "exp1", "FOLDER_EXP": str(tmp_path),
        "LOGGER": {"TENSORBOARD": False,
                   "WANDB": {"PROJECT": "ladiff", "OFFLINE": True,
                             "RESUME_ID": None}}})
    sink = MetricsLogger.from_cfg(cfg, wandb_module=wandb)
    sink.log(3, {"total": 1.5, "kl": 0.25}, prefix="train/vae/")
    sink.close()

    run = wandb.runs[0]
    assert run.kwargs["project"] == "ladiff"
    assert run.kwargs["mode"] == "offline"
    assert run.kwargs["id"] is None
    assert run.logged == [(3, {"train/vae/total": 1.5, "train/vae/kl": 0.25})]
    assert run.finished
    # jsonl sink still written
    rec = json.loads(open(tmp_path / "metrics.jsonl").read().splitlines()[-1])
    assert rec == {"step": 3, "train/vae/total": 1.5, "train/vae/kl": 0.25}


def test_metrics_logger_without_wandb_package(tmp_path):
    """No project configured / package missing -> jsonl-only, no crash."""
    cfg = ConfigNode({"NAME": "x", "FOLDER_EXP": str(tmp_path),
                      "LOGGER": {"TENSORBOARD": False,
                                 "WANDB": {"PROJECT": None}}})
    sink = MetricsLogger.from_cfg(cfg)
    sink.log(0, {"a": 1.0})
    sink.close()
    assert sink._wandb is None
    assert os.path.exists(tmp_path / "metrics.jsonl")


def test_resume_run_id_scan(tmp_path):
    wdir = tmp_path / "wandb"
    wdir.mkdir()
    (wdir / "run-20260101_010101-abc123").mkdir()
    (wdir / "run-20260102_020202-def456").mkdir()
    (wdir / "latest-run").mkdir()
    assert resume_wandb_run_id(str(tmp_path)) == "def456"
    assert resume_wandb_run_id(str(tmp_path / "nope")) is None


def test_apply_resume_reloads_config_and_run_id(tmp_path):
    import yaml

    prev = tmp_path / "oldrun"
    (prev / "checkpoints").mkdir(parents=True)
    (prev / "wandb" / "run-20260101_000000-runid9").mkdir(parents=True)
    with open(prev / "config_train_2026.yaml", "w") as f:
        yaml.safe_dump({"NAME": "oldname", "SEED_VALUE": 77,
                        "TRAIN": {"STAGE": "vae", "END_EPOCH": 99}}, f)

    cfg = ConfigNode({
        "NAME": "newname", "SEED_VALUE": 1,
        "TRAIN": {"STAGE": "diffusion", "END_EPOCH": 5,
                  "RESUME": str(prev)},
        "LOGGER": {"WANDB": {"PROJECT": "p", "RESUME_ID": None}}})
    out = apply_resume(cfg)
    # previous run's config wins EXCEPT the current TRAIN section
    assert out["NAME"] == "oldname" and out["SEED_VALUE"] == 77
    assert out.TRAIN.STAGE == "diffusion" and out.TRAIN.END_EPOCH == 5
    assert out.TRAIN.RESUME == str(prev / "checkpoints")
    assert out.LOGGER.WANDB.RESUME_ID == "runid9"
    # resume id feeds the wandb init
    wandb = _fake_wandb()
    out["FOLDER_EXP"] = str(tmp_path / "exp")
    sink = MetricsLogger.from_cfg(out, wandb_module=wandb)
    sink.close()
    assert wandb.runs[0].kwargs["id"] == "runid9"
    assert wandb.runs[0].kwargs["resume"] == "must"


def test_apply_resume_noop_and_badpath(tmp_path):
    cfg = ConfigNode({"TRAIN": {"RESUME": ""}})
    assert apply_resume(cfg) is cfg
    cfg = ConfigNode({"TRAIN": {"RESUME": str(tmp_path / "missing")}})
    try:
        apply_resume(cfg)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
