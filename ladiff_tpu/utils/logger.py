"""Experiment logging.

Rebuild of /root/reference/src/ladiff/utils/logger.py:9-71 (file+console
logger, experiment dir ``experiments/<model>/<NAME>``, per-run config
snapshot) and the ProgressLogger epoch lines
(/root/reference/src/ladiff/callback/progress.py:30-54).  TensorBoard/WandB
are optional sinks, gated on availability (zero-egress images run offline).
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from os.path import join as pjoin
from typing import Dict, Optional

import yaml

__all__ = ["create_logger", "MetricsLogger"]


def create_logger(cfg, phase: str = "train") -> logging.Logger:
    model_name = str(cfg.model.get("model_type", "ladiff"))
    name = str(cfg.get("NAME", "exp"))
    root = pjoin(str(cfg.get("FOLDER", "experiments")), model_name, name)
    os.makedirs(root, exist_ok=True)
    cfg["FOLDER_EXP"] = root

    # config snapshot (reference logger.py:37-71)
    stamp = time.strftime("%Y-%m-%dT%H-%M-%S")
    with open(pjoin(root, f"config_{phase}_{stamp}.yaml"), "w") as f:
        yaml.safe_dump(cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg),
                       f, sort_keys=False)

    logger = logging.getLogger(f"ladiff_tpu.{name}.{phase}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    fh = logging.FileHandler(pjoin(root, f"{phase}_{stamp}.log"))
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricsLogger:
    """Scalar sink: jsonl always; TensorBoard when available."""

    def __init__(self, exp_dir: str, enable_tensorboard: bool = True):
        self.exp_dir = exp_dir
        os.makedirs(exp_dir, exist_ok=True)
        self._jsonl = open(pjoin(exp_dir, "metrics.jsonl"), "a")
        self._tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(pjoin(exp_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float],
            prefix: str = "") -> None:
        rec = {"step": step}
        for k, v in scalars.items():
            key = f"{prefix}{k}" if prefix else k
            rec[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
