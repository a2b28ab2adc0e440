"""Epoch-level training throughput on hardware: host pipeline vs step floor.

The round-2 review flagged the input pipeline as fully synchronous
(per-step host collate -> caption embedding -> host->device transfer
serialized with the device step); round 3 added the background
HostPrefetcher (training/loop.py).  This measures what the device
actually sees: a file-backed synthetic training epoch through the
PRODUCTION ``run_training`` loop, prefetch off vs on, against the pure
device-step floor from scripts/train_bench.py (state pre-staged,
host work excluded).

The epoch seconds are parsed from run_training's own per-epoch log lines,
so the measured path is exactly the production one.  The first epoch pays
compilation (and, for the diffusion stage, the caption-embedding cache
fill); steady state is the min over the remaining epochs.

Usage:  python scripts/epoch_bench.py [--batch 128] [--clips 1280]
        [--epochs 3] [--stage vae] [--bf16] [--rng rbg]
Prints one JSON line per prefetch setting.

Reference surface being compared: Lightning's NUM_WORKERS=8 dataloader
(/root/reference/src/configs/config_ladiff_humanml3d.yaml:34).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import re
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _EpochTimes(logging.Handler):
    """Captures the '(Xs)' suffix of run_training's epoch lines."""

    pat = re.compile(r"epoch (\d+) \[.*\((\d+\.\d)s\)$")

    def __init__(self):
        super().__init__()
        self.seconds = []

    def emit(self, record):
        m = self.pat.search(record.getMessage())
        if m:
            self.seconds.append(float(m.group(2)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--clips", type=int, default=1280)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--stage", default="vae", choices=["vae", "diffusion"])
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--rng", default="rbg",
                    choices=["threefry2x32", "rbg", "unsafe_rbg"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ladiff_tpu.utils.jax_cache import enable as _enable
    _enable()
    from ladiff_tpu.config import assemble_config
    from ladiff_tpu.data.datamodule import T2MDataModule
    from ladiff_tpu.data.synthetic import generate_synthetic_dataset
    from ladiff_tpu.data.word_vectorizer import HashWordVectorizer
    from ladiff_tpu.training.loop import run_training

    tmp = tempfile.mkdtemp(prefix="epoch_bench_")
    data_dir = os.path.join(tmp, "data")
    generate_synthetic_dataset(data_dir, n_clips=args.clips, seed=0)
    dm = T2MDataModule("humanml3d", data_dir, HashWordVectorizer(),
                       batch_size=args.batch)
    steps = args.clips // args.batch

    cfg_name = ("config_vae_humanml3d.yaml" if args.stage == "vae"
                else "config_ladiff_humanml3d.yaml")
    for prefetch in (0, 2):
        cfg = assemble_config(
            os.path.join(REPO, "configs", cfg_name),
            os.path.join(REPO, "configs", "assets.yaml"),
            overrides={
                "DEBUG": False,
                "FOLDER": os.path.join(tmp, f"exp_pf{prefetch}"),
                "NAME": f"epoch_bench_pf{prefetch}",
                "TRAIN": {"BATCH_SIZE": args.batch,
                          "END_EPOCH": args.epochs,
                          "PREFETCH": prefetch,
                          "MIXED_PRECISION": bool(args.bf16),
                          "RNG_IMPL": args.rng,
                          # stage-2 normally boots from a stage-1 ckpt;
                          # random init is fine for throughput
                          "PRETRAINED_VAE": ""},
                "LOGGER": {"SACE_CHECKPOINT_EPOCH": 10 ** 6},
            })
        logger = logging.getLogger(f"epoch_bench_pf{prefetch}")
        logger.setLevel(logging.INFO)
        cap = _EpochTimes()
        logger.addHandler(cap)
        run_training(cfg, dm, logger)
        steady = min(cap.seconds[1:]) if len(cap.seconds) > 1 else None
        print(json.dumps({
            "stage": args.stage, "batch": args.batch, "steps": steps,
            "prefetch": prefetch,
            "epoch_s": cap.seconds,
            "steady_ms_per_step": (round(steady / steps * 1e3, 2)
                                   if steady else None),
            "samples_per_sec": (round(args.batch * steps / steady, 1)
                                if steady else None),
        }))


if __name__ == "__main__":
    main()
