"""HostPrefetcher: ordering, error propagation, clean shutdown — and
bitwise training determinism with the background host pipeline on vs off.

The prefetcher replaces the reference's Lightning NUM_WORKERS=8 dataloader
(/root/reference/src/configs/config_ladiff_humanml3d.yaml:34) as the
mechanism that hides per-step host work (collate, caption embedding,
host->device transfer) behind the device step.  The training rng stays on
the main thread, so results must not depend on TRAIN.PREFETCH.
"""
import logging
import os
import time

import numpy as np
import pytest

from ladiff_tpu.training.loop import HostPrefetcher

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_prefetcher_preserves_order_and_values():
    items = list(range(57))
    pf = HostPrefetcher(iter(items), lambda x: x * 2, depth=3)
    assert list(pf) == [x * 2 for x in items]


def test_prefetcher_propagates_iterator_error():
    def gen():
        yield 1
        raise RuntimeError("boom")

    pf = HostPrefetcher(gen(), lambda x: x, depth=2)
    out = []
    with pytest.raises(RuntimeError, match="boom"):
        for v in pf:
            out.append(v)
    assert out == [1]


def test_prefetcher_propagates_prepare_error():
    def prep(x):
        if x == 3:
            raise ValueError("bad batch")
        return x

    pf = HostPrefetcher(iter(range(10)), prep, depth=2)
    with pytest.raises(ValueError, match="bad batch"):
        list(pf)


def test_prefetcher_close_midstream_does_not_deadlock():
    pf = HostPrefetcher(iter(range(1000)), lambda x: x, depth=1)
    assert next(pf) == 0
    t0 = time.time()
    pf.close()
    assert time.time() - t0 < 5.0
    assert not pf._thread.is_alive()


def test_prefetcher_stop_aware_prepare_exits_promptly():
    """A prepare(item, stop) signature opts into mid-pipeline stop checks:
    close() must not wait out a slow stage (advisor finding, round 3)."""
    stages_entered = []

    def prep(x, stop):
        stages_entered.append(x)
        # simulate a slow multi-stage pipeline that polls the stop event
        for _ in range(100):
            if stop.is_set():
                return None
            time.sleep(0.02)
        return x

    pf = HostPrefetcher(iter(range(100)), prep, depth=1)
    assert pf._pass_stop
    time.sleep(0.1)  # let the producer enter prep(0)
    t0 = time.time()
    pf.close()
    assert time.time() - t0 < 1.0  # far below the 2 s the stage would take
    assert not pf._thread.is_alive()
    assert stages_entered[0] == 0


def test_prefetcher_one_arg_prepare_still_works():
    pf = HostPrefetcher(iter(range(5)), lambda x: x + 1, depth=2)
    assert not pf._pass_stop
    assert list(pf) == [1, 2, 3, 4, 5]


def _train_vae(tmp_path, name: str, prefetch: int):
    from ladiff_tpu.config import assemble_config
    from ladiff_tpu.data.datamodule import T2MDataModule
    from ladiff_tpu.data.synthetic import generate_synthetic_dataset
    from ladiff_tpu.data.word_vectorizer import HashWordVectorizer
    from ladiff_tpu.training.loop import run_training
    from ladiff_tpu.utils.checkpoint import CheckpointManager, \
        latest_checkpoint
    from ladiff_tpu.utils.logger import create_logger

    data_dir = str(tmp_path / "data")
    if not os.path.isdir(data_dir):
        generate_synthetic_dataset(data_dir, n_clips=32, seed=0)
    dm = T2MDataModule("humanml3d", data_dir, HashWordVectorizer(),
                       batch_size=8)
    cfg = assemble_config(
        os.path.join(REPO, "configs", "config_vae_humanml3d.yaml"),
        os.path.join(REPO, "configs", "assets.yaml"),
        overrides={
            "DEBUG": False,
            "FOLDER": str(tmp_path / "experiments"),
            "NAME": name,
            "TRAIN": {"BATCH_SIZE": 8, "END_EPOCH": 2,
                      "PREFETCH": prefetch},
            "model": {"num_layers": 3, "ff_size": 64,
                      "latent_dim": [7, 32]},
            "LOGGER": {"SACE_CHECKPOINT_EPOCH": 2},
        })
    logger = create_logger(cfg, phase="train")
    logger.setLevel(logging.WARNING)
    ckpt_dir = run_training(cfg, dm, logger, max_steps_per_epoch=3)
    step, _ = latest_checkpoint(ckpt_dir)
    _, tree = CheckpointManager(ckpt_dir).restore(step, None)
    return tree


def test_training_identical_with_and_without_prefetch(tmp_path):
    sync = _train_vae(tmp_path, "pf_off", prefetch=0)
    pref = _train_vae(tmp_path, "pf_on", prefetch=2)
    leaves_a, treedef_a = __import__("jax").tree.flatten(sync)
    leaves_b, treedef_b = __import__("jax").tree.flatten(pref)
    assert treedef_a == treedef_b
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
