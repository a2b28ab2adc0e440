"""Benchmark evaluation entry point.

Mirrors the reference protocol (/root/reference/src/test.py:39-170):
REPLICATION_TIMES full passes of the T2M metric suite over the test split,
plus a separate mm_mode pass per replication for MultiModality, aggregated
as mean +- 1.96*sigma/sqrt(n), written to a table and metrics_<time>.json.
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from os.path import join as pjoin


def _aggregate(values):
    import numpy as np
    arr = np.asarray(values, dtype=np.float64)
    mean = arr.mean()
    conf = 1.96 * arr.std() / max(np.sqrt(len(arr)), 1)
    return float(mean), float(conf)


def run_test(cfg, logger, datamodule=None, text_encoder=None,
             params=None, evaluator=None):
    """Programmatic test runner; returns {metric: (mean, conf)}."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ladiff_tpu.data.datamodule import get_datasets
    from ladiff_tpu.evaluation.t2m_eval import T2MEvaluator, make_eval_step
    from ladiff_tpu.metrics.mm import MMMetrics
    from ladiff_tpu.metrics.mr import MRMetrics
    from ladiff_tpu.metrics.temos import TemosMetrics
    from ladiff_tpu.metrics.tm2t import TM2TMetrics
    from ladiff_tpu.training.loop import CaptionEmbedder, build_system
    from ladiff_tpu.utils.checkpoint import CheckpointManager, latest_checkpoint

    dm = datamodule or get_datasets(cfg, phase="test")[0]
    metric_types_all = list(cfg.METRIC.TYPE)
    if any(m in ("HUMANACTMetrics", "UESTCMetrics") for m in metric_types_all):
        return _run_a2m_test(cfg, logger, dm, params=params)
    system = build_system(cfg, dm)

    if params is None:
        ckpt_src = str(cfg.TEST.CHECKPOINTS)
        found = latest_checkpoint(ckpt_src)
        if found is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_src}")
        epoch, tree = CheckpointManager(ckpt_src).restore(found[0])
        params = jax.tree.map(jnp.asarray, tree["params"])
        logger.info(f"loaded checkpoint epoch {epoch} from {ckpt_src}")
    if "denoiser" not in params:
        params = dict(params)
        params["denoiser"] = system.init_params(jax.random.PRNGKey(0))["denoiser"]

    if text_encoder is None:
        from ladiff_tpu.models.clip_text import ClipTextEncoder
        text_encoder = ClipTextEncoder(
            modelpath=str(cfg.model.get("clip_path", "") or "") or None)
    embedder = CaptionEmbedder(text_encoder)

    if evaluator is None:
        t2m_path = str(cfg.model.get("t2m_path", "") or "")
        dataname = "t2m" if dm.name == "humanml3d" else dm.name
        fin = pjoin(t2m_path, dataname, "text_mot_match", "model", "finest.tar")
        evaluator = T2MEvaluator.from_checkpoint(fin, dm.nfeats)
        if evaluator is None:
            logger.warning(
                f"T2M evaluator weights not found at {fin}; using random-init "
                "evaluators (metrics are self-consistent only)")
            evaluator = T2MEvaluator.random_init(dm.nfeats)

    stage = str(cfg.TRAIN.STAGE)
    metric_types = list(cfg.METRIC.TYPE)
    reps = int(cfg.TEST.REPLICATION_TIMES)
    bs = int(cfg.TEST.BATCH_SIZE)

    # data-parallel eval over the device mesh (the reference forces test to
    # one GPU, config.py:193-197; here the benchmark is the same SPMD
    # program as training).  Every batch is padded to exactly TEST.BATCH_SIZE
    # below, so sharding divisibility only depends on the configured bs.
    from ladiff_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    eval_step = make_eval_step(system, evaluator, dm.mean_eval, dm.std_eval,
                               stage="vae" if stage == "vae" else "diffusion",
                               mesh=mesh if bs % n_dev == 0 else None)
    n_rep_mm = int(cfg.TEST.MM_NUM_REPEATS)
    eval_step_mm = make_eval_step(
        system, evaluator, dm.mean_eval, dm.std_eval,
        stage="vae" if stage == "vae" else "diffusion",
        mesh=mesh if n_rep_mm % n_dev == 0 else None)
    all_metrics = defaultdict(list)
    rng = jax.random.PRNGKey(int(cfg.get("SEED_VALUE", 1234)))

    from ladiff_tpu.metrics.uncond import UncondMetrics
    # batch padding makes these loop-invariant [bs/n_rep, 1, D] — build and
    # upload once (host->device transfers over the relay are slow)
    uncond = jnp.asarray(np.repeat(embedder.uncond, bs, 0))
    uncond_mm = jnp.asarray(np.repeat(embedder.uncond, n_rep_mm, 0))
    count_time = bool(cfg.TEST.get("COUNT_TIME", False))
    # TEST.SAVE_LATENTS (reference ladiff.py:1175-1191): during vae-stage
    # eval, dump each batch's gt-encoded latents as
    # datasets/latents/latent_<n>.npy with a running 6-digit counter.
    # (The reference requires ./datasets/latents to pre-exist; we create it.)
    save_latents = bool(cfg.TEST.get("SAVE_LATENTS", False)) and stage == "vae"
    latents_dir = str(cfg.TEST.get("LATENTS_DIR", "./datasets/latents"))
    if save_latents:
        import re
        os.makedirs(latents_dir, exist_ok=True)
        # next index = max existing latent_<n> + 1 (a plain file count can
        # collide with existing dumps when unrelated files match or the
        # sequence has gaps)
        existing = [int(m.group(1)) for f in os.listdir(latents_dir)
                    if (m := re.fullmatch(r"latent_(\d+)\.npy", f))]
        latent_count = max(existing, default=-1) + 1
    times = []
    for rep in range(reps):
        tm2t = TM2TMetrics(diversity_times=min(
            int(cfg.TEST.DIVERSITY_TIMES), 300), seed=rep)
        temos = TemosMetrics(njoints=dm.njoints,
                             jointstype=dm.name)
        mr = MRMetrics(njoints=dm.njoints)
        uncond_metric = UncondMetrics(seed=rep)
        t0 = time.time()
        n_seq = 0
        for batch in dm.loader("test", batch_size=bs, shuffle=True, seed=rep):
            texts = batch["text"]
            n_true = len(texts)
            # pad ragged final batches to the one compiled shape (outputs
            # trimmed to n_true below); also keeps the data-axis sharding
            # divisible for any mesh size that divides TEST.BATCH_SIZE
            pad = bs - n_true
            rep_pad = lambda v: (np.concatenate(
                [v, np.repeat(v[-1:], pad, 0)]) if pad else v)
            cond = jnp.asarray(rep_pad(embedder(texts)))
            device_batch = {
                "motion": jnp.asarray(rep_pad(batch["motion"])),
                "length": jnp.asarray(rep_pad(batch["length"])),
                "word_embs": jnp.asarray(rep_pad(batch["word_embs"])),
                "pos_ohot": jnp.asarray(rep_pad(batch["pos_ohot"])),
                "text_len": jnp.asarray(rep_pad(batch["text_len"])),
            }
            rng, step_rng = jax.random.split(rng)
            bt0 = time.time()
            out = jax.device_get(eval_step(params, device_batch, cond,
                                           uncond, step_rng))
            if pad:
                out = {k: v[:n_true] for k, v in out.items()}
            if count_time:
                # reference TEST.COUNT_TIME: per-batch latency, times.txt
                # (ladiff.py:253-306)
                times.append(time.time() - bt0)
            if save_latents:
                np.save(pjoin(latents_dir, f"latent_{latent_count:06d}.npy"),
                        np.asarray(out["z"]))
                latent_count += 1
            lengths = list(np.asarray(batch["length"]))
            n_seq += len(lengths)
            if "TM2TMetrics" in metric_types:
                tm2t.update(out["lat_t"], out["lat_rm"], out["lat_m"], lengths)
            if "TemosMetric" in metric_types:
                temos.update(out["joints_rst"], out["joints_ref"], lengths)
            if "MRMetrics" in metric_types:
                mr.update(out["joints_rst"], out["joints_ref"], lengths)
            if "UncondMetrics" in metric_types:
                uncond_metric.update(out["lat_rm"], out["lat_m"], lengths)

        rep_metrics = {}
        if "TM2TMetrics" in metric_types and n_seq > tm2t.R_size:
            rep_metrics.update(tm2t.compute())
        if "TemosMetric" in metric_types:
            rep_metrics.update(temos.compute())
        if "MRMetrics" in metric_types:
            rep_metrics.update(mr.compute())
        if "UncondMetrics" in metric_types and uncond_metric.count_seq > 1:
            rep_metrics.update(
                {f"uncond_{k}": v
                 for k, v in uncond_metric.compute().items()})

        # MultiModality pass (reference test.py:142-146)
        if "TM2TMetrics" in metric_types and stage != "vae":
            mm = MMMetrics(mm_num_times=int(cfg.TEST.MM_NUM_TIMES), seed=rep)
            dm.mm_mode(True, int(cfg.TEST.MM_NUM_SAMPLES), seed=rep)
            for batch in dm.loader("test", batch_size=1, shuffle=False):
                texts = list(batch["text"]) * n_rep_mm
                cond = jnp.asarray(embedder(texts))
                rep_batch = {
                    "motion": jnp.asarray(
                        np.repeat(batch["motion"], n_rep_mm, 0)),
                    "length": jnp.asarray(
                        np.repeat(batch["length"], n_rep_mm, 0)),
                    "word_embs": jnp.asarray(
                        np.repeat(batch["word_embs"], n_rep_mm, 0)),
                    "pos_ohot": jnp.asarray(
                        np.repeat(batch["pos_ohot"], n_rep_mm, 0)),
                    "text_len": jnp.asarray(
                        np.repeat(batch["text_len"], n_rep_mm, 0)),
                }
                rng, step_rng = jax.random.split(rng)
                out = jax.device_get(eval_step_mm(params, rep_batch,
                                                  cond, uncond_mm, step_rng))
                mm.update(out["lat_rm"][None], [1])
            dm.mm_mode(False)
            if mm.count_seq > int(cfg.TEST.MM_NUM_TIMES):
                rep_metrics.update(mm.compute())

        for k, v in rep_metrics.items():
            all_metrics[k].append(float(v))
        logger.info(f"replication {rep + 1}/{reps} done in "
                    f"{time.time() - t0:.1f}s: "
                    + " ".join(f"{k}={v:.4f}" for k, v in
                               sorted(rep_metrics.items())))

    summary = {k: _aggregate(v) for k, v in all_metrics.items()}
    lines = [f"{k:>24s}: {m:.4f} ± {c:.4f}" for k, (m, c) in
             sorted(summary.items())]
    logger.info("==== final metrics ====\n" + "\n".join(lines))

    out_dir = cfg.get("FOLDER_EXP", ".")
    if count_time and times:
        mean_t = float(np.mean(times))
        logger.info(f"mean eval-step latency: {mean_t * 1e3:.1f} ms/batch "
                    f"({mean_t / bs * 1e3:.2f} ms/sample)")
        with open(pjoin(out_dir, "times.txt"), "w") as f:
            f.write("\n".join(str(t) for t in times) + "\n")
    stamp = time.strftime("%Y-%m-%dT%H-%M-%S")
    with open(pjoin(out_dir, f"metrics_{stamp}.json"), "w") as f:
        json.dump({k: {"mean": m, "conf": c} for k, (m, c) in summary.items()},
                  f, indent=2)
    return summary


def _run_a2m_test(cfg, logger, dataset, params=None):
    """Action-conditioned benchmark (reference HUMANACT/UESTC metric path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ladiff_tpu.evaluation.a2m_eval import run_a2m_eval
    from ladiff_tpu.metrics.a2m import ActionClassifierMetrics
    from ladiff_tpu.models.classifiers import (MotionDiscriminator, STGCN,
                                               load_gru_classifier_checkpoint,
                                               load_stgcn_checkpoint)
    from ladiff_tpu.models.ladiff import LADiffSystem
    from ladiff_tpu.utils.checkpoint import CheckpointManager, latest_checkpoint

    nfeats = int(cfg.DATASET.NFEATS)
    system = LADiffSystem.from_cfg(
        cfg, nfeats=nfeats, njoints=int(cfg.DATASET.NJOINTS),
        mean=np.zeros(nfeats, np.float32), std=np.ones(nfeats, np.float32))
    vae = system.vae
    if params is None:
        found = latest_checkpoint(str(cfg.TEST.CHECKPOINTS))
        if found is None:
            raise FileNotFoundError(
                f"no checkpoint under {cfg.TEST.CHECKPOINTS}")
        _, tree = CheckpointManager(str(cfg.TEST.CHECKPOINTS)).restore(found[0])
        params = jax.tree.map(jnp.asarray, tree["params"])

    is_uestc = "UESTCMetrics" in list(cfg.METRIC.TYPE)
    num_labels = int(cfg.DATASET.get("NCLASSES", 12))
    if is_uestc:
        # reference UESTCMetrics classifier (metrics/stgcn.py:32-49):
        # 24-joint smpl graph, rot6d channels, translation node dropped
        clf = STGCN(in_channels=6, num_class=num_labels, num_nodes=24)
        stgcn_path = pjoin(
            str(cfg.model.get("uestc_rec_path", "") or
                "deps/actionrecognition"), "uestc_rot6d_stgcn.tar")
        clf_params = load_stgcn_checkpoint(stgcn_path)
        if clf_params is None:
            logger.warning(f"ST-GCN ckpt not found at {stgcn_path}; "
                           "using random init (self-consistent only)")
            clf_params = clf.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 60, 24, 6)))["params"]
        kind = "stgcn"
    else:
        # the released HumanAct12 classifier consumes 24x3 SMPL joints from
        # Rotation2xyz, NOT raw features — input_size is pinned to 72 like
        # the reference (metrics/gru.py:32-36; joints_eval from
        # ladiff.py:1311-1314)
        clf = MotionDiscriminator(input_size=72, hidden_size=128,
                                  hidden_layer=2, output_size=num_labels)
        clf_params = None
        gru_path = str(cfg.model.get("humanact12_rec_path", "") or
                       "deps/actionrecognition/humanact12_gru.tar")
        loaded = load_gru_classifier_checkpoint(gru_path)
        if loaded is not None:
            clf_params = loaded
        else:
            logger.warning(f"GRU classifier ckpt not found at {gru_path}; "
                           "using random init (self-consistent only)")
            clf_params = clf.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 60, 72)),
                                  jnp.array([60]))["params"]
        kind = "gru"

    reps = int(cfg.TEST.REPLICATION_TIMES)
    num_frames = int(cfg.DATASET.get(
        "HUMANACT12" if not is_uestc else "UESTC", {}).get("NUM_FRAMES", 60))
    if hasattr(dataset, "dataset"):  # ActionDataModule -> eval split
        dataset = dataset.dataset("test")
    all_metrics = defaultdict(list)
    for rep in range(reps):
        metrics = ActionClassifierMetrics(num_labels=num_labels, seed=rep)
        out = run_a2m_eval(system, vae, params, dataset, clf, clf_params,
                           metrics, batch_size=int(cfg.TEST.BATCH_SIZE),
                           num_frames=num_frames, classifier_kind=kind,
                           seed=rep)
        for k, v in out.items():
            all_metrics[k].append(float(v))
        logger.info(f"replication {rep + 1}/{reps}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in sorted(out.items())))
    summary = {k: _aggregate(v) for k, v in all_metrics.items()}
    lines = [f"{k:>24s}: {m:.4f} ± {c:.4f}" for k, (m, c) in
             sorted(summary.items())]
    logger.info("==== final metrics ====\n" + "\n".join(lines))
    return summary


def main():
    from ladiff_tpu.utils.jax_cache import enable as _enable_jax_cache
    _enable_jax_cache()

    from ladiff_tpu.config import parse_args
    from ladiff_tpu.utils.logger import create_logger

    cfg = parse_args("test")
    logger = create_logger(cfg, phase="test")
    run_test(cfg, logger)


if __name__ == "__main__":
    main()
