"""Action-conditioned evaluation pipeline.

Rebuild of the reference ``a2m_eval``
(/root/reference/src/ladiff/models/modeltype/ladiff.py:1284-1326) and the
HUMANACT/UESTC metric updates (allsplit_step :1470-1483): generate motions
from action labels (CFG with zeroed action embedding as the unconditional
branch), then run the frozen GRU / ST-GCN classifier on generated and
ground-truth sequences and accumulate ActionClassifierMetrics.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ladiff_tpu.models.classifiers import MotionDiscriminator, STGCN

__all__ = ["make_a2m_eval_step", "run_a2m_eval"]


def make_a2m_eval_step(system, vae, classifier, classifier_params,
                       classifier_kind: str = "gru",
                       mesh=None) -> Callable:
    """jitted (params, batch, rng) -> features/logits for gen + gt.

    ``system`` here is an action-conditioned LADiffSystem whose denoiser has
    condition="action"; ``vae`` is the ActorVae.  Classifier inputs follow
    the reference protocol exactly:
      * HumanAct12 GRU: 24x3 SMPL joints from the Rotation2xyz forward pass
        (reference joints_eval_rst/ref, ladiff.py:1311-1314, consumed by
        HUMANACTMetrics' input_size=72 classifier at :1470-1474), flattened
        joints-major — the order the reference GRU sees after its
        reshape(bs, 24*3, T).permute(2,0,1) (humanact12_gru.py:28-31);
      * UESTC ST-GCN: raw rot6d features, channel-major reshape with the
        translation node dropped (ladiff.py:1475-1483).

    ``mesh``: optional data mesh — batch shards over the ``data`` axis and
    params replicate, mirroring make_eval_step (t2m_eval.py)."""

    def classify(motion, lengths, mask):
        if classifier_kind == "gru":
            joints = system.feats2joints_action_eval(motion, mask)
            B, T = joints.shape[:2]
            feats, logits = classifier.apply(
                {"params": classifier_params}, joints.reshape(B, T, -1),
                lengths)
        else:
            # reference slicing (ladiff.py:1475-1483): channel-major rot6d
            # reshape, translation node dropped -> 24-joint smpl graph
            from ladiff_tpu.models.classifiers import stgcn_input_from_feats
            feats, logits = classifier.apply(
                {"params": classifier_params}, stgcn_input_from_feats(motion))
        return feats, logits

    def step(params, batch, rng):
        lengths = batch["length"]
        actions = batch["action"][:, 0]
        # CFG: zeroed action embedding as the unconditional branch
        # (reference a2m_eval :1290-1291 + EmbedAction force mask)
        den = system.denoiser
        cond = den.apply({"params": params["denoiser"]}, actions,
                         method=den.embed_action)
        uncond = jnp.zeros_like(cond)
        z = system.diffusion_reverse(
            params["denoiser"], cond, uncond, lengths, rng)
        feats_rst = vae.apply(
            {"params": params["vae"]}, z, lengths,
            nframes=batch["motion"].shape[1], deterministic=True,
            method=vae.decode)
        mask = batch["mask"]
        rec_f, rec_l = classify(feats_rst, lengths, mask)
        gt_f, gt_l = classify(batch["motion"], lengths, mask)
        return {"rec_feats": rec_f, "rec_logits": rec_l,
                "gt_feats": gt_f, "gt_logits": gt_l,
                "feats_rst": feats_rst}

    if mesh is None:
        return jax.jit(step)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ladiff_tpu.parallel.mesh import DATA_AXIS
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    batch_sh = {"motion": data, "length": data, "action": data,
                "mask": data}
    return jax.jit(step, in_shardings=(repl, batch_sh, repl),
                   out_shardings=repl)


def run_a2m_eval(system, vae, params, dataset, classifier, classifier_params,
                 metrics, batch_size: int = 32, num_frames: int = 60,
                 classifier_kind: str = "gru", seed: int = 0):
    """One full pass over an action dataset, accumulating metrics.

    Batches are padded to ``batch_size`` (outputs trimmed back): one
    compiled shape for the whole pass, and the data-axis sharding divides
    for any mesh size that divides the batch size."""
    from ladiff_tpu.data.a2m import a2m_collate
    from ladiff_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    step = make_a2m_eval_step(system, vae, classifier, classifier_params,
                              classifier_kind,
                              mesh=mesh if batch_size % n_dev == 0 else None)
    rng = jax.random.PRNGKey(seed)
    n = len(dataset)
    for start in range(0, n, batch_size):
        items = [dataset[i] for i in range(start, min(start + batch_size, n))]
        n_true = len(items)
        batch = a2m_collate(items, num_frames)
        pad = batch_size - n_true
        rep_pad = lambda v: (np.concatenate(
            [v, np.repeat(v[-1:], pad, 0)]) if pad else v)
        device_batch = {k: jnp.asarray(rep_pad(np.asarray(v)))
                        for k, v in batch.items() if k != "action_text"}
        rng, step_rng = jax.random.split(rng)
        out = jax.device_get(step(params, device_batch, step_rng))
        if pad:
            out = {k: v[:n_true] for k, v in out.items()}
        metrics.update(batch["action"], out["rec_feats"], out["rec_logits"],
                       out["gt_feats"], out["gt_logits"],
                       list(batch["length"]))
    return metrics.compute()
