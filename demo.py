"""Single-prompt inference entry point.

Mirrors the reference demo (/root/reference/src/demo.py): reads an example
txt file with ``length text`` per line (utils/demo_utils.py:6-21), generates
motions, saves per-sample ``.npy`` joints + ``.txt`` captions, and prints
FPS timings.  Supports the latentwise fw/bw generation ablation
(reference demo.py:46-53 + ladiff.py:274-283: repeat each latent set
MAX_IT times, progressively zeroing later/earlier rows to visualize what
each latent token contributes).
"""
from __future__ import annotations

import os
import time
from os.path import join as pjoin

DEFAULT_EXAMPLES = [
    (196, "a person walks forward and then turns around"),
    (120, "someone jumps twice and raises both arms"),
    (64, "a person sits down on a chair"),
]


def load_example_file(path):
    """`length text` per line (reference utils/demo_utils.py:6-21)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            length, text = line.split(" ", 1)
            out.append((int(length), text))
    return out


def main():
    from ladiff_tpu.utils.jax_cache import enable as _enable_jax_cache
    _enable_jax_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ladiff_tpu.config import parse_args
    from ladiff_tpu.data.datamodule import get_datasets
    from ladiff_tpu.models.clip_text import ClipTextEncoder
    from ladiff_tpu.training.loop import CaptionEmbedder, build_system
    from ladiff_tpu.utils.checkpoint import CheckpointManager, latest_checkpoint
    from ladiff_tpu.utils.logger import create_logger

    cfg = parse_args("demo")
    logger = create_logger(cfg, phase="demo")
    dm = get_datasets(cfg, phase="test")[0]
    system = build_system(cfg, dm)

    example = cfg.DEMO.get("EXAMPLE")
    pairs = load_example_file(example) if example else DEFAULT_EXAMPLES
    lengths = [min(l, system.max_frames) for l, _ in pairs]
    texts = [t for _, t in pairs]

    ckpt_src = str(cfg.TEST.CHECKPOINTS)
    found = latest_checkpoint(ckpt_src)
    if found is not None:
        _, tree = CheckpointManager(ckpt_src).restore(found[0])
        params = jax.tree.map(jnp.asarray, tree["params"])
        logger.info(f"loaded checkpoint epoch {found[0]}")
    else:
        logger.warning(f"no checkpoint under {ckpt_src}; using random init")
        params = system.init_params(jax.random.PRNGKey(0))

    text_encoder = ClipTextEncoder(
        modelpath=str(cfg.model.get("clip_path", "") or "") or None)
    embedder = CaptionEmbedder(text_encoder)
    cond = jnp.asarray(embedder(texts))
    uncond = jnp.asarray(np.repeat(embedder.uncond, len(texts), 0))
    lengths_arr = jnp.asarray(np.array(lengths, np.int32))

    rng0 = jax.random.PRNGKey(int(cfg.get("SEED_VALUE", 1234)))
    latentwise = cfg.DEMO.get("LATENTWISE_GEN")
    task = str(cfg.DEMO.get("TASK", "text_motion"))
    # reference demo flags: --replication runs the whole generation N
    # times; --allinone (DEMO.OUTALL) additionally groups all replications
    # into one [nsample, nrep, T, J, 3] npy (reference demo.py:210-230;
    # per-rep files there silently overwrite each other — here rep r > 0
    # gets a _rep{r} suffix instead)
    reps = int(cfg.DEMO.get("REPLICATION", 1) or 1)
    outall = bool(cfg.DEMO.get("OUTALL", False))
    if latentwise and (reps > 1 or outall):
        raise SystemExit("--latentwise_gen is incompatible with "
                         "--replication/--allinone (same as the reference)")
    rep_joints, rep_lengths = [], []

    t0 = time.time()
    for rep_i in range(reps):
        rng = jax.random.fold_in(rng0, rep_i)
        texts = [t for _, t in pairs]
        lengths_arr = jnp.asarray(np.array(lengths, np.int32))
        joints, texts, lengths_arr = _generate_once(
            cfg, system, params, rng, cond, uncond, texts, lengths_arr,
            pairs, task, latentwise, logger,
            plot_att_allowed=(rep_i == 0))
        rep_joints.append(joints)
        rep_lengths.append(np.asarray(lengths_arr))
    dt = time.time() - t0
    logger.info(f"generated {len(texts) * reps} motions in {dt:.2f}s "
                f"({reps * sum(lengths) / dt:.1f} fps overall)")

    out_dir = cfg.DEMO.get("OUT_DIR") or pjoin(cfg.get("FOLDER_EXP", "."),
                                               "samples")
    os.makedirs(out_dir, exist_ok=True)
    for rep_i, (joints, lengths_np) in enumerate(zip(rep_joints, rep_lengths)):
        suffix = f"_rep{rep_i}" if rep_i else ""
        for i, text in enumerate(texts):
            L = int(lengths_np[i])
            np.save(pjoin(out_dir, f"sample_{i:03d}{suffix}.npy"),
                    joints[i, :L])
            with open(pjoin(out_dir, f"sample_{i:03d}{suffix}.txt"),
                      "w") as f:
                f.write(text + "\n")
    if outall:
        # [nsample, nrep, T<=max(lengths), J, 3] grouped output + captions
        # + a lengths npy so consumers can trim per sample (the reference's
        # grouped file keeps untrimmed frames and crashes on mixed lengths)
        lengths_np = rep_lengths[0]
        combined = np.stack(rep_joints, axis=1)[:, :, :int(lengths_np.max())]
        np.save(pjoin(out_dir, f"{task}_all.npy"), combined)
        np.save(pjoin(out_dir, f"{task}_all_lengths.npy"), lengths_np)
        with open(pjoin(out_dir, f"{task}_all.txt"), "w") as f:
            for _ in range(reps):
                for text in texts:
                    f.write(text + "\n")
        logger.info(f"saved grouped output {combined.shape} to "
                    f"{pjoin(out_dir, task + '_all.npy')}")
    logger.info(f"saved {len(texts) * reps} samples to {out_dir}")


def _generate_once(cfg, system, params, rng, cond, uncond, texts,
                   lengths_arr, pairs, task, latentwise, logger,
                   plot_att_allowed=True):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ladiff_tpu.utils.masks import latent_valid_mask

    if task == "random_latent":
        # sample z ~ N(0, I) with the per-length active mask
        # (reference demo task "random_sampling")
        z = jax.random.normal(
            rng, (len(texts), system.max_it, system.latent_dim[-1]))
        z = jnp.where(latent_valid_mask(lengths_arr, system.frame_per_latent,
                                        system.max_it)[:, :, None], z, 0.0)
    elif task == "reconstruction":
        # encode+decode a provided motion npy (reference recon_from_motion,
        # ladiff.py:320-331); expects --example pointing at a .npy features
        # file alongside the text file
        motion_npy = str(cfg.DEMO.get("EXAMPLE", "")).replace(".txt", ".npy")
        feats_in = jnp.asarray(np.load(motion_npy))[None]
        lengths_arr = jnp.asarray([feats_in.shape[1]])
        texts = ["reconstruction"]
        z, _, _, _ = system.vae.apply(
            {"params": params["vae"]}, feats_in, lengths_arr,
            rng=rng, deterministic=True, method=system.vae.encode)
    else:
        reverse = (system.diffusion_reverse_ar if system.ardiff
                   else system.diffusion_reverse)
        z = reverse(params["denoiser"], cond, uncond, lengths_arr, rng)
    if latentwise in ("fw", "bw"):
        # repeat each sample MAX_IT times with progressive latent masking
        M = system.max_it
        z = jnp.repeat(z, M, axis=0)
        lengths_arr = jnp.repeat(lengths_arr, M)
        texts = [t for t in texts for _ in range(M)]
        keep = jnp.arange(M)[None, :]  # latent row index
        step = jnp.tile(jnp.arange(M), (len(pairs),))[:, None]
        mask = (keep <= step) if latentwise == "fw" else (keep >= M - 1 - step)
        base_valid = latent_valid_mask(lengths_arr, system.frame_per_latent, M)
        z = jnp.where((mask & base_valid)[:, :, None], z, 0.0)
    plot_att = bool(cfg.DEMO.get("PLOT_ATT_MAP", False)) and plot_att_allowed
    out = system.vae.apply(
        {"params": params["vae"]}, z, lengths_arr,
        nframes=system.max_frames, deterministic=True,
        return_cross_weights=plot_att,
        method=system.vae.decode)
    if plot_att:
        # cross-attention heatmaps frames x latents per decoder block
        # (reference cross_attention.py:378-407 dumps these per layer)
        feats, cross_weights = out
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        att_dir = pjoin(cfg.get("FOLDER_EXP", "."), "att_maps")
        os.makedirs(att_dir, exist_ok=True)
        for bi, w in enumerate(jax.device_get(cross_weights)):
            fig, ax = plt.subplots(figsize=(3, 6))
            ax.imshow(np.asarray(w[0]), aspect="auto", cmap="viridis")
            ax.set_xlabel("latents")
            ax.set_ylabel("frames")
            fig.savefig(pjoin(att_dir, f"block_{bi}.png"),
                        bbox_inches="tight", dpi=120)
            plt.close(fig)
        logger.info(f"saved {len(cross_weights)} attention maps to {att_dir}")
    else:
        feats = out
    joints = jax.device_get(system.feats2joints(feats))
    return joints, texts, lengths_arr


if __name__ == "__main__":
    main()
