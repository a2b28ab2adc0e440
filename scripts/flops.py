"""FLOPs profiling.

TPU-native equivalent of the reference's thop-based profiler
(/root/reference/src/scripts/flops.py:11-119): instead of instrumenting
torch modules, ask XLA for its cost analysis of the compiled programs —
exact for the graph it actually runs.

Usage: python scripts/flops.py [--batch 32] [--frames 196] [--steps 50]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import jax
import jax.numpy as jnp
import numpy as np


def cost(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {
        "flops": float(analysis.get("flops", float("nan"))),
        "bytes_accessed": float(analysis.get("bytes accessed",
                                             float("nan"))),
    }


def main():
    from ladiff_tpu.models.ladiff import LADiffSystem

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=196)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--train", action="store_true",
                    help="report the TRAINING steps (fwd+bwd+AdamW) instead "
                         "of the generation path")
    args = ap.parse_args()

    if args.train:
        return train_report(args)

    nfeats = 263
    system = LADiffSystem(
        nfeats=nfeats, njoints=22, max_frames=args.frames,
        latent_dim=(7, 256), ff_size=1024, num_layers=9, num_heads=4,
        num_inference_timesteps=args.steps,
        mean=np.zeros(nfeats, np.float32), std=np.ones(nfeats, np.float32))
    params = system.init_params(jax.random.PRNGKey(0))
    B, T = args.batch, args.frames
    feats = jnp.zeros((B, T, nfeats))
    lengths = jnp.full((B,), T, jnp.int32)
    text = jnp.zeros((B, 1, 768))
    rng = jax.random.PRNGKey(0)

    report = {}
    report["vae_encode"] = cost(
        lambda p, f, l, r: system.vae.apply({"params": p}, f, l, rng=r,
                                            method=system.vae.encode),
        params["vae"], feats, lengths, rng)
    z = jnp.zeros((B, system.max_it, 256))
    report["vae_decode"] = cost(
        lambda p, z, l: system.vae.apply({"params": p}, z, l, nframes=T,
                                         method=system.vae.decode),
        params["vae"], z, lengths)
    t = jnp.zeros((B,), jnp.int32)
    valid = jnp.ones((B, system.max_it), bool)
    report["denoiser_step"] = cost(
        lambda p, z, t, c, v: system.denoiser.apply({"params": p}, z, t, c, v),
        params["denoiser"], z, t, text, valid)
    report[f"full_ddim{args.steps}_generation"] = cost(
        lambda p, c, u, l, r: system.generate(p, c, u, l, r, nframes=T)[0],
        params, text, jnp.zeros_like(text), lengths, rng)

    for name, c in report.items():
        print(f"{name:>28s}: {c['flops']/1e9:10.2f} GFLOP  "
              f"{c['bytes_accessed']/1e6:10.1f} MB accessed")
    print(json.dumps(report))


def train_report(args):
    """XLA cost analysis of the three training steps.

    Traced with LADIFF_DISABLE_PALLAS=1: FLOP counts are graph-level and
    layout-independent, but XLA reports custom calls (the fused Mosaic
    kernels) as zero FLOPs — the un-fused graph is the true count.
    """
    os.environ["LADIFF_DISABLE_PALLAS"] = "1"
    from ladiff_tpu.models.ladiff import LADiffSystem
    from ladiff_tpu.parallel.mesh import make_mesh, shard_batch
    from ladiff_tpu.training.trainer import (create_train_state,
                                             make_diffusion_train_step,
                                             make_optimizer,
                                             make_vae_diffusion_train_step,
                                             make_vae_train_step)

    nfeats = 263
    system = LADiffSystem(
        nfeats=nfeats, njoints=22, max_frames=args.frames,
        latent_dim=(7, 256), ff_size=1024, num_layers=9, num_heads=4,
        dropout=0.1, text_encoded_dim=768,
        num_inference_timesteps=args.steps,
        mean=np.zeros(nfeats, np.float32), std=np.ones(nfeats, np.float32))
    params = system.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh()
    tx = make_optimizer(1e-4)
    B, T = args.batch, args.frames
    batch = {
        "motion": jnp.zeros((B, T, nfeats)),
        "length": jnp.full((B,), T, jnp.int32),
        "text_emb": jnp.zeros((B, 1, 768)),
    }
    batch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)
    uncond = np.zeros((1, 1, 768), np.float32)

    report = {}
    state = create_train_state(jax.tree.map(jnp.copy, params["vae"]), tx)
    report["vae_train_step"] = cost(
        make_vae_train_step(system, mesh).raw_step, state,
        {k: batch[k] for k in ("motion", "length")}, rng)
    state2 = create_train_state(params["denoiser"], tx)
    report["diffusion_train_step"] = cost(
        make_diffusion_train_step(system, mesh, params["vae"],
                                  uncond).raw_step,
        state2, batch, rng)
    state3 = create_train_state(
        {"vae": params["vae"], "denoiser": params["denoiser"]}, tx)
    report["vae_diffusion_train_step"] = cost(
        make_vae_diffusion_train_step(system, mesh, uncond).raw_step,
        state3, batch, rng)

    for name, c in report.items():
        print(f"{name:>28s}: {c['flops']/1e9:10.2f} GFLOP  "
              f"{c['bytes_accessed']/1e6:10.1f} MB accessed")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
