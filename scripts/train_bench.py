"""Training-step throughput on the real TPU at reference batch sizes.

The reference trains stage-1 at bs 128 and stage-2 at bs 128 on 8 GPUs
(/root/reference/src/configs/config_vae_humanml3d.yaml:37-39,
config_ladiff_humanml3d.yaml:36-38); this measures our single-chip step
time / samples/s for both stages at full model size (9 layers, latent
[5+2, 256], 196-frame batches), using the axon-safe timing protocol from
PERF.md (sum-to-scalar inside jit, subtract a measured no-op round trip,
amortize over a scanned loop of steps).

Usage: python scripts/train_bench.py [--batch 128] [--iters 20]
Prints one JSON line per stage.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--frames", type=int, default=196)
    ap.add_argument("--bf16", action="store_true",
                    help="mixed precision (TRAIN.MIXED_PRECISION)")
    args = ap.parse_args()

    from ladiff_tpu.utils.jax_cache import enable as _enable
    _enable()
    from ladiff_tpu.models.ladiff import LADiffSystem
    from ladiff_tpu.parallel.mesh import make_mesh, shard_batch
    from ladiff_tpu.training.trainer import (create_train_state,
                                             make_diffusion_train_step,
                                             make_optimizer,
                                             make_vae_train_step)

    nfeats = 263
    system = LADiffSystem(
        nfeats=nfeats, njoints=22, max_frames=args.frames,
        latent_dim=(7, 256), ff_size=1024, num_layers=9, num_heads=4,
        dropout=0.1, text_encoded_dim=768, num_inference_timesteps=50,
        mean=np.zeros(nfeats, np.float32), std=np.ones(nfeats, np.float32),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    params = system.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh()
    tx = make_optimizer(1e-4)

    B = args.batch
    rng = jax.random.PRNGKey(1)
    lengths = np.minimum(
        40 + 8 * np.arange(B) % (args.frames - 39), args.frames)
    batch = {
        "motion": jnp.asarray(
            np.random.RandomState(0).randn(B, args.frames, nfeats)
            .astype(np.float32)),
        "length": jnp.asarray(lengths.astype(np.int32)),
    }
    batch = shard_batch(batch, mesh)

    @jax.jit
    def noop(r):
        return jnp.float32(jax.random.uniform(r, ()))

    np.asarray(noop(rng))
    t0 = time.perf_counter()
    for i in range(10):
        np.asarray(noop(jax.random.PRNGKey(i)))
    overhead = (time.perf_counter() - t0) / 10
    print(f"# no-op round trip: {overhead * 1e3:.2f} ms", file=sys.stderr)

    def bench(stage, state, step_fn, extra=None):
        """Scan-amortized timing (PERF.md protocol): ONE jit runs `iters`
        optimizer steps via lax.scan, so the per-call relay dispatch
        (hundreds of param handles serialized per call over axon) is paid
        once, not per step."""
        b = dict(batch)
        if extra:
            b.update(extra)
        raw = step_fn.raw_step

        @jax.jit
        def many(state, rng):
            def body(st, r):
                st, logs = raw(st, b, r)
                return st, logs["total"]
            state, totals = jax.lax.scan(
                body, state, jax.random.split(rng, args.iters))
            return jnp.float32(jnp.sum(totals))

        np.asarray(many(state, rng))                 # compile + warm
        t0 = time.perf_counter()
        np.asarray(many(state, jax.random.PRNGKey(7)))
        dt = (time.perf_counter() - t0 - overhead) / args.iters
        print(json.dumps({
            "stage": stage, "batch": B,
            "ms_per_step": round(dt * 1e3, 2),
            "samples_per_sec": round(B / dt, 1),
        }))

    # the step donates its state, so give it a copy — params["vae"] is
    # reused below for the frozen-VAE diffusion step
    state = create_train_state(jax.tree.map(jnp.copy, params["vae"]), tx)
    bench("vae_train", state, make_vae_train_step(system, mesh))

    uncond = np.zeros((1, 1, 768), np.float32)
    state2 = create_train_state(params["denoiser"], tx)
    step2 = make_diffusion_train_step(system, mesh, params["vae"], uncond)
    text = jnp.asarray(
        np.random.RandomState(1).randn(B, 1, 768).astype(np.float32))
    bench("diffusion_train", state2, step2,
          extra={"text_emb": jax.device_put(text)})


if __name__ == "__main__":
    main()
