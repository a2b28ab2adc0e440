"""Stage-level timing breakdown on the real TPU (sampler vs decode).

Uses the axon-safe protocol (PERF.md): reduce to a scalar inside jit, fetch
it, subtract a measured no-op round trip.  Prints one JSON line per stage.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
STEPS = 50
FRAMES = 196


def timeit(fn, *args, iters=5, overhead=0.0):
    np.asarray(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / iters - overhead


def main():
    from ladiff_tpu.utils.jax_cache import enable as _enable
    _enable()
    from ladiff_tpu.models.ladiff import LADiffSystem

    nfeats, njoints = 263, 22
    dtype = jnp.bfloat16
    system = LADiffSystem(
        nfeats=nfeats, njoints=njoints, max_frames=FRAMES,
        latent_dim=(7, 256), ff_size=1024, num_layers=9, num_heads=4,
        dropout=0.1, text_encoded_dim=768, num_inference_timesteps=STEPS,
        mean=np.zeros(nfeats, np.float32), std=np.ones(nfeats, np.float32),
        dtype=dtype)
    params = system.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    rng0 = jax.random.PRNGKey(1)
    text_cond = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, 1, 768).astype(np.float32))
    text_uncond = jnp.zeros((BATCH, 1, 768), jnp.float32)
    lengths = jnp.full((BATCH,), FRAMES, jnp.int32)

    @jax.jit
    def noop(rng):
        return jnp.float32(jax.random.uniform(rng, ()))

    np.asarray(noop(rng0))
    t0 = time.perf_counter()
    for i in range(10):
        np.asarray(noop(jax.random.PRNGKey(i)))
    overhead = (time.perf_counter() - t0) / 10
    print(f"# no-op round trip: {overhead * 1e3:.2f} ms")

    @jax.jit
    def sample_only(params, rng):
        z = system.diffusion_reverse(params["denoiser"], text_cond,
                                     text_uncond, lengths, rng)
        return jnp.float32(jnp.sum(z))

    @jax.jit
    def full(params, rng):
        feats, _ = system.generate(params, text_cond, text_uncond, lengths,
                                   rng, nframes=FRAMES)
        return jnp.float32(jnp.sum(feats))

    t_sample = timeit(sample_only, params, rng0, overhead=overhead)
    t_full = timeit(full, params, rng0, overhead=overhead)
    t_decode = t_full - t_sample
    for name, t in (("sampler_50steps", t_sample), ("decode", t_decode),
                    ("full", t_full)):
        print(json.dumps({
            "stage": name, "ms_per_batch": round(t * 1e3, 2),
            "ms_per_step": round(t * 1e3 / STEPS, 3)
            if name == "sampler_50steps" else None,
            "samples_per_sec": round(BATCH / t, 1),
        }))


if __name__ == "__main__":
    main()
