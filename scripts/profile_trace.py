"""jax.profiler trace capture over the generation hot path.

The reference's tracing story is ad-hoc wall-clock timing (COUNT_TIME,
/root/reference/src/ladiff/models/modeltype/ladiff.py:253-306 and demo FPS
prints, demo.py:308-327) — `test.py --cfg ... TEST.COUNT_TIME` covers that
here.  This script is the TPU-native upgrade: it wraps the jitted sampler +
decode in a `jax.profiler.trace` so the XLA/TPU timeline (per-fusion,
per-pallas-kernel) can be inspected in TensorBoard or Perfetto
(`tensorboard --logdir <out>` / ui.perfetto.dev), and prints the same
samples/s counters as scripts/breakdown.py.

Trace capture may be unavailable over the axon relay (remote device);
the script then still reports host-side stage timings and says so.

Usage:  python scripts/profile_trace.py [--out /tmp/ladiff_trace] [--batch 256]
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
    ap.add_argument("--out", default="/tmp/ladiff_trace")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--frames", type=int, default=196)
    args = ap.parse_args()

    from ladiff_tpu.utils.jax_cache import enable as _enable
    _enable()
    from ladiff_tpu.models.ladiff import LADiffSystem

    nfeats, njoints = 263, 22
    dtype = jnp.bfloat16
    system = LADiffSystem(
        nfeats=nfeats, njoints=njoints, max_frames=args.frames,
        latent_dim=(7, 256), ff_size=1024, num_layers=9, num_heads=4,
        dropout=0.1, text_encoded_dim=768,
        num_inference_timesteps=args.steps,
        mean=np.zeros(nfeats, np.float32), std=np.ones(nfeats, np.float32),
        dtype=dtype)
    params = system.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    B = args.batch
    text_cond = jnp.asarray(
        np.random.RandomState(0).randn(B, 1, 768).astype(np.float32))
    text_uncond = jnp.zeros((B, 1, 768), jnp.float32)
    lengths = jnp.full((B,), args.frames, jnp.int32)
    rng0 = jax.random.PRNGKey(1)

    @jax.jit
    def full(params, rng):
        feats, _ = system.generate(params, text_cond, text_uncond, lengths,
                                   rng, nframes=args.frames)
        return jnp.float32(jnp.sum(feats))

    np.asarray(full(params, rng0))  # compile + warm outside the trace

    traced = False
    try:
        with jax.profiler.trace(args.out):
            t0 = time.perf_counter()
            np.asarray(full(params, rng0))
            dt = time.perf_counter() - t0
        traced = True
    except Exception as e:  # remote-device capture can be unsupported
        print(f"# trace capture unavailable ({type(e).__name__}: {e}); "
              "host timing only", file=sys.stderr)
        t0 = time.perf_counter()
        np.asarray(full(params, rng0))
        dt = time.perf_counter() - t0

    print(json.dumps({
        "stage": "full_generate", "ms_per_batch": round(dt * 1e3, 2),
        "samples_per_sec": round(B / dt, 1),
        "trace_dir": args.out if traced else None,
    }))
    if traced:
        print(f"# inspect with: tensorboard --logdir {args.out}")


if __name__ == "__main__":
    main()
