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
    ap.add_argument("--rng", default="threefry2x32",
                    choices=["threefry2x32", "rbg", "unsafe_rbg"],
                    help="PRNG impl for dropout/noise keys (TRAIN.RNG_IMPL)")
    ap.add_argument("--breakdown", action="store_true",
                    help="time VAE-step variants to localize the cost")
    ap.add_argument("--cpu", action="store_true",
                    help="run on host CPU (sanity-check mode; numbers are "
                         "not TPU numbers)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

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
    rng = jax.random.key(1, impl=args.rng)
    # ramp 40, 48, 56, ... wrapping so every length stays in
    # [40, args.frames] (clamped when frames itself is small)
    span = max(args.frames - 39, 1)
    lengths = np.minimum(40 + (8 * np.arange(B)) % span, args.frames)
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
        np.asarray(many(state, jax.random.key(7, impl=args.rng)))
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

    if args.breakdown:
        vae_breakdown(system, params["vae"], batch, rng, args, overhead)

    uncond = np.zeros((1, 1, 768), np.float32)
    state2 = create_train_state(params["denoiser"], tx)
    step2 = make_diffusion_train_step(system, mesh, params["vae"], uncond)
    text = jnp.asarray(
        np.random.RandomState(1).randn(B, 1, 768).astype(np.float32))
    bench("diffusion_train", state2, step2,
          extra={"text_emb": jax.device_put(text)})

    # joint stage (TRAIN.STAGE=vae_diffusion): both trees train together
    from ladiff_tpu.training.trainer import make_vae_diffusion_train_step
    state3 = create_train_state(
        {"vae": params["vae"], "denoiser": params["denoiser"]}, tx)
    step3 = make_vae_diffusion_train_step(system, mesh, uncond)
    bench("vae_diffusion_train", state3, step3,
          extra={"text_emb": jax.device_put(text)})


def vae_breakdown(system, vae_params, batch, rng, args, overhead):
    """Localize the VAE step cost: times grad passes of reduced graphs.

    Differences between rows bound individual components (dropout RNG,
    the feats2joints joint-loss chain, encoder vs decoder fwd+bwd); each
    row is scan-amortized over --iters evaluations like the step bench.

    Rows measure the PRODUCTION path (training-mode fused kernels engage
    where the train step would use them); only the ``train=False``
    variants trace under ``no_pallas()``, because they differentiate
    deterministic forwards and the inference kernels define no VJP.
    """
    _vae_breakdown_body(system, vae_params, batch, rng, args, overhead)


def _vae_breakdown_body(system, vae_params, batch, rng, args, overhead):
    import time
    from ladiff_tpu.losses.mld import vae_loss, smooth_l1

    feats = batch["motion"]
    lengths = batch["length"]

    def fwd(p, r, train):
        e, d, drop = jax.random.split(r, 3)
        z, mu, logvar, _ = system.vae.apply(
            {"params": p}, feats, lengths, rng=e, deterministic=not train,
            rngs={"dropout": drop} if train else {}, method=system.vae.encode)
        rst = system.vae.apply(
            {"params": p}, z, lengths, nframes=feats.shape[1],
            deterministic=not train,
            rngs={"dropout": jax.random.fold_in(drop, 1)} if train else {},
            method=system.vae.decode)
        return z, mu, logvar, rst

    def loss_full(p, r, train=True, joints=True):
        z, mu, logvar, rst = fwd(p, r, train)
        j_rst = system.feats2joints(rst) if joints else None
        j_ref = system.feats2joints(feats) if joints else None
        total, _ = vae_loss(rst, feats, j_rst, j_ref, mu, logvar,
                            system.weights)
        return total

    def loss_encode(p, r, train=True):
        e, drop = jax.random.split(r)
        z, mu, logvar, _ = system.vae.apply(
            {"params": p}, feats, lengths, rng=e, deterministic=not train,
            rngs={"dropout": drop} if train else {},
            method=system.vae.encode)
        return (jnp.mean(z.astype(jnp.float32) ** 2)
                + jnp.mean(mu.astype(jnp.float32) ** 2)
                + jnp.mean(logvar.astype(jnp.float32) ** 2))

    z0 = jax.jit(lambda p, r: fwd(p, r, False)[0])(vae_params, rng)

    def loss_decode(p, r, train=True):
        rst = system.vae.apply(
            {"params": p}, z0, lengths, nframes=feats.shape[1],
            deterministic=not train,
            rngs={"dropout": r} if train else {}, method=system.vae.decode)
        return smooth_l1(rst.astype(jnp.float32), feats)

    def loss_joints(x, r):
        return jnp.mean(system.feats2joints(x) ** 2)

    rows = [
        ("full_grad", lambda p, r: loss_full(p, r), vae_params),
        ("no_dropout_grad", lambda p, r: loss_full(p, r, train=False),
         vae_params),
        ("no_jointloss_grad", lambda p, r: loss_full(p, r, joints=False),
         vae_params),
        ("encoder_grad", loss_encode, vae_params),
        ("decoder_grad", loss_decode, vae_params),
        ("feats2joints_grad", loss_joints, feats),
        ("full_fwd_only", None, vae_params),
    ]

    for name, loss_fn, arg in rows:
        if loss_fn is None:
            def many(a, r):
                tot, _ = jax.lax.scan(
                    lambda c, rr: (c + loss_full(a, rr), None),
                    jnp.float32(0.0), jax.random.split(r, args.iters))
                return tot
        else:
            g = jax.value_and_grad(loss_fn)

            def many(a, r, g=g):
                def body(c, rr):
                    v, gr = g(a, rr)
                    # consume EVERY grad leaf, else XLA dead-code-eliminates
                    # the parts of the backward pass we are trying to time
                    gsum = sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in jax.tree.leaves(gr))
                    return c + v + gsum, None
                tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                                      jax.random.split(r, args.iters))
                return tot

        jitted = jax.jit(many)
        # trace-time scope: the deterministic-forward rows need the XLA
        # path for AD; the timed call below replays the cached executable
        import contextlib
        from ladiff_tpu.ops.pallas_common import no_pallas
        scope = (no_pallas() if name == "no_dropout_grad"
                 else contextlib.nullcontext())
        with scope:
            np.asarray(jitted(arg, rng))
        t0 = time.perf_counter()
        np.asarray(jitted(arg, jax.random.key(9, impl=args.rng)))
        dt = (time.perf_counter() - t0 - overhead) / args.iters
        print(json.dumps({"variant": name,
                          "ms": round(dt * 1e3, 2)}))


if __name__ == "__main__":
    main()
