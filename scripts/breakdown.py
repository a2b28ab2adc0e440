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

    # scan-amortized (K back-to-back batches inside one jit): the per-call
    # relay dispatch spreads over K, so stage sums match the steady-state
    # bench.py protocol instead of under-reading by the dispatch wobble
    K = 8

    def scanned(body):
        @jax.jit
        def many(params, rng):
            acc, _ = jax.lax.scan(
                lambda c, r: (c + body(params, r), None),
                jnp.float32(0.0), jax.random.split(rng, K))
            return acc
        return many

    sample_many = scanned(
        lambda p, r: jnp.float32(jnp.sum(system.diffusion_reverse(
            p["denoiser"], text_cond, text_uncond, lengths, r))))
    full_many = scanned(
        lambda p, r: jnp.float32(jnp.sum(system.generate(
            p, text_cond, text_uncond, lengths, r, nframes=FRAMES)[0])))

    z0 = jax.jit(lambda p, r: system.diffusion_reverse(
        p["denoiser"], text_cond, text_uncond, lengths, r))(params, rng0)

    def decode_body(p, r):
        # tie the input to the scan key so XLA cannot hoist the (otherwise
        # loop-invariant) decode out of the scan
        z = z0 + (1e-12 * jax.random.uniform(r, ())).astype(z0.dtype)
        return jnp.float32(jnp.sum(system.vae.apply(
            {"params": p["vae"]}, z, lengths, nframes=FRAMES,
            deterministic=True, method=system.vae.decode)))

    decode_many = scanned(decode_body)

    if "--md-sweep" in sys.argv:
        # sampler A/B: MD-kernel value layout (slot vs lane-masked)
        prev = os.environ.get("LADIFF_MD_VSLOT")
        try:
            for vs in ("1", "0"):
                os.environ["LADIFF_MD_VSLOT"] = vs
                body = lambda p, r: jnp.float32(jnp.sum(
                    system.diffusion_reverse(
                        p["denoiser"], text_cond, text_uncond, lengths, r)))
                t = timeit(scanned(body), params, rng0, iters=2,
                           overhead=overhead) / K
                print(json.dumps({"stage": f"sampler_vslot{vs}",
                                  "ms_per_batch": round(t * 1e3, 2)}))
        finally:
            if prev is None:
                os.environ.pop("LADIFF_MD_VSLOT", None)
            else:
                os.environ["LADIFF_MD_VSLOT"] = prev
        return

    if "--md-block-sweep" in sys.argv:
        # sampler A/B: MD-layer sample-block size (VMEM-bounded above;
        # errors reported per config like the decode sweep)
        prev = os.environ.get("LADIFF_MD_BLOCK")
        try:
            for bb in (8, 16, 32, 64, 128):
                os.environ["LADIFF_MD_BLOCK"] = str(bb)
                body = lambda p, r: jnp.float32(jnp.sum(
                    system.diffusion_reverse(
                        p["denoiser"], text_cond, text_uncond, lengths, r)))
                try:
                    t = timeit(scanned(body), params, rng0, iters=2,
                               overhead=overhead) / K
                except Exception as e:
                    print(json.dumps({"stage": f"sampler_mdbb{bb}",
                                      "error": str(e)[:120]}))
                    continue
                print(json.dumps({"stage": f"sampler_mdbb{bb}",
                                  "ms_per_batch": round(t * 1e3, 2),
                                  "ms_per_step": round(t * 1e3 / STEPS, 3)}))
        finally:
            if prev is None:
                os.environ.pop("LADIFF_MD_BLOCK", None)
            else:
                os.environ["LADIFF_MD_BLOCK"] = prev
        return

    if "--distill-sweep" in sys.argv:
        # distilled serving path: few-step student with guidance folded in
        # (no CFG batch doubling), plus the bucketed text encode — the
        # end-to-end protocol of the headline.  Throughput is
        # weight-independent, so random weights; QUALITY of a distilled
        # student is gated on the released checkpoints (verify_release.py).
        from ladiff_tpu.models.clip_text import CLIPTextTower
        from ladiff_tpu.models.ladiff import LADiffSystem as _Sys
        tower = CLIPTextTower(dtype=dtype)
        ids32 = jnp.asarray(np.random.RandomState(1).randint(
            1, 49405, size=(K, BATCH, 32), dtype=np.int32))
        tower_params = jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            tower.init(jax.random.PRNGKey(3), ids32[0]))

        @jax.jit
        def text32(tp, rng):
            acc, _ = jax.lax.scan(
                lambda c, ids: (c + jnp.float32(jnp.sum(tower.apply(tp, ids))),
                                None), jnp.float32(0.0), ids32)
            return acc

        t_text = timeit(lambda *_: text32(tower_params, rng0), None,
                        iters=2, overhead=overhead) / K
        print(json.dumps({"stage": "text_encode_bucket32",
                          "ms_per_batch": round(t_text * 1e3, 2)}))
        for steps in (25, 10, 5):
            stu = _Sys(
                nfeats=nfeats, njoints=njoints, max_frames=FRAMES,
                latent_dim=(7, 256), ff_size=1024, num_layers=9, num_heads=4,
                dropout=0.1, text_encoded_dim=768,
                num_inference_timesteps=steps, guidance_scale=1.0,
                mean=np.zeros(nfeats, np.float32),
                std=np.ones(nfeats, np.float32), dtype=dtype)
            sp = jax.tree.map(
                lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
                stu.init_params(jax.random.PRNGKey(0)))
            body = lambda p, r: jnp.float32(jnp.sum(stu.generate(
                p, text_cond, text_uncond, lengths, r, nframes=FRAMES)[0]))
            t = timeit(scanned(body), sp, rng0, iters=2,
                       overhead=overhead) / K
            total = t + t_text
            print(json.dumps({
                "stage": f"distilled_{steps}step_plus_text32",
                "ms_per_batch": round(total * 1e3, 2),
                "samples_per_sec": round(BATCH / total, 1)}))
        return

    if "--sweep" in sys.argv:
        # decode (block_samples, per_sample_attention) sweep under the
        # scan-amortized protocol (the original per-call sweep was polluted
        # by dispatch wobble).  ps=1 at bb>=2 splits the in-kernel attention
        # into per-sample [T,T] blocks (half the masked-score FLOPs).
        prev = {k: os.environ.get(k) for k in
                ("LADIFF_DECODE_BLOCK", "LADIFF_DECODE_PERSAMPLE",
                 "LADIFF_DECODE_VMEM_MB")}
        try:
            # bb8 joint layout exceeded VMEM ([8T,8T] scores); per-sample
            # splitting shrinks scores to 8x[T,T], which admits bb8 (the
            # v5e winner, 12.79 ms).  bb16+ need a raised scoped-VMEM
            # budget (bb16 = 22.4M vs the 16M default)
            for bb, ps, mb in ((1, 1, 0), (2, 1, 0), (4, 1, 0), (8, 1, 0),
                               (16, 1, 40), (32, 1, 72)):
                os.environ["LADIFF_DECODE_BLOCK"] = str(bb)
                os.environ["LADIFF_DECODE_PERSAMPLE"] = str(ps)
                os.environ["LADIFF_DECODE_VMEM_MB"] = str(mb)
                try:
                    t = timeit(scanned(decode_body), params, rng0, iters=2,
                               overhead=overhead) / K
                except Exception as e:
                    print(json.dumps({"stage": f"decode_bb{bb}_ps{ps}_v{mb}",
                                      "error": str(e)[:120]}))
                    continue
                print(json.dumps({"stage": f"decode_bb{bb}_ps{ps}_v{mb}",
                                  "ms_per_batch": round(t * 1e3, 2)}))
        finally:
            for k, v in prev.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        return

    # frozen CLIP text encode (in the headline's timed region since round
    # 4) — per-scan-step fresh ids so XLA can't hoist the tower out.
    # Measured at BOTH the reference's 77-pad width and the production
    # 32-token bucket (pooled features identical — clip_text.py docstring).
    from ladiff_tpu.models.clip_text import CLIPTextTower
    tower = CLIPTextTower(dtype=dtype)
    ids_stack = jnp.asarray(np.random.RandomState(1).randint(
        1, 49407, size=(K, BATCH, 77), dtype=np.int32))
    tower_params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        tower.init(jax.random.PRNGKey(3), ids_stack[0]))

    def text_many_at(width):
        stack = ids_stack[:, :, :width]

        @jax.jit
        def text_many(tp, rng):
            acc, _ = jax.lax.scan(
                lambda c, ids: (c + jnp.float32(jnp.sum(tower.apply(tp, ids))),
                                None),
                jnp.float32(0.0), stack)
            return acc
        return text_many

    t_sample = timeit(sample_many, params, rng0, iters=2,
                      overhead=overhead) / K
    t_decode = timeit(decode_many, params, rng0, iters=2,
                      overhead=overhead) / K
    t_full = timeit(full_many, params, rng0, iters=2, overhead=overhead) / K
    text77 = text_many_at(77)
    text32 = text_many_at(32)
    t_text = timeit(lambda *_: text77(tower_params, rng0), None,
                    iters=2, overhead=overhead) / K
    t_text32 = timeit(lambda *_: text32(tower_params, rng0), None,
                      iters=2, overhead=overhead) / K
    for name, t in (("text_encode_77pad", t_text),
                    ("text_encode_bucket32", t_text32),
                    ("sampler_50steps", t_sample), ("decode", t_decode),
                    ("glue", t_full - t_sample - t_decode),
                    ("full_sans_text", t_full),
                    ("full_with_text_77pad", t_full + t_text),
                    ("full_with_text_bucket32", t_full + t_text32)):
        print(json.dumps({
            "stage": name, "ms_per_batch": round(t * 1e3, 2),
            "ms_per_step": round(t * 1e3 / STEPS, 3)
            if name == "sampler_50steps" else None,
            "samples_per_sec": round(BATCH / t, 1),
        }))


if __name__ == "__main__":
    main()
