"""Headline benchmark: DDIM-50 motion samples/sec/chip.

Protocol (BASELINE.md north star): batch-256 classifier-free-guided DDIM-50
generation of 196-frame HumanML3D motions (263 feats) at the published model
scale (9-layer MD-trans denoiser, 9-layer LA-VAE decode, d=256), on one TPU
chip.  The whole pipeline — frozen CLIP ViT-L/14 text encode (fresh ids per
batch so XLA cannot hoist it out of the loop) + 50 denoiser evaluations with
CFG batch doubling + VAE decode — runs as a single jitted program with zero
host sync.  The one cached piece is the unconditional CFG embedding: it is a
constant of the model (the empty-prompt encode), so any real serving loop
computes it once at startup.

Text length: captions ride the production length-bucketed encode (32-token
bucket; caption BPE lengths drawn 8-28, the HumanML3D regime — the datasets
cap text at 22 GloVe tokens for the evaluators).  The reference pads every
caption to the full 77-token context (mld_clip.py:53-60) and pays the full
tower; with causal attention + EOT pooling the pooled features are
mathematically identical (bit-exact on TPU — tests/test_clip.py), so the
bucket is a pure framework win, not a protocol cut.  The 77-pad figure is
still printed on stderr for series continuity.

Baseline: the reference repo publishes no numbers (BASELINE.json
``published: {}``).  The closest published figure for this architecture
family is MLD's average inference time per sentence of 0.217 s (DDIM-50,
V100; MLD paper Table; LADiff is an MLD fork with the same-sized denoiser),
i.e. ~4.6 samples/sec/chip.  ``vs_baseline`` is reported against that.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_SAMPLES_PER_SEC = 4.6  # MLD DDIM-50 V100 estimate (see module docstring)
BATCH = 256
STEPS = 50
FRAMES = 196
# back-to-back generation batches inside ONE jitted scan: steady-state
# serving throughput.  Per-call timing pays the axon relay's 15-35 ms
# dispatch on a ~55 ms program (~35% haircut that no real serving loop
# pays); amortizing over K batches spreads the one round trip thin —
# the same protocol PERF.md documents for the training benches.
SCAN_BATCHES = 8


def main():
    from ladiff_tpu.utils.jax_cache import enable as _enable_jax_cache
    _enable_jax_cache()

    from ladiff_tpu.models.ladiff import LADiffSystem

    nfeats, njoints = 263, 22
    dtype = jnp.bfloat16  # MXU-native compute; params stay f32
    system = LADiffSystem(
        nfeats=nfeats, njoints=njoints, max_frames=FRAMES,
        latent_dim=(7, 256), ff_size=1024, num_layers=9, num_heads=4,
        dropout=0.1, text_encoded_dim=768, num_inference_timesteps=STEPS,
        mean=np.zeros(nfeats, np.float32), std=np.ones(nfeats, np.float32),
        dtype=dtype)
    params = system.init_params(jax.random.PRNGKey(0))
    # cast params to bf16 once: avoids a full f32->bf16 weight cast on every
    # one of the 50 scan steps (saves HBM bandwidth)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    # frozen text tower at the reference scale (CLIP ViT-L/14 text: 12
    # layers, width 768) — INSIDE the timed region since round 4 (the
    # reference's COUNT_TIME protocol and MLD's 0.217 s/sentence both
    # include the text forward)
    from ladiff_tpu.models.clip_text import CLIPTextTower
    tower = CLIPTextTower(dtype=dtype)
    ids0 = np.random.RandomState(1).randint(
        1, 49407, size=(BATCH, 77), dtype=np.int32)
    tower_params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        tower.init(jax.random.PRNGKey(3), jnp.asarray(ids0)))

    def encode_text(tp, ids):
        return tower.apply(tp, ids)[:, None, :].astype(jnp.float32)

    @jax.jit
    def run(params, tp, ids, text_uncond, lengths, rng):
        feats, _ = system.generate(params, encode_text(tp, ids), text_uncond,
                                   lengths, rng, nframes=FRAMES)
        # reduce to a scalar: fetching it forces full execution without a
        # bulk transfer (block_until_ready is unreliable over the axon relay)
        return jnp.float32(jnp.sum(feats))

    @jax.jit
    def run_many(params, tp, ids_stack, text_uncond, lengths, rng):
        def body(acc, step):
            r, ids = step
            feats, _ = system.generate(params, encode_text(tp, ids),
                                       text_uncond, lengths, r,
                                       nframes=FRAMES)
            return acc + jnp.float32(jnp.sum(feats)), None
        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            (jax.random.split(rng, SCAN_BATCHES), ids_stack))
        return acc

    @jax.jit
    def run_many_sans_text(params, text_cond, text_uncond, lengths, rng):
        # round-1..3 protocol (pre-embedded text): kept for series
        # continuity, reported on stderr only
        def body(acc, r):
            feats, _ = system.generate(params, text_cond, text_uncond,
                                       lengths, r, nframes=FRAMES)
            return acc + jnp.float32(jnp.sum(feats)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jax.random.split(rng, SCAN_BATCHES))
        return acc

    @jax.jit
    def noop(rng):
        return jnp.float32(jax.random.uniform(rng, ()))

    # per-batch fresh token ids: loop-VARIANT text inputs, so the text
    # forward stays inside the measured scan body
    ids_stack77 = jnp.asarray(np.random.RandomState(2).randint(
        1, 49407, size=(SCAN_BATCHES, BATCH, 77), dtype=np.int32))
    # realistic captions at the production 32-token bucket: SOT + body +
    # EOT (the max id, so argmax pooling picks it), zero padding after
    rs = np.random.RandomState(4)
    ids32 = np.zeros((SCAN_BATCHES, BATCH, 32), np.int32)
    for b in range(SCAN_BATCHES):
        for s in range(BATCH):
            n = rs.randint(8, 29)
            ids32[b, s, 0] = 49406
            ids32[b, s, 1:1 + n] = rs.randint(1, 49405, size=n)
            ids32[b, s, 1 + n] = 49407
    ids_stack32 = jnp.asarray(ids32)
    ids = jnp.asarray(ids32[0])
    text_uncond = jnp.zeros((BATCH, 1, 768), jnp.float32)
    lengths = jnp.full((BATCH,), FRAMES, jnp.int32)

    text_cond0 = jnp.asarray(
        np.random.RandomState(0).randn(BATCH, 1, 768).astype(np.float32))

    # compile + warmup (run_many compiles once per token width: 32 and 77)
    np.asarray(run(params, tower_params, ids, text_uncond, lengths,
                   jax.random.PRNGKey(1)))
    np.asarray(run_many(params, tower_params, ids_stack32, text_uncond,
                        lengths, jax.random.PRNGKey(1)))
    np.asarray(run_many(params, tower_params, ids_stack77, text_uncond,
                        lengths, jax.random.PRNGKey(1)))
    np.asarray(run_many_sans_text(params, text_cond0, text_uncond, lengths,
                                  jax.random.PRNGKey(1)))
    np.asarray(noop(jax.random.PRNGKey(0)))

    # The axon relay's round-trip overhead wobbles with pool load (see
    # PERF.md), so a single averaged overhead sample can swing the result
    # by 20-30%.  Interleave run/no-op timings and take best-of-N for
    # both: the minima see the same (least-loaded) pool state.
    iters = 4
    run_times, many_times, pad77_times, sans_times, noop_times = \
        [], [], [], [], []
    for i in range(iters):
        t0 = time.perf_counter()
        np.asarray(noop(jax.random.PRNGKey(i)))
        noop_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run(params, tower_params, ids, text_uncond, lengths,
                       jax.random.PRNGKey(2 + i)))
        run_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run_many(params, tower_params, ids_stack32, text_uncond,
                            lengths, jax.random.PRNGKey(20 + i)))
        many_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run_many(params, tower_params, ids_stack77, text_uncond,
                            lengths, jax.random.PRNGKey(30 + i)))
        pad77_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run_many_sans_text(params, text_cond0, text_uncond,
                                      lengths, jax.random.PRNGKey(40 + i)))
        sans_times.append(time.perf_counter() - t0)
    dt_single = min(run_times) - min(noop_times)
    dt = (min(many_times) - min(noop_times)) / SCAN_BATCHES
    dt_pad77 = (min(pad77_times) - min(noop_times)) / SCAN_BATCHES
    dt_sans = (min(sans_times) - min(noop_times)) / SCAN_BATCHES
    assert dt > 0 and dt_single > 0 and dt_pad77 > 0 and dt_sans > 0

    samples_per_sec = BATCH / dt
    import sys
    print(f"# single-batch (per-call dispatch included): "
          f"{BATCH / dt_single:.0f} samples/s", file=sys.stderr)
    print(f"# 77-pad text protocol (early-round-4 comparable): "
          f"{BATCH / dt_pad77:.0f} samples/s", file=sys.stderr)
    print(f"# sans-text protocol (rounds 1-3 comparable): "
          f"{BATCH / dt_sans:.0f} samples/s", file=sys.stderr)
    print(json.dumps({
        "metric": "ddim50_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s (batch 256, 196 frames, bucketed CLIP text "
                "encode + CFG DDIM-50 + decode, steady-state over 8 "
                "batches)",
        "vs_baseline": round(samples_per_sec / REF_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    # The axon relay's remote-compile helper occasionally fails transiently
    # (HTTP 500 / timeouts); a retry re-enters through the persistent
    # compile cache and normally succeeds (CLAUDE.md environment traps).
    # One JSON line is still guaranteed on success.
    import sys
    import time as _time

    def _is_transient(e: Exception) -> bool:
        # the remote-compile helper surfaces failures as RuntimeError/OSError
        # with HTTP/timeout text (and raw socket timeouts); config errors or
        # real regressions (ValueError/AssertionError/...) fail immediately
        if isinstance(e, (TimeoutError, ConnectionError, OSError)):
            return True
        msg = str(e).lower()
        return isinstance(e, RuntimeError) and any(
            s in msg for s in ("timeout", "timed out", "http", "unavailable",
                               "deadline", "connection", "socket"))

    last = None
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001 — classified below
            last = e
            print(f"# bench attempt {attempt + 1} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            if not _is_transient(e):
                raise
            if attempt < 2:
                _time.sleep(20)
    else:
        raise last
