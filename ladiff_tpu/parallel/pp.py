"""Pipeline parallelism (GPipe-style) over the denoiser MD skip stack.

The reference's only parallelism is replicated-weights DDP
(/root/reference/src/train.py:153-165); like ``parallel/tp.py`` and
``parallel/fsdp.py`` this module goes beyond it, completing the classic
parallelism matrix with the pipeline axis: the denoiser's L MD layers
(/root/reference/src/ladiff/models/architectures/tools/cross_attention.py:69-86
over mdiff_transformer.py:265-321) are split into S contiguous stages,
one stage's weights per device along a ``pipe`` mesh axis, and a batch
flows through as ``n_micro`` microbatches on the GPipe schedule:

    tick t = 0 .. n_micro + S - 2:
        stage 0 injects microbatch min(t, n_micro-1)
        every stage applies its K = L/S layers to its current carry
        stage S-1 banks the result for microbatch t - (S-1)
        carries rotate one hop along the ring (lax.ppermute over ICI)

Everything is a single jitted SPMD program under ``jax.shard_map``: the
tick loop is a ``lax.scan``, the hop is ``ppermute``, and the banked
outputs are made replicated with one final ``psum`` — so ``jax.grad``
differentiates straight through the schedule (a ppermute's transpose is
the reverse ppermute), giving pipeline-parallel TRAINING with no
hand-written backward schedule.  Bubble fraction is the textbook
(S-1)/(n_micro+S-1).

The U-Net skips are the interesting part: a skip pushed by input block i
is popped by output block nb-1-i, which generally lives on a LATER stage
— so the carry flowing down the ring is (x, skip buffer), and every
layer runs one uniform program:

    x   <- concat(x, skips[pop_idx]) @ wlin + blin      (identity-extended
                                                         wlin for non-output
                                                         layers, so the same
                                                         GEMM is a no-op)
    x   <- MD layer(x)
    skips[push_idx] <- x  where the layer is an input block

The identity extension costs one extra [*, 2D]x[2D, D] GEMM per
non-output layer — the price of a stage program with no data-dependent
structure (the global layer index is ``axis_index``-dependent under
SPMD).  This is a scale-out readiness path like TP/FSDP, not a
single-host win (SURVEY.md §2.6: the model is small; DP is production):
it is exercised by ``__graft_entry__.dryrun_multichip`` and
``tests/test_pp.py`` (forward + gradient parity vs the single-device
encoder).  Dropout-off (deterministic) by design; the Pallas fused
layers are bypassed inside the stage program (``no_pallas``), matching
the TP/FSDP convention.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ladiff_tpu.ops.pallas_common import no_pallas

__all__ = ["PIPE_AXIS", "make_pipe_mesh", "stack_stage_params",
           "pipeline_encoder_forward"]

PIPE_AXIS = "pipe"


def make_pipe_mesh(n_pipe: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_pipe, (len(devices), n_pipe)
    return Mesh(np.asarray(devices[:n_pipe]), (PIPE_AXIS,))


def stack_stage_params(enc_params, num_layers: int, n_stages: int,
                       d_model: int):
    """Re-layout MDSkipTransformerEncoder params for S pipeline stages.

    Returns a pytree whose every leaf has a leading [S] axis (sharded
    P("pipe") under shard_map): the K-per-stage MD layer params stacked
    [S, K, ...], plus the uniform skip-fusion weights wlin [S, K, 2D, D]
    / blin [S, K, D] — real ``linear_blocks`` Dense params for output
    blocks, an identity extension (cat(x, skip) @ [[I],[0]] == x) for
    input/middle blocks.  Built from the GLOBAL layer layout, so the
    stage program itself needs no per-layer structure.
    """
    L, S = num_layers, n_stages
    assert L % S == 0, f"n_stages {S} must divide num_layers {L}"
    nb = (L - 1) // 2
    names = ([f"input_blocks_{i}" for i in range(nb)] + ["middle_block"]
             + [f"output_blocks_{i}" for i in range(nb)])
    layer_trees = [enc_params[n] for n in names]
    eye = jnp.concatenate([jnp.eye(d_model), jnp.zeros((d_model, d_model))])
    wlin, blin = [], []
    for l in range(L):
        if l > nb:
            lin = enc_params[f"linear_blocks_{l - nb - 1}"]
            wlin.append(lin["kernel"])
            blin.append(lin["bias"])
        else:
            wlin.append(eye)
            blin.append(jnp.zeros((d_model,)))
    K = L // S

    def stage_stack(leaves):
        rows = [jnp.stack(leaves[s * K:(s + 1) * K]) for s in range(S)]
        return jnp.stack(rows)  # [S, K, ...]

    layers = jax.tree.map(lambda *xs: stage_stack(list(xs)), *layer_trees)
    return {"layers": layers, "wlin": stage_stack(wlin),
            "blin": stage_stack(blin)}


def pipeline_encoder_forward(enc, enc_params, x, xf, emb, latent_valid, *,
                             mesh: Mesh, n_micro: int) -> jax.Array:
    """The MDSkipTransformerEncoder forward, pipelined over ``mesh``'s
    ``pipe`` axis.  Equals ``enc.apply({"params": enc_params}, x, xf, emb,
    latent_valid, deterministic=True)`` (tests/test_pp.py pins forward AND
    gradient parity); differentiable w.r.t. ``enc_params``.

    enc: the (unbound) encoder module, for hyperparameters; x [B, T, D];
    xf [B, N, D]; emb [B, D]; latent_valid [B, T] bool or None.
    """
    from ladiff_tpu.ops.stylization import MDTransformerLayer

    S = mesh.shape[PIPE_AXIS]
    L = enc.num_layers
    nb = (L - 1) // 2
    K = L // S
    B, T, D = x.shape
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro
    staged = stack_stage_params(enc_params, L, S, enc.d_model)
    template = MDTransformerLayer(
        enc.d_model, enc.text_latent_dim, enc.ffn_dim, enc.num_heads,
        dropout=0.0, dtype=enc.dtype)

    def split(a):  # [B, ...] -> [n_micro, mb, ...]
        return a.reshape((n_micro, mb) + a.shape[1:])

    valid = (jnp.ones((B, T), bool) if latent_valid is None
             else latent_valid.astype(bool))

    def stage_fn(params1, carry):
        """Apply this stage's K layers to one carry (params1 leaves carry
        the local [1, K, ...] shard_map block)."""
        stage = jax.lax.axis_index(PIPE_AXIS)
        xc, skips, xfc, embc, vc = carry
        for k in range(K):
            l = stage * K + k  # global layer index (traced)
            p_k = jax.tree.map(lambda a: a[0, k], params1["layers"])
            pop = jnp.clip(2 * nb - l, 0, max(nb - 1, 0))
            cat = jnp.concatenate([xc, skips[pop]], axis=-1)
            xin = cat @ params1["wlin"][0, k] + params1["blin"][0, k]
            xout = template.apply({"params": p_k}, xin, xfc, embc, vc,
                                  deterministic=True)
            push = jnp.clip(l, 0, max(nb - 1, 0))
            keep = jnp.where(l < nb, xout, skips[push])
            skips = skips.at[push].set(keep)
            xc = xout
        return xc, skips, xfc, embc, vc

    def run(staged, x_mb, xf_mb, emb_mb, valid_mb):
        stage = jax.lax.axis_index(PIPE_AXIS)
        zero_carry = (
            jnp.zeros((mb, T, D), x.dtype),
            jnp.zeros((max(nb, 1), mb, T, D), x.dtype),
            jnp.zeros_like(xf_mb[0]),
            jnp.zeros_like(emb_mb[0]),
            jnp.ones((mb, T), bool),
        )

        def tick(state, t):
            carry, banked = state
            i = jnp.clip(t, 0, n_micro - 1)
            injected = (
                x_mb[i],
                jnp.zeros((max(nb, 1), mb, T, D), x.dtype),
                xf_mb[i], emb_mb[i], valid_mb[i],
            )
            carry = jax.tree.map(
                lambda inj, c: jnp.where(stage == 0, inj, c),
                injected, carry)
            carry = stage_fn(staged, carry)
            # bank stage S-1's result for microbatch t-(S-1) (valid once
            # the pipe is full; the drain ticks re-bank stale slots below,
            # masked off by the write predicate)
            o = jnp.clip(t - (S - 1), 0, n_micro - 1)
            write = (stage == S - 1) & (t >= S - 1)
            banked = banked.at[o].set(
                jnp.where(write, carry[0], banked[o]))
            perm = [(s, (s + 1) % S) for s in range(S)]
            carry = jax.tree.map(
                lambda a: jax.lax.ppermute(a, PIPE_AXIS, perm), carry)
            return (carry, banked), None

        banked0 = jnp.zeros((n_micro, mb, T, D), x.dtype)
        (_, banked), _ = jax.lax.scan(
            tick, (zero_carry, banked0), jnp.arange(n_micro + S - 1))
        # only stage S-1 holds real outputs; replicate them to every device
        return jax.lax.psum(
            jnp.where(stage == S - 1, banked, jnp.zeros_like(banked)),
            PIPE_AXIS)

    shmapped = jax.shard_map(
        run, mesh=mesh, in_specs=(P(PIPE_AXIS), P(), P(), P(), P()),
        out_specs=P(), check_vma=False)
    # commit args to THIS mesh's devices: callers may hold params/batches
    # committed to a different device set (e.g. a full-host DP mesh), which
    # shard_map rejects as incompatible
    shard = jax.sharding.NamedSharding(mesh, P(PIPE_AXIS))
    repl = jax.sharding.NamedSharding(mesh, P())
    staged = jax.device_put(staged, shard)
    args = jax.device_put(
        (split(x), split(xf), split(emb), split(valid)), repl)
    with no_pallas():
        y = shmapped(staged, *args)
    y = y.reshape(B, T, D)
    import flax.linen as nn
    norm_p = jax.device_put(enc_params["norm"], repl)
    return nn.LayerNorm(epsilon=1e-5, dtype=enc.dtype).apply(
        {"params": norm_p}, y)
