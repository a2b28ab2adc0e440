"""Pipeline parallelism (GPipe-style) over the denoiser MD skip stack.

The reference's only parallelism is replicated-weights DDP
(/root/reference/src/train.py:153-165); like ``parallel/tp.py`` and
``parallel/fsdp.py`` this module goes beyond it, completing the classic
parallelism matrix with the pipeline axis: the denoiser's L MD layers
(/root/reference/src/ladiff/models/operator/cross_attention.py:69-86
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

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ladiff_tpu.ops.pallas_common import no_pallas

__all__ = ["PIPE_AXIS", "make_pipe_mesh", "stack_stage_params",
           "pipeline_encoder_forward", "make_pipeline_encoder",
           "make_pp_diffusion_train_step", "denoiser_encoder_hp"]

PIPE_AXIS = "pipe"


def denoiser_encoder_hp(den, num_layers=None):
    """Hyperparameter twin of the denoiser's MD skip encoder.

    An UNBOUND ``MDSkipTransformerEncoder`` constructed with the same
    fields ``denoiser.setup`` uses (models/denoiser.py, the md_trans
    branch), so staged pipeline programs apply the CANONICAL param tree.
    Single home on purpose: the train-step factory, ``__graft_entry__``'s
    dryrun, and tests/test_pp.py all need this twin, and a hand-copied
    construction in each would drift the first time ``setup`` changes."""
    from ladiff_tpu.ops.stylization import MDSkipTransformerEncoder
    return MDSkipTransformerEncoder(
        den.d_model, den.d_model, den.num_heads,
        den.num_layers if num_layers is None else num_layers,
        den.ff_size, den.dropout, dtype=den.dtype)


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


def _make_modules(enc):
    """(template MD layer, final LayerNorm) from encoder hyperparameters.
    MUST be called OUTSIDE any live flax module scope — flax forbids
    constructing modules inside another module's method (the pp_hook
    override runs inside the denoiser's __call__), so the train-step
    factory pre-builds these and passes them into _pipeline_apply."""
    import flax.linen as nn

    from ladiff_tpu.ops.stylization import MDTransformerLayer
    template = MDTransformerLayer(
        enc.d_model, enc.text_latent_dim, enc.ffn_dim, enc.num_heads,
        dropout=0.0, dtype=enc.dtype)
    norm = nn.LayerNorm(epsilon=1e-5, dtype=enc.dtype)
    return template, norm


def _pipeline_apply(enc, staged, norm_params, x, xf, emb, latent_valid, *,
                    mesh: Mesh, n_micro: int, modules=None) -> jax.Array:
    """The traced GPipe core: staged params (leading [S] axis) + inputs ->
    encoder output.  Pure — no staging, no device placement — so it can
    run under an outer ``jit`` (the PP train step) where the arguments are
    tracers and placement comes from the jit's shardings.  ``enc`` is any
    object carrying the MDSkipTransformerEncoder hyperparameters
    (num_layers, d_model, text_latent_dim, ffn_dim, num_heads, dtype) —
    the unbound module, or the bound one handed to the pp_hook override.
    ``modules``: a pre-built ``_make_modules`` pair, REQUIRED when called
    from inside a flax scope (the pp_hook path)."""
    S = mesh.shape[PIPE_AXIS]
    L = enc.num_layers
    nb = (L - 1) // 2
    K = L // S
    B, T, D = x.shape
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro
    template, norm = modules if modules is not None else _make_modules(enc)

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
    with no_pallas():
        y = shmapped(staged, split(x), split(xf), split(emb), split(valid))
    y = y.reshape(B, T, D)
    return norm.apply({"params": norm_params}, y)


def make_pipeline_encoder(enc, enc_params, *, mesh: Mesh, n_micro: int):
    """Host-level factory: stage + place the encoder params ONCE, return
    ``forward(x, xf, emb, latent_valid=None)`` for repeated (inference)
    calls — the production shape of the PP forward path (the per-call
    staging of early revisions was dryrun-grade only).

    enc: the (unbound) MDSkipTransformerEncoder, for hyperparameters.
    """
    S = mesh.shape[PIPE_AXIS]
    staged = stack_stage_params(enc_params, enc.num_layers, S, enc.d_model)
    # commit to THIS mesh's devices: callers may hold params/batches
    # committed to a different device set (e.g. a full-host DP mesh),
    # which shard_map rejects as incompatible
    shard = jax.sharding.NamedSharding(mesh, P(PIPE_AXIS))
    repl = jax.sharding.NamedSharding(mesh, P())
    staged = jax.device_put(staged, shard)
    norm_params = jax.device_put(enc_params["norm"], repl)

    def forward(x, xf, emb, latent_valid=None):
        x, xf, emb = jax.device_put((x, xf, emb), repl)
        if latent_valid is not None:
            latent_valid = jax.device_put(latent_valid, repl)
        return _pipeline_apply(enc, staged, norm_params, x, xf, emb,
                               latent_valid, mesh=mesh, n_micro=n_micro)

    return forward


def pipeline_encoder_forward(enc, enc_params, x, xf, emb, latent_valid, *,
                             mesh: Mesh, n_micro: int) -> jax.Array:
    """One-shot convenience wrapper over :func:`make_pipeline_encoder`
    (stages params per call — use the factory for repeated calls).
    Equals ``enc.apply({"params": enc_params}, x, xf, emb, latent_valid,
    deterministic=True)`` (tests/test_pp.py pins forward AND gradient
    parity); differentiable w.r.t. ``enc_params``.

    enc: the (unbound) encoder module, for hyperparameters; x [B, T, D];
    xf [B, N, D]; emb [B, D]; latent_valid [B, T] bool or None.
    """
    return make_pipeline_encoder(enc, enc_params, mesh=mesh,
                                 n_micro=n_micro)(x, xf, emb, latent_valid)


def make_pp_diffusion_train_step(system, mesh: Mesh, vae_params, uncond_emb,
                                 *, n_micro: int):
    """jitted (state, batch, rng) -> (state, logs): the stage-2 denoiser
    train step with the MD skip stack PIPELINED over ``mesh``'s ``pipe``
    axis (TRAIN.PIPELINE_STAGES in the loop).

    Same loss math as ``trainer.make_diffusion_train_step`` — the
    ``ops/pp_hook`` scope reroutes only the MDSkipTransformerEncoder
    forward into the GPipe shard_map program, whose staging runs INSIDE
    the compiled step (params change every update, so per-step staging is
    a handful of device-side stacks, and ``jax.grad`` flows through the
    re-layout back to the canonical param tree the optimizer owns).
    Encoder dropout is off under the pipeline schedule (the stage program
    is deterministic by design — documented in PARITY.md §2.6); batch and
    state are replicated over the pipe mesh, microbatching provides the
    parallelism.  tests/test_pp.py pins one-step parity vs the plain DP
    step at dropout 0.
    """
    import optax

    from ladiff_tpu.ops.pp_hook import pp_encoder_override

    S = mesh.shape[PIPE_AXIS]
    L = system.denoiser_num_layers or system.num_layers
    assert L % S == 0, (
        f"PIPELINE_STAGES={S} must divide the denoiser's {L} MD layers")
    repl = jax.sharding.NamedSharding(mesh, P())
    vae_params = jax.device_put(vae_params, repl)
    uncond_emb = jax.device_put(jnp.asarray(uncond_emb), repl)
    # pre-build the stage modules HERE, outside any flax scope: the
    # override fires inside the denoiser's __call__, where flax forbids
    # module construction (_make_modules docstring)
    enc_hp = denoiser_encoder_hp(system.denoiser, L)
    modules = _make_modules(enc_hp)

    def override(enc_bound, x, xf, emb, latent_valid):
        enc_params = enc_bound.variables["params"]
        staged = stack_stage_params(enc_params, L, S, enc_hp.d_model)
        return _pipeline_apply(enc_hp, staged, enc_params["norm"],
                               x, xf, emb, latent_valid,
                               mesh=mesh, n_micro=n_micro, modules=modules)

    def step(state, batch, rng):
        def loss_fn(params):
            with pp_encoder_override(override), no_pallas():
                total, (logs, _) = system.diffusion_forward(
                    params, vae_params, batch, rng, uncond_emb, train=True)
            return total, logs

        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads)
        return state, dict(logs, grad_norm=optax.global_norm(grads))

    jitted = jax.jit(step, in_shardings=(repl, repl, repl),
                     out_shardings=(repl, repl), donate_argnums=(0,))
    jitted.raw_step = step
    return jitted
