"""SPMD training steps.

Replaces the reference's Lightning+DDP training loop
(/root/reference/src/train.py:153-217, modeltype/base.py:28-37) with jitted
train steps over a ``jax.sharding.Mesh``: batch sharded on the ``data``
axis, params/optimizer state replicated, gradient allreduce inserted by XLA
(compiler-based SPMD — the TPU-native equivalent of DDP/NCCL).

Optimizer: AdamW lr 1e-4 (reference ladiff.py:120-122, TRAIN.OPTIM).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ladiff_tpu.models.ladiff import LADiffSystem
from ladiff_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["TrainState", "make_optimizer", "create_train_state",
           "make_vae_train_step", "make_diffusion_train_step",
           "make_vae_diffusion_train_step"]


class TrainState(train_state.TrainState):
    pass


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-2,
                   grad_clip: Optional[float] = None) -> optax.GradientTransformation:
    """AdamW with torch-default betas/eps/weight-decay (torch.optim.AdamW)."""
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def create_train_state(params, tx, apply_fn=None) -> TrainState:
    return TrainState.create(apply_fn=apply_fn or (lambda *a: None),
                             params=params, tx=tx)


def _shardings(mesh: Mesh):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return repl, data


def _jit_step(step, mesh: Mesh, batch_sh, repl, fsdp: bool = False,
              replicated_state: bool = False):
    """jit a train step for the mesh.

    DP mesh (model axis 1, no FSDP): explicit replicated state shardings.
    TP mesh (model axis > 1) or FSDP (params sharded over the DATA axis,
    parallel/fsdp.py): the state arrives device_put with the tp/fsdp
    specs, so shardings are inferred from the committed arguments, and
    the trace runs under ``no_pallas()`` — the SPMD partitioner cannot
    split the fused kernels' custom calls.

    replicated_state forces the DP-style replicated-state jit even when
    the model axis is wide — sequence parallelism reuses that axis for
    TOKENS while params stay replicated (make_vae_train_step(seq_parallel)).
    """
    if (mesh.shape[MODEL_AXIS] <= 1 or replicated_state) and not fsdp:
        jitted = jax.jit(step, in_shardings=(repl, batch_sh, repl),
                         out_shardings=(repl, repl), donate_argnums=(0,))
        jitted.raw_step = step
        return jitted
    from ladiff_tpu.ops.pallas_common import no_pallas
    if mesh.shape[MODEL_AXIS] > 1:
        from ladiff_tpu.parallel.tp import tp_spec_for
        nm = mesh.shape[MODEL_AXIS]

        def spec_for(path, x):
            return tp_spec_for(path, x, nm)
    else:
        from ladiff_tpu.parallel.fsdp import fsdp_spec_for
        nd = mesh.shape[DATA_AXIS]

        def spec_for(path, x):
            return fsdp_spec_for(x, nd)

    def step_xla(state, batch, rng):
        with no_pallas():
            new_state, logs = step(state, batch, rng)
        # pin the OUTPUT state to the tp/fsdp specs too: without the
        # constraint GSPMD may materialize some updated leaves with a
        # different layout, so the next call's arguments would no longer
        # match the compiled signature (silent recompile + drift off the
        # sharded layout)
        new_state = jax.tree_util.tree_map_with_path(
            lambda path, x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec_for(path, x))),
            new_state)
        return new_state, logs

    jitted = jax.jit(step_xla, donate_argnums=(0,))
    jitted.raw_step = step_xla
    return jitted


def make_vae_train_step(system: LADiffSystem, mesh: Mesh,
                        fsdp: bool = False,
                        seq_parallel: bool = False) -> Callable:
    """jitted (state, batch, rng) -> (state, logs); stage-1 VAE training.

    seq_parallel (TRAIN.SEQUENCE_PARALLEL in the loop): the mesh's
    ``model`` axis is reused as a SEQUENCE axis — params replicated,
    batch data-sharded as usual, and the VAE tower's inter-block
    activations pinned to a [data, model(=seq), None] sharding via
    ``ops/sp_hook``, so LayerNorm/FFN/skip GEMMs compute on 1/n token
    slices and only attention gathers (parallel/sp.py design, wired for
    training; tests/test_training.py pins step parity vs plain DP)."""
    repl, data = _shardings(mesh)

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        def loss_fn(params):
            total, (logs, _) = system.vae_forward(params, batch, rng, train=True)
            return total, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads)
        logs = dict(logs, grad_norm=optax.global_norm(grads))
        return state, logs

    if seq_parallel:
        from ladiff_tpu.ops.pallas_common import no_pallas
        from ladiff_tpu.ops.sp_hook import seq_sharding
        act = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
        inner = step

        def step(state, batch, rng):
            # trace-time scopes: activations re-pinned between blocks;
            # plain-XLA module paths (the SPMD partitioner cannot split
            # the fused kernels' custom calls)
            with seq_sharding(act), no_pallas():
                return inner(state, batch, rng)

    batch_sh = {"motion": data, "length": data}
    return _jit_step(step, mesh, batch_sh, repl, fsdp=fsdp,
                     replicated_state=seq_parallel)


def make_diffusion_train_step(system: LADiffSystem, mesh: Mesh,
                              vae_params, uncond_emb,
                              fsdp: bool = False) -> Callable:
    """jitted (state, batch, rng) -> (state, logs); stage-2 denoiser training
    with the stage-1 VAE frozen (reference ladiff.py:94-98 freezes vae)."""
    repl, data = _shardings(mesh)
    vae_params = jax.device_put(vae_params, repl)
    uncond_emb = jax.device_put(jnp.asarray(uncond_emb), repl)

    forward = (system.diffusion_forward_ar if system.ardiff
               else system.diffusion_forward)

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        def loss_fn(params):
            total, (logs, _) = forward(
                params, vae_params, batch, rng, uncond_emb, train=True)
            return total, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads)
        logs = dict(logs, grad_norm=optax.global_norm(grads))
        return state, logs

    cond_key = "action" if system.condition == "action" else "text_emb"
    batch_sh = {"motion": data, "length": data, cond_key: data}
    return _jit_step(step, mesh, batch_sh, repl, fsdp=fsdp)


def make_vae_diffusion_train_step(system: LADiffSystem, mesh: Mesh,
                                  uncond_emb,
                                  fsdp: bool = False) -> Callable:
    """jitted joint-stage step training BOTH the VAE and the denoiser
    (reference TRAIN.STAGE=vae_diffusion).  ``state.params`` is the full
    {"vae", "denoiser"} tree."""
    repl, data = _shardings(mesh)
    uncond_emb = jax.device_put(jnp.asarray(uncond_emb), repl)

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        def loss_fn(params):
            total, (logs, _) = system.vae_diffusion_forward(
                params, batch, rng, uncond_emb, train=True)
            return total, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads)
        logs = dict(logs, grad_norm=optax.global_norm(grads))
        return state, logs

    batch_sh = {"motion": data, "length": data, "text_emb": data}
    return _jit_step(step, mesh, batch_sh, repl, fsdp=fsdp)
