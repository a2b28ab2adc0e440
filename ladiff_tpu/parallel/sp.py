"""Sequence parallelism over the VAE's token axis.

The LA-VAE is the framework's long-sequence component: its encoder runs
2*MAX_IT distribution tokens + T frame tokens (206 at the HumanML3D
T=196) through the 9-layer skip stack, and its decoder runs T frame
queries (/root/reference/src/ladiff/models/architectures/ladiff_vae.py:189-362).
The reference's only parallelism is replicated-weights DDP
(/root/reference/src/train.py:153-165); like ``parallel/{tp,fsdp,pp}.py``
this module goes beyond it, completing the dp/tp/pp/sp matrix: the token
axis is sharded 1/n over a ``seq`` mesh axis so every LayerNorm / FFN /
skip-fusion GEMM — the non-attention bulk of the tower — computes on a
1/n activation slice, and only attention pays a k/v gather.

Design is the idiomatic-JAX one (scaling-book recipe), not hand-written
collectives: the input is placed with the sequence sharding, and the
transformer stacks re-pin their residual stream to it between blocks via
``ops/sp_hook.constrain_seq`` (without the re-pin, XLA's propagation may
all-gather once and run the tower replicated — the constraint is what
makes it sequence-PARALLEL rather than sequence-SHARDED-at-the-door).
XLA's SPMD partitioner then inserts the attention-side collectives over
ICI itself.  Differentiable: ``with_sharding_constraint`` transposes to
itself, so ``jax.grad`` through ``sp_vae_reconstruct`` is the
sequence-parallel backward (tests/test_sp.py pins forward AND gradient
parity vs the single-device VAE, and asserts the compiled program
actually contains collectives).

Like TP/PP/FSDP this is scale-out readiness (long-sequence headroom:
frame counts beyond HumanML3D's 196 cap, e.g. minute-scale motions),
not a single-host win at T=196 — the Pallas fused layers are bypassed
inside the SPMD program (``no_pallas``), matching the TP/FSDP
convention.
"""
from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ladiff_tpu.ops.pallas_common import no_pallas
from ladiff_tpu.ops.sp_hook import seq_sharding

__all__ = ["SEQ_AXIS", "make_seq_mesh", "sp_vae_reconstruct"]

SEQ_AXIS = "seq"


def make_seq_mesh(n_seq: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_seq, (len(devices), n_seq)
    return Mesh(np.asarray(devices[:n_seq]), (SEQ_AXIS,))


@functools.partial(jax.jit, static_argnums=(0, 5))
def _sp_fn(vae, params, features, lengths, rng, act_sharding):
    with seq_sharding(act_sharding):
        return vae.apply({"params": params}, features, lengths, rng,
                         deterministic=True)


def sp_vae_reconstruct(vae, params, features, lengths, rng, *, mesh: Mesh):
    """Full VAE reconstruction (encode -> reparameterize -> decode) with
    the token axis sharded over ``mesh``'s ``seq`` axis.  Equals
    ``vae.apply({"params": params}, features, lengths, rng,
    deterministic=True)`` — returns (feats, z, mu, logvar, latent_valid).

    vae: the (unbound) LAVae module; features [B, T, nfeats]; lengths [B];
    rng: PRNG key for the reparameterization sample.  Differentiable
    w.r.t. ``params``.
    """
    act = NamedSharding(mesh, P(None, SEQ_AXIS, None))
    repl = NamedSharding(mesh, P())
    # commit args to THIS mesh (callers may hold them on another device set)
    params = jax.device_put(params, repl)
    features = jax.device_put(features, act)
    lengths, rng = jax.device_put((lengths, rng), repl)
    with no_pallas():
        return _sp_fn(vae, params, features, lengths, rng, act)
