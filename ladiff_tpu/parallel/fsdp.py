"""Fully-sharded data parallelism (ZeRO-3-style) over the ``data`` axis.

The reference's only parallelism is replicated-weights DDP
(/root/reference/src/train.py:153-165).  This module goes beyond it with
the TPU-native FSDP recipe: every parameter (and its AdamW moments, which
mirror the param tree leaf-for-leaf) is sharded along ONE of its dims over
the same mesh axis the batch is sharded on.  Under ``jax.jit`` XLA's SPMD
partitioner then materialises each weight just-in-time (all-gather over
ICI before its GEMM), reduce-scatters the gradients, and keeps the
optimizer update fully sharded — the ZeRO-3 schedule, derived by the
compiler from layout annotations alone, with no per-op code changes.

Spec rule: shard the LARGEST dim divisible by the data-axis size (ties to
the earlier dim); leaves with no divisible dim stay replicated.  At this
model's scale FSDP is scale-out readiness, not a single-host win (the
whole train state fits one chip comfortably) — it is exercised by
``__graft_entry__.dryrun_multichip`` and ``tests/test_fsdp.py`` the same
way the tensor-parallel axis is.

Like tensor parallelism, the fused Pallas kernels gate OFF under FSDP
(the SPMD partitioner cannot split a custom call); the train-step
factories trace under ``no_pallas()`` when ``fsdp=True``.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ladiff_tpu.parallel.mesh import DATA_AXIS

__all__ = ["fsdp_spec_for", "shard_params", "shard_train_state"]


def fsdp_spec_for(leaf, n_data: int) -> P:
    """PartitionSpec sharding the largest ``n_data``-divisible dim of one
    leaf over the data axis (replicated when none divides)."""
    if not hasattr(leaf, "ndim") or leaf.ndim == 0 or n_data <= 1:
        return P()
    best = None
    for d, size in enumerate(leaf.shape):
        if size % n_data == 0 and size > 0 and (
                best is None or size > leaf.shape[best]):
            best = d
    if best is None:
        return P()
    spec = [None] * leaf.ndim
    spec[best] = DATA_AXIS
    return P(*spec)


def shard_params(params, mesh: Mesh):
    """device_put every param leaf with its FSDP spec."""
    n = mesh.shape[DATA_AXIS]

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, fsdp_spec_for(x, n)))

    return jax.tree.map(put, params)


def shard_train_state(state, mesh: Mesh):
    """Shard a full TrainState (params + AdamW mu/nu, which mirror the
    param tree) — the ZeRO optimizer-state partitioning falls out of the
    same rule because the moments have the params' shapes."""
    n = mesh.shape[DATA_AXIS]

    def put(x):
        if not hasattr(x, "ndim"):
            return x
        return jax.device_put(x, NamedSharding(mesh, fsdp_spec_for(x, n)))

    return jax.tree.map(put, state)
