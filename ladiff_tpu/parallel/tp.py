"""Tensor-parallel (``model``-axis) sharding rules.

The reference's only parallelism is data-parallel DDP
(/root/reference/src/train.py:153-165); this module goes beyond it with a
Megatron-style 2-D layout over the mesh declared in ``parallel.mesh``:
batches stay sharded on ``data`` while the transformer weight matrices
shard over ``model`` —

  * ``linear1.kernel``  [D, F]   -> P(None, "model")   (column parallel)
  * ``linear1.bias``    [F]      -> P("model")
  * ``linear2.kernel``  [F, D]   -> P("model", None)   (row parallel)
  * ``in_proj_kernel``  [D, 3D]  -> P(None, "model")
  * ``in_proj_bias``    [3D]     -> P("model")
  * ``out_proj.kernel`` [D, D]   -> P("model", None)

Everything else (LayerNorms, biases of row-parallel layers, embeddings,
skip-fusion Dense blocks) stays replicated.  Under ``jax.jit`` XLA's SPMD
partitioner then computes each FFN as a local column GEMM -> local row
GEMM -> one all-reduce over the ``model`` axis (riding ICI) — the
hand-written Megatron schedule, with no per-op code changes.  The
ATTENTION projections are a weaker story: the torch-packed ``[D, 3D]``
in_proj is split as contiguous columns, which does not align with the
q/k/v blocks or head boundaries, so GSPMD inserts gathers around the
per-head softmax instead of running the attention head-parallel (the
params still shard — memory distributes — and the math is unchanged; a
head-interleaved layout would need to break the torch checkpoint-parity
packing, not worth it at this model size).

The SAME name-based rule applies to the optimizer moments: AdamW's
``mu``/``nu`` trees mirror the param tree leaf-for-leaf, so
``shard_train_state`` maps one rule over the whole ``TrainState``.

The fused Pallas kernels are gated OFF under tensor parallelism (the SPMD
partitioner cannot split a custom call): the train-step factories wrap
their trace in ``pallas_common.no_pallas()`` when the mesh's model axis
is wider than 1.  DP stays the production layout (SURVEY.md §2.6 — the
model is small); TP is exercised by ``__graft_entry__.dryrun_multichip``
and ``tests/test_tp.py`` for scale-out readiness.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ladiff_tpu.parallel.mesh import MODEL_AXIS

__all__ = ["tp_spec_for", "shard_params", "shard_train_state"]

# (parent module name or None, leaf name) -> dims sharded over the model
# axis; matched against the LAST path components so the same table covers
# params["vae"][...] and optimizer mu/nu mirrors alike.
_COL = {("linear1", "kernel"), (None, "in_proj_kernel")}
_ROW = {("linear2", "kernel"), ("out_proj", "kernel")}
_VEC = {("linear1", "bias"), (None, "in_proj_bias")}


def _names(path):
    out = []
    for k in path:
        out.append(getattr(k, "key", getattr(k, "name", str(k))))
    return out


def tp_spec_for(path, leaf, n_model: int) -> P:
    """PartitionSpec for one leaf under an ``n_model``-wide model axis."""
    names = _names(path)
    leafname = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else None
    key_p = (parent, leafname)
    key_n = (None, leafname)
    if leaf.ndim == 2:
        if (key_p in _COL or key_n in _COL) and leaf.shape[1] % n_model == 0:
            return P(None, MODEL_AXIS)
        if (key_p in _ROW or key_n in _ROW) and leaf.shape[0] % n_model == 0:
            return P(MODEL_AXIS, None)
    if leaf.ndim == 1:
        if (key_p in _VEC or key_n in _VEC) and leaf.shape[0] % n_model == 0:
            return P(MODEL_AXIS)
    return P()


def shard_params(params, mesh: Mesh):
    """device_put every param leaf with its TP spec (no-op layout change
    when the model axis is 1: every spec degenerates to replicated)."""
    nm = mesh.shape[MODEL_AXIS]

    def put(path, x):
        return jax.device_put(x, NamedSharding(mesh, tp_spec_for(path, x, nm)))

    return jax.tree_util.tree_map_with_path(put, params)


def shard_train_state(state, mesh: Mesh):
    """Shard a full TrainState (params + AdamW moments, which mirror the
    param tree leaf-for-leaf) with the same name-based rule."""
    nm = mesh.shape[MODEL_AXIS]

    def put(path, x):
        if not hasattr(x, "ndim"):
            return x
        return jax.device_put(x, NamedSharding(mesh, tp_spec_for(path, x, nm)))

    return jax.tree_util.tree_map_with_path(put, state)
