"""Device mesh + sharding helpers (the DP layer).

The reference's only parallelism is single-node PyTorch-Lightning DDP over
up to 8 GPUs (/root/reference/src/train.py:153-165) with NCCL allreduce.
The TPU-native equivalent is compiler-based SPMD: a 1-D ``data`` mesh over
ICI, batches sharded along it, parameters replicated; XLA inserts the
gradient psum when the jitted loss averages over the global batch.  Metric
state aggregation likewise becomes a plain mean/sum under the same jit
(replacing torchmetrics ``dist_sync_on_step``).

The mesh axes are declared once here; a second ``model`` axis is reserved
for tensor-parallel experiments (the model is small enough that DP is the
production layout, matching the reference's scale analysis in SURVEY.md §2.6).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "pad_to_multiple"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every array in a batch pytree with its batch dim sharded."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
