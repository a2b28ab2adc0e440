"""Pallas fused segments for the frozen CLIP text tower (inference only).

The reference runs HF CLIP as-is (MldTextEncoder,
/root/reference/src/ladiff/models/architectures/mld_clip.py:50-78); on TPU
the tower's GEMMs are MXU-bound but the per-layer LayerNorm / projection
glue costs extra HBM traversals of the [B*S, 768] activation stream —
measured ~6 ms of the 13.56 ms tower time at the 32-token bucket
(PERF.md, text-tower decomposition).  Round 4 established that the
attention CORE itself must stay on XLA (two fused-attention prototypes
and a fused-qkv single GEMM all measured slower), so these kernels fuse
everything AROUND it:

  ``fused_ln_qkv``   LN1 -> q/k/v projections (attention scale folded
                     into q) — one read of x instead of an LN round trip
                     plus three separate projection reads.
  ``fused_proj_mlp`` out-projection + residual + LN2 -> fc1 -> quick-GELU
                     -> fc2 + residual — the whole post-attention half of
                     a CLIP layer in one pass (~9 XLA ops).

Both are inference kernels (no VJP) on the frozen tower; the flax module
(models/clip_text.py CLIPTextLayer) dispatches here under the standard
``pallas_enabled()`` gate and falls back to plain XLA elsewhere.  Weights
stay VMEM-resident across row blocks (largest case: out-proj + both MLP
mats at width 768 = ~10.6 MB bf16), so ``fused_proj_mlp`` uses a smaller
row block than the repo's 256-wide kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ladiff_tpu.ops.pallas_common import ln

__all__ = ["fused_ln_qkv", "fused_proj_mlp"]


def _env_block(default: int) -> int:
    """LADIFF_CLIP_BLOCK overrides the proj+MLP kernel's row block
    (trace-time, same precedent as LADIFF_MD_BLOCK's sampler sweep)."""
    import os
    return int(os.environ.get("LADIFF_CLIP_BLOCK") or default)


def _qkv_kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                lns_ref, lnb_ref, q_ref, k_ref, v_ref, *, scale: float):
    y = ln(x_ref[...].astype(jnp.float32),
           lns_ref[...].astype(jnp.float32),
           lnb_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    dot = lambda w_ref: jax.lax.dot_general(
        y, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    q_ref[...] = ((dot(wq_ref) + bq_ref[...].astype(jnp.float32))
                  * scale).astype(q_ref.dtype)
    k_ref[...] = (dot(wk_ref)
                  + bk_ref[...].astype(jnp.float32)).astype(k_ref.dtype)
    v_ref[...] = (dot(wv_ref)
                  + bv_ref[...].astype(jnp.float32)).astype(v_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_rows"))
def fused_ln_qkv(
    x: jax.Array,                         # [M, D] residual stream
    wq: jax.Array, bq: jax.Array,         # [D, D], [D]
    wk: jax.Array, bk: jax.Array,
    wv: jax.Array, bv: jax.Array,
    ln_scale: jax.Array, ln_bias: jax.Array,
    scale: float = 1.0,                   # folded into q
    block_rows: int = 512,
):
    M, D = x.shape
    Mb = min(block_rows, M)
    rows = lambda i: (i, 0)
    rep = lambda i: (0, 0)
    row_spec = pl.BlockSpec((Mb, D), rows, memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((D, D), rep, memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, D), rep, memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((M, D), x.dtype)
    return pl.pallas_call(
        functools.partial(_qkv_kernel, scale=scale),
        grid=(pl.cdiv(M, Mb),),
        in_specs=[row_spec, mat, vec, mat, vec, mat, vec, vec, vec],
        out_specs=[row_spec, row_spec, row_spec],
        out_shape=[out, out, out],
    )(x, wq, bq.reshape(1, -1), wk, bk.reshape(1, -1), wv, bv.reshape(1, -1),
      ln_scale.reshape(1, -1), ln_bias.reshape(1, -1))


def _proj_mlp_kernel(att_ref, x_ref, wo_ref, bo_ref, w1_ref, b1_ref,
                     w2_ref, b2_ref, lns_ref, lnb_ref, out_ref):
    h = jax.lax.dot_general(att_ref[...], wo_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + bo_ref[...].astype(jnp.float32) + x_ref[...].astype(jnp.float32)
    y = ln(h, lns_ref[...].astype(jnp.float32),
           lnb_ref[...].astype(jnp.float32))
    y = jax.lax.dot_general(y.astype(att_ref.dtype), w1_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b1_ref[...].astype(jnp.float32)
    y = y * jax.nn.sigmoid(1.702 * y)      # quick-GELU (CLIP)
    y = jax.lax.dot_general(y.astype(att_ref.dtype), w2_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[...] = (h + y
                    + b2_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def fused_proj_mlp(
    att: jax.Array,                       # [M, D] attention output (heads merged)
    x: jax.Array,                         # [M, D] residual stream (pre-LN1 input)
    wo: jax.Array, bo: jax.Array,         # [D, D], [D]  out_proj
    w1: jax.Array, b1: jax.Array,         # [D, F], [F]  fc1
    w2: jax.Array, b2: jax.Array,         # [F, D], [D]  fc2
    ln_scale: jax.Array, ln_bias: jax.Array,
    block_rows: int = 0,
) -> jax.Array:
    M, D = att.shape
    F = w1.shape[1]
    Mb = min(block_rows or _env_block(128), M)
    rows = lambda i: (i, 0)
    rep = lambda i: (0, 0)
    row_spec = pl.BlockSpec((Mb, D), rows, memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), rep, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _proj_mlp_kernel,
        grid=(pl.cdiv(M, Mb),),
        in_specs=[row_spec, row_spec,
                  pl.BlockSpec((D, D), rep, memory_space=pltpu.VMEM), vec(D),
                  pl.BlockSpec((D, F), rep, memory_space=pltpu.VMEM), vec(F),
                  pl.BlockSpec((F, D), rep, memory_space=pltpu.VMEM), vec(D),
                  vec(D), vec(D)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((M, D), att.dtype),
    )(att, x, wo, bo.reshape(1, -1), w1, b1.reshape(1, -1),
      w2, b2.reshape(1, -1), ln_scale.reshape(1, -1), ln_bias.reshape(1, -1))
