"""Pallas fused masked attention for TPU.

The VAE's hot attention operates over ~206 tokens (2*MAX_IT distribution
tokens + 196 frames) at d_model 256 / 4 heads (SURVEY.md §5: a Pallas
flash-attention kernel for the frame-length attention is the perf nicety
worth having).  This kernel fuses QK^T -> masked softmax -> PV for one
(batch, head) pair per grid program, keeping the [S, S] logits entirely in
VMEM instead of materializing them to HBM.

Used on the inference path (no dropout, no weight outputs); training and
CPU tests fall back to the XLA einsum pipeline in ``attention.py`` — at
these shapes both are correct, this one avoids logits round-trips.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_masked_attention"]

_NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float):
    # blocks: q/k/v [1, 1, S, Dp] in VMEM; mask [1, 1, S] f32 (1=valid).
    # Full-block reads (no ref slicing: Mosaic memref slices must be
    # 128-aligned) then squeeze the leading singleton dims.
    S, Dp = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[...].reshape(S, Dp).astype(jnp.float32)
    k = k_ref[...].reshape(S, Dp).astype(jnp.float32)
    v = v_ref[...].reshape(S, Dp).astype(jnp.float32)
    logits = jax.lax.dot_general(
        q * scale, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [S, S]
    mask = mask_ref[...].reshape(1, S)               # [1, S]
    logits = logits + (1.0 - mask) * _NEG_INF
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = out.reshape(1, 1, S, Dp).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def pallas_masked_attention(
    q: jax.Array,                        # [B, S, D] projected queries
    k: jax.Array,                        # [B, S, D]
    v: jax.Array,                        # [B, S, D]
    key_valid: Optional[jax.Array],      # [B, S] bool (True = attend)
    *,
    num_heads: int,
) -> jax.Array:
    B, S, D = q.shape
    H = num_heads
    Dh = D // H
    # Mosaic tiles the last dim to 128 lanes: pad the head dim up (zero
    # columns are inert in both QK^T and PV)
    Dp = max(128, ((Dh + 127) // 128) * 128)
    if key_valid is None:
        key_valid = jnp.ones((B, S), bool)
    mask = key_valid.astype(jnp.float32)[:, None, :]  # [B, 1, S]

    scale = float(1.0 / (Dh ** 0.5))
    kernel = functools.partial(_attn_kernel, scale=scale)

    def spec_qkv():
        return pl.BlockSpec((1, 1, S, Dp),
                            lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    def heads(x):
        xh = x.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        return jnp.pad(xh, ((0, 0), (0, 0), (0, 0), (0, Dp - Dh)))

    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[spec_qkv(), spec_qkv(), spec_qkv(),
                  pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec_qkv(),
        out_shape=jax.ShapeDtypeStruct((B, H, S, Dp), q.dtype),
    )(heads(q), heads(k), heads(v), mask)
    return out[..., :Dh].transpose(0, 2, 1, 3).reshape(B, S, D)
