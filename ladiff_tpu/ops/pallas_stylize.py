"""Pallas fused broadcast-stylize kernel (collapsed ca_block tail).

With a single pooled text token the MD layer's softmax-linear cross
attention collapses exactly to ``y[b,t] = v[b]`` on valid latent rows (see
LinearTemporalCrossAttention).  What remains per layer is

    y   = v_row * row_mask
    h   = LayerNorm(y) * (1 + scale) + shift
    out = x + silu(h) @ W + b

which this kernel runs as one pallas_call over [rows, D] blocks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_broadcast_stylize"]


def _kernel(x_ref, v_ref, mask_ref, scale_ref, shift_ref, lns_ref, lnb_ref,
            w_ref, b_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)
    y = v_ref[...].astype(jnp.float32) * mask_ref[...].astype(jnp.float32)
    mu = jnp.mean(y, -1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, -1, keepdims=True)
    h = (y - mu) * jax.lax.rsqrt(var + 1e-5)
    h = h * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    h = h * (1.0 + scale_ref[...].astype(jnp.float32)) \
        + shift_ref[...].astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)
    h = jax.lax.dot_general(h.astype(x_ref.dtype), w_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[...] = (x + h + b_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def fused_broadcast_stylize(
    x: jax.Array,        # [M, D] latent rows
    v: jax.Array,        # [M, D] per-sample value rows (expanded)
    mask: jax.Array,     # [M, 1] f32 row validity
    scale: jax.Array,    # [M, D]
    shift: jax.Array,    # [M, D]
    ln_scale: jax.Array, ln_bias: jax.Array,  # [D]
    w: jax.Array, b: jax.Array,               # [D, D], [D]
    block_rows: int = 1024,
) -> jax.Array:
    M, D = x.shape
    Mb = min(block_rows, M)
    grid = (pl.cdiv(M, Mb),)
    rows = lambda i: (i, 0)
    rep = lambda i: (0, 0)
    row = pl.BlockSpec((Mb, D), rows, memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), rep, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[row, row,
                  pl.BlockSpec((Mb, 1), rows, memory_space=pltpu.VMEM),
                  row, row, vec(D), vec(D),
                  pl.BlockSpec((D, D), rep, memory_space=pltpu.VMEM), vec(D)],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
    )(x, v, mask, scale, shift, ln_scale.reshape(1, -1),
      ln_bias.reshape(1, -1), w, b.reshape(1, -1))
