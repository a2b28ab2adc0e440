"""Pallas fused post-norm FFN segment.

Fuses the torch-post-norm tail of every transformer layer
(reference cross_attention.py:301-307 / :408-413):

    h   = LayerNorm1(x + attn_out)
    y   = act(h @ W1 + b1) @ W2 + b2
    out = LayerNorm2(h + y)

(~8 XLA kernels) into one pallas_call over [rows, D] blocks.  Used by the
denoiser's sa_blocks ([B*9, 256] rows, relu) and the VAE encoder/decoder
layers ([B*196+, 256] rows, gelu) at inference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_postnorm_ffn"]


def _ln(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias


def _erf(x):
    # Abramowitz-Stegun 7.1.26 (max err 1.5e-7); Mosaic lacks erf/erfc
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln1s_ref, ln1b_ref,
            ln2s_ref, ln2b_ref, out_ref, *, activation: str):
    x = x_ref[...].astype(jnp.float32)
    h = _ln(x, ln1s_ref[...].astype(jnp.float32),
            ln1b_ref[...].astype(jnp.float32))
    y = jax.lax.dot_general(h.astype(x_ref.dtype), w1_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b1_ref[...].astype(jnp.float32)
    if activation == "relu":
        y = jnp.maximum(y, 0.0)
    else:  # exact-grade gelu
        y = 0.5 * y * (1.0 + _erf(y * 0.7071067811865476))
    y = jax.lax.dot_general(y.astype(x_ref.dtype), w2_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32)
    out = _ln(h + y, ln2s_ref[...].astype(jnp.float32),
              ln2b_ref[...].astype(jnp.float32))
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("activation", "block_rows"))
def fused_postnorm_ffn(
    x: jax.Array,                        # [M, D] = residual sum (pre-norm1)
    w1: jax.Array, b1: jax.Array,        # [D, F], [F]
    w2: jax.Array, b2: jax.Array,        # [F, D], [D]
    ln1_scale: jax.Array, ln1_bias: jax.Array,
    ln2_scale: jax.Array, ln2_bias: jax.Array,
    activation: str = "gelu",
    block_rows: int = 512,
) -> jax.Array:
    M, D = x.shape
    F = w1.shape[1]
    Mb = min(block_rows, M)
    grid = (pl.cdiv(M, Mb),)
    rows = lambda i: (i, 0)
    rep = lambda i: (0, 0)
    row_spec = pl.BlockSpec((Mb, D), rows, memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), rep, memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, activation=activation)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec,
                  pl.BlockSpec((D, F), rep, memory_space=pltpu.VMEM), vec(F),
                  pl.BlockSpec((F, D), rep, memory_space=pltpu.VMEM), vec(D),
                  vec(D), vec(D), vec(D), vec(D)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
      ln1_scale.reshape(1, -1), ln1_bias.reshape(1, -1),
      ln2_scale.reshape(1, -1), ln2_bias.reshape(1, -1))
