"""Positional and timestep embeddings.

TPU-native equivalents of the reference's position encodings
(/root/reference/src/ladiff/models/operator/position_encoding.py:113-160) and
diffusers-style timestep embeddings
(/root/reference/src/ladiff/models/architectures/tools/embeddings.py:288-346).
All batch-first, static shapes.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "sinusoidal_position_table",
    "PositionEmbeddingLearned1D",
    "PositionEmbeddingSine1D",
    "timestep_embedding",
    "TimestepEmbedding",
]


def sinusoidal_position_table(max_len: int, d_model: int) -> np.ndarray:
    """[max_len, d_model] sine/cosine table (reference: position_encoding.py:115-127)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) *
                      (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionEmbeddingSine1D(nn.Module):
    """Additive fixed sine PE over the sequence axis (batch-first [B, S, D])."""

    d_model: int
    max_len: int = 500
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        table = jnp.asarray(sinusoidal_position_table(self.max_len, self.d_model),
                            dtype=self.dtype)
        return x + table[None, : x.shape[1], :]


class PositionEmbeddingLearned1D(nn.Module):
    """Additive learned PE (reference: PositionEmbeddingLearned1D, init U[0,1))."""

    d_model: int
    max_len: int = 500
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pe = self.param(
            "pe",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32),
            (self.max_len, self.d_model),
        )
        return x + pe[None, : x.shape[1], :].astype(self.dtype)


def timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jax.Array:
    """diffusers ``get_timestep_embedding`` (reference: embeddings.py:260-286).

    timesteps: [B] (float or int) -> [B, embedding_dim].
    """
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Linear-SiLU-Linear MLP over the sinusoidal embedding
    (reference: embeddings.py:288-306)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x
