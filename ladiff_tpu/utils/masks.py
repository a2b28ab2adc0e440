"""Length/mask helpers.

TPU-native equivalents of the reference's ``lengths_to_mask``
(/root/reference/src/ladiff/utils/temos_utils.py:10) and the per-sample
latent-count masking that the reference does with Python loops
(ladiff_vae.py:152-159,197-207; ladiff_denoiser.py:164-171;
modeltype/ladiff.py:379-390).  Everything here is vectorized ``jnp.where``
logic over static shapes — the masks are data, never shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["lengths_to_mask", "active_latent_count", "latent_valid_mask"]


def lengths_to_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B] int -> [B, max_len] bool; True for frames < length."""
    idx = jnp.arange(max_len)[None, :]
    return idx < lengths[:, None]


def active_latent_count(lengths: jax.Array, frame_per_latent: int,
                        max_it: int) -> jax.Array:
    """n_active = ceil(length / FRAME_PER_LATENT), clipped to [0, max_it]
    (reference: ladiff_vae.py:198)."""
    n = -(-lengths // frame_per_latent)  # ceil div on ints
    return jnp.clip(n, 0, max_it)


def latent_valid_mask(lengths: jax.Array, frame_per_latent: int,
                      max_it: int) -> jax.Array:
    """[B] int lengths -> [B, max_it] bool latent-row validity."""
    n = active_latent_count(lengths, frame_per_latent, max_it)
    idx = jnp.arange(max_it)[None, :]
    return idx < n[:, None]
