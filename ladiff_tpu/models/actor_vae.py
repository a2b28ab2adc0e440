"""ACTOR-style VAE (the action-conditioned stage-1 model).

Rebuild of /root/reference/src/ladiff/models/architectures/actor_vae.py:
11-258: agnostic encoder with single mu/logvar tokens prepended to the
embedded frames (vanilla post-norm transformer encoder), and a decoder whose
sine-PE time queries cross-attend to the single latent through a vanilla
transformer decoder.  Used by the ``modules_humanact12`` config family
(configs/modules_humanact12/motion_vae.yaml).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladiff_tpu.ops.embeddings import PositionEmbeddingSine1D
from ladiff_tpu.ops.transformer import (TransformerDecoderLayer,
                                        TransformerEncoderLayer)
from ladiff_tpu.utils.masks import lengths_to_mask

__all__ = ["ActorVae"]


class ActorVae(nn.Module):
    nfeats: int
    latent_dim: Sequence[int] = (1, 256)
    ff_size: int = 1024
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    is_vae: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def d_model(self) -> int:
        return int(self.latent_dim[-1])

    def setup(self):
        D = self.d_model
        self.skel_embedding = nn.Dense(D, dtype=self.dtype,
                                       name="skel_embedding")
        self.mu_token = self.param("mu_token", nn.initializers.normal(1.0),
                                   (D,))
        self.logvar_token = self.param("logvar_token",
                                       nn.initializers.normal(1.0), (D,))
        self.pe = PositionEmbeddingSine1D(D, dtype=self.dtype, name="pe")
        self.enc_layers = [
            TransformerEncoderLayer(D, self.num_heads, self.ff_size,
                                    self.dropout, self.activation,
                                    dtype=self.dtype, name=f"enc_{i}")
            for i in range(self.num_layers)]
        self.dec_layers = [
            TransformerDecoderLayer(D, self.num_heads, self.ff_size,
                                    self.dropout, self.activation,
                                    dtype=self.dtype, name=f"dec_{i}")
            for i in range(self.num_layers)]
        self.final_layer = nn.Dense(self.nfeats, dtype=self.dtype,
                                    name="final_layer")

    def encode(self, features: jax.Array, lengths: jax.Array, *,
               rng: Optional[jax.Array] = None, sample_mean: bool = False,
               deterministic: bool = True
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        B, T, _ = features.shape
        frame_valid = lengths_to_mask(lengths, T)
        x = self.skel_embedding(features.astype(self.dtype))
        mu_tok = jnp.broadcast_to(self.mu_token[None, None, :],
                                  (B, 1, self.d_model)).astype(self.dtype)
        lv_tok = jnp.broadcast_to(self.logvar_token[None, None, :],
                                  (B, 1, self.d_model)).astype(self.dtype)
        xseq = jnp.concatenate([mu_tok, lv_tok, x], axis=1)
        valid = jnp.concatenate([jnp.ones((B, 2), bool), frame_valid], axis=1)
        xseq = self.pe(xseq)
        for layer in self.enc_layers:
            xseq = layer(xseq, valid, deterministic=deterministic)
        mu, logvar = xseq[:, 0], xseq[:, 1]
        if sample_mean or not self.is_vae:
            z = mu
        else:
            assert rng is not None
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mu.shape, mu.dtype)
        lat_valid = jnp.ones((B, 1), dtype=bool)
        # 4-tuple matches LAVae.encode so the system layer is vae-agnostic
        return z[:, None, :], mu[:, None, :], logvar[:, None, :], lat_valid

    def decode(self, z: jax.Array, lengths: jax.Array, *,
               nframes: int, deterministic: bool = True) -> jax.Array:
        B = z.shape[0]
        frame_valid = lengths_to_mask(lengths, nframes)
        queries = jnp.zeros((B, nframes, self.d_model), self.dtype)
        queries = self.pe(queries)
        out = queries
        for layer in self.dec_layers:
            out = layer(out, z.astype(self.dtype),
                        tgt_key_valid=frame_valid,
                        deterministic=deterministic)
        feats = self.final_layer(out)
        return jnp.where(frame_valid[:, :, None], feats, 0.0)

    def __call__(self, features, lengths, rng, deterministic: bool = True):
        z, mu, logvar, lat_valid = self.encode(features, lengths, rng=rng,
                                               deterministic=deterministic)
        feats = self.decode(z, lengths, nframes=features.shape[1],
                            deterministic=deterministic)
        return feats, z, mu, logvar, lat_valid
