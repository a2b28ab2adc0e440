"""LA-VAE: length-aware transformer VAE.

TPU-native rebuild of
/root/reference/src/ladiff/models/architectures/ladiff_vae.py:33-362.

Behavioral contract (checked against the reference line by line):
  * Encoder prepends ``2 * MAX_IT`` learned distribution tokens to the
    embedded frames; per-sample token validity is
    ``ceil(length / FRAME_PER_LATENT)`` for both the mu and logvar halves
    (ladiff_vae.py:189-209).
  * Learned additive positional encoding over the concatenated token stream
    (ladiff_vae.py:219).
  * After the 9-layer skip encoder, the first MAX_IT tokens are mu, the next
    MAX_IT are logvar (ladiff_vae.py:254-259); the reparameterized sample
    has inactive rows zeroed (ladiff_vae.py:265-268).
  * Decoder: zero queries (one per frame) + learned PE cross-attend to the
    latent memory through a 9-layer skip decoder with
    ``memory_key_padding_mask`` = latent mask and ``tgt_key_padding_mask`` =
    frame mask; final linear to nfeats; padded frames zeroed
    (ladiff_vae.py:288-362).
  * Optional DVAE input corruption: a fixed fraction of flattened feature
    entries (same positions across the batch) gets unit-Gaussian noise
    added (ladiff_vae.py:136-150).

TPU-first deltas: batch-first [B, T, F] static shapes (T = 196 padded), all
per-sample loops replaced by vectorized mask math, explicit PRNG keys.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladiff_tpu.ops.embeddings import PositionEmbeddingLearned1D, PositionEmbeddingSine1D
from ladiff_tpu.ops.transformer import SkipTransformerDecoder, SkipTransformerEncoder
from ladiff_tpu.utils.masks import latent_valid_mask, lengths_to_mask

__all__ = ["LAVae"]


class LAVae(nn.Module):
    nfeats: int
    latent_dim: Sequence[int] = (7, 256)
    ff_size: int = 1024
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    arch: str = "encoder_decoder"
    normalize_before: bool = False
    activation: str = "gelu"
    position_embedding: str = "learned"
    # ablation block (reference cfg TRAIN.ABLATION)
    max_it: int = 5
    frame_per_latent: int = 48
    lad: bool = True
    dvae: bool = False
    percentage_noised: float = 0.0
    mlp_dist: bool = False
    test_efficiency: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def d_model(self) -> int:
        return int(self.latent_dim[-1])

    def _pe(self, name: str):
        if self.position_embedding == "learned":
            return PositionEmbeddingLearned1D(self.d_model, dtype=self.dtype, name=name)
        return PositionEmbeddingSine1D(self.d_model, dtype=self.dtype, name=name)

    def setup(self):
        D = self.d_model
        self.skel_embedding = nn.Dense(D, dtype=self.dtype, name="skel_embedding")
        self.final_layer = nn.Dense(self.nfeats, dtype=self.dtype, name="final_layer")
        if self.mlp_dist:
            # MLP_DIST ablation (reference ladiff_vae.py:110-113): single
            # token set + Linear(D -> 2D) producing mu/logvar
            n_tok = int(self.latent_dim[0])
            self.dist_layer = nn.Dense(2 * D, dtype=self.dtype,
                                       name="dist_layer")
        else:
            n_tok = 2 * self.max_it if self.max_it else 2 * int(self.latent_dim[0])
        self.global_motion_token = self.param(
            "global_motion_token", nn.initializers.normal(1.0), (n_tok, D))
        self.query_pos_encoder = self._pe("query_pos_encoder")
        self.query_pos_decoder = self._pe("query_pos_decoder")
        self.encoder = SkipTransformerEncoder(
            D, self.num_heads, self.num_layers, self.ff_size, self.dropout,
            self.activation, self.normalize_before, dtype=self.dtype,
            name="encoder")
        if self.arch == "encoder_decoder":
            self.decoder = SkipTransformerDecoder(
                D, self.num_heads, self.num_layers, self.ff_size, self.dropout,
                self.activation, self.normalize_before, dtype=self.dtype,
                name="decoder")
        elif self.arch == "all_encoder":
            self.decoder = SkipTransformerEncoder(
                D, self.num_heads, self.num_layers, self.ff_size, self.dropout,
                self.activation, self.normalize_before, dtype=self.dtype,
                name="decoder")
        else:
            raise ValueError(f"unsupported arch {self.arch}")

    # ------------------------------------------------------------------
    def add_noise(self, features: jax.Array, rng: jax.Array) -> jax.Array:
        """DVAE input corruption (reference: ladiff_vae.py:136-150)."""
        B, T, F = features.shape
        total = T * F
        n_corrupt = int(total * self.percentage_noised)
        idx_rng, noise_rng = jax.random.split(rng)
        idx = jax.random.randint(idx_rng, (n_corrupt,), 0, total)
        col_mask = jnp.zeros((total,), self.dtype).at[idx].set(1.0)
        noise = jax.random.normal(noise_rng, (B, total), self.dtype) * col_mask
        return features + noise.reshape(B, T, F)

    def encode(
        self,
        features: jax.Array,          # [B, T, nfeats]
        lengths: jax.Array,           # [B] int
        *,
        rng: Optional[jax.Array] = None,
        sample_mean: bool = False,
        fact: Optional[float] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Returns (z [B, max_it, D], mu, logvar, latent_valid [B, max_it]).

        ``sample_mean``/``fact`` mirror the test-time knobs TEST.MEAN /
        TEST.FACT (reference sample_from_distribution, ladiff.py:225-248:
        z = mu + fact * (sample - mu))."""
        B, T, _ = features.shape
        n_lat = self.max_it if self.max_it else int(self.latent_dim[0])

        if self.dvae and self.percentage_noised > 0.0 and not deterministic:
            assert rng is not None
            rng, noise_rng = jax.random.split(rng)
            features = self.add_noise(features, noise_rng)

        frame_valid = lengths_to_mask(lengths, T)
        x = self.skel_embedding(features.astype(self.dtype))

        dist_tokens = jnp.tile(
            self.global_motion_token[None, :, :].astype(self.dtype), (B, 1, 1))
        if self.max_it and self.lad:
            lat_valid = latent_valid_mask(lengths, self.frame_per_latent, self.max_it)
            dist_valid = jnp.concatenate([lat_valid, lat_valid], axis=1)
        else:
            lat_valid = jnp.ones((B, n_lat), dtype=bool)
            dist_valid = jnp.ones((B, 2 * n_lat), dtype=bool)

        n_tok = self.global_motion_token.shape[0]
        aug_valid = jnp.concatenate([dist_valid[:, :n_tok], frame_valid],
                                    axis=1)
        xseq = jnp.concatenate([dist_tokens, x], axis=1)
        xseq = self.query_pos_encoder(xseq)
        out = self.encoder(xseq, aug_valid, deterministic=deterministic)
        out = out[:, :n_tok]

        if self.mlp_dist:
            tokens_dist = self.dist_layer(out)
            mu = tokens_dist[..., : self.d_model]
            logvar = tokens_dist[..., self.d_model:]
        else:
            mu = out[:, :n_lat]
            logvar = out[:, n_lat:]
        std = jnp.exp(0.5 * logvar)
        if sample_mean:
            z = mu
        else:
            assert rng is not None, "encode needs an rng to sample"
            eps = jax.random.normal(rng, mu.shape, mu.dtype)
            z = mu + std * eps
            if fact is not None:
                z = mu + fact * (z - mu)
        if self.max_it and self.lad:
            z = jnp.where(lat_valid[:, :, None], z, 0.0)
        return z, mu, logvar, lat_valid

    def decode(
        self,
        z: jax.Array,                 # [B, max_it, D]
        lengths: jax.Array,           # [B] int
        *,
        nframes: Optional[int] = None,
        latent_valid: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_cross_weights: bool = False,
        mask_memory: bool = True,
    ):
        """Latents -> features [B, nframes, nfeats]; padded frames zeroed."""
        B = z.shape[0]
        T = int(nframes) if nframes is not None else None
        if T is None:
            raise ValueError("decode requires a static nframes")
        frame_valid = lengths_to_mask(lengths, T)
        if latent_valid is None:
            latent_valid = latent_valid_mask(
                lengths, self.frame_per_latent, z.shape[1])

        queries = jnp.zeros((B, T, self.d_model), self.dtype)
        queries = self.query_pos_decoder(queries)
        if self.arch == "encoder_decoder":
            out = self.decoder(
                queries, z.astype(self.dtype),
                tgt_key_valid=frame_valid,
                # TEST_EFFICIENCY ablation drops the memory mask to time the
                # minimal graph (reference ladiff_vae.py:294-295,342)
                memory_key_valid=(latent_valid
                                  if (mask_memory and not self.test_efficiency)
                                  else None),
                deterministic=deterministic,
                return_cross_weights=return_cross_weights)
            if return_cross_weights:
                out, cross_weights = out
        else:  # all_encoder
            z_valid = jnp.ones((B, z.shape[1]), dtype=bool)
            xseq = jnp.concatenate([z.astype(self.dtype), queries], axis=1)
            aug_valid = jnp.concatenate([z_valid, frame_valid], axis=1)
            xseq = self.query_pos_decoder(xseq)
            out = self.decoder(xseq, aug_valid, deterministic=deterministic)
            out = out[:, z.shape[1]:]
            cross_weights = None
        feats = self.final_layer(out)
        feats = jnp.where(frame_valid[:, :, None], feats, 0.0)
        if return_cross_weights:
            return feats, cross_weights
        return feats

    def __call__(self, features, lengths, rng, deterministic: bool = True):
        """Full reconstruction pass (used for init/shape inference)."""
        z, mu, logvar, lat_valid = self.encode(
            features, lengths, rng=rng, deterministic=deterministic)
        feats = self.decode(z, lengths, nframes=features.shape[1],
                            deterministic=deterministic)
        return feats, z, mu, logvar, lat_valid
