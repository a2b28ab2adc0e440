"""LA-denoiser: length-conforming latent diffusion transformer.

TPU-native rebuild of
/root/reference/src/ladiff/models/architectures/ladiff_denoiser.py:16-295.

Behavioral contract:
  * Input latents [B, MAX_IT, 256]; per-sample latent-row validity mask
    threaded through every attention layer (ladiff_denoiser.py:164-171).
  * Sinusoidal timestep embedding at ``text_encoded_dim`` (768), projected
    by a Linear-SiLU-Linear MLP to 256 (ladiff_denoiser.py:65-68,184-188).
  * Text conditioning: pooled CLIP features projected ReLU+Linear(768->256)
    (ladiff_denoiser.py:70-73,196-200).
  * Two wirings: the released ``MD_TRANS`` stylization path (skip encoder
    over MDTransformerLayer; ladiff_denoiser.py:246-255) and the plain path
    (concat [latents; time; text] through the vanilla skip encoder with no
    padding mask; ladiff_denoiser.py:229-259).
  * Optional autoregressive conditioning tokens ``enclat`` concatenated to
    the latent stream (ladiff_denoiser.py:229-248).
  * Action conditioning via a learned per-class embedding table with
    CFG-style unconditional masking (EmbedAction, ladiff_denoiser.py:298-346).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladiff_tpu.ops.embeddings import (
    PositionEmbeddingLearned1D,
    PositionEmbeddingSine1D,
    TimestepEmbedding,
    timestep_embedding,
)
from ladiff_tpu.ops.stylization import MDSkipTransformerEncoder
from ladiff_tpu.ops.transformer import SkipTransformerEncoder

__all__ = ["LADenoiser", "EmbedAction"]


class EmbedAction(nn.Module):
    """Learned action-class embedding with unconditional drop for CFG
    (reference: ladiff_denoiser.py:298-346)."""

    num_actions: int
    latent_dim: int
    guidance_uncondp: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, action_ids: jax.Array, *, force_mask: bool = False,
                 deterministic: bool = True,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        table = self.param("action_embedding",
                           nn.initializers.xavier_uniform(),
                           (self.num_actions, self.latent_dim))
        out = table[action_ids.astype(jnp.int32)].astype(self.dtype)
        if force_mask:
            return jnp.zeros_like(out)
        if not deterministic and self.guidance_uncondp > 0.0:
            assert rng is not None
            drop = jax.random.bernoulli(rng, self.guidance_uncondp,
                                        (out.shape[0], 1))
            out = out * (1.0 - drop.astype(out.dtype))
        return out


class LADenoiser(nn.Module):
    nfeats: int = 263
    condition: str = "text"
    latent_dim: Sequence[int] = (7, 256)
    ff_size: int = 1024
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    normalize_before: bool = False
    activation: str = "gelu"
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    position_embedding: str = "learned"
    arch: str = "trans_enc"
    text_encoded_dim: int = 768
    nclasses: int = 10
    guidance_uncondp: float = 0.1
    # ablation block
    skip_connect: bool = True
    md_trans: bool = True
    diffusion_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def d_model(self) -> int:
        return int(self.latent_dim[-1])

    def setup(self):
        D = self.d_model
        if self.condition in ("text", "text_uncond"):
            self.time_embedding = TimestepEmbedding(D, dtype=self.dtype,
                                                    name="time_embedding")
            if self.text_encoded_dim != D:
                self.emb_proj = nn.Dense(D, dtype=self.dtype, name="emb_proj_1")
        elif self.condition == "action":
            self.time_embedding = TimestepEmbedding(D, dtype=self.dtype,
                                                    name="time_embedding")
            self.action_emb = EmbedAction(self.nclasses, D,
                                          self.guidance_uncondp,
                                          dtype=self.dtype, name="emb_proj")
        else:
            raise ValueError(f"condition {self.condition} not supported")

        if self.diffusion_only:
            self.pose_embd = nn.Dense(D, dtype=self.dtype, name="pose_embd")
            self.pose_proj = nn.Dense(self.nfeats, dtype=self.dtype,
                                      name="pose_proj")

        if self.position_embedding == "learned":
            self.query_pos = PositionEmbeddingLearned1D(D, dtype=self.dtype,
                                                        name="query_pos")
        else:
            self.query_pos = PositionEmbeddingSine1D(D, dtype=self.dtype,
                                                     name="query_pos")

        if self.arch != "trans_enc":
            raise ValueError(f"arch {self.arch} not supported (trans_enc only)")
        if self.md_trans:
            self.encoder = MDSkipTransformerEncoder(
                D, D, self.num_heads, self.num_layers, self.ff_size,
                self.dropout, dtype=self.dtype, name="encoder")
        else:
            self.encoder = SkipTransformerEncoder(
                D, self.num_heads, self.num_layers, self.ff_size, self.dropout,
                self.activation, self.normalize_before, dtype=self.dtype,
                name="encoder")

    def compute_time_embedding(self, timesteps: jax.Array) -> jax.Array:
        """[N] timesteps -> [N, D] embedded; exposed so samplers can build
        the whole table once outside the scan (all DDIM steps are known)."""
        sin_dim = (self.text_encoded_dim
                   if self.condition in ("text", "text_uncond")
                   else self.d_model)
        t_emb = timestep_embedding(
            timesteps, sin_dim,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=float(self.freq_shift)).astype(self.dtype)
        return self.time_embedding(t_emb)

    def project_text(self, encoder_hidden_states: jax.Array) -> jax.Array:
        """[B, N, 768] raw text features -> [B, N, D]; step-invariant, so
        samplers call it once instead of per diffusion step.  Inputs already
        at d_model (pre-projected, e.g. action embeddings) pass through."""
        text = encoder_hidden_states.astype(self.dtype)
        if text.shape[-1] == self.d_model:
            return text
        return self.emb_proj(nn.relu(text))

    def precompute_md_prep(self, text_emb_latent: jax.Array,
                           time_table: jax.Array):
        """Step-invariant prep for the fused MD sampling path: per-layer ca
        text values [B, D] + AdaLN scale/shift rows for every DDIM step
        [S, 2D] (see MDSkipTransformerEncoder.precompute_prep).  Only valid
        for the md_trans wiring."""
        assert self.md_trans
        return self.encoder.precompute_prep(
            text_emb_latent.astype(self.dtype),
            time_table.astype(self.dtype))

    def precompute_md_stack(self):
        """Stacked-[L] layer params for the whole-stack fused sampling
        kernel (ops/pallas_md_stack), computed once outside the scan."""
        assert self.md_trans
        return self.encoder.stacked_params()

    def stack_md_prep(self, prep_all):
        """Re-layout precompute_md_prep's output for the whole-stack
        kernel: values [L, B, D] + AdaLN tables [S, L, 2D]."""
        assert self.md_trans
        return self.encoder.stack_prep(prep_all)

    def embed_action(self, action_ids: jax.Array,
                     force_mask: bool = False) -> jax.Array:
        """[B] class ids -> [B, 1, D] conditioning tokens; force_mask gives
        the zeroed unconditional branch (reference EmbedAction:329-333)."""
        return self.action_emb(action_ids, force_mask=force_mask)[:, None, :]

    def __call__(
        self,
        sample: jax.Array,                 # [B, n_lat, D] noisy latents
        timesteps: Optional[jax.Array] = None,     # [B] int
        encoder_hidden_states: Optional[jax.Array] = None,  # [B, N, 768]
        latent_valid: Optional[jax.Array] = None,  # [B, n_lat] bool
        enclat: Optional[jax.Array] = None,        # [B, n_cond, D]
        frame_valid: Optional[jax.Array] = None,   # diffusion-only path
        deterministic: bool = True,
        time_emb: Optional[jax.Array] = None,          # [B, D] precomputed
        text_emb_latent: Optional[jax.Array] = None,   # [B, N, D] precomputed
        enclat_valid: Optional[jax.Array] = None,      # [B, n_cond] bool
        md_prep=None,   # per-step slice of precompute_md_prep (sampling)
    ) -> jax.Array:
        B, n_lat, _ = sample.shape
        sample = sample.astype(self.dtype)

        # 1. time embedding (or precomputed row from the sampler's table)
        if time_emb is None:
            time_emb = self.compute_time_embedding(timesteps)  # [B, D]
        time_emb = time_emb.astype(self.dtype)

        # 2. condition embedding
        if text_emb_latent is not None:
            text_emb_latent = text_emb_latent.astype(self.dtype)
        elif self.condition in ("text", "text_uncond"):
            text_emb_latent = self.project_text(encoder_hidden_states)
        else:
            rng = (self.make_rng("cond_drop")
                   if not deterministic else None)
            text_emb_latent = self.action_emb(
                encoder_hidden_states, deterministic=deterministic,
                rng=rng)[:, None, :]

        if self.diffusion_only:
            sample = self.pose_embd(sample)

        if enclat is not None:
            stream = jnp.concatenate([sample, enclat.astype(self.dtype)], axis=1)
            if latent_valid is not None or enclat_valid is not None:
                if latent_valid is None:
                    latent_valid = jnp.ones((B, n_lat), dtype=bool)
                cond_valid = (enclat_valid if enclat_valid is not None
                              else jnp.ones((B, enclat.shape[1]), dtype=bool))
                stream_valid = jnp.concatenate([latent_valid, cond_valid], axis=1)
            else:
                stream_valid = None
        else:
            stream = sample
            stream_valid = latent_valid

        if self.md_trans:
            xseq = self.query_pos(stream)
            tokens = self.encoder(xseq, text_emb_latent, time_emb,
                                  stream_valid, deterministic=deterministic,
                                  prep=md_prep)
            out = tokens[:, :n_lat]
        else:
            # plain concat path: [latents(+enclat); time; text] tokens, no
            # padding mask (reference: ladiff_denoiser.py:258-259 passes none)
            emb_tokens = jnp.concatenate(
                [time_emb[:, None, :], text_emb_latent], axis=1)
            if self.diffusion_only:
                xseq = jnp.concatenate([emb_tokens, stream], axis=1)
            else:
                xseq = jnp.concatenate([stream, emb_tokens], axis=1)
            xseq = self.query_pos(xseq)
            # reference passes no padding mask on this path; a mask appears
            # only when static-shape AR conditioning needs invalid enclat
            # rows hidden (the reference instead drops the tokens entirely)
            if enclat_valid is not None and stream_valid is not None:
                emb_valid = jnp.ones((B, emb_tokens.shape[1]), dtype=bool)
                xseq_valid = (jnp.concatenate([stream_valid, emb_valid], axis=1)
                              if not self.diffusion_only else None)
            else:
                xseq_valid = None
            tokens = self.encoder(xseq, xseq_valid, deterministic=deterministic)
            if self.diffusion_only:
                out = tokens[:, emb_tokens.shape[1]:]
                out = self.pose_proj(out)
                if frame_valid is not None:
                    out = jnp.where(frame_valid[:, :, None], out, 0.0)
                return out
            out = tokens[:, :n_lat]
        return out
