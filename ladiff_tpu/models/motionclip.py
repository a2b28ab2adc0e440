"""MotionCLIP: a CLIP-aligned motion autoencoder + text encoder.

Functional rebuild of the reference's motionclip text-encoder option
(/root/reference/src/ladiff/models/architectures/mld_motionclip.py:22-123
and ``configs/modules/text_encoder.yaml:2``).  The reference module depends
on an external ``deps.motionclip`` repo that does not ship with the code
and is broken as committed: it constructs a MOTIONCLIP model (CLIP ViT-B/32
+ ACTOR-style ``Encoder_TRANSFORMER``/``Decoder_TRANSFORMER``,
mld_motionclip.py:38-57) and then immediately overwrites ``self.text_model``
with a plain HF ``AutoModel`` (mld_motionclip.py:59-60), so the motion
tower is never used.  This rebuild provides the *intended* capability:

- :class:`MotionClipTextEncoder` — the config-selectable text encoder
  (same ``texts -> [B, 1, D]`` contract as ``mld_clip``), backed by our
  flax CLIP tower at MotionCLIP's ViT-B/32 text geometry (width 512,
  8 heads, 12 layers, 512-d projection).
- :class:`MotionClipMotionEncoder` / :class:`MotionClipMotionDecoder` —
  the ACTOR-style transformer motion autoencoder (MotionCLIP, Tevet et
  al. ECCV 2022: latent 512, 8 post-norm layers, 4 heads, ff 1024, gelu)
  whose single pooled latent lives in the CLIP embedding space.
- :class:`MotionClip` — ties them together and exposes the CLIP-space
  cosine alignment used for training/retrieval.

Masking follows the framework conventions: static shapes, boolean
``key_valid`` masks, padded frames zeroed.
"""
from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ladiff_tpu.ops.embeddings import sinusoidal_position_table
from ladiff_tpu.ops.transformer import (TransformerDecoderLayer,
                                        TransformerEncoderLayer)
from ladiff_tpu.utils.masks import lengths_to_mask

__all__ = ["MotionClipTextEncoder", "MotionClipMotionEncoder",
           "MotionClipMotionDecoder", "MotionClip"]


class MotionClipMotionEncoder(nn.Module):
    """ACTOR-style encoder: embed frames, prepend a learned mu query token,
    pool the transformer output at that token into a 512-d CLIP-space latent
    (reference mld_motionclip.py:53 ``Encoder_TRANSFORMER``)."""

    nfeats: int
    latent_dim: int = 512
    num_layers: int = 8
    num_heads: int = 4
    ff_size: int = 1024
    dropout: float = 0.1
    activation: str = "gelu"
    max_len: int = 196
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, lengths: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """feats [B, T, F], lengths [B] -> z [B, latent_dim]."""
        B, T, _ = feats.shape
        x = nn.Dense(self.latent_dim, dtype=self.dtype,
                     name="skel_embedding")(feats)
        mu = self.param("mu_query", nn.initializers.normal(0.02),
                        (1, self.latent_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(mu[None].astype(x.dtype),
                              (B, 1, self.latent_dim)), x], axis=1)
        pe = sinusoidal_position_table(self.max_len + 1, self.latent_dim)
        x = x + jnp.asarray(pe[:T + 1], x.dtype)[None]
        valid = jnp.concatenate(
            [jnp.ones((B, 1), bool), lengths_to_mask(lengths, T)], axis=1)
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.latent_dim, self.num_heads, self.ff_size, self.dropout,
                self.activation, dtype=self.dtype, name=f"layers_{i}")(
                    x, key_valid=valid, deterministic=deterministic)
        return x[:, 0]


class MotionClipMotionDecoder(nn.Module):
    """ACTOR-style decoder: sinusoidal time queries cross-attend to the
    single latent token, final linear to features, padded frames zeroed
    (reference mld_motionclip.py:54 ``Decoder_TRANSFORMER``)."""

    nfeats: int
    latent_dim: int = 512
    num_layers: int = 8
    num_heads: int = 4
    ff_size: int = 1024
    dropout: float = 0.1
    activation: str = "gelu"
    max_len: int = 196
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, lengths: jax.Array, nframes: int,
                 deterministic: bool = True) -> jax.Array:
        """z [B, latent_dim], lengths [B] -> feats [B, nframes, nfeats]."""
        B = z.shape[0]
        pe = sinusoidal_position_table(self.max_len, self.latent_dim)
        queries = jnp.broadcast_to(
            jnp.asarray(pe[:nframes], self.dtype)[None],
            (B, nframes, self.latent_dim))
        memory = z[:, None, :].astype(self.dtype)
        valid = lengths_to_mask(lengths, nframes)
        x = queries
        for i in range(self.num_layers):
            x = TransformerDecoderLayer(
                self.latent_dim, self.num_heads, self.ff_size, self.dropout,
                self.activation, dtype=self.dtype, name=f"layers_{i}")(
                    x, memory, tgt_key_valid=valid,
                    deterministic=deterministic)
        out = nn.Dense(self.nfeats, dtype=self.dtype, name="final_layer")(x)
        return jnp.where(valid[..., None], out, 0.0)


class MotionClip(nn.Module):
    """Motion autoencoder whose latent is aligned with CLIP text space."""

    nfeats: int
    latent_dim: int = 512
    num_layers: int = 8
    num_heads: int = 4
    ff_size: int = 1024
    dropout: float = 0.1
    max_len: int = 196
    dtype: Any = jnp.float32

    def setup(self):
        kw = dict(nfeats=self.nfeats, latent_dim=self.latent_dim,
                  num_layers=self.num_layers, num_heads=self.num_heads,
                  ff_size=self.ff_size, dropout=self.dropout,
                  max_len=self.max_len, dtype=self.dtype)
        self.encoder = MotionClipMotionEncoder(**kw)
        self.decoder = MotionClipMotionDecoder(**kw)

    def __call__(self, feats: jax.Array, lengths: jax.Array,
                 deterministic: bool = True):
        z = self.encoder(feats, lengths, deterministic=deterministic)
        recon = self.decoder(z, lengths, feats.shape[1],
                             deterministic=deterministic)
        return recon, z

    def encode(self, feats, lengths, deterministic: bool = True):
        return self.encoder(feats, lengths, deterministic=deterministic)

    def decode(self, z, lengths, nframes: int, deterministic: bool = True):
        return self.decoder(z, lengths, nframes,
                            deterministic=deterministic)

    @staticmethod
    def clip_alignment(z_motion: jax.Array, z_text: jax.Array) -> jax.Array:
        """Cosine similarity matrix [B, B] between motion latents and CLIP
        text embeddings — MotionCLIP's alignment objective."""
        zm = z_motion / (jnp.linalg.norm(z_motion, axis=-1,
                                         keepdims=True) + 1e-8)
        zt = z_text / (jnp.linalg.norm(z_text, axis=-1, keepdims=True) + 1e-8)
        return zm @ zt.T


class MotionClipTextEncoder:
    """texts -> [B, 1, 512]: the mld_motionclip text-encoder option.

    MotionCLIP pairs motions with CLIP **ViT-B/32** text embeddings
    (mld_motionclip.py:38), so this tower runs at that geometry instead of
    mld_clip's ViT-L/14.  Loads an HF-format CLIP checkpoint from
    ``modelpath`` when present (assets key ``model.motionclip_path``,
    reference assets.yaml:32); hash-tokenizer + random init otherwise.
    """

    def __init__(self, modelpath: Optional[str] = None,
                 last_hidden_state: bool = False, dtype=jnp.float32,
                 rng_seed: int = 0):
        import os

        from ladiff_tpu.models.clip_text import (BPETokenizer, CLIPTextTower,
                                                 HashTokenizer,
                                                 load_torch_clip_state)
        self.tower = CLIPTextTower(width=512, heads=8, num_layers=12,
                                   projection_dim=512, dtype=dtype)
        self.last_hidden_state = last_hidden_state
        self.text_encoded_dim = 512
        if modelpath and os.path.exists(os.path.join(modelpath, "vocab.json")):
            self.tokenizer = BPETokenizer(modelpath)
        else:
            self.tokenizer = HashTokenizer()
        self.params = None
        if modelpath:
            self.params = load_torch_clip_state(modelpath, self.tower)
        if self.params is None:
            ids = jnp.zeros((1, 77), jnp.int32)
            self.params = self.tower.init(
                jax.random.PRNGKey(rng_seed), ids)["params"]
        self._apply = jax.jit(
            lambda params, ids: self.tower.apply(
                {"params": params}, ids, return_hidden=last_hidden_state))

    def encode_ids(self, input_ids: jax.Array) -> jax.Array:
        out = self._apply(self.params, input_ids)
        if self.last_hidden_state:
            return out
        return out[:, None, :]

    def __call__(self, texts: List[str]) -> jax.Array:
        ids = jnp.asarray(self.tokenizer(texts))
        return self.encode_ids(ids)
