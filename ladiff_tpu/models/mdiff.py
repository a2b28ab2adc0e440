"""MotionDiffuse: the full per-frame text-to-motion diffusion transformer.

Rebuild of /root/reference/src/ladiff/models/architectures/
mdiff_transformer.py:323-556 — the ``MotionTransformer`` model plus the
temporal attention blocks only it consumes (``TemporalSelfAttention``,
``TemporalCrossAttention``, ``LinearTemporalSelfAttention``; the
MLD-flavoured linear decoder layer is shared with the LADiff denoiser and
lives in ``ops/stylization.py``).  Dead code in the reference —
instantiated by no shipped config — and broken as shipped in two ways:

* the default ``no_eff=False`` branch constructs
  ``LinearTemporalDiffusionTransformerDecoderLayer(latent_dim=...)``
  (mdiff_transformer.py:493-502) against a constructor whose parameter is
  ``d_model`` (mdiff_transformer.py:265-275) — a ``TypeError``; and with
  the hardcoded ``use_MLD_Transformer=True`` its forward concatenates
  512-d latents with 256-d text rows (mdiff_transformer.py:311).
* both layer flavours crash inside ``forward`` on
  ``emb.permute(1, 0, 2)`` of a 2-D tensor (mdiff_transformer.py:306)
  when driven by ``MotionTransformer.forward``'s [B, D] embedding.

This rebuild keeps the model's intended (upstream MotionDiffuse)
semantics working for both flavours: the efficient path uses the original
softmax-linear attention blocks; everything is batch-first, masks are
boolean [B, T] arrays, and text comes in as precomputed CLIP token
features (the frozen CLIP tower lives in ``models/clip_text.py``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ladiff_tpu.ops.embeddings import timestep_embedding
from ladiff_tpu.ops.param_layers import DenseParams, LNParams
from ladiff_tpu.ops.stylization import (LinearTemporalCrossAttention,
                                        StylizedFFN, _StylizationParams)
from ladiff_tpu.ops.transformer import TransformerEncoderLayer
from ladiff_tpu.utils.masks import lengths_to_mask

__all__ = ["LinearTemporalSelfAttention", "TemporalSelfAttention",
           "TemporalCrossAttention", "TemporalDecoderLayer",
           "LinearTemporalDecoderLayer", "MotionTransformer",
           "convert_torch_motion_transformer"]


class LinearTemporalSelfAttention(nn.Module):
    """Softmax-linear self attention with frame masking
    (reference mdiff_transformer.py:166-203): softmax over feature dim for
    queries, over time for keys (invalid keys biased to -1e6 pre-softmax,
    invalid values zeroed), then two small GEMMs instead of a TxT map."""

    latent_dim: int
    num_heads: int
    emb_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array,
                 frame_valid: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        B, T, D = x.shape
        H = self.num_heads
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        query = nn.Dense(D, dtype=self.dtype, name="query")(xn)
        key = nn.Dense(D, dtype=self.dtype, name="key")(xn)
        value = nn.Dense(D, dtype=self.dtype, name="value")(xn)
        if frame_valid is not None:
            fv = frame_valid[:, :, None].astype(key.dtype)
            key = key + (1.0 - fv) * -1000000.0
            value = value * fv
        query = jax.nn.softmax(query.reshape(B, T, H, -1), axis=-1)
        keyh = jax.nn.softmax(key.reshape(B, T, H, -1), axis=1)
        valueh = value.reshape(B, T, H, -1)
        attention = jnp.einsum("bnhd,bnhl->bhdl", keyh, valueh,
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype)
        y = jnp.einsum("bnhd,bhdl->bnhl", query, attention,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(B, T, D)
        proj_out = _StylizationParams(self.latent_dim, self.dropout,
                                      dtype=self.dtype, emb_dim=self.emb_dim,
                                      name="proj_out")
        return x + proj_out(y, emb, deterministic=deterministic)


class TemporalSelfAttention(nn.Module):
    """Vanilla quadratic self attention with stylized output projection
    (reference mdiff_transformer.py:323-354).

    NB the reference adds ``(1 - src_mask) * -100000`` broadcast over the
    QUERY axis (constant across keys, mdiff_transformer.py:349) — a no-op
    in exact arithmetic (softmax shift invariance), but the huge shift
    rounds masked rows' logits in fp32, and those rows feed back into
    valid rows at the NEXT layer (keys are never masked).  Replicated
    bit-for-bit here, like the other deliberate reference quirks."""

    latent_dim: int
    num_heads: int
    emb_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array,
                 frame_valid: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        B, T, D = x.shape
        H = self.num_heads
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        query = nn.Dense(D, dtype=self.dtype, name="query")(xn)
        key = nn.Dense(D, dtype=self.dtype, name="key")(xn)
        value = nn.Dense(D, dtype=self.dtype, name="value")(xn)
        q = query.reshape(B, T, H, -1)
        k = key.reshape(B, T, H, -1)
        attn = jnp.einsum("bnhd,bmhd->bnmh", q, k,
                          preferred_element_type=jnp.float32
                          ) / np.sqrt(D // H)
        if frame_valid is not None:
            fv = frame_valid[:, :, None, None].astype(attn.dtype)
            attn = attn + (1.0 - fv) * -100000.0
        weight = jax.nn.softmax(attn, axis=2).astype(x.dtype)
        weight = nn.Dropout(self.dropout)(weight, deterministic=deterministic)
        v = value.reshape(B, T, H, -1)
        y = jnp.einsum("bnmh,bmhd->bnhd", weight, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(B, T, D)
        proj_out = _StylizationParams(self.latent_dim, self.dropout,
                                      dtype=self.dtype, emb_dim=self.emb_dim,
                                      name="proj_out")
        return x + proj_out(y, emb, deterministic=deterministic)


class TemporalCrossAttention(nn.Module):
    """Vanilla quadratic latents->text cross attention
    (reference mdiff_transformer.py:356-389)."""

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    emb_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, xf: jax.Array, emb: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        B, T, D = x.shape
        N = xf.shape[1]
        H = self.num_heads
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        tn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="text_norm")(xf)
        q = nn.Dense(D, dtype=self.dtype, name="query")(xn).reshape(B, T, H, -1)
        k = nn.Dense(D, dtype=self.dtype, name="key")(tn).reshape(B, N, H, -1)
        v = nn.Dense(D, dtype=self.dtype, name="value")(tn).reshape(B, N, H, -1)
        attn = jnp.einsum("bnhd,bmhd->bnmh", q, k,
                          preferred_element_type=jnp.float32
                          ) / np.sqrt(D // H)
        weight = jax.nn.softmax(attn, axis=2).astype(x.dtype)
        weight = nn.Dropout(self.dropout)(weight, deterministic=deterministic)
        y = jnp.einsum("bnmh,bmhd->bnhd", weight, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(B, T, D)
        proj_out = _StylizationParams(self.latent_dim, self.dropout,
                                      dtype=self.dtype, emb_dim=self.emb_dim,
                                      name="proj_out")
        return x + proj_out(y, emb, deterministic=deterministic)


class TemporalDecoderLayer(nn.Module):
    """``no_eff`` layer: quadratic self-attn, quadratic cross-attn, FFN
    (reference TemporalDiffusionTransformerDecoderLayer,
    mdiff_transformer.py:391-412)."""

    latent_dim: int
    text_latent_dim: int
    emb_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.sa_block = TemporalSelfAttention(
            self.latent_dim, self.num_heads, self.emb_dim, self.dropout,
            dtype=self.dtype, name="sa_block")
        self.ca_block = TemporalCrossAttention(
            self.latent_dim, self.text_latent_dim, self.num_heads,
            self.emb_dim, self.dropout, dtype=self.dtype, name="ca_block")
        self.ffn = StylizedFFN(self.latent_dim, self.ffn_dim, self.dropout,
                               dtype=self.dtype, emb_dim=self.emb_dim,
                               name="ffn")

    def __call__(self, x, xf, emb, frame_valid=None, deterministic=True):
        x = self.sa_block(x, emb, frame_valid, deterministic=deterministic)
        x = self.ca_block(x, xf, emb, deterministic=deterministic)
        return self.ffn(x, emb, deterministic=deterministic)


class LinearTemporalDecoderLayer(nn.Module):
    """Efficient layer with the upstream-MotionDiffuse semantics the
    reference's ``no_eff=False`` branch intends (see module docstring):
    softmax-linear self-attn, softmax-linear cross-attn, FFN
    (mdiff_transformer.py:265-291 with ``use_MLD_Transformer=False``)."""

    latent_dim: int
    text_latent_dim: int
    emb_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.sa_block = LinearTemporalSelfAttention(
            self.latent_dim, self.num_heads, self.emb_dim, self.dropout,
            dtype=self.dtype, name="sa_block")
        self.ca_block = LinearTemporalCrossAttention(
            self.latent_dim, self.text_latent_dim, self.num_heads,
            self.dropout, dtype=self.dtype, emb_dim=self.emb_dim,
            name="ca_block")
        self.ffn = StylizedFFN(self.latent_dim, self.ffn_dim, self.dropout,
                               dtype=self.dtype, emb_dim=self.emb_dim,
                               name="ffn")

    def __call__(self, x, xf, emb, frame_valid=None, deterministic=True):
        x = self.sa_block(x, emb, frame_valid, deterministic=deterministic)
        x = self.ca_block(x, xf, emb, deterministic=deterministic)
        return self.ffn(x, emb, deterministic=deterministic)


class MotionTransformer(nn.Module):
    """Per-frame text-to-motion diffusion denoiser
    (reference mdiff_transformer.py:415-556).

    Text conditioning comes in as precomputed frozen-CLIP token features
    ``clip_tokens`` [B, N, 512] + per-sample EOT index (the reference calls
    its bundled ``clip`` tower inline, mdiff_transformer.py:507-524; our
    frozen tower is ``models/clip_text.py`` and stays outside the
    trainable module)."""

    input_feats: int
    num_frames: int = 240
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    dropout: float = 0.0
    activation: str = "gelu"
    num_text_layers: int = 4
    text_latent_dim: int = 256
    text_ff_size: int = 2048
    text_num_heads: int = 4
    clip_dim: int = 512
    no_eff: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.latent_dim * 4

    def setup(self):
        D, E = self.latent_dim, self.time_embed_dim
        self.sequence_embedding = self.param(
            "sequence_embedding", nn.initializers.normal(1.0),
            (self.num_frames, D))
        if self.text_latent_dim != self.clip_dim:
            self.text_pre_proj = DenseParams(
                self.clip_dim, self.text_latent_dim, dtype=self.dtype,
                name="text_pre_proj")
        else:
            self.text_pre_proj = None  # nn.Identity in the reference
        self.text_layers = [
            TransformerEncoderLayer(self.text_latent_dim,
                                    self.text_num_heads, self.text_ff_size,
                                    self.dropout, self.activation,
                                    dtype=self.dtype, name=f"text_enc_{i}")
            for i in range(self.num_text_layers)]
        self.text_ln = LNParams(self.text_latent_dim, dtype=self.dtype,
                                name="text_ln")
        self.text_proj = DenseParams(self.text_latent_dim, E,
                                     dtype=self.dtype, name="text_proj")
        self.joint_embed = DenseParams(self.input_feats, D, dtype=self.dtype,
                                       name="joint_embed")
        self.time_embed_1 = DenseParams(D, E, dtype=self.dtype,
                                        name="time_embed_1")
        self.time_embed_2 = DenseParams(E, E, dtype=self.dtype,
                                        name="time_embed_2")
        layer_cls = (TemporalDecoderLayer if self.no_eff
                     else LinearTemporalDecoderLayer)
        self.blocks = [
            layer_cls(D, self.text_latent_dim, E, self.ff_size,
                      self.num_heads, self.dropout, dtype=self.dtype,
                      name=f"block_{i}")
            for i in range(self.num_layers)]
        self.out = DenseParams(D, self.input_feats, zero=True,
                               dtype=self.dtype, name="out")

    def encode_text(self, clip_tokens: jax.Array, eot_idx: jax.Array,
                    deterministic: bool = True
                    ) -> Tuple[jax.Array, jax.Array]:
        """Frozen-CLIP token features [B, N, 512] + EOT positions [B] ->
        (xf_proj [B, 4D], xf_out [B, N, text_latent_dim])
        (reference mdiff_transformer.py:507-524 minus the CLIP forward)."""
        x = clip_tokens.astype(self.dtype)
        if self.text_pre_proj is not None:
            x = self.text_pre_proj(x)
        for layer in self.text_layers:
            x = layer(x, None, deterministic=deterministic)
        xf_out = self.text_ln(x)
        B = xf_out.shape[0]
        eot = xf_out[jnp.arange(B), eot_idx]
        return self.text_proj(eot), xf_out

    def __call__(self, x: jax.Array, timesteps: jax.Array,
                 lengths: Optional[jax.Array] = None,
                 xf_proj: Optional[jax.Array] = None,
                 xf_out: Optional[jax.Array] = None,
                 clip_tokens: Optional[jax.Array] = None,
                 eot_idx: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """x [B, T, input_feats], timesteps [B] -> predicted noise/sample
        [B, T, input_feats] (reference mdiff_transformer.py:534-556)."""
        B, T, _ = x.shape
        if xf_proj is None or xf_out is None:
            xf_proj, xf_out = self.encode_text(clip_tokens, eot_idx,
                                               deterministic=deterministic)
        emb = self.time_embed_2(nn.silu(self.time_embed_1(
            timestep_embedding(timesteps, self.latent_dim,
                               flip_sin_to_cos=True).astype(self.dtype)
        ))) + xf_proj.astype(self.dtype)
        h = self.joint_embed(x.astype(self.dtype))
        h = h + self.sequence_embedding[None, :T, :].astype(self.dtype)
        frame_valid = (lengths_to_mask(lengths, T)
                       if lengths is not None else None)
        for block in self.blocks:
            h = block(h, xf_out, emb, frame_valid,
                      deterministic=deterministic)
        return self.out(h)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _dense_t(sd, key):
    return {"kernel": np.asarray(sd[key + ".weight"]).T,
            "bias": np.asarray(sd[key + ".bias"])}


def _ln_t(sd, key):
    return {"scale": np.asarray(sd[key + ".weight"]),
            "bias": np.asarray(sd[key + ".bias"])}


def _styl_t(sd, p):
    return {"emb_layers_1": _dense_t(sd, p + "emb_layers.1"),
            "norm": _ln_t(sd, p + "norm"),
            "out_layers_2": _dense_t(sd, p + "out_layers.2")}


def _attn_t(sd, p, cross: bool):
    out = {"norm": _ln_t(sd, p + "norm"),
           "query": _dense_t(sd, p + "query"),
           "key": _dense_t(sd, p + "key"),
           "value": _dense_t(sd, p + "value"),
           "proj_out": _styl_t(sd, p + "proj_out.")}
    if cross:
        out["text_norm"] = _ln_t(sd, p + "text_norm")
    return out


def _text_layer_t(sd, p):
    return {
        "self_attn": {
            "in_proj_kernel": np.asarray(sd[p + "self_attn.in_proj_weight"]).T,
            "in_proj_bias": np.asarray(sd[p + "self_attn.in_proj_bias"]),
            "out_proj": _dense_t(sd, p + "self_attn.out_proj"),
        },
        "linear1": _dense_t(sd, p + "linear1"),
        "linear2": _dense_t(sd, p + "linear2"),
        "norm1": _ln_t(sd, p + "norm1"),
        "norm2": _ln_t(sd, p + "norm2"),
    }


def convert_torch_motion_transformer(sd, num_layers: int = 8,
                                     num_text_layers: int = 4,
                                     has_pre_proj: bool = True):
    """Reference MotionTransformer state_dict (sans the frozen ``clip.*``
    keys) -> our param tree.  Works for the constructable ``no_eff=True``
    flavour and for standalone efficient blocks."""
    P = {
        "sequence_embedding": np.asarray(sd["sequence_embedding"]),
        "text_ln": _ln_t(sd, "text_ln"),
        "text_proj": _dense_t(sd, "text_proj.0"),
        "joint_embed": _dense_t(sd, "joint_embed"),
        "time_embed_1": _dense_t(sd, "time_embed.0"),
        "time_embed_2": _dense_t(sd, "time_embed.2"),
        "out": _dense_t(sd, "out"),
    }
    if has_pre_proj:
        P["text_pre_proj"] = _dense_t(sd, "text_pre_proj")
    for i in range(num_text_layers):
        P[f"text_enc_{i}"] = _text_layer_t(
            sd, f"textTransEncoder.layers.{i}.")
    for i in range(num_layers):
        p = f"temporal_decoder_blocks.{i}."
        P[f"block_{i}"] = {
            "sa_block": _attn_t(sd, p + "sa_block.", cross=False),
            "ca_block": _attn_t(sd, p + "ca_block.", cross=True),
            "ffn": {"linear1": _dense_t(sd, p + "ffn.linear1"),
                    "linear2": _dense_t(sd, p + "ffn.linear2"),
                    "proj_out": _styl_t(sd, p + "ffn.proj_out.")},
        }
    return {"params": P}
