"""Deterministic conv "VAE" over T2M-GPT conv stacks (reference MldVae).

Rebuild of /root/reference/src/ladiff/models/architectures/mld_vae_t2m.py:
35-111 — despite the class name there is no distribution: encode is the
T2M-GPT strided-conv Encoder (encdec.py:4-33), decode the nearest-upsample
Decoder (encdec.py:35-67), with MLD's [latent, B, C] interchange layout
bolted on (mld_vae_t2m.py:103).  Dead-but-importable in the reference
(instantiated by no shipped config); rebuilt working on the channels-last
conv stack already built for the VQ family (``models/vq.py``).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ladiff_tpu.models.vq import Decoder1D, Encoder1D

__all__ = ["MldVaeT2m", "convert_torch_encdec", "convert_torch_mld_vae_t2m"]


class MldVaeT2m(nn.Module):
    """Encoder/Decoder pair with the reference's constructor surface
    (mld_vae_t2m.py:37-63; the transformer kwargs are accepted and unused
    exactly as there — the reference binds them to attributes and then
    builds only the conv stacks)."""

    nfeats: int
    latent_dim: Tuple[int, int] = (1, 256)
    down_t: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder1D(down_t=self.down_t, name="encoder")
        self.decoder = Decoder1D(out_feats=self.nfeats, down_t=self.down_t,
                                 name="decoder")

    def encode(self, features: jax.Array,
               lengths: Optional[List[int]] = None
               ) -> Tuple[jax.Array, None]:
        """[B, T, nfeats] -> ([T/2^down_t, B, 512], None) — the reference
        permutes the conv output to MLD's latent-first layout and returns a
        None in place of a distribution (mld_vae_t2m.py:88-105)."""
        z = self.encoder(features.astype(self.dtype))
        return jnp.transpose(z, (1, 0, 2)), None

    def decode(self, z: jax.Array,
               lengths: Optional[List[int]] = None) -> jax.Array:
        """[L, B, 512] -> [B, L*2^down_t, nfeats] (mld_vae_t2m.py:107-111)."""
        return self.decoder(jnp.transpose(z, (1, 0, 2)).astype(self.dtype))

    def __call__(self, features: jax.Array,
                 lengths: Optional[List[int]] = None):
        z, dist = self.encode(features, lengths)
        feats_rst = self.decode(z, lengths)
        return feats_rst, z, dist


def _conv_t(sd, key):
    """torch Conv1d [out, in, k] -> flax Conv {kernel [k, in, out], bias}."""
    return {"kernel": np.asarray(sd[key + ".weight"]).transpose(2, 1, 0),
            "bias": np.asarray(sd[key + ".bias"])}


def _resnet_t(sd, prefix, depth):
    """Reference Resnet1D (resnet.py:71-82; norm=None so only convs) ->
    our Resnet1D block_i/conv1-2 tree."""
    out = {}
    for i in range(depth):
        out[f"block_{i}"] = {
            "conv1": _conv_t(sd, f"{prefix}.model.{i}.conv1"),
            "conv2": _conv_t(sd, f"{prefix}.model.{i}.conv2"),
        }
    return out


def convert_torch_encdec(sd, prefix: str, kind: str, down_t: int = 3,
                         depth: int = 3):
    """Reference encdec Encoder/Decoder state_dict subtree -> our
    Encoder1D/Decoder1D param tree.

    Sequential-slot mapping — Encoder (encdec.py:17-30): model.0 in-conv,
    model.(2+i) = Sequential(strided conv, Resnet1D), model.last out-conv.
    Decoder (encdec.py:47-63): model.0 in-conv, model.(2+i) =
    Sequential(Resnet1D, Upsample, conv), then mid-conv and out-conv."""
    if kind == "encoder":
        out = {"in_conv": _conv_t(sd, f"{prefix}model.0"),
               "out_conv": _conv_t(sd, f"{prefix}model.{2 + down_t}")}
        for i in range(down_t):
            blk = f"{prefix}model.{2 + i}"
            out[f"down_{i}"] = _conv_t(sd, f"{blk}.0")
            out[f"res_{i}"] = _resnet_t(sd, f"{blk}.1", depth)
        return out
    assert kind == "decoder"
    out = {"in_conv": _conv_t(sd, f"{prefix}model.0"),
           "mid_conv": _conv_t(sd, f"{prefix}model.{2 + down_t}"),
           "out_conv": _conv_t(sd, f"{prefix}model.{4 + down_t}")}
    for i in range(down_t):
        blk = f"{prefix}model.{2 + i}"
        out[f"res_{i}"] = _resnet_t(sd, f"{blk}.0", depth)
        out[f"up_{i}"] = _conv_t(sd, f"{blk}.2")
    return out


def convert_torch_mld_vae_t2m(sd, down_t: int = 3, depth: int = 3):
    """Full reference MldVae state_dict -> our MldVaeT2m param tree."""
    return {"params": {
        "encoder": convert_torch_encdec(sd, "encoder.", "encoder",
                                        down_t, depth),
        "decoder": convert_torch_encdec(sd, "decoder.", "decoder",
                                        down_t, depth),
    }}
