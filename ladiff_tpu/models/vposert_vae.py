"""VPoser-style MLP VAE (the reference's ``vae_type: "vposert"`` branch).

Rebuild of /root/reference/src/ladiff/models/architectures/vposert_vae.py:
27-145 — a flat MLP VAE over whole fixed-length motion clips: flatten
[B, 196, 263] -> BatchNorm -> 512-wide MLP -> Normal(mu, softplus(logvar)),
and an MLP decoder back to [B, 196, 263].  Dead-but-importable code in the
reference (reachable via the ``vae_type == "vposert"`` branches at
modeltype/ladiff.py:95,819,884,1065 but selected by no shipped config);
rebuilt working for drop-in coverage.

TPU-first recast: the encode/decode latent keeps the reference's
[1, B, latent] interchange layout for API parity, but everything inside is
one fused batch-first MLP; BatchNorm runs on explicit ``batch_stats``
collections (functional state), matching torch eps 1e-5 / momentum 0.1.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["VPosert", "convert_torch_vposert"]


class VPosert(nn.Module):
    """Encoder (vposert_vae.py:39-45) + decoder (vposert_vae.py:47-55).

    ``frames``/``nfeats`` default to the reference's hard-coded 196x263
    HumanML3D clip geometry (vposert_vae.py:37).
    """

    frames: int = 196
    nfeats: int = 263
    num_neurons: int = 512
    latent_dim: int = 256
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        N = self.num_neurons
        bn = lambda name: nn.BatchNorm(use_running_average=True,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        # encoder_net indices follow the reference nn.Sequential slots
        self.enc_bn_in = bn("enc_bn_in")        # encoder_net.1
        self.enc_fc1 = nn.Dense(N, dtype=self.dtype, name="enc_fc1")    # .2
        self.enc_bn_mid = bn("enc_bn_mid")      # encoder_net.4
        self.enc_fc2 = nn.Dense(N, dtype=self.dtype, name="enc_fc2")    # .6
        self.enc_fc3 = nn.Dense(N, dtype=self.dtype, name="enc_fc3")    # .7
        self.mu = nn.Dense(self.latent_dim, dtype=self.dtype, name="mu")
        self.logvar = nn.Dense(self.latent_dim, dtype=self.dtype,
                               name="logvar")
        self.dec_fc1 = nn.Dense(N, dtype=self.dtype, name="dec_fc1")    # .0
        self.dec_fc2 = nn.Dense(N, dtype=self.dtype, name="dec_fc2")    # .3
        self.dec_out = nn.Dense(self.frames * self.nfeats, dtype=self.dtype,
                                name="dec_out")                          # .5
        self.drop = nn.Dropout(self.dropout)

    def dist_params(self, features: jax.Array,
                    deterministic: bool = True
                    ) -> Tuple[jax.Array, jax.Array]:
        """[B, frames, nfeats] (or [B, frames*nfeats]) -> (mu, scale) of the
        Normal posterior; scale = softplus(logvar-head) exactly as the
        reference NormalDistDecoder (vposert_vae.py:135-145)."""
        x = features.reshape(features.shape[0], -1).astype(self.dtype)
        x = self.enc_bn_in(x)
        x = nn.leaky_relu(self.enc_fc1(x), negative_slope=0.01)
        x = self.enc_bn_mid(x)
        x = self.drop(x, deterministic=deterministic)
        x = self.enc_fc2(x)
        x = self.enc_fc3(x)
        return self.mu(x), jax.nn.softplus(self.logvar(x))

    def encode(self, features: jax.Array,
               lengths: Optional[jax.Array] = None, *,
               rng: Optional[jax.Array] = None, sample_mean: bool = False,
               deterministic: bool = True
               ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        """Returns (z [1, B, latent], (mu, scale)) — the reference returns
        ``q_z.rsample().unsqueeze(0)`` plus the torch Normal
        (vposert_vae.py:62-70); lengths are accepted and ignored exactly as
        there (the clip length is baked into the flatten)."""
        mu, scale = self.dist_params(features, deterministic=deterministic)
        if sample_mean or rng is None:
            z = mu
        else:
            z = mu + scale * jax.random.normal(rng, mu.shape, mu.dtype)
        return z[None], (mu, scale)

    def decode(self, z: jax.Array, lengths: Optional[jax.Array] = None,
               deterministic: bool = True) -> jax.Array:
        """[1, B, latent] -> [B, frames, nfeats] (vposert_vae.py:72-78; the
        trailing reshape is the reference's ContinousRotReprDecoder, which
        as shipped is just a view, vposert_vae.py:117-132)."""
        x = z[0].astype(self.dtype)
        x = nn.leaky_relu(self.dec_fc1(x), negative_slope=0.01)
        x = self.drop(x, deterministic=deterministic)
        x = nn.leaky_relu(self.dec_fc2(x), negative_slope=0.01)
        x = self.dec_out(x)
        return x.reshape(-1, self.frames, self.nfeats)

    def __call__(self, features: jax.Array,
                 lengths: Optional[jax.Array] = None, *,
                 rng: Optional[jax.Array] = None,
                 deterministic: bool = True):
        """(feats_rst, z, (mu, scale)) like the reference forward
        (vposert_vae.py:57-60), with the sampled z also returned so the
        caller can keep the stage-1/stage-2 plumbing uniform."""
        z, dist = self.encode(features, lengths, rng=rng,
                              deterministic=deterministic)
        feats_rst = self.decode(z, lengths, deterministic=deterministic)
        return feats_rst, z, dist


def _dense_t(sd, key):
    return {"kernel": np.asarray(sd[key + ".weight"]).T,
            "bias": np.asarray(sd[key + ".bias"])}


def _bn_t(sd, key):
    params = {"scale": np.asarray(sd[key + ".weight"]),
              "bias": np.asarray(sd[key + ".bias"])}
    stats = {"mean": np.asarray(sd[key + ".running_mean"]),
             "var": np.asarray(sd[key + ".running_var"])}
    return params, stats


def convert_torch_vposert(sd):
    """Reference VPosert state_dict -> our {"params", "batch_stats"} tree.

    Sequential-slot mapping (vposert_vae.py:39-55): encoder_net.1/.4 are the
    BatchNorms, .2/.6/.7 the Linears, .8.mu/.8.logvar the dist heads;
    decoder_net.0/.3/.5 the decoder Linears."""
    bn_in_p, bn_in_s = _bn_t(sd, "encoder_net.1")
    bn_mid_p, bn_mid_s = _bn_t(sd, "encoder_net.4")
    params = {
        "enc_bn_in": bn_in_p,
        "enc_fc1": _dense_t(sd, "encoder_net.2"),
        "enc_bn_mid": bn_mid_p,
        "enc_fc2": _dense_t(sd, "encoder_net.6"),
        "enc_fc3": _dense_t(sd, "encoder_net.7"),
        "mu": _dense_t(sd, "encoder_net.8.mu"),
        "logvar": _dense_t(sd, "encoder_net.8.logvar"),
        "dec_fc1": _dense_t(sd, "decoder_net.0"),
        "dec_fc2": _dense_t(sd, "decoder_net.3"),
        "dec_out": _dense_t(sd, "decoder_net.5"),
    }
    batch_stats = {"enc_bn_in": bn_in_s, "enc_bn_mid": bn_mid_s}
    return {"params": params, "batch_stats": batch_stats}
