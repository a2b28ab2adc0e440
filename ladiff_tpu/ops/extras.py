"""Operator extras: AdaIN, MUNIT-style blocks, Hessian penalty.

Rebuild of the reference's auxiliary operator/tooling modules —
/root/reference/src/ladiff/models/operator/adain.py (AdaptiveInstanceNorm1d
+ parameter assignment helpers), operator/blocks.py (LinearBlock/ConvBlock
/MLP), and models/tools/hessian_penalty.py (finite-difference Hessian
penalty regularizer, arXiv:2008.10599) — recast functionally for JAX:
AdaIN takes its style (weight, bias) as explicit arguments instead of
module attributes mutated by ``assign_adain_params``, and the Hessian
penalty takes an explicit PRNG key instead of global torch randomness.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["adaptive_instance_norm_1d", "split_adain_params",
           "num_adain_params", "LinearBlock", "ConvBlock", "MLP",
           "hessian_penalty"]


def adaptive_instance_norm_1d(x: jax.Array, weight: jax.Array,
                              bias: jax.Array, eps: float = 1e-5,
                              direct_weighting: bool = False,
                              no_std: bool = False) -> jax.Array:
    """AdaIN over [B, T, C]: instance-normalize each (sample, channel)
    series over time, then scale/shift with per-sample style params
    (reference adain.py:16-43; torch expresses this as a reshaped
    batch_norm in always-training mode — same math).

    weight, bias: [B, C] (std / mean of the style).
    """
    if direct_weighting:
        out = x if no_std else x * weight[:, None, :]
        return out + bias[:, None, :]
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + eps)
    return h * weight[:, None, :] + bias[:, None, :]


def num_adain_params(channel_sizes: Sequence[int]) -> int:
    """2*C params per AdaIN site (reference adain.py:60-66)."""
    return 2 * sum(channel_sizes)


def split_adain_params(adain_params: jax.Array,
                       channel_sizes: Sequence[int]):
    """Split a [B, sum(2*C)] style vector into per-site (bias, weight)
    pairs — mean first, std second, matching reference adain.py:48-57."""
    out = []
    off = 0
    for c in channel_sizes:
        mean = adain_params[:, off:off + c]
        std = adain_params[:, off + c:off + 2 * c]
        out.append((mean, std))
        off += 2 * c
    return out


_ACTS = {"relu": nn.relu, "lrelu": lambda x: nn.leaky_relu(x, 0.2),
         "tanh": jnp.tanh, "none": lambda x: x}


class LinearBlock(nn.Module):
    """Linear + norm + activation (reference blocks.py:96-122)."""

    out_dim: int
    norm: str = "none"
    acti: str = "relu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, name="linear")(x)
        if self.norm == "bn":
            x = nn.BatchNorm(use_running_average=True, name="norm")(x)
        elif self.norm == "in":
            x = nn.LayerNorm(name="norm")(x)  # per-sample norm, 1-D case
        return _ACTS[self.acti](x)


class ConvBlock(nn.Module):
    """Pad + 1-D conv + norm + activation over [B, T, C]
    (reference blocks.py:75-146)."""

    kernel_size: int
    out_channels: int
    stride: int = 1
    pad_type: str = "reflect"
    norm: str = "none"
    acti: str = "lrelu"
    adain_style: Optional[tuple] = None  # (weight, bias) when norm='adain'

    @nn.compact
    def __call__(self, x):
        pad_l = (self.kernel_size - 1) // 2
        pad_r = self.kernel_size - 1 - pad_l
        mode = {"reflect": "reflect", "replicate": "edge",
                "zero": "constant"}[self.pad_type]
        x = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)), mode=mode)
        x = nn.Conv(self.out_channels, (self.kernel_size,),
                    strides=(self.stride,), padding="VALID", name="conv")(x)
        if self.norm == "adain":
            assert self.adain_style is not None, \
                "pass adain_style=(weight, bias) for norm='adain'"
            w, b = self.adain_style
            x = adaptive_instance_norm_1d(x, w, b)
        elif self.norm == "in":
            mu = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
            scale = self.param("in_scale", nn.initializers.ones_init(),
                               (self.out_channels,))
            bias = self.param("in_bias", nn.initializers.zeros_init(),
                              (self.out_channels,))
            x = x * scale + bias
        return _ACTS[self.acti](x)


class MLP(nn.Module):
    """Stacked LinearBlocks (reference blocks.py:7-32)."""

    dims: Sequence[int]
    out_dim: int
    acti: str = "lrelu"

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        for i, d in enumerate(self.dims[1:]):
            x = LinearBlock(d, acti=self.acti, name=f"block_{i}")(x)
        return LinearBlock(self.out_dim, acti="none", name="out")(x)


def hessian_penalty(G: Callable, z: jax.Array, rng: jax.Array, k: int = 2,
                    epsilon: float = 0.1,
                    reduction: Callable = jnp.max) -> jax.Array:
    """Finite-difference Hessian penalty (reference hessian_penalty.py:29-88,
    arXiv:2008.10599): variance over k Rademacher directions of the central
    second directional derivative of G at z, reduced to a scalar.

    G: z -> tensor (or list of tensors).  Differentiable w.r.t. G's params
    through the two shifted forward passes.
    """
    G_z = G(z)
    single = not isinstance(G_z, (list, tuple))
    G_z_list = [G_z] if single else list(G_z)

    dzs = epsilon * jax.random.rademacher(
        rng, (k,) + z.shape, dtype=z.dtype)

    def sdd(dz):
        plus = G(z + dz)
        minus = G(z - dz)
        plus = [plus] if single else list(plus)
        minus = [minus] if single else list(minus)
        return [(p - 2 * g + m) / (epsilon ** 2)
                for p, g, m in zip(plus, G_z_list, minus)]

    seconds = [sdd(dzs[i]) for i in range(k)]  # k lists of activations
    total = 0.0
    for acts in zip(*seconds):  # per activation: k tensors
        var = jnp.var(jnp.stack(acts), axis=0, ddof=1)
        total = total + reduction(var)
    return total
