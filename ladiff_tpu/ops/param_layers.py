"""Dense/LayerNorm modules with directly addressable params.

Parameter trees are identical to ``nn.Dense`` ({kernel, bias}) and
``nn.LayerNorm`` ({scale, bias}), so checkpoint converters are unaffected;
unlike the stock modules, the raw arrays are attributes — which lets layers
hand their weights to fused Pallas kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["DenseParams", "LNParams"]

zero_init = nn.initializers.zeros_init()


class DenseParams(nn.Module):
    din: int
    dout: int
    zero: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        init = zero_init if self.zero else nn.initializers.lecun_normal()
        self.kernel = self.param("kernel", init, (self.din, self.dout))
        self.bias = self.param("bias", zero_init, (self.dout,))

    def __call__(self, x):
        return (x @ self.kernel.astype(self.dtype)
                + self.bias.astype(self.dtype))


class LNParams(nn.Module):
    """LayerNorm(eps 1e-5, torch parity) with addressable params."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones_init(),
                                (self.dim,))
        self.bias = self.param("bias", zero_init, (self.dim,))

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, -1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (h * self.scale + self.bias).astype(self.dtype)
