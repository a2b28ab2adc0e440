"""Masked multi-head attention for TPU.

Functional core used by every transformer block in the framework.  The
reference uses ``torch.nn.MultiheadAttention`` throughout
(/root/reference/src/ladiff/models/operator/cross_attention.py:271,337-338);
here attention is a single fused einsum pipeline over batch-first, static
shapes so XLA can tile it onto the MXU.  Padding is expressed with boolean
key-validity masks (True = attend) instead of dynamic shapes.

Parameter layout note: like torch, q/k/v live in one fused projection
(``in_proj_kernel`` [din, 3D] = torch ``in_proj_weight``.T, plus
``in_proj_bias``) — both for checkpoint parity and so self-attention runs as
a single GEMM.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from ladiff_tpu.ops.pallas_common import pallas_enabled

__all__ = ["MultiHeadAttention", "masked_attention"]

_NEG_INF = -1e9  # large finite negative: keeps softmax numerics safe in bf16

# toggled by set_pallas_enabled.  Default OFF: measured on v5e, the fused
# kernel matches the XLA pipeline at these shapes (decode 52ms both ways —
# attention is not the bottleneck; FFN GEMMs are), so the simpler path wins.
# The kernel remains available for larger-sequence variants.
_PALLAS_ENABLED = False


def set_pallas_enabled(enabled: bool) -> None:
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = enabled


def masked_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_valid: Optional[jax.Array] = None,
    *,
    num_heads: int,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    return_weights: bool = False,
):
    """Scaled dot-product attention over batch-first tensors.

    Args:
      q: [B, Sq, D]; k, v: [B, Sk, D] (already projected).
      key_valid: [B, Sk] bool, True where the key may be attended to.
    Returns [B, Sq, D] (and optionally head-averaged weights [B, Sq, Sk]).
    """
    B, Sq, D = q.shape
    Sk = k.shape[1]
    H = num_heads
    Dh = D // H

    # Head-fused fast path for TINY attention (the denoiser's <=9-token
    # streams): fold heads into the sequence axis and run ONE
    # [S*H, Dh] x [Dh, S*H] batched product with a block-diagonal head
    # mask, instead of H tiny per-head products.  At [512, 9, 256]/4-heads
    # this measures 187us vs 260us for the per-head einsum pipeline on
    # v5e (~28% off the sampler's dominant cost).  Exactly equivalent
    # (same-head bias keeps softmax support per head; verified 5e-6).
    if (Sq == Sk and Sq * H <= 128 and Sq > 1
            and dropout_rate == 0.0 and not return_weights):
        SH = Sq * H
        qh = q.reshape(B, SH, Dh)   # (s, h) flat, h fastest — matches the
        kh = k.reshape(B, SH, Dh)   # standard head split of D = H * Dh
        vh = v.reshape(B, SH, Dh)
        h_idx = jnp.tile(jnp.arange(H), Sq)
        same_head = h_idx[:, None] == h_idx[None, :]
        if key_valid is not None:
            kvalid = jnp.repeat(key_valid, H, axis=1)
            mask = same_head[None] & kvalid[:, None, :]
        else:
            mask = jnp.broadcast_to(same_head[None], (B, SH, SH))
        bias = jnp.where(mask, 0.0, _NEG_INF).astype(jnp.float32)
        scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32)).astype(q.dtype)
        logits = jnp.einsum("bqd,bkd->bqk", qh * scale, kh,
                            preferred_element_type=jnp.float32) + bias
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bqk,bkd->bqd", w, vh,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        return out.reshape(B, Sq, D)

    # Pallas fused path: frame-length self-attention on TPU (keeps the
    # [S, S] logits in VMEM).  Gated to inference (no dropout/weights) and
    # sequences long enough to amortize; tiny token counts stay on the XLA
    # pipeline above.
    if (_PALLAS_ENABLED and Sq == Sk and Sq >= 64
            and dropout_rate == 0.0 and not return_weights
            and D % num_heads == 0
            and pallas_enabled()):
        from ladiff_tpu.ops.pallas_attention import pallas_masked_attention
        return pallas_masked_attention(q, k, v, key_valid,
                                       num_heads=num_heads)
    qh = q.reshape(B, Sq, H, Dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Sk, H, Dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Sk, H, Dh).transpose(0, 2, 1, 3)

    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, dtype=jnp.float32)).astype(q.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh,
                        preferred_element_type=jnp.float32)
    if key_valid is not None:
        mask = key_valid[:, None, None, :]
        logits = jnp.where(mask, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, Sq, D)
    if return_weights:
        return out, weights.mean(axis=1)
    return out


class MultiHeadAttention(nn.Module):
    """Batch-first equivalent of ``torch.nn.MultiheadAttention``."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        key_valid: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        D = self.d_model
        din = query.shape[-1]
        # fused in-projection, torch ``in_proj_weight`` layout transposed:
        # one [din, 3D] kernel.  Self-attention (query is key is value, the
        # common case here: PEs are added to the token stream, not per
        # layer) becomes ONE GEMM — K=256-deep matmuls are shallow for the
        # 128x128 MXU, so fusing the three projections amortizes fill.
        kernel = self.param("in_proj_kernel",
                            nn.initializers.xavier_uniform(), (din, 3 * D))
        bias = self.param("in_proj_bias", nn.initializers.zeros_init(),
                          (3 * D,))
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if query is key and key is value:
            qkv = query.astype(self.dtype) @ kernel + bias
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = query.astype(self.dtype) @ kernel[:, :D] + bias[:D]
            kv_same = key is value
            if kv_same:
                kv = key.astype(self.dtype) @ kernel[:, D:] + bias[D:]
                k, v = jnp.split(kv, 2, axis=-1)
            else:
                k = key.astype(self.dtype) @ kernel[:, D:2 * D] + bias[D:2 * D]
                v = value.astype(self.dtype) @ kernel[:, 2 * D:] + bias[2 * D:]
        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        out = masked_attention(
            q, k, v, key_valid,
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dropout_rng=rng,
            return_weights=return_weights,
        )
        if return_weights:
            out, weights = out
        out = nn.Dense(D, dtype=self.dtype, name="out_proj")(out)
        if return_weights:
            return out, weights
        return out
