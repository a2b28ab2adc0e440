"""DETR-style transformer blocks with U-Net skip connections.

TPU-native rebuild of the reference operator layer
(/root/reference/src/ladiff/models/operator/cross_attention.py:19-450):
post-norm encoder/decoder layers and the Skip encoder/decoder that pops
(L-1)/2 saved activations through ``Linear(2D -> D)`` fusion blocks.

Differences from the reference, by design:
  * batch-first [B, S, D] everywhere (XLA-friendly layout),
  * padding via boolean ``key_valid`` masks, never dynamic shapes,
  * exact (erf) GELU to match ``torch.nn.functional.gelu``.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladiff_tpu.ops.attention import MultiHeadAttention
from ladiff_tpu.ops.pallas_common import pallas_enabled
from ladiff_tpu.ops.sp_hook import constrain_seq

__all__ = [
    "TransformerEncoderLayer",
    "TransformerDecoderLayer",
    "SkipTransformerEncoder",
    "SkipTransformerDecoder",
]


def get_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "glu":
        return nn.glu
    raise ValueError(f"activation should be relu/gelu/glu, not {name}")



def _train_fused_tail(mod, resid_sum, ln_a, ln_b, drop_rate):
    """Training-mode fused FFN tail (fwd+bwd Pallas, in-kernel dropout).

    Returns None when the fused path does not apply (shape/backend gates,
    or no dropout rng available); the caller falls back to XLA ops.
    """
    D = mod.d_model
    if not (D % 128 == 0 and mod.ff_size % 128 == 0
            and mod.activation in ("relu", "gelu") and pallas_enabled()
            and (drop_rate == 0.0 or mod.has_rng("dropout"))):
        return None
    from ladiff_tpu.ops.pallas_train_ffn import (_row_block,
                                                 train_postnorm_ffn)
    B, S, _ = resid_sum.shape
    if _row_block(B * S, D, mod.ff_size) == 0:
        # weight matrices + grad accumulators alone exceed the VMEM
        # scope for very wide layers: fall back to XLA
        return None
    if drop_rate > 0.0:
        seed = jax.random.randint(mod.make_rng("dropout"), (), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.int32(0)
    out = train_postnorm_ffn(
        resid_sum.reshape(B * S, D).astype(mod.dtype),
        mod.linear1.kernel, mod.linear1.bias,
        mod.linear2.kernel, mod.linear2.bias,
        ln_a.scale, ln_a.bias, ln_b.scale, ln_b.bias,
        seed, mod.activation, float(drop_rate))
    return out.reshape(B, S, D)


def decode_block_default(dtype) -> int:
    """Default decode-kernel sample block for a compute dtype.

    bf16: bb8 is the measured v5e winner (PERF.md sweep).  Wider dtypes
    double every VMEM buffer — bb8 at f32 needs 26.3M against the 16M
    scope (the test.py eval path runs f32; regression caught by the
    end-to-end drive).  Scale by itemsize so the same VMEM argument holds
    at every width (f64 would double again past the scope were x64 ever
    enabled): bf16->8, f32->4, f64->2, floored at 1.
    """
    return max(1, 16 // jnp.dtype(dtype).itemsize)


def _train_fused_layer(mod, x, key_valid, drop_rate):
    """Whole-layer training kernel: self-attention + FFN tail in ONE
    fwd and ONE bwd pallas_call (pallas_train_layer.py) — saves the HBM
    round trip of the intermediate residual between the two split
    kernels.  Returns None when the fused path does not apply; the
    caller then tries the split kernels and finally plain XLA."""
    D = mod.d_model
    if not (D % 128 == 0 and mod.ff_size % 128 == 0
            and D // mod.num_heads <= 128 and x.shape[1] >= 32
            and mod.activation in ("relu", "gelu")
            and not mod.is_initializing() and pallas_enabled()
            and (drop_rate == 0.0 or mod.has_rng("dropout"))
            and os.environ.get("LADIFF_TRAIN_WHOLE_LAYER", "0")
            in ("1", "enc")):
        return None
    from ladiff_tpu.ops.pallas_train_layer import (encoder_layer_vmem_mb,
                                                   train_encoder_layer)
    bb_wl = int(os.environ.get("LADIFF_TRAIN_ATTN_BLOCK", "2"))
    if encoder_layer_vmem_mb(x.shape[1], D, mod.num_heads, mod.ff_size,
                             bb_wl) > 96:
        return None  # beyond any reasonable VMEM scope: XLA fallback
    if drop_rate > 0.0:
        seed = jax.random.randint(mod.make_rng("dropout"), (), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.int32(0)
    B, S, _ = x.shape
    kv = (key_valid if key_valid is not None
          else jnp.ones((B, S), bool))
    p = mod.self_attn.variables["params"]
    out = train_encoder_layer(
        x.reshape(B * S, D).astype(mod.dtype),
        kv.reshape(B * S, 1).astype(jnp.float32),
        p["in_proj_kernel"], p["in_proj_bias"],
        p["out_proj"]["kernel"], p["out_proj"]["bias"],
        mod.linear1.kernel, mod.linear1.bias,
        mod.linear2.kernel, mod.linear2.bias,
        mod.norm1.scale, mod.norm1.bias, mod.norm2.scale, mod.norm2.bias,
        seed, mod.num_heads, S, float(drop_rate), mod.activation, bb_wl)
    return out.reshape(B, S, D)


def _train_fused_decoder_layer(mod, tgt, memory, tgt_key_valid,
                               memory_key_valid, drop_rate):
    """Whole-DECODER-layer training kernel (self-attn + cross-attn + FFN
    tail in ONE fwd and ONE bwd pallas_call,
    pallas_train_decoder_layer.py).  Returns None when the fused path
    does not apply; the caller then tries the split kernels."""
    D = mod.d_model
    if not (D % 128 == 0 and mod.ff_size % 128 == 0
            and D // mod.num_heads <= 128 and tgt.shape[1] >= 32
            and memory.shape[-1] == D
            # the kernel's cross-attn probs-dropout masks are drawn
            # 128 lanes wide and sliced to the memory width
            and memory.shape[1] <= 128
            and mod.activation in ("relu", "gelu")
            and not mod.is_initializing() and pallas_enabled()
            and (drop_rate == 0.0 or mod.has_rng("dropout"))
            and os.environ.get("LADIFF_TRAIN_WHOLE_LAYER", "0")
            in ("1", "dec")):
        return None
    from ladiff_tpu.ops.pallas_train_decoder_layer import (
        decoder_layer_vmem_mb, train_decoder_layer)
    bb_wl = int(os.environ.get("LADIFF_TRAIN_ATTN_BLOCK", "2"))
    if decoder_layer_vmem_mb(tgt.shape[1], memory.shape[1], D,
                             mod.num_heads, mod.ff_size, bb_wl) > 96:
        return None  # beyond any reasonable VMEM scope: XLA fallback
    if drop_rate > 0.0:
        seed = jax.random.randint(mod.make_rng("dropout"), (), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.int32(0)
    B, S, _ = tgt.shape
    L = memory.shape[1]
    kv = (tgt_key_valid if tgt_key_valid is not None
          else jnp.ones((B, S), bool))
    mv = (memory_key_valid if memory_key_valid is not None
          else jnp.ones((B, L), bool))
    sa = mod.self_attn.variables["params"]
    ca = mod.multihead_attn.variables["params"]
    out = train_decoder_layer(
        tgt.reshape(B * S, D).astype(mod.dtype),
        kv.reshape(B * S, 1).astype(jnp.float32),
        memory.astype(mod.dtype), mv.astype(jnp.float32),
        sa["in_proj_kernel"], sa["in_proj_bias"],
        sa["out_proj"]["kernel"], sa["out_proj"]["bias"],
        ca["in_proj_kernel"], ca["in_proj_bias"],
        ca["out_proj"]["kernel"], ca["out_proj"]["bias"],
        mod.linear1.kernel, mod.linear1.bias,
        mod.linear2.kernel, mod.linear2.bias,
        (mod.norm1.scale, mod.norm1.bias, mod.norm2.scale, mod.norm2.bias,
         mod.norm3.scale, mod.norm3.bias),
        seed, mod.num_heads, S, L, float(drop_rate), mod.activation,
        bb_wl)
    return out.reshape(B, S, D)


def _train_fused_attn(mod, attn_mod, x, key_valid, drop_rate):
    """Training-mode fused self-attention segment (fwd+bwd Pallas with
    in-kernel dropout): returns ``x + dropout(self_attn(x))`` or None when
    the fused path does not apply."""
    D = mod.d_model
    # S gate: the per-sample in-kernel attention degenerates to tiny
    # sub-MXU GEMMs on short token streams (the MD denoiser's ~11-token
    # sa_block measured 8.2 vs 6.7 ms/step through it) — those stay on
    # the XLA path, which has its own head-fused tiny-attention layout
    if not (D % 128 == 0 and D // mod.num_heads <= 128 and x.shape[1] >= 32
            and not mod.is_initializing() and pallas_enabled()
            and (drop_rate == 0.0 or mod.has_rng("dropout"))):
        return None
    from ladiff_tpu.ops.pallas_train_attention import (attn_block_default,
                                                       resolve_attn_layout,
                                                       train_self_attention)
    B, S, _ = x.shape
    bb_env = os.environ.get("LADIFF_TRAIN_ATTN_BLOCK", "")
    bb = int(bb_env) if bb_env else attn_block_default(S, D, mod.num_heads)
    if bb == 0:
        # even a one-sample block exceeds the VMEM scope (wide layers):
        # fall back to the XLA path
        return None
    if drop_rate > 0.0:
        seed = jax.random.randint(mod.make_rng("dropout"), (), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.int32(0)
    kv = (key_valid if key_valid is not None
          else jnp.ones((B, S), bool))
    p = attn_mod.variables["params"]
    out = train_self_attention(
        x.reshape(B * S, D).astype(mod.dtype),
        kv.reshape(B * S, 1).astype(jnp.float32),
        p["in_proj_kernel"], p["in_proj_bias"],
        p["out_proj"]["kernel"], p["out_proj"]["bias"],
        seed, mod.num_heads, S, float(drop_rate), bb,
        # resolved ONCE here (same altitude as the block env above) so
        # the custom_vjp's fwd and bwd passes can never read the env at
        # different times and disagree on the layout
        resolve_attn_layout(None, D, mod.num_heads))
    return out.reshape(B, S, D)


class TransformerEncoderLayer(nn.Module):
    """Post-norm (default) or pre-norm encoder layer
    (reference: cross_attention.py:264-329)."""

    d_model: int
    num_heads: int
    ff_size: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from ladiff_tpu.ops.param_layers import DenseParams, LNParams
        D, F = self.d_model, self.ff_size
        self.self_attn = MultiHeadAttention(D, self.num_heads, self.dropout,
                                            dtype=self.dtype, name="self_attn")
        self.linear1 = DenseParams(D, F, dtype=self.dtype, name="linear1")
        self.linear2 = DenseParams(F, D, dtype=self.dtype, name="linear2")
        self.norm1 = LNParams(D, dtype=self.dtype, name="norm1")
        self.norm2 = LNParams(D, dtype=self.dtype, name="norm2")
        self.drop = nn.Dropout(self.dropout)

    def _ffn_tail(self, resid_sum: jax.Array,
                  deterministic: bool) -> jax.Array:
        """norm1(x+attn) -> FFN -> norm2(residual): fused pallas kernel at
        inference on TPU, XLA ops otherwise/when training."""
        D = self.d_model
        if (deterministic and D % 128 == 0 and self.ff_size % 128 == 0
                and self.activation in ("relu", "gelu")
                and pallas_enabled()):
            from ladiff_tpu.ops.pallas_postnorm_ffn import fused_postnorm_ffn
            B, S, _ = resid_sum.shape
            out = fused_postnorm_ffn(
                resid_sum.reshape(B * S, D).astype(self.dtype),
                self.linear1.kernel.astype(self.dtype),
                self.linear1.bias.astype(self.dtype),
                self.linear2.kernel.astype(self.dtype),
                self.linear2.bias.astype(self.dtype),
                self.norm1.scale, self.norm1.bias,
                self.norm2.scale, self.norm2.bias,
                activation=self.activation)
            return out.reshape(B, S, D)
        if not deterministic:
            fused = _train_fused_tail(self, resid_sum, self.norm1,
                                      self.norm2, self.dropout)
            if fused is not None:
                return fused
        act = get_activation(self.activation)
        h = self.norm1(resid_sum)
        y = self.linear2(self.drop(act(self.linear1(h)),
                                   deterministic=deterministic))
        return self.norm2(h + self.drop(y, deterministic=deterministic))

    def __call__(
        self,
        src: jax.Array,
        key_valid: Optional[jax.Array] = None,
        pos: Optional[jax.Array] = None,
        deterministic: bool = True,
        extra_kv: Optional[jax.Array] = None,
    ) -> jax.Array:
        """``extra_kv`` [B, S_extra, D]: additional key/value tokens that are
        attended to but produce no outputs.  Exactly equivalent to running
        the layer on ``concat([src, extra_kv])`` and slicing the first S
        outputs."""
        attn = self.self_attn
        drop = lambda x: self.drop(x, deterministic=deterministic)
        act = get_activation(self.activation)

        def with_pos(x):
            return x if pos is None else x + pos

        if self.normalize_before:
            assert extra_kv is None, "extra_kv only supported post-norm"
            x2 = self.norm1(src)
            qk = with_pos(x2)
            x2 = attn(qk, qk, x2, key_valid, deterministic=deterministic)
            src = src + drop(x2)
            x2 = self.norm2(src)
            x2 = self.linear2(drop(act(self.linear1(x2))))
            return src + drop(x2)
        qk = with_pos(src)
        if extra_kv is not None:
            kv = jnp.concatenate([qk, extra_kv.astype(qk.dtype)], axis=1)
            x2 = attn(qk, kv, kv, key_valid, deterministic=deterministic)
        else:
            if not deterministic and pos is None:
                whole = _train_fused_layer(self, src, key_valid,
                                           self.dropout)
                if whole is not None:
                    return whole
                resid = _train_fused_attn(self, self.self_attn, src,
                                          key_valid, self.dropout)
                if resid is not None:
                    return self._ffn_tail(resid, deterministic)
            x2 = attn(qk, qk, src, key_valid, deterministic=deterministic)
        return self._ffn_tail(src + drop(x2), deterministic)


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer: self-attn over queries, cross-attn into
    memory, FFN (reference: cross_attention.py:332-450)."""

    d_model: int
    num_heads: int
    ff_size: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from ladiff_tpu.ops.param_layers import DenseParams, LNParams
        D, F = self.d_model, self.ff_size
        self.self_attn = MultiHeadAttention(D, self.num_heads, self.dropout,
                                            dtype=self.dtype, name="self_attn")
        self.multihead_attn = MultiHeadAttention(
            D, self.num_heads, self.dropout, dtype=self.dtype,
            name="multihead_attn")
        self.linear1 = DenseParams(D, F, dtype=self.dtype, name="linear1")
        self.linear2 = DenseParams(F, D, dtype=self.dtype, name="linear2")
        self.norm1 = LNParams(D, dtype=self.dtype, name="norm1")
        self.norm2 = LNParams(D, dtype=self.dtype, name="norm2")
        self.norm3 = LNParams(D, dtype=self.dtype, name="norm3")
        self.drop_mod = nn.Dropout(self.dropout)

    def _ffn_tail(self, resid_sum: jax.Array, ln_a, ln_b,
                  deterministic: bool) -> jax.Array:
        D = self.d_model
        if (deterministic and D % 128 == 0 and self.ff_size % 128 == 0
                and self.activation in ("relu", "gelu")
                and pallas_enabled()):
            from ladiff_tpu.ops.pallas_postnorm_ffn import fused_postnorm_ffn
            B, S, _ = resid_sum.shape
            out = fused_postnorm_ffn(
                resid_sum.reshape(B * S, D).astype(self.dtype),
                self.linear1.kernel.astype(self.dtype),
                self.linear1.bias.astype(self.dtype),
                self.linear2.kernel.astype(self.dtype),
                self.linear2.bias.astype(self.dtype),
                ln_a.scale, ln_a.bias, ln_b.scale, ln_b.bias,
                activation=self.activation)
            return out.reshape(B, S, D)
        if not deterministic:
            fused = _train_fused_tail(self, resid_sum, ln_a, ln_b,
                                      self.dropout)
            if fused is not None:
                return fused
        act = get_activation(self.activation)
        h = ln_a(resid_sum)
        y = self.linear2(self.drop_mod(act(self.linear1(h)),
                                       deterministic=deterministic))
        return ln_b(h + self.drop_mod(y, deterministic=deterministic))

    def __call__(
        self,
        tgt: jax.Array,
        memory: jax.Array,
        tgt_key_valid: Optional[jax.Array] = None,
        memory_key_valid: Optional[jax.Array] = None,
        pos: Optional[jax.Array] = None,
        query_pos: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_cross_weights: bool = False,
    ):
        if (deterministic and not self.normalize_before
                and not self.is_initializing()
                and not return_cross_weights
                and pos is None and query_pos is None
                and self.d_model % 128 == 0 and self.ff_size % 128 == 0
                and self.d_model // self.num_heads <= 128
                and self.activation in ("relu", "gelu")
                and pallas_enabled()):
            # whole layer (self-attn + cross-attn + FFN) as ONE pallas
            # kernel — the VAE decode hot path
            from ladiff_tpu.ops.pallas_decoder_layer import \
                fused_decoder_layer
            B, T, D = tgt.shape
            L = memory.shape[1]
            kv = (tgt_key_valid if tgt_key_valid is not None
                  else jnp.ones((B, T), bool))
            mv = (memory_key_valid if memory_key_valid is not None
                  else jnp.ones((B, L), bool))
            params = {
                "self_attn": self.self_attn.variables["params"],
                "multihead_attn": self.multihead_attn.variables["params"],
                "linear1": {"kernel": self.linear1.kernel,
                            "bias": self.linear1.bias},
                "linear2": {"kernel": self.linear2.kernel,
                            "bias": self.linear2.bias},
                "norm1": {"scale": self.norm1.scale, "bias": self.norm1.bias},
                "norm2": {"scale": self.norm2.scale, "bias": self.norm2.bias},
                "norm3": {"scale": self.norm3.scale, "bias": self.norm3.bias},
            }
            out = fused_decoder_layer(
                tgt.reshape(B * T, D).astype(self.dtype),
                kv.reshape(B * T, 1).astype(jnp.float32),
                memory.astype(self.dtype),
                mv.astype(jnp.float32),
                params, T=T, L=L, H=self.num_heads,
                activation=self.activation,
                # sweepable at trace time (scripts/breakdown.py --sweep).
                # v5e winner at bf16: bb8 WITH the per-sample attention
                # split (12.8 ms/batch-256 vs 14.6 for the old bb2 joint
                # layout): per-sample [T,T] score blocks remove the
                # block-diagonal waste, which also shrinks VMEM enough to
                # double the sample block twice (fewer grid steps -> less
                # weight streaming); bb16 exceeds the VMEM scope (PERF.md).
                # f32 doubles every buffer — bb8 f32 needs 26.3M vs the
                # 16M scope (caught by the test.py eval drive, which runs
                # f32) — so the f32 default halves to bb4 (~13M, fits)
                block_samples=int(os.environ.get(
                    "LADIFF_DECODE_BLOCK",
                    str(decode_block_default(self.dtype)))),
                per_sample_attention=os.environ.get(
                    "LADIFF_DECODE_PERSAMPLE", "1") == "1")
            return out.reshape(B, T, D)
        self_attn = self.self_attn
        cross_attn = self.multihead_attn
        linear1, linear2 = self.linear1, self.linear2
        norm1, norm2, norm3 = self.norm1, self.norm2, self.norm3
        act = get_activation(self.activation)
        drop = lambda x: self.drop_mod(x, deterministic=deterministic)

        def with_pos(x, p):
            return x if p is None else x + p

        cross_weights = None
        if self.normalize_before:
            x2 = norm1(tgt)
            qk = with_pos(x2, query_pos)
            x2 = self_attn(qk, qk, x2, tgt_key_valid, deterministic=deterministic)
            tgt = tgt + drop(x2)
            x2 = norm2(tgt)
            x2 = cross_attn(with_pos(x2, query_pos), with_pos(memory, pos), memory,
                            memory_key_valid, deterministic=deterministic)
            tgt = tgt + drop(x2)
            x2 = norm3(tgt)
            x2 = linear2(drop(act(linear1(x2))))
            tgt = tgt + drop(x2)
        else:
            if (not deterministic and pos is None and query_pos is None
                    and not return_cross_weights):
                whole = _train_fused_decoder_layer(
                    self, tgt, memory, tgt_key_valid, memory_key_valid,
                    self.dropout)
                if whole is not None:
                    return whole
            if not deterministic and query_pos is None:
                resid = _train_fused_attn(self, self.self_attn, tgt,
                                          tgt_key_valid, self.dropout)
            else:
                resid = None
            if resid is not None:
                tgt = norm1(resid)
            else:
                qk = with_pos(tgt, query_pos)
                x2 = self_attn(qk, qk, tgt, tgt_key_valid,
                               deterministic=deterministic)
                tgt = norm1(tgt + drop(x2))
            out = cross_attn(with_pos(tgt, query_pos), with_pos(memory, pos), memory,
                             memory_key_valid, deterministic=deterministic,
                             return_weights=return_cross_weights)
            if return_cross_weights:
                x2, cross_weights = out
            else:
                x2 = out
            tgt = self._ffn_tail(tgt + drop(x2), norm2, norm3, deterministic)
        if return_cross_weights:
            return tgt, cross_weights
        return tgt


class SkipTransformerEncoder(nn.Module):
    """U-Net style encoder: (L-1)/2 input blocks, middle block, (L-1)/2
    output blocks with Linear(2D->D) skip fusion, final LayerNorm
    (reference: cross_attention.py:19-88)."""

    d_model: int
    num_heads: int
    num_layers: int
    ff_size: int = 1024
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.num_layers % 2 == 1, "skip encoder needs odd layer count"
        num_block = (self.num_layers - 1) // 2
        mk = lambda name: TransformerEncoderLayer(
            self.d_model, self.num_heads, self.ff_size, self.dropout,
            self.activation, self.normalize_before, dtype=self.dtype, name=name)
        self.input_blocks = [mk(f"input_blocks_{i}") for i in range(num_block)]
        self.middle_block = mk("middle_block")
        self.output_blocks = [mk(f"output_blocks_{i}") for i in range(num_block)]
        self.linear_blocks = [
            nn.Dense(self.d_model, dtype=self.dtype, name=f"linear_blocks_{i}")
            for i in range(num_block)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")

    def __call__(
        self,
        src: jax.Array,
        key_valid: Optional[jax.Array] = None,
        pos: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        x = constrain_seq(src)
        xs = []
        for block in self.input_blocks:
            x = constrain_seq(
                block(x, key_valid, pos, deterministic=deterministic))
            xs.append(x)
        x = constrain_seq(
            self.middle_block(x, key_valid, pos, deterministic=deterministic))
        for block, linear in zip(self.output_blocks, self.linear_blocks):
            x = linear(jnp.concatenate([x, xs.pop()], axis=-1))
            x = constrain_seq(
                block(x, key_valid, pos, deterministic=deterministic))
        return self.norm(x)


class SkipTransformerDecoder(nn.Module):
    """Skip decoder: same U-Net wiring over decoder layers cross-attending to
    a memory (reference: cross_attention.py:90-153)."""

    d_model: int
    num_heads: int
    num_layers: int
    ff_size: int = 1024
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.num_layers % 2 == 1, "skip decoder needs odd layer count"
        num_block = (self.num_layers - 1) // 2
        mk = lambda name: TransformerDecoderLayer(
            self.d_model, self.num_heads, self.ff_size, self.dropout,
            self.activation, self.normalize_before, dtype=self.dtype, name=name)
        self.input_blocks = [mk(f"input_blocks_{i}") for i in range(num_block)]
        self.middle_block = mk("middle_block")
        self.output_blocks = [mk(f"output_blocks_{i}") for i in range(num_block)]
        self.linear_blocks = [
            nn.Dense(self.d_model, dtype=self.dtype, name=f"linear_blocks_{i}")
            for i in range(num_block)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")

    def __call__(
        self,
        tgt: jax.Array,
        memory: jax.Array,
        tgt_key_valid: Optional[jax.Array] = None,
        memory_key_valid: Optional[jax.Array] = None,
        pos: Optional[jax.Array] = None,
        query_pos: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_cross_weights: bool = False,
    ):
        x = tgt
        xs = []
        all_weights = []

        def run(block, x):
            out = block(x, memory, tgt_key_valid, memory_key_valid, pos,
                        query_pos, deterministic=deterministic,
                        return_cross_weights=return_cross_weights)
            if return_cross_weights:
                x, w = out
                all_weights.append(w)
                return x
            return out

        x = constrain_seq(x)
        for block in self.input_blocks:
            x = constrain_seq(run(block, x))
            xs.append(x)
        x = constrain_seq(run(self.middle_block, x))
        for block, linear in zip(self.output_blocks, self.linear_blocks):
            x = linear(jnp.concatenate([x, xs.pop()], axis=-1))
            x = constrain_seq(run(block, x))
        x = self.norm(x)
        if return_cross_weights:
            return x, all_weights
        return x
