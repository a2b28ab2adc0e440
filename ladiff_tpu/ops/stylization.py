"""MotionDiffuse-style stylization layers (the ``MD_TRANS`` denoiser path).

TPU-native rebuild of
/root/reference/src/ladiff/models/architectures/mdiff_transformer.py:137-321:
AdaLN-like ``StylizationBlock`` (scale/shift from the time embedding),
softmax-linear cross attention between latents and text, and the composed
decoder layer (self-attn over [latents; text; time], linear cross-attn, FFN)
that the released LADiff config wires into the skip encoder
(config_ladiff_humanml3d.yaml: ``MD_TRANS: True``).

Everything is batch-first over static shapes; the per-sample latent mask is
a boolean array threaded through attention, not a Python loop.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ladiff_tpu.ops.param_layers import DenseParams, LNParams
from ladiff_tpu.ops.transformer import TransformerEncoderLayer
from ladiff_tpu.ops.pallas_common import pallas_enabled

__all__ = [
    "StylizationBlock",
    "LinearTemporalCrossAttention",
    "StylizedFFN",
    "MDTransformerLayer",
    "MDSkipTransformerEncoder",
    "md_stack_enabled",
]

zero_init = nn.initializers.zeros_init()


def md_stack_enabled(d_model: int, ffn_dim: int, num_heads: int) -> bool:
    """Gate for the whole-stack fused sampling kernel (pallas_md_stack):
    OPT-IN via LADIFF_MD_STACK=1, plus TPU + packed head layout +
    128-aligned dims.  Off by default: the same-session TPU A/B measured
    the whole-stack kernel SLOWER than the per-layer kernels it replaces
    (3204.8 vs 3482.2 samples/s headline; see PERF.md "whole-stack
    sampling kernel") — XLA's scan-level overlap across per-layer kernel
    calls beats the single grid's serialized layer loop.  Callers also
    require the sampling fast path (per-step prep with step-shared AdaLN
    rows and a single pooled text token)."""
    import os
    from ladiff_tpu.ops.pallas_md_layer import _env_layout
    if os.environ.get("LADIFF_MD_STACK", "0") != "1":
        return False
    return (pallas_enabled()
            and _env_layout() == "packed"
            and d_model % 128 == 0 and ffn_dim % 128 == 0
            and 128 % (d_model // num_heads) == 0)


class StylizationBlock(nn.Module):
    """h <- zero_linear(silu(dropout(norm(h)*(1+scale)+shift)))
    with (scale, shift) from the time embedding
    (reference: mdiff_transformer.py:137-163)."""

    latent_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, emb: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        # emb: [B, D_time]
        emb_out = nn.Dense(2 * self.latent_dim, dtype=self.dtype,
                           name="emb_layers_1")(nn.silu(emb))
        scale, shift = jnp.split(emb_out[:, None, :], 2, axis=2)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(h) * (1 + scale) + shift
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.latent_dim, dtype=self.dtype, kernel_init=zero_init,
                     bias_init=zero_init, name="out_layers_2")(h)
        return h


class LinearTemporalCrossAttention(nn.Module):
    """Softmax-linear attention latents <-> text with latent-row masking
    (reference: mdiff_transformer.py:206-247)."""

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    emb_dim: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,            # [B, T, D] latents
        xf: jax.Array,           # [B, N, D_text] text tokens
        emb: jax.Array,          # [B, D_time]
        latent_valid: Optional[jax.Array] = None,  # [B, T] bool
        deterministic: bool = True,
    ) -> jax.Array:
        B, T, D = x.shape
        N = xf.shape[1]
        H = self.num_heads
        tn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="text_norm")(xf)
        value = nn.Dense(D, dtype=self.dtype, name="value")(tn)
        # keep query/key params in the tree for checkpoint parity even on
        # the N=1 shortcut below
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        query = nn.Dense(D, dtype=self.dtype, name="query")(xn)
        key = nn.Dense(D, dtype=self.dtype, name="key")(tn)
        proj_out = _StylizationParams(self.latent_dim, self.dropout,
                                      dtype=self.dtype, emb_dim=self.emb_dim,
                                      name="proj_out")
        if N == 1:
            # EXACT algebraic collapse for a single text token (the pooled-
            # CLIP configs): softmax over one key is 1, so the context
            # matrix is v broadcast over d; the query softmax sums to 1, so
            # y[b,t] = v[b] for valid rows (0 for masked rows).  The q/k
            # GEMMs cancel out of the math entirely.
            if (deterministic and D % 128 == 0
                    and pallas_enabled()):
                from ladiff_tpu.ops.pallas_stylize import \
                    fused_broadcast_stylize
                scale, shift = proj_out.scale_shift(emb)
                vrow = jnp.repeat(value[:, 0, :], T, axis=0)
                if latent_valid is not None:
                    maskr = latent_valid.reshape(B * T, 1).astype(jnp.float32)
                else:
                    maskr = jnp.ones((B * T, 1), jnp.float32)
                out = fused_broadcast_stylize(
                    x.reshape(B * T, D).astype(self.dtype),
                    vrow.astype(self.dtype), maskr,
                    jnp.repeat(scale, T, axis=0).astype(self.dtype),
                    jnp.repeat(shift, T, axis=0).astype(self.dtype),
                    proj_out.norm.scale, proj_out.norm.bias,
                    proj_out.out_layers_2.kernel.astype(self.dtype),
                    proj_out.out_layers_2.bias.astype(self.dtype))
                return out.reshape(B, T, D)
            y = jnp.broadcast_to(value, (B, T, D))
            if latent_valid is not None:
                y = jnp.where(latent_valid[:, :, None], y, 0.0)
        else:
            query = jax.nn.softmax(query.reshape(B, T, H, -1), axis=-1)
            keyh = jax.nn.softmax(key.reshape(B, N, H, -1), axis=1)
            valueh = value.reshape(B, N, H, -1)
            # [B, H, Dh, Dh] context; then project queries through it.
            attention = jnp.einsum(
                "bnhd,bnhl->bhdl", keyh, valueh,
                preferred_element_type=jnp.float32).astype(x.dtype)
            if latent_valid is not None:
                query = query * latent_valid[:, :, None, None].astype(query.dtype)
            y = jnp.einsum("bnhd,bhdl->bnhl", query, attention,
                           preferred_element_type=jnp.float32).astype(x.dtype)
            y = y.reshape(B, T, D)
        y = proj_out(y, emb, deterministic=deterministic)
        return x + y


class _StylizationParams(nn.Module):
    """StylizationBlock with addressable params (tree-identical to
    StylizationBlock: emb_layers_1 / norm / out_layers_2).

    ``emb_dim``: width of the conditioning embedding (reference
    ``time_embed_dim``, mdiff_transformer.py:139-144).  Defaults to
    ``latent_dim`` — the LADiff denoiser's choice; the full MotionDiffuse
    model conditions on a 4x-wide time embedding."""

    latent_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    emb_dim: Optional[int] = None

    def setup(self):
        D = self.latent_dim
        self.emb_layers_1 = DenseParams(self.emb_dim or D, 2 * D,
                                         dtype=self.dtype,
                                         name="emb_layers_1")
        self.norm = LNParams(D, dtype=self.dtype, name="norm")
        self.out_layers_2 = DenseParams(D, D, zero=True, dtype=self.dtype,
                                         name="out_layers_2")
        self.drop = nn.Dropout(self.dropout)

    def scale_shift(self, emb: jax.Array):
        out = self.emb_layers_1(nn.silu(emb))
        return jnp.split(out, 2, axis=-1)

    def __call__(self, h: jax.Array, emb: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        scale, shift = self.scale_shift(emb)
        h = self.norm(h) * (1 + scale[:, None, :]) + shift[:, None, :]
        h = nn.silu(h)
        h = self.drop(h, deterministic=deterministic)
        return self.out_layers_2(h)


class StylizedFFN(nn.Module):
    """GELU FFN with zero-init second linear and stylized output
    (reference: mdiff_transformer.py:249-262).

    At inference on TPU the whole chain runs as ONE pallas kernel
    (pallas_fused_ffn) — the denoiser step is latency-bound on kernel
    count, and this block is ~10 of its ~25 kernels per layer."""

    latent_dim: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    emb_dim: Optional[int] = None

    def setup(self):
        D, F = self.latent_dim, self.ffn_dim
        self.linear1 = DenseParams(D, F, dtype=self.dtype, name="linear1")
        self.linear2 = DenseParams(F, D, zero=True, dtype=self.dtype,
                                    name="linear2")
        self.proj_out = _StylizationParams(D, self.dropout, dtype=self.dtype,
                                           emb_dim=self.emb_dim,
                                           name="proj_out")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: jax.Array, emb: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        D = self.latent_dim
        use_fused = (deterministic and x.ndim == 3
                     and D % 128 == 0 and self.ffn_dim % 128 == 0
                     and pallas_enabled())
        if use_fused:
            from ladiff_tpu.ops.pallas_fused_ffn import fused_stylized_ffn
            B, T, _ = x.shape
            scale, shift = self.proj_out.scale_shift(emb)
            p = self.proj_out
            out = fused_stylized_ffn(
                x.reshape(B * T, D).astype(self.dtype),
                jnp.repeat(scale, T, axis=0).astype(self.dtype),
                jnp.repeat(shift, T, axis=0).astype(self.dtype),
                self.linear1.kernel.astype(self.dtype),
                self.linear1.bias.astype(self.dtype),
                self.linear2.kernel.astype(self.dtype),
                self.linear2.bias.astype(self.dtype),
                p.norm.scale, p.norm.bias,
                p.out_layers_2.kernel.astype(self.dtype),
                p.out_layers_2.bias.astype(self.dtype))
            return out.reshape(B, T, D)
        y = self.linear1(x)
        y = nn.gelu(y, approximate=False)
        y = self.drop(y, deterministic=deterministic)
        y = self.linear2(y)
        y = self.proj_out(y, emb, deterministic=deterministic)
        return x + y


class MDTransformerLayer(nn.Module):
    """Composed layer: vanilla self-attn over [latents; text; time] tokens,
    then linear cross-attn and stylized FFN
    (reference: LinearTemporalDiffusionTransformerDecoderLayer,
    mdiff_transformer.py:265-321, with ``use_MLD_Transformer=True``)."""

    d_model: int
    text_latent_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.sa_block = TransformerEncoderLayer(
            self.d_model, self.num_heads, 1024, self.dropout, "relu", False,
            dtype=self.dtype, name="sa_block")
        self.ca_block = LinearTemporalCrossAttention(
            self.d_model, self.text_latent_dim, self.num_heads, self.dropout,
            dtype=self.dtype, name="ca_block")
        self.ffn = StylizedFFN(self.d_model, self.ffn_dim, self.dropout,
                               dtype=self.dtype, name="ffn")

    def compute_prep(self, xf: jax.Array, embs: jax.Array):
        """Step-invariant pieces of the fused path, computable ONCE before
        a sampling scan: the collapsed ca text value (per sample) and both
        AdaLN scale/shift tables (one row per scan step — during sampling
        every sample shares the step's time embedding).

        xf: [B, 1, D] projected text; embs: [S, D] time-embedding table.
        Returns {"value": [B, D], "ca_ss": [S, 2D], "ffn_ss": [S, 2D]}.
        """
        ca = self.ca_block.variables["params"]
        ffn = self.ffn.variables["params"]
        xf0 = xf[:, 0, :].astype(jnp.float32)
        mu = xf0.mean(-1, keepdims=True)
        var = ((xf0 - mu) ** 2).mean(-1, keepdims=True)
        tn = ((xf0 - mu) * jax.lax.rsqrt(var + 1e-5)
              * ca["text_norm"]["scale"]
              + ca["text_norm"]["bias"]).astype(self.dtype)
        value = (tn @ ca["value"]["kernel"].astype(self.dtype)
                 + ca["value"]["bias"].astype(self.dtype))
        sembs = nn.silu(embs.astype(self.dtype))
        ca_ss = (sembs @ ca["proj_out"]["emb_layers_1"]["kernel"].astype(
            self.dtype) + ca["proj_out"]["emb_layers_1"]["bias"].astype(
            self.dtype))
        ffn_ss = (sembs @ ffn["proj_out"]["emb_layers_1"]["kernel"].astype(
            self.dtype) + ffn["proj_out"]["emb_layers_1"]["bias"].astype(
            self.dtype))
        return {"value": value, "ca_ss": ca_ss, "ffn_ss": ffn_ss}

    def _fused(self, x, xf, emb, latent_valid, prep=None, extra_rows=None):
        """Whole layer as ONE pallas kernel (pallas_md_layer) — inference
        on TPU only; reads the children's params directly.

        prep: optional per-step slice of compute_prep's output — "value"
        [B, D] plus single-row "ca_ss"/"ffn_ss" [2D] (all samples share the
        step's time embedding).  extra_rows: optional precomputed
        [B*2, D] text+time k/v rows (shared across the layer stack).
        """
        from ladiff_tpu.ops.pallas_md_layer import fused_md_layer
        B, T, D = x.shape
        sa = self.sa_block.variables["params"]
        ca = self.ca_block.variables["params"]
        ffn = self.ffn.variables["params"]

        if prep is not None:
            value = prep["value"]
            ca_scale, ca_shift = jnp.split(
                prep["ca_ss"].reshape(1, -1), 2, axis=-1)
            ffn_scale, ffn_shift = jnp.split(
                prep["ffn_ss"].reshape(1, -1), 2, axis=-1)
        else:
            p = self.compute_prep(xf, emb)
            value = p["value"]
            ca_scale, ca_shift = jnp.split(p["ca_ss"], 2, axis=-1)
            ffn_scale, ffn_shift = jnp.split(p["ffn_ss"], 2, axis=-1)

        if extra_rows is None:
            extra = jnp.concatenate([xf, emb[:, None, :]], axis=1)
            extra_rows = extra.reshape(B * 2, D).astype(self.dtype)
        if latent_valid is not None:
            kvalid = latent_valid.reshape(B * T, 1).astype(jnp.float32)
        else:
            kvalid = jnp.ones((B * T, 1), jnp.float32)
        out = fused_md_layer(
            x.reshape(B * T, D).astype(self.dtype),
            extra_rows, kvalid, value, ca_scale, ca_shift,
            ffn_scale, ffn_shift, sa, ca["proj_out"], ffn,
            T=T, E=2, H=self.num_heads)
        return out.reshape(B, T, D)

    def __call__(
        self,
        x: jax.Array,             # [B, T, D]
        xf: jax.Array,            # [B, N, D]
        emb: jax.Array,           # [B, D] time embedding
        latent_valid: Optional[jax.Array] = None,
        deterministic: bool = True,
        prep=None,
        extra_rows=None,
    ) -> jax.Array:
        B, T, _ = x.shape
        if (deterministic and not self.is_initializing()
                and xf.shape[1] == 1 and self.d_model % 128 == 0
                and self.ffn_dim % 128 == 0
                and self.d_model // self.num_heads <= 128
                and pallas_enabled()):
            return self._fused(x, xf, emb, latent_valid, prep=prep,
                               extra_rows=extra_rows)
        # self-attention over [latents; text; time] with 2 always-valid
        # extras (reference hardcodes ff=1024 + relu for this inner block,
        # mdiff_transformer.py:287-288).  The text/time rows' outputs are
        # discarded by the reference (it slices [:T]); passing them as
        # extra_kv computes only the latent rows — exact same result.
        # (measured on v5e: the extra_kv trick — computing only latent rows —
        # was 2x SLOWER than the full 7-token pass; irregular Sq!=Sk attention
        # shapes tile worse than one uniform GEMM, so keep the concat form)
        tokens = jnp.concatenate([x, xf, emb[:, None, :]], axis=1)
        if latent_valid is not None:
            extra_v = jnp.ones((B, tokens.shape[1] - T), dtype=bool)
            valid = jnp.concatenate([latent_valid, extra_v], axis=1)
        else:
            valid = None
        x = self.sa_block(tokens, valid, deterministic=deterministic)[:, :T]
        x = self.ca_block(x, xf, emb, latent_valid,
                          deterministic=deterministic)
        x = self.ffn(x, emb, deterministic=deterministic)
        return x


class MDSkipTransformerEncoder(nn.Module):
    """Skip (U-Net) encoder over MD layers — the ``MD_trans=True`` branch of
    the reference skip encoder (cross_attention.py:69-86)."""

    d_model: int
    text_latent_dim: int
    num_heads: int
    num_layers: int
    ffn_dim: int = 1024
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.num_layers % 2 == 1
        num_block = (self.num_layers - 1) // 2
        mk = lambda name: MDTransformerLayer(
            self.d_model, self.text_latent_dim, self.ffn_dim, self.num_heads,
            self.dropout, dtype=self.dtype, name=name)
        self.input_blocks = [mk(f"input_blocks_{i}") for i in range(num_block)]
        self.middle_block = mk("middle_block")
        self.output_blocks = [mk(f"output_blocks_{i}") for i in range(num_block)]
        self.linear_blocks = [
            nn.Dense(self.d_model, dtype=self.dtype, name=f"linear_blocks_{i}")
            for i in range(num_block)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")

    def _ordered_blocks(self):
        """(kind, index, name, block) in execution order; kind drives the
        skip wiring, name keys the precomputed prep."""
        return ([("input", i, f"input_blocks_{i}", b)
                 for i, b in enumerate(self.input_blocks)]
                + [("middle", 0, "middle_block", self.middle_block)]
                + [("output", i, f"output_blocks_{i}", b)
                   for i, b in enumerate(self.output_blocks)])

    def precompute_prep(self, xf: jax.Array, embs: jax.Array):
        """Step-invariant fused-path prep for EVERY layer, computed once
        before a sampling scan (see MDTransformerLayer.compute_prep).
        Returns {layer_name: {"value": [B, D], "ca_ss"/"ffn_ss": [S, 2D]}}.
        """
        return {name: block.compute_prep(xf, embs)
                for _, _, name, block in self._ordered_blocks()}

    def stacked_params(self):
        """Layer params stacked on a leading [L] axis for the whole-stack
        fused sampling kernel (pallas_md_stack), computed ONCE outside the
        sampling scan and closed over by the scan body."""
        from ladiff_tpu.ops.pallas_md_stack import stack_md_params
        layers = [(b.sa_block.variables["params"],
                   b.ca_block.variables["params"]["proj_out"],
                   b.ffn.variables["params"])
                  for _, _, _, b in self._ordered_blocks()]
        linears = [lin.variables["params"] for lin in self.linear_blocks]
        return stack_md_params(layers, linears,
                               self.norm.variables["params"], self.dtype)

    def stack_prep(self, prep_all):
        """Re-layout precompute_prep's per-layer dict into stacked arrays
        for the whole-stack kernel: values [L, B, D] (step-invariant) and
        AdaLN tables [S, L, 2D] (sliced to [L, 2D] per scan step)."""
        names = [name for _, _, name, _ in self._ordered_blocks()]
        values = jnp.stack([prep_all[n]["value"] for n in names])
        ca_ss = jnp.stack([prep_all[n]["ca_ss"] for n in names], axis=1)
        ffn_ss = jnp.stack([prep_all[n]["ffn_ss"] for n in names], axis=1)
        return values, ca_ss, ffn_ss

    def _unstack_prep(self, stack):
        """Defensive inverse of stack_prep + stacked per-step rows -> the
        per-layer prep dict, for traces where the stack prep was built but
        the kernel gate turns out false (e.g. CPU fallback)."""
        names = [name for _, _, name, _ in self._ordered_blocks()]
        return {n: {"value": stack["values"][i],
                    "ca_ss": stack["ca_ss"][i],
                    "ffn_ss": stack["ffn_ss"][i]}
                for i, n in enumerate(names)}

    def _fused_stack(self, x, xf, emb, latent_valid, stack):
        """Whole stack (layers + skips + final LN) as ONE pallas kernel —
        the sampling scan body's fast path (see pallas_md_stack)."""
        from ladiff_tpu.ops.pallas_md_stack import fused_md_stack
        B, T, D = x.shape
        extra = jnp.concatenate([xf, emb[:, None, :]], axis=1)
        extra_rows = extra.reshape(B * 2, D).astype(self.dtype)
        if latent_valid is not None:
            kvalid = latent_valid.reshape(B * T, 1).astype(jnp.float32)
        else:
            kvalid = jnp.ones((B * T, 1), jnp.float32)
        out = fused_md_stack(
            x.reshape(B * T, D).astype(self.dtype), extra_rows, kvalid,
            stack["values"], stack["ca_ss"], stack["ffn_ss"],
            stack["params"], T=T, E=2, H=self.num_heads)
        return out.reshape(B, T, D)

    def __call__(
        self,
        x: jax.Array,
        xf: jax.Array,
        emb: jax.Array,
        latent_valid: Optional[jax.Array] = None,
        deterministic: bool = True,
        prep=None,
    ) -> jax.Array:
        """prep: optional per-step slice of precompute_prep's output
        ({layer: {"value" [B, D], "ca_ss"/"ffn_ss" [2D]}}) — sampling-scan
        fast path; the text/time k/v rows are also shared across layers.
        A prep dict carrying "stack" (stacked params + values + per-step
        [L, 2D] AdaLN rows, see diffusion_reverse) routes the whole stack
        through ONE pallas kernel when the gate holds."""
        from ladiff_tpu.ops.pp_hook import pp_override_get
        ov = pp_override_get()
        if ov is not None and not self.is_initializing():
            # pipeline-parallel scope (parallel/pp.py): the GPipe shard_map
            # program replaces the layer loop; prep/dropout do not apply
            # there (the stage program is deterministic by design)
            return ov(self, x, xf, emb, latent_valid)
        B = x.shape[0]
        if prep is not None and "stack" in prep:
            stack = prep["stack"]
            if (deterministic and not self.is_initializing()
                    and xf.shape[1] == 1
                    and md_stack_enabled(self.d_model, self.ffn_dim,
                                         self.num_heads)):
                return self._fused_stack(x, xf, emb, latent_valid, stack)
            prep = self._unstack_prep(stack)
        extra_rows = None
        if prep is not None:
            extra = jnp.concatenate([xf, emb[:, None, :]], axis=1)
            extra_rows = extra.reshape(B * 2, -1).astype(self.dtype)
        xs = []
        for kind, i, name, block in self._ordered_blocks():
            p = prep[name] if prep is not None else None
            if kind == "output":
                x = self.linear_blocks[i](
                    jnp.concatenate([x, xs.pop()], axis=-1))
            x = block(x, xf, emb, latent_valid,
                      deterministic=deterministic, prep=p,
                      extra_rows=extra_rows)
            if kind == "input":
                xs.append(x)
        return self.norm(x)
