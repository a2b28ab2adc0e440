"""Whole MD denoiser stack (all layers + skips + final LN) as ONE kernel.

`pallas_md_layer` already fuses each MD layer into a single pallas_call,
but the sampler still round-trips the latent activations through HBM at
every layer boundary — plus the 4 skip-fusion Denses, the skip-stack
writes/reads, and per-call Mosaic entry costs, 9 calls per DDIM step.
This kernel runs the ENTIRE `MDSkipTransformerEncoder` forward —

    for each of L layers in U-Net order (inputs, middle, outputs):
        [skip pop -> Linear(2D->D) fusion]      (output blocks)
        full MD layer (sa -> post-norm FFN -> ca collapse -> stylized FFN)
        [skip push]                             (input blocks)
    final LayerNorm

— in one pallas_call blocked over SAMPLES.  Layer weights are stacked on
a leading [L] axis and stay resident in VMEM across all grid steps
(constant index maps); the activations and the skip stack never leave
VMEM.  ~27 MB of weights at the production config (9 layers, D=256,
F=1024, bf16) -> needs a raised scoped-VMEM budget (LADIFF_MD_STACK_VMEM_MB,
default 48).

Packed head layout only (the production default; other layouts keep the
per-layer kernel).  Sampling fast path only: engaged when the per-layer
prep carries single-row AdaLN scale/shift (every sample shares the step's
time embedding — true inside the DDIM scan).  Equivalent to the layer-loop
path (same math, same bf16 casts at every layer boundary); verified in
tests/test_pallas_md_stack.py.

Reference semantics: skip encoder cross_attention.py:69-86 over
LinearTemporalDiffusionTransformerDecoderLayer (mdiff_transformer.py:265-321).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ladiff_tpu.ops.pallas_common import (NEG_INF as _NEG_INF,
                                          align_block_samples, dot as _dot,
                                          erf as _erf, ln as _ln,
                                          scoped_vmem_bytes)
from ladiff_tpu.ops.pallas_decoder_layer import _heads_attention_packed
from ladiff_tpu.ops.pallas_md_layer import _expand_rows

__all__ = ["fused_md_stack", "stack_md_params"]


def _layer_math(x, extra, bias, value_row, ca_scale, ca_shift,
                ffn_scale, ffn_shift, kvalid,
                wqkv, bqkv, wout, bout, ln1s, ln1b, w1, b1, w2, b2,
                ln2s, ln2b, ca_lns, ca_lnb, wca, bca,
                f_w1, f_b1, f_w2, f_b2, f_lns, f_lnb, f_wp, f_bp,
                *, Bb, T, H, dtype):
    """One MD layer in the packed layout — line-for-line the math of
    pallas_md_layer._kernel's packed branch, on plain VMEM arrays so the
    stack kernel can unroll it per layer (equivalence pinned by
    tests/test_pallas_md_stack.py against the per-layer path)."""
    D = x.shape[1]
    Dh = D // H

    # --- self-attention over [latents ; extras] -------------------------
    qkv = _dot(x, wqkv) + bqkv.astype(jnp.float32)
    qkv_e = _dot(extra, wqkv) + bqkv.astype(jnp.float32)
    q_pad = qkv[:, :D].astype(dtype)
    k_pad = jnp.concatenate([qkv[:, D:2 * D], qkv_e[:, D:2 * D]],
                            axis=0).astype(dtype)
    v = jnp.concatenate([qkv[:, 2 * D:], qkv_e[:, 2 * D:]],
                        axis=0).astype(dtype)
    ctx = _heads_attention_packed(q_pad, k_pad, v, bias, H, Dh, dtype)
    attn = _dot(ctx.astype(dtype), wout) + bout.astype(jnp.float32)
    resid = x.astype(jnp.float32) + attn

    # --- sa post-norm relu FFN tail --------------------------------------
    h1 = _ln(resid, ln1s.astype(jnp.float32), ln1b.astype(jnp.float32))
    y = _dot(h1.astype(dtype), w1) + b1.astype(jnp.float32)
    y = jnp.maximum(y, 0.0)
    y = _dot(y.astype(dtype), w2) + b2.astype(jnp.float32)
    x2 = _ln(h1 + y, ln2s.astype(jnp.float32), ln2b.astype(jnp.float32))

    # --- ca collapse (single text token) + stylization -------------------
    val_rows = _expand_rows(value_row.astype(jnp.float32), Bb, T, D)
    yv = val_rows * kvalid
    h2 = _ln(yv, ca_lns.astype(jnp.float32), ca_lnb.astype(jnp.float32))
    h2 = h2 * (1.0 + ca_scale.astype(jnp.float32)) \
        + ca_shift.astype(jnp.float32)
    h2 = h2 * jax.nn.sigmoid(h2)
    x3 = x2 + _dot(h2.astype(dtype), wca) + bca.astype(jnp.float32)

    # --- stylized gelu FFN ------------------------------------------------
    y2 = _dot(x3.astype(dtype), f_w1) + f_b1.astype(jnp.float32)
    y2 = 0.5 * y2 * (1.0 + _erf(y2 * 0.7071067811865476))
    y2 = _dot(y2.astype(dtype), f_w2) + f_b2.astype(jnp.float32)
    h3 = _ln(y2, f_lns.astype(jnp.float32), f_lnb.astype(jnp.float32))
    h3 = h3 * (1.0 + ffn_scale.astype(jnp.float32)) \
        + ffn_shift.astype(jnp.float32)
    h3 = h3 * jax.nn.sigmoid(h3)
    return x3 + _dot(h3.astype(dtype), f_wp) + f_bp.astype(jnp.float32)


def _kernel(x_ref, extra_ref, kvalid_ref, values_ref, ca_ss_ref, ffn_ss_ref,
            wqkv_ref, bqkv_ref, wout_ref, bout_ref,
            ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            ln2s_ref, ln2b_ref,
            ca_lns_ref, ca_lnb_ref, wca_ref, bca_ref,
            f_w1_ref, f_b1_ref, f_w2_ref, f_b2_ref,
            f_lns_ref, f_lnb_ref, f_wp_ref, f_bp_ref,
            wlin_ref, blin_ref, norm_s_ref, norm_b_ref,
            out_ref, *, L: int, T: int, E: int, H: int):
    Bb = values_ref.shape[1]
    M = Bb * T
    KE = Bb * E
    D = x_ref.shape[1]
    dtype = x_ref.dtype
    num_block = (L - 1) // 2

    x = x_ref[...]
    extra = extra_ref[...]
    kvalid = kvalid_ref[...].astype(jnp.float32)

    # block-diagonal same-sample bias + latent-row key validity — layer
    # invariant, computed once for all L layers
    rq = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // T
    rk = jnp.concatenate([
        jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // T,
        jax.lax.broadcasted_iota(jnp.int32, (KE, 1), 0) // E,
    ], axis=0)
    kval = jnp.concatenate([kvalid, jnp.ones((KE, 1), jnp.float32)], axis=0)
    same = (rq == rk.reshape(1, M + KE)) & (kval.reshape(1, M + KE) > 0.5)
    bias = jnp.where(same, 0.0, _NEG_INF)

    skips = []
    for l in range(L):
        if l > num_block:  # output block: pop + Linear(2D->D) skip fusion
            j = l - num_block - 1
            cat = jnp.concatenate([x, skips.pop()], axis=1)
            x = (_dot(cat, wlin_ref[j])
                 + blin_ref[j].astype(jnp.float32)).astype(dtype)
        out = _layer_math(
            x, extra, bias, values_ref[l],
            ca_ss_ref[l, :, :D], ca_ss_ref[l, :, D:],
            ffn_ss_ref[l, :, :D], ffn_ss_ref[l, :, D:], kvalid,
            wqkv_ref[l], bqkv_ref[l], wout_ref[l], bout_ref[l],
            ln1s_ref[l], ln1b_ref[l], w1_ref[l], b1_ref[l],
            w2_ref[l], b2_ref[l], ln2s_ref[l], ln2b_ref[l],
            ca_lns_ref[l], ca_lnb_ref[l], wca_ref[l], bca_ref[l],
            f_w1_ref[l], f_b1_ref[l], f_w2_ref[l], f_b2_ref[l],
            f_lns_ref[l], f_lnb_ref[l], f_wp_ref[l], f_bp_ref[l],
            Bb=Bb, T=T, H=H, dtype=dtype)
        # match the per-layer path's dtype round trip at each boundary
        x = out.astype(dtype)
        if l < num_block:  # input block: push skip
            skips.append(x)

    y = _ln(x.astype(jnp.float32), norm_s_ref[...].astype(jnp.float32),
            norm_b_ref[...].astype(jnp.float32))
    out_ref[...] = y.astype(out_ref.dtype)


def stack_md_params(layers, linears, norm: dict, dtype) -> dict:
    """Stack per-layer params onto a leading [L] axis, once, OUTSIDE the
    sampling scan (relying on XLA's while-loop invariant code motion to
    hoist a 27 MB stack op would be fragile).  The returned pytree is
    closed over by the scan body and fed to ``fused_md_stack``.

    layers: L (sa, ca_proj, ffn) param-dict triples in execution order;
    linears: (L-1)//2 skip-fusion Dense params; norm: the final LN."""
    sa_l, ca_l, ffn_l = zip(*layers)
    stacked = {}
    get = {
        "wqkv": lambda sa, ca, ff: sa["self_attn"]["in_proj_kernel"],
        "bqkv": lambda sa, ca, ff: sa["self_attn"]["in_proj_bias"][None],
        "wout": lambda sa, ca, ff: sa["self_attn"]["out_proj"]["kernel"],
        "bout": lambda sa, ca, ff: sa["self_attn"]["out_proj"]["bias"][None],
        "ln1s": lambda sa, ca, ff: sa["norm1"]["scale"][None],
        "ln1b": lambda sa, ca, ff: sa["norm1"]["bias"][None],
        "w1": lambda sa, ca, ff: sa["linear1"]["kernel"],
        "b1": lambda sa, ca, ff: sa["linear1"]["bias"][None],
        "w2": lambda sa, ca, ff: sa["linear2"]["kernel"],
        "b2": lambda sa, ca, ff: sa["linear2"]["bias"][None],
        "ln2s": lambda sa, ca, ff: sa["norm2"]["scale"][None],
        "ln2b": lambda sa, ca, ff: sa["norm2"]["bias"][None],
        "ca_lns": lambda sa, ca, ff: ca["norm"]["scale"][None],
        "ca_lnb": lambda sa, ca, ff: ca["norm"]["bias"][None],
        "wca": lambda sa, ca, ff: ca["out_layers_2"]["kernel"],
        "bca": lambda sa, ca, ff: ca["out_layers_2"]["bias"][None],
        "f_w1": lambda sa, ca, ff: ff["linear1"]["kernel"],
        "f_b1": lambda sa, ca, ff: ff["linear1"]["bias"][None],
        "f_w2": lambda sa, ca, ff: ff["linear2"]["kernel"],
        "f_b2": lambda sa, ca, ff: ff["linear2"]["bias"][None],
        "f_lns": lambda sa, ca, ff: ff["proj_out"]["norm"]["scale"][None],
        "f_lnb": lambda sa, ca, ff: ff["proj_out"]["norm"]["bias"][None],
        "f_wp": lambda sa, ca, ff: ff["proj_out"]["out_layers_2"]["kernel"],
        "f_bp": lambda sa, ca, ff: ff["proj_out"]["out_layers_2"]["bias"][None],
    }
    # LN scales/biases stay in their native dtype (the per-layer kernel
    # passes them uncast and upcasts to f32 in-kernel); GEMM operands cast
    # to the activation dtype like pallas_md_layer's c()
    f32_names = {"ln1s", "ln1b", "ln2s", "ln2b", "ca_lns", "ca_lnb",
                 "f_lns", "f_lnb"}
    for name, fn in get.items():
        cast = (lambda a: a) if name in f32_names else (
            lambda a: a.astype(dtype))
        stacked[name] = jnp.stack(
            [cast(fn(sa, ca, ff)) for sa, ca, ff in zip(sa_l, ca_l, ffn_l)])
    stacked["wlin"] = jnp.stack(
        [lin["kernel"].astype(dtype) for lin in linears])
    stacked["blin"] = jnp.stack(
        [lin["bias"][None].astype(dtype) for lin in linears])
    stacked["norm_s"] = norm["scale"].reshape(1, -1)
    stacked["norm_b"] = norm["bias"].reshape(1, -1)
    return stacked


def fused_md_stack(
    x: jax.Array,          # [B*T, D] latent rows
    extra: jax.Array,      # [B*E, D] text+time rows (k/v only)
    kvalid: jax.Array,     # [B*T, 1] f32 latent-row validity
    values: jax.Array,     # [L, B, D] per-layer collapsed ca text value
    ca_ss: jax.Array,      # [L, 2D] per-layer AdaLN rows (step-shared)
    ffn_ss: jax.Array,     # [L, 2D]
    stacked: dict,         # stack_md_params output
    *, T: int, E: int, H: int, block_samples: int = 32,
) -> jax.Array:
    """Whole-stack fused forward; same contract as looping
    MDTransformerLayer._fused over the stack then applying the final norm.
    Packed layout only (callers gate).  Block size trace-time overridable
    via LADIFF_MD_BLOCK (shared with the per-layer kernel)."""
    import os
    block_samples = int(os.environ.get("LADIFF_MD_BLOCK", block_samples))
    return _fused_md_stack(
        x, extra, kvalid, values, ca_ss, ffn_ss, stacked,
        T=T, E=E, H=H, block_samples=block_samples)


@functools.partial(jax.jit, static_argnames=("T", "E", "H", "block_samples"))
def _fused_md_stack(x, extra, kvalid, values, ca_ss, ffn_ss, stacked,
                    *, T: int, E: int, H: int, block_samples: int):
    BT, D = x.shape
    B = BT // T
    L = values.shape[0]
    NB = stacked["wlin"].shape[0]
    Bb = align_block_samples(block_samples, B, T, E)
    # pad the batch to whole blocks (garbage KEY rows would poison valid
    # queries through the score GEMM — same rationale as pallas_md_layer)
    Bp = -(-B // Bb) * Bb
    if Bp != B:
        pad = Bp - B
        x = jnp.pad(x, ((0, pad * T), (0, 0)))
        extra = jnp.pad(extra, ((0, pad * E), (0, 0)))
        kvalid = jnp.pad(kvalid, ((0, pad * T), (0, 0)))
        values = jnp.pad(values, ((0, 0), (0, pad), (0, 0)))
    grid = (Bp // Bb,)
    dtype = x.dtype

    def rows_T(i):
        return (i, 0)

    def rep(i):
        return (0, 0)

    def rep3(i):
        return (0, 0, 0)

    lat = pl.BlockSpec((Bb * T, D), rows_T, memory_space=pltpu.VMEM)

    def w3(shape):
        return pl.BlockSpec(shape, rep3, memory_space=pltpu.VMEM)

    order = ["wqkv", "bqkv", "wout", "bout", "ln1s", "ln1b", "w1", "b1",
             "w2", "b2", "ln2s", "ln2b", "ca_lns", "ca_lnb", "wca", "bca",
             "f_w1", "f_b1", "f_w2", "f_b2", "f_lns", "f_lnb", "f_wp",
             "f_bp"]
    kernel = functools.partial(_kernel, L=L, T=T, E=E, H=H)
    vmem = scoped_vmem_bytes("LADIFF_MD_STACK_VMEM_MB", 48)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        in_specs=[
            lat,                                              # x
            pl.BlockSpec((Bb * E, D), rows_T, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb * T, 1), rows_T, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Bb, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),            # values
            w3((L, 1, 2 * D)), w3((L, 1, 2 * D)),             # ca/ffn ss
        ] + [w3(stacked[k].shape) for k in order] + [
            w3((NB, 2 * D, D)), w3((NB, 1, D)),               # skip linears
            pl.BlockSpec((1, D), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=lat,
        out_shape=jax.ShapeDtypeStruct((Bp * T, D), dtype),
    )(
        x, extra.astype(dtype), kvalid.astype(jnp.float32),
        values.astype(dtype), ca_ss[:, None, :].astype(dtype),
        ffn_ss[:, None, :].astype(dtype),
        *[stacked[k] for k in order],
        stacked["wlin"], stacked["blin"],
        stacked["norm_s"], stacked["norm_b"],
    )
    return out[:BT]
