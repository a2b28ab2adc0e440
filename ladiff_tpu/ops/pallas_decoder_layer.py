"""Fully-fused transformer DECODER layer (the VAE decode hot path).

One pallas_call per decoder layer: self-attention over the 196 frame
queries, post-norm LN, cross-attention into the <=MAX_IT latent memory,
and the LN-FFN-LN tail — all with activations resident in VMEM, blocked
over samples.  Decode was measured at its HBM roofline (~21 ms/batch-256)
with ~5x compute headroom; fusing removes the per-op HBM round trips.

Attention head layout (LADIFF_DECODE_LAYOUT):

* ``packed`` (default, round 3) — all projections COMPACT; 128//Dh heads
  share each 128-lane slot and are separated in-kernel by lane masks
  (zeroed other-head q lanes before the score GEMM, lane-masked value
  accumulation).  Score/value MXU passes match ``slots`` — the MXU
  rounds K=64 contractions up to 128 either way — but the qkv and out
  projections shed their slot-padding lanes (same-session +7.1% headline
  A/B in PERF.md, jointly with the MD-layer packing).
* ``slots`` — per-head q/k (and self-attention values) in 128-lane
  slots: head h occupies lanes [h*128, h*128+Dh), weights remapped
  outside the kernel (zero-filled columns for wq/wk/wv, zero-filled ROWS
  for the out projection).  Cross-attention keeps the lane-masked value
  path (keys number <=MAX_IT).  The round-2 layout, kept for A/B.

Equivalent to TransformerDecoderLayer's post-norm XLA path (reference
cross_attention.py:332-450); verified in tests/test_pallas_fused.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ladiff_tpu.ops.pallas_common import (NEG_INF as _NEG_INF,
                                          align_block_samples, dot as _dot,
                                          dot_t as _dot_t, erf as _erf,
                                          ln as _ln)

__all__ = ["fused_decoder_layer", "pad_head_columns"]


def pad_head_columns(w: jax.Array, H: int, Dh: int) -> jax.Array:
    """[..., H*Dh] -> [..., H*128] with head h in lanes [h*128, h*128+Dh)."""
    parts = []
    pad_shape = w.shape[:-1] + (128 - Dh,)
    zeros = jnp.zeros(pad_shape, w.dtype)
    for h in range(H):
        parts.append(w[..., h * Dh:(h + 1) * Dh])
        parts.append(zeros)
    return jnp.concatenate(parts, axis=-1)


def pad_head_rows(w: jax.Array, H: int, Dh: int) -> jax.Array:
    """[H*Dh, D] -> [H*128, D]: row block h moves to rows [h*128, h*128+Dh),
    zero rows elsewhere — the out-projection counterpart of
    ``pad_head_columns`` for context vectors kept in head slots."""
    parts = []
    zeros = jnp.zeros((128 - Dh,) + w.shape[1:], w.dtype)
    for h in range(H):
        parts.append(w[h * Dh:(h + 1) * Dh])
        parts.append(zeros)
    return jnp.concatenate(parts, axis=0)


def _heads_attention(q_pad, k_pad, v, bias, H, Dh, dtype):
    """Per-head attention with 128-lane-aligned head slots.
    q_pad [M, H*128], k_pad [K, H*128], v [K, D]; returns ctx [M, D] f32."""
    M = q_pad.shape[0]
    D = v.shape[-1]
    scale = 1.0 / (Dh ** 0.5)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) // Dh
    ctx = jnp.zeros((M, D), jnp.float32)
    for h in range(H):
        qh = q_pad[:, h * 128:(h + 1) * 128]
        kh = k_pad[:, h * 128:(h + 1) * 128]
        s = _dot_t(qh, kh) * scale + bias
        w = jax.nn.softmax(s, axis=-1).astype(dtype)
        hm = (lane == h).astype(jnp.float32)
        ctx = ctx + _dot(w, v) * hm
    return ctx


def _heads_attention_slots(q_pad, k_pad, v_pad, bias, H, Dh, dtype):
    """Like _heads_attention, but VALUES also live in 128-lane head slots
    (v_pad [K, H*128], zero lanes outside each head's Dh), so every value
    GEMM contracts only the head's slot instead of masked full-D — half
    the value FLOPs for Dh=64.  Returns ctx in slot layout [M, H*128] f32
    (zero lanes preserved); pair with a pad_head_rows-remapped out proj."""
    scale = 1.0 / (Dh ** 0.5)
    outs = []
    for h in range(H):
        qh = q_pad[:, h * 128:(h + 1) * 128]
        kh = k_pad[:, h * 128:(h + 1) * 128]
        s = _dot_t(qh, kh) * scale + bias
        w = jax.nn.softmax(s, axis=-1).astype(dtype)
        outs.append(_dot(w, v_pad[:, h * 128:(h + 1) * 128]))
    return jnp.concatenate(outs, axis=1)


def _heads_attention_packed(q, k, v, bias, H, Dh, dtype):
    """Per-head attention in the COMPACT layout: q/k/v all [_, D] with
    128//Dh heads per 128-lane slot.  Per head, the other heads' lanes of
    q are zeroed before the score GEMM (their k lanes then contribute
    nothing) and the value GEMM's mixed slot output is lane-masked back to
    the head's own range.  Score/value MXU passes equal the slot layouts'
    (K=128 per head either way) but the projections feeding this stay
    compact — no slot-padding FLOPs.  Returns ctx [M, D] f32."""
    M, D = q.shape
    scale = 1.0 / (Dh ** 0.5)
    S = 128 // Dh                        # heads per slot
    G = D // 128                         # slots
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // Dh
    outs = []
    for g in range(G):
        qs = q[:, g * 128:(g + 1) * 128]
        ks = k[:, g * 128:(g + 1) * 128]
        vs = v[:, g * 128:(g + 1) * 128]
        acc = jnp.zeros((M, 128), jnp.float32)
        for j in range(S):
            hm = (lane == j).astype(dtype)
            s = _dot_t(qs * hm, ks) * scale + bias
            w = jax.nn.softmax(s, axis=-1).astype(dtype)
            acc = acc + _dot(w, vs) * hm.astype(jnp.float32)
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def _kernel(x_ref, kvalid_ref, mem_ref, mvalid_ref,
            sa_wqk_ref, sa_bqk_ref, sa_wv_ref, sa_bv_ref,
            sa_wout_ref, sa_bout_ref, ln1s_ref, ln1b_ref,
            ca_wq_ref, ca_bq_ref, ca_wk_ref, ca_bk_ref,
            ca_wv_ref, ca_bv_ref, ca_wout_ref, ca_bout_ref,
            w1_ref, b1_ref, w2_ref, b2_ref,
            ln2s_ref, ln2b_ref, ln3s_ref, ln3b_ref,
            out_ref, *, T: int, L: int, H: int, activation: str,
            per_sample: bool, layout: str):
    M = x_ref.shape[0]
    Bb = M // T
    ML = Bb * L
    D = sa_wv_ref.shape[0]
    Dh = D // H
    HP = D if layout == "packed" else H * 128
    dtype = x_ref.dtype
    # packed: q/k/v/out projections all compact, per-head separation by
    # in-kernel lane masks; slots: one 128-lane slot per head
    sa_att = (_heads_attention_packed if layout == "packed"
              else _heads_attention_slots)
    ca_att = (_heads_attention_packed if layout == "packed"
              else _heads_attention)

    x = x_ref[...]

    # --- self-attention over the frame queries -------------------------
    qk = _dot(x, sa_wqk_ref[...]) + sa_bqk_ref[...].astype(jnp.float32)
    q_pad = qk[:, :HP].astype(dtype)
    k_pad = qk[:, HP:].astype(dtype)
    # values in head slots too ([M, H*128], wv pre-remapped outside)
    v = (_dot(x, sa_wv_ref[...])
         + sa_bv_ref[...].astype(jnp.float32)).astype(dtype)

    kval = kvalid_ref[...].astype(jnp.float32).reshape(1, M)
    if per_sample:
        # per-sample 8-aligned attention: a [T, T] score block per sample
        # instead of one [M, M] block where only the diagonal survives the
        # same-sample mask — half the score/value FLOPs (and softmax width)
        # for Bb=2 at the same grid size
        parts = []
        for s in range(Bb):
            sl = slice(s * T, (s + 1) * T)
            bias_s = jnp.where(kval[:, sl] > 0.5, 0.0, _NEG_INF)
            parts.append(sa_att(
                q_pad[sl], k_pad[sl], v[sl], bias_s, H, Dh, dtype))
        ctx = jnp.concatenate(parts, axis=0)
    else:
        rq = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // T
        same = rq == rq.reshape(1, M)
        bias = jnp.where(same & (kval > 0.5), 0.0, _NEG_INF)
        ctx = sa_att(q_pad, k_pad, v, bias, H, Dh, dtype)
    # out proj is pad_head_rows-remapped to the slot layout [H*128, D]
    attn = _dot(ctx.astype(dtype), sa_wout_ref[...]) \
        + sa_bout_ref[...].astype(jnp.float32)
    t1 = _ln(x.astype(jnp.float32) + attn,
             ln1s_ref[...].astype(jnp.float32),
             ln1b_ref[...].astype(jnp.float32))

    # --- cross-attention into the latent memory ------------------------
    mem = mem_ref[...]
    q2 = (_dot(t1.astype(dtype), ca_wq_ref[...])
          + ca_bq_ref[...].astype(jnp.float32)).astype(dtype)
    k2 = (_dot(mem, ca_wk_ref[...])
          + ca_bk_ref[...].astype(jnp.float32)).astype(dtype)
    v2 = (_dot(mem, ca_wv_ref[...])
          + ca_bv_ref[...].astype(jnp.float32)).astype(dtype)
    mval = mvalid_ref[...].astype(jnp.float32).reshape(1, ML)
    if per_sample:
        parts = []
        for s in range(Bb):
            sl = slice(s * T, (s + 1) * T)
            ml = slice(s * L, (s + 1) * L)
            bias_s = jnp.where(mval[:, ml] > 0.5, 0.0, _NEG_INF)
            parts.append(ca_att(
                q2[sl], k2[ml], v2[ml], bias_s, H, Dh, dtype))
        ctx2 = jnp.concatenate(parts, axis=0)
    else:
        rq = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // T
        rm = jax.lax.broadcasted_iota(jnp.int32, (ML, 1), 0) // L
        same2 = rq == rm.reshape(1, ML)
        bias2 = jnp.where(same2 & (mval > 0.5), 0.0, _NEG_INF)
        ctx2 = ca_att(q2, k2, v2, bias2, H, Dh, dtype)
    x2 = _dot(ctx2.astype(dtype), ca_wout_ref[...]) \
        + ca_bout_ref[...].astype(jnp.float32)

    # --- post-norm FFN tail ---------------------------------------------
    h = _ln(t1 + x2, ln2s_ref[...].astype(jnp.float32),
            ln2b_ref[...].astype(jnp.float32))
    y = _dot(h.astype(dtype), w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    if activation == "relu":
        y = jnp.maximum(y, 0.0)
    else:
        y = 0.5 * y * (1.0 + _erf(y * 0.7071067811865476))
    y = _dot(y.astype(dtype), w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    out = _ln(h + y, ln3s_ref[...].astype(jnp.float32),
              ln3b_ref[...].astype(jnp.float32))
    out_ref[...] = out.astype(out_ref.dtype)


def _env_layout() -> str:
    import os
    return os.environ.get("LADIFF_DECODE_LAYOUT", "packed")


def fused_decoder_layer(
    x: jax.Array,        # [B*T, D] frame-query rows
    kvalid: jax.Array,   # [B*T, 1] f32 frame-key validity
    mem: jax.Array,      # [B, L, D] latent memory
    mvalid: jax.Array,   # [B, L] f32 memory-key validity
    params: dict,        # TransformerDecoderLayer param tree
    *, T: int, L: int, H: int, activation: str = "gelu",
    block_samples: int = 2, per_sample_attention: bool = True,
) -> jax.Array:
    """Head layout comes from LADIFF_DECODE_LAYOUT ("packed" default,
    "slots" = the round-2 layout), resolved OUTSIDE the jit so switching
    it retraces instead of hitting a stale cache."""
    D = x.shape[1]
    layout = _env_layout()
    if layout == "packed" and (128 % (D // H) != 0 or D % 128 != 0):
        layout = "slots"
    return _fused_decoder_layer(
        x, kvalid, mem, mvalid, params, T=T, L=L, H=H,
        activation=activation, block_samples=block_samples,
        per_sample_attention=per_sample_attention, layout=layout)


@functools.partial(jax.jit, static_argnames=("T", "L", "H", "activation",
                                             "block_samples",
                                             "per_sample_attention",
                                             "layout"))
def _fused_decoder_layer(
    x, kvalid, mem, mvalid, params,
    *, T: int, L: int, H: int, activation: str,
    block_samples: int, per_sample_attention: bool, layout: str,
) -> jax.Array:
    BT, D = x.shape
    B = BT // T
    T0 = T
    Dh = D // H
    F = params["linear1"]["kernel"].shape[1]
    # Mosaic requires block sublane counts divisible by 8: pad the latent
    # rows per sample to an 8-multiple (validity 0 -> masked out exactly)
    # and pad the FRAME rows per sample to an 8-multiple too.  Per-sample
    # 8-aligned frame rows let block_samples=1 carry no block-diagonal
    # attention waste: a [T, T] score GEMM per sample instead of a
    # [Bb*T, Bb*T] one where only the diagonal blocks survive the mask
    # (for T=196 that halves the self-attention score/value FLOPs vs the
    # previous Bb=2-forced-by-alignment layout, at +2% padded rows).
    Lp = -(-L // 8) * 8
    if Lp != L:
        mem = jnp.pad(mem, ((0, 0), (0, Lp - L), (0, 0)))
        mvalid = jnp.pad(mvalid, ((0, 0), (0, Lp - L)))
    L = Lp
    Tp = -(-T // 8) * 8
    if Tp != T and (per_sample_attention or block_samples == 1):
        # 8-aligned per-sample frame rows enable the in-kernel per-sample
        # attention split (and are required for one-sample blocks); with
        # per_sample_attention=False and Bb >= 2 the unpadded rows keep the
        # original joint-attention layout for A/B benchmarking
        pad_t = ((0, 0), (0, Tp - T), (0, 0))
        x = jnp.pad(x.reshape(B, T, D), pad_t).reshape(B * Tp, D)
        kvalid = jnp.pad(kvalid.reshape(B, T, 1),
                         pad_t).reshape(B * Tp, 1)
        T = Tp
    mem = mem.reshape(B * L, D)
    mvalid = mvalid.reshape(B * L, 1)
    Bb = align_block_samples(block_samples, B, T)
    # pad the batch to a whole number of blocks: attention kernels must
    # never read out-of-bounds KEY rows (garbage keys would poison valid
    # queries through the score GEMM — NaN ignores the additive mask)
    Bp = -(-B // Bb) * Bb
    if Bp != B:
        pad = Bp - B
        x = jnp.pad(x, ((0, pad * T), (0, 0)))
        kvalid = jnp.pad(kvalid, ((0, pad * T), (0, 0)))
        mem = jnp.pad(mem, ((0, pad * L), (0, 0)))
        mvalid = jnp.pad(mvalid, ((0, pad * L), (0, 0)))
    grid = (Bp // Bb,)
    dtype = x.dtype
    c = lambda a: a.astype(dtype)
    vec = lambda a: a.reshape(1, -1)

    sa = params["self_attn"]
    ca = params["multihead_attn"]
    if layout == "packed":
        # compact projections; per-head separation happens in-kernel
        sa_wqk = c(sa["in_proj_kernel"][:, :2 * D])
        sa_bqk = c(sa["in_proj_bias"][:2 * D])
        sa_wv = c(sa["in_proj_kernel"][:, 2 * D:])
        sa_bv = c(sa["in_proj_bias"][2 * D:])
        sa_wout = c(sa["out_proj"]["kernel"])
        ca_wq = c(ca["in_proj_kernel"][:, :D])
        ca_bq = c(ca["in_proj_bias"][:D])
        ca_wk = c(ca["in_proj_kernel"][:, D:2 * D])
        ca_bk = c(ca["in_proj_bias"][D:2 * D])
        HP = D
    else:
        # remap q/k projections into 128-lane head slots (exact zero-pad)
        sa_wq = pad_head_columns(c(sa["in_proj_kernel"][:, :D]), H, Dh)
        sa_wk = pad_head_columns(c(sa["in_proj_kernel"][:, D:2 * D]), H, Dh)
        sa_wqk = jnp.concatenate([sa_wq, sa_wk], axis=1)   # [D, 2*H*128]
        sa_bq = pad_head_columns(c(sa["in_proj_bias"][:D]), H, Dh)
        sa_bk = pad_head_columns(c(sa["in_proj_bias"][D:2 * D]), H, Dh)
        sa_bqk = jnp.concatenate([sa_bq, sa_bk], axis=-1)
        # self-attn VALUES in head slots as well: wv gets padded columns and
        # the out projection padded rows (zero slots contract to zero)
        sa_wv = pad_head_columns(c(sa["in_proj_kernel"][:, 2 * D:]), H, Dh)
        sa_bv = pad_head_columns(c(sa["in_proj_bias"][2 * D:]), H, Dh)
        sa_wout = pad_head_rows(c(sa["out_proj"]["kernel"]), H, Dh)
        ca_wq = pad_head_columns(c(ca["in_proj_kernel"][:, :D]), H, Dh)
        ca_bq = pad_head_columns(c(ca["in_proj_bias"][:D]), H, Dh)
        ca_wk = pad_head_columns(c(ca["in_proj_kernel"][:, D:2 * D]), H, Dh)
        ca_bk = pad_head_columns(c(ca["in_proj_bias"][D:2 * D]), H, Dh)
        HP = H * 128
    rows = lambda i: (i, 0)
    rep = lambda i: (0, 0)
    frame = pl.BlockSpec((Bb * T, D), rows, memory_space=pltpu.VMEM)
    latm = pl.BlockSpec((Bb * L, D), rows, memory_space=pltpu.VMEM)

    def w(shape):
        return pl.BlockSpec(shape, rep, memory_space=pltpu.VMEM)

    # per-sample split needs 8-aligned frame rows; for one-sample blocks it
    # is strictly cheaper (no same-sample mask) and always legal
    ps = (T % 8 == 0) and (per_sample_attention or Bb == 1)
    kernel = functools.partial(_kernel, T=T, L=L, H=H, activation=activation,
                               per_sample=ps, layout=layout)
    # LADIFF_DECODE_VMEM_MB (trace-time) raises the scoped-VMEM budget so
    # larger sample blocks fit: bb16 per-sample needs ~40M vs the 16M
    # default scope (PERF.md decode sweep).  0 = compiler default.
    from ladiff_tpu.ops.pallas_common import scoped_vmem_bytes
    vmem = scoped_vmem_bytes("LADIFF_DECODE_VMEM_MB")
    extra = ({"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=vmem)} if vmem else {})
    out = pl.pallas_call(
        kernel,
        grid=grid,
        **extra,
        in_specs=[
            frame,
            pl.BlockSpec((Bb * T, 1), rows, memory_space=pltpu.VMEM),
            latm,
            pl.BlockSpec((Bb * L, 1), rows, memory_space=pltpu.VMEM),
            w((D, 2 * HP)), w((1, 2 * HP)),       # sa q/k (padded heads)
            w((D, HP)), w((1, HP)),               # sa v (head slots)
            w((HP, D)), w((1, D)), w((1, D)), w((1, D)),  # sa out + ln1
            w((D, HP)), w((1, HP)), w((D, HP)), w((1, HP)),  # ca q/k
            w((D, D)), w((1, D)), w((D, D)), w((1, D)),      # ca v/out
            w((D, F)), w((1, F)), w((F, D)), w((1, D)),      # ffn
            w((1, D)), w((1, D)), w((1, D)), w((1, D)),      # ln2/ln3
        ],
        out_specs=frame,
        out_shape=jax.ShapeDtypeStruct((Bp * T, D), dtype),
    )(
        x, kvalid.astype(jnp.float32), mem.astype(dtype),
        mvalid.astype(jnp.float32),
        sa_wqk, vec(sa_bqk),
        sa_wv, vec(sa_bv),
        sa_wout, vec(c(sa["out_proj"]["bias"])),
        vec(params["norm1"]["scale"]), vec(params["norm1"]["bias"]),
        ca_wq, vec(ca_bq), ca_wk, vec(ca_bk),
        c(ca["in_proj_kernel"][:, 2 * D:]), vec(c(ca["in_proj_bias"][2 * D:])),
        c(ca["out_proj"]["kernel"]), vec(c(ca["out_proj"]["bias"])),
        c(params["linear1"]["kernel"]), vec(c(params["linear1"]["bias"])),
        c(params["linear2"]["kernel"]), vec(c(params["linear2"]["bias"])),
        vec(params["norm2"]["scale"]), vec(params["norm2"]["bias"]),
        vec(params["norm3"]["scale"]), vec(params["norm3"]["bias"]),
    )
    if T != T0:
        out = out[:B * T].reshape(B, T, D)[:, :T0].reshape(BT, D)
    return out[:BT]
