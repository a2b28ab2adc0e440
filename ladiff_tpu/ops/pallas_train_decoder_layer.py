"""Whole-DECODER-layer training kernel: self-attn + cross-attn + FFN tail.

Companion to pallas_train_layer.py (the encoder whole-layer kernel): the
post-norm decoder layer's full training chain —

    sa   = softmax(qk^T + frame-key bias) per head, probs dropout
    r1   = x + dropout(sa_out @ Wout + b)          # residual dropout
    t1   = LN1(r1)
    ca   = softmax(q2 k2^T + memory-key bias) per head, probs dropout
           (queries from t1, keys/values from the latent memory)
    r2   = t1 + dropout(ca_out @ Wout2 + b2)
    h    = LN2(r2)
    out  = LN3(h + dropout(dropout(act(h @ W1 + b1)) @ W2 + b2'))

— as ONE forward and ONE backward pallas_call through ``jax.custom_vjp``,
blocked over samples, with gradients for x, the MEMORY, and every
parameter.  The backward re-derives the whole chain from (x, mem) and
regenerates all six dropout mask groups from the same counter-based seed
(flash-style remat; the only residuals are the inputs).

Layouts: self-attention q/k/v in 128-lane head slots with per-sample
attention blocks (pallas_train_attention.py).  Cross-attention q/k in
head slots, VALUES lane-masked full-D (keys number <=MAX_IT latents —
slot values would cost more in the doubled out-proj than they save;
same trade as the inference kernel, pallas_decoder_layer.py).  Memory
rows are padded per sample to an 8-multiple with validity 0 (masked out
exactly; zero rows cannot produce NaN through the score GEMM).

Semantics match TransformerDecoderLayer's post-norm XLA path
site-for-site (ops/transformer.py; reference cross_attention.py:332-450).
Mask draw order: sa probs per (sample, head), sa residual, ca probs per
(sample, head) (drawn 128-lane wide, sliced to the memory width — lane
count of a draw must be tile-legal), ca residual, FFN act, FFN out.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ladiff_tpu.ops.pallas_common import NEG_INF as _NEG_INF, dot as _dot, \
    dot_t as _dot_t, dropout_masks as _masks, train_vmem_params as _vmem
from ladiff_tpu.ops.pallas_decoder_layer import (pad_head_columns,
                                                 pad_head_rows)
from ladiff_tpu.ops.pallas_train_attention import (_attn_bwd_core,
                                                   _attn_fwd_core,
                                                   _unpad_head_columns,
                                                   _unpad_head_rows)
from ladiff_tpu.ops.pallas_train_ffn import (_act_fwd, _act_grad, _ln_bwd,
                                             _ln_fwd)

__all__ = ["train_decoder_layer", "decoder_layer_vmem_mb"]


def decoder_layer_vmem_mb(S: int, L: int, D: int, H: int, F: int,
                          block_samples: int = 2) -> int:
    """Conservative scoped-VMEM estimate (MB) for the backward kernel
    (see encoder_layer_vmem_mb; adds the cross-attention weights)."""
    HP = H * 128
    Sp = -(-S // 8) * 8
    Lp = -(-L // 8) * 8
    Bb = max(1, block_samples)
    el = (2 * (4 * D * HP + 2 * D * HP + 2 * D * D + 2 * D * F)
          + Bb * Sp * (3 * D + 6 * HP + 3 * F + 2 * 128)
          + Bb * Lp * 4 * D + 3 * Sp * Sp)
    return int(el * 4 * 1.3 / (1024 * 1024)) + 1


def _mask_shapes(Bb, Sp, Lp, H, M, D, F):
    # draw order: sa probs, sa resid, ca probs (128-lane draws), ca resid,
    # FFN act, FFN out
    return ([(Sp, Sp)] * (Bb * H) + [(M, D)]
            + [(Sp, 128)] * (Bb * H) + [(M, D)] + [(M, F)] + [(M, D)])


def _cross_fwd(t1, mem, mval, ca_wq, ca_bq, ca_wk, ca_bk, ca_wv, ca_bv,
               masks, mask_off, *, Bb, Sp, Lp, H, D, dtype):
    """Cross-attention with probs dropout; returns (q2, k2, v2, ctx2)."""
    Dh = D // H
    scale = 1.0 / (Dh ** 0.5)
    q2 = _dot(t1.astype(dtype), ca_wq) + ca_bq.astype(jnp.float32)
    k2 = _dot(mem, ca_wk) + ca_bk.astype(jnp.float32)
    v2 = (_dot(mem, ca_wv) + ca_bv.astype(jnp.float32)).astype(dtype)
    q2 = q2.astype(dtype)
    k2 = k2.astype(dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) // Dh
    parts = []
    for s in range(Bb):
        sl = slice(s * Sp, (s + 1) * Sp)
        ml = slice(s * Lp, (s + 1) * Lp)
        bias = jnp.where(mval[:, ml] > 0.5, 0.0, _NEG_INF)   # [1, Lp]
        ctx = jnp.zeros((Sp, D), jnp.float32)
        for h in range(H):
            hs = slice(h * 128, (h + 1) * 128)
            sc = _dot_t(q2[sl, hs], k2[ml, hs]) * scale + bias
            p = jax.nn.softmax(sc, axis=-1)
            m = masks[mask_off + s * H + h]
            if not isinstance(m, float):   # rate 0 -> scalar keep-mask
                m = m[:, :Lp]
            a = (p * m).astype(dtype)
            hm = (lane == h).astype(jnp.float32)
            ctx = ctx + _dot(a, v2[ml]) * hm
        parts.append(ctx)
    return q2, k2, v2, jnp.concatenate(parts, axis=0)


def _fwd_kernel(seed_ref, x_ref, kvalid_ref, mem_ref, mvalid_ref,
                sa_wqkv_ref, sa_bqkv_ref, sa_wout_ref, sa_bout_ref,
                ca_wq_ref, ca_bq_ref, ca_wk_ref, ca_bk_ref,
                ca_wv_ref, ca_bv_ref, ca_wout_ref, ca_bout_ref,
                w1_ref, b1_ref, w2_ref, b2_ref,
                ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, ln3s_ref, ln3b_ref,
                out_ref, *, Bb: int, Sp: int, Lp: int, H: int, rate: float,
                activation: str):
    M = Bb * Sp
    D = x_ref.shape[1]
    F = w1_ref.shape[1]
    dtype = x_ref.dtype
    x = x_ref[...]
    kval = kvalid_ref[...].astype(jnp.float32).reshape(1, M)
    mval = mvalid_ref[...].astype(jnp.float32).reshape(1, Bb * Lp)
    masks = _masks(seed_ref, rate, _mask_shapes(Bb, Sp, Lp, H, M, D, F))
    m_sa_resid = masks[Bb * H]
    m_ca_resid, m1, m2 = masks[-3], masks[-2], masks[-1]

    # self-attention segment
    _, _, _, ctx = _attn_fwd_core(x, kval, sa_wqkv_ref[...], sa_bqkv_ref[...],
                                  masks, Bb=Bb, Sp=Sp, H=H, dtype=dtype)
    attn = _dot(ctx.astype(dtype), sa_wout_ref[...]) \
        + sa_bout_ref[...].astype(jnp.float32)
    r1 = x.astype(jnp.float32) + attn * m_sa_resid
    t1, _, _ = _ln_fwd(r1, ln1s_ref[...].astype(jnp.float32),
                       ln1b_ref[...].astype(jnp.float32))

    # cross-attention into the latent memory
    _, _, _, ctx2 = _cross_fwd(
        t1, mem_ref[...], mval, ca_wq_ref[...], ca_bq_ref[...],
        ca_wk_ref[...], ca_bk_ref[...], ca_wv_ref[...], ca_bv_ref[...],
        masks, Bb * H + 1, Bb=Bb, Sp=Sp, Lp=Lp, H=H, D=D, dtype=dtype)
    x2 = _dot(ctx2.astype(dtype), ca_wout_ref[...]) \
        + ca_bout_ref[...].astype(jnp.float32)
    r2 = t1 + x2 * m_ca_resid

    # FFN tail
    h, _, _ = _ln_fwd(r2, ln2s_ref[...].astype(jnp.float32),
                      ln2b_ref[...].astype(jnp.float32))
    a2 = _dot(h.astype(dtype), w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    gd = _act_fwd(a2, activation) * m1
    y = _dot(gd.astype(dtype), w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    out, _, _ = _ln_fwd(h + y * m2, ln3s_ref[...].astype(jnp.float32),
                        ln3b_ref[...].astype(jnp.float32))
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, dout_ref, kvalid_ref, mem_ref, mvalid_ref,
                sa_wqkv_ref, sa_bqkv_ref, sa_wout_ref, sa_bout_ref,
                ca_wq_ref, ca_bq_ref, ca_wk_ref, ca_bk_ref,
                ca_wv_ref, ca_bv_ref, ca_wout_ref, ca_bout_ref,
                w1_ref, b1_ref, w2_ref, b2_ref,
                ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, ln3s_ref, ln3b_ref,
                dx_ref, dmem_ref,
                dsa_wqkv_ref, dsa_bqkv_ref, dsa_wout_ref, dsa_bout_ref,
                dca_wq_ref, dca_bq_ref, dca_wk_ref, dca_bk_ref,
                dca_wv_ref, dca_bv_ref, dca_wout_ref, dca_bout_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref,
                dln1s_ref, dln1b_ref, dln2s_ref, dln2b_ref,
                dln3s_ref, dln3b_ref,
                *, Bb: int, Sp: int, Lp: int, H: int, rate: float,
                activation: str):
    M = Bb * Sp
    ML = Bb * Lp
    D = x_ref.shape[1]
    F = w1_ref.shape[1]
    HP = H * 128
    Dh = D // H
    dtype = x_ref.dtype
    scale = 1.0 / (Dh ** 0.5)
    x = x_ref[...]
    mem = mem_ref[...]
    dout = dout_ref[...].astype(jnp.float32)
    kval = kvalid_ref[...].astype(jnp.float32).reshape(1, M)
    mval = mvalid_ref[...].astype(jnp.float32).reshape(1, ML)

    # ---- recompute the forward chain with identical mask draws ----
    masks = _masks(seed_ref, rate, _mask_shapes(Bb, Sp, Lp, H, M, D, F))
    m_sa_resid = masks[Bb * H]
    m_ca_resid, m1, m2 = masks[-3], masks[-2], masks[-1]
    ca_off = Bb * H + 1

    q, k, v, ctx = _attn_fwd_core(x, kval, sa_wqkv_ref[...],
                                  sa_bqkv_ref[...], masks,
                                  Bb=Bb, Sp=Sp, H=H, dtype=dtype)
    attn = _dot(ctx.astype(dtype), sa_wout_ref[...]) \
        + sa_bout_ref[...].astype(jnp.float32)
    r1 = x.astype(jnp.float32) + attn * m_sa_resid
    ln1s = ln1s_ref[...].astype(jnp.float32)
    t1, xhat1, inv1 = _ln_fwd(r1, ln1s, ln1b_ref[...].astype(jnp.float32))

    q2, k2, v2, ctx2 = _cross_fwd(
        t1, mem, mval, ca_wq_ref[...], ca_bq_ref[...],
        ca_wk_ref[...], ca_bk_ref[...], ca_wv_ref[...], ca_bv_ref[...],
        masks, ca_off, Bb=Bb, Sp=Sp, Lp=Lp, H=H, D=D, dtype=dtype)
    x2 = _dot(ctx2.astype(dtype), ca_wout_ref[...]) \
        + ca_bout_ref[...].astype(jnp.float32)
    r2 = t1 + x2 * m_ca_resid
    ln2s = ln2s_ref[...].astype(jnp.float32)
    h, xhat2, inv2 = _ln_fwd(r2, ln2s, ln2b_ref[...].astype(jnp.float32))
    a2 = _dot(h.astype(dtype), w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    g = _act_fwd(a2, activation)
    gd = g * m1
    y = _dot(gd.astype(dtype), w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    s3 = h + y * m2
    ln3s = ln3s_ref[...].astype(jnp.float32)
    _, xhat3, inv3 = _ln_fwd(s3, ln3s, ln3b_ref[...].astype(jnp.float32))

    # ---- backward: FFN tail ----
    ds3, dsc3, dbi3 = _ln_bwd(dout, xhat3, inv3, ln3s)
    dy = ds3 * m2
    dgd = jax.lax.dot_general(dy.astype(dtype), w2_ref[...],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    da2 = dgd * m1 * _act_grad(a2, activation)
    dh_ffn = jax.lax.dot_general(da2.astype(dtype), w1_ref[...],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dh = ds3 + dh_ffn
    dr2, dsc2, dbi2 = _ln_bwd(dh, xhat2, inv2, ln2s)
    dw1 = jax.lax.dot_general(h.astype(dtype), da2.astype(dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(gd.astype(dtype), dy.astype(dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(da2, axis=0, keepdims=True)
    db2 = jnp.sum(dy, axis=0, keepdims=True)

    # ---- backward: cross-attention (upstream grad is dr2) ----
    dx2 = (dr2 * m_ca_resid).astype(dtype)
    dctx2 = _dot_t(dx2, ca_wout_ref[...])                    # [M, D] f32
    dca_wout = jax.lax.dot_general(ctx2.astype(dtype), dx2,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    dca_bout = jnp.sum(dx2.astype(jnp.float32), axis=0, keepdims=True)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) // Dh
    dq2_parts, dk2_parts, dv2_parts = [], [], []
    for smp in range(Bb):
        sl = slice(smp * Sp, (smp + 1) * Sp)
        ml = slice(smp * Lp, (smp + 1) * Lp)
        bias = jnp.where(mval[:, ml] > 0.5, 0.0, _NEG_INF)
        dqs, dks = [], []
        dv_s = jnp.zeros((Lp, D), jnp.float32)
        for hh in range(H):
            hs = slice(hh * 128, (hh + 1) * 128)
            q2h, k2h = q2[sl, hs], k2[ml, hs]
            sc = _dot_t(q2h, k2h) * scale + bias
            p = jax.nn.softmax(sc, axis=-1)
            m = masks[ca_off + smp * H + hh]
            if not isinstance(m, float):   # rate 0 -> scalar keep-mask
                m = m[:, :Lp]
            a = (p * m).astype(dtype)
            hm = (lane == hh).astype(jnp.float32)
            dctx_h = (dctx2[sl] * hm).astype(dtype)          # [Sp, D]
            da = _dot_t(dctx_h, v2[ml])                      # [Sp, Lp]
            # head h's dctx is lane-masked, so its dv contribution lands
            # only in lanes [h*Dh, (h+1)*Dh); summing over heads is exact
            dv_s = dv_s + jax.lax.dot_general(
                a, dctx_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = da * m
            dsc = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                   ).astype(dtype)
            dqs.append(_dot(dsc, k2h) * scale)
            # per-head 128-lane slots are disjoint: concatenate, no sum
            dks.append(jax.lax.dot_general(
                dsc, q2h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)  # [Lp, 128]
        dq2_parts.append(jnp.concatenate(dqs, axis=1))       # [Sp, HP]
        dk2_parts.append(jnp.concatenate(dks, axis=1))       # [Lp, HP]
        dv2_parts.append(dv_s)
    dq2 = jnp.concatenate(dq2_parts, axis=0)                 # [M, HP] f32
    dk2 = jnp.concatenate(dk2_parts, axis=0)                 # [ML, HP]
    dv2 = jnp.concatenate(dv2_parts, axis=0)                 # [ML, D]

    dca_wq = jax.lax.dot_general(t1.astype(dtype), dq2.astype(dtype),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dca_bq = jnp.sum(dq2, axis=0, keepdims=True)
    dca_wk = jax.lax.dot_general(mem, dk2.astype(dtype),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dca_bk = jnp.sum(dk2, axis=0, keepdims=True)
    dca_wv = jax.lax.dot_general(mem, dv2.astype(dtype),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dca_bv = jnp.sum(dv2, axis=0, keepdims=True)
    dmem = (_dot_t(dk2.astype(dtype), ca_wk_ref[...])
            + _dot_t(dv2.astype(dtype), ca_wv_ref[...]))
    dmem_ref[...] = dmem.astype(dmem_ref.dtype)

    dt1 = dr2 + _dot_t(dq2.astype(dtype), ca_wq_ref[...])
    dr1, dsc1, dbi1 = _ln_bwd(dt1, xhat1, inv1, ln1s)

    # ---- backward: self-attention segment (upstream grad is dr1) ----
    dattn = (dr1 * m_sa_resid).astype(dtype)
    dctx = _dot_t(dattn, sa_wout_ref[...])                   # [M, HP]
    dsa_wout = jax.lax.dot_general(ctx.astype(dtype), dattn,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    dsa_bout = jnp.sum(dattn.astype(jnp.float32), axis=0, keepdims=True)

    dqkv = _attn_bwd_core(q, k, v, dctx, kval, masks, Bb=Bb, Sp=Sp, H=H,
                          scale=scale, dtype=dtype)

    dsa_wqkv = jax.lax.dot_general(x, dqkv.astype(dtype),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    dsa_bqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dx = dr1 + _dot_t(dqkv.astype(dtype), sa_wqkv_ref[...])
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dsa_wqkv_ref, dsa_bqkv_ref, dsa_wout_ref, dsa_bout_ref,
                    dca_wq_ref, dca_bq_ref, dca_wk_ref, dca_bk_ref,
                    dca_wv_ref, dca_bv_ref, dca_wout_ref, dca_bout_ref,
                    dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dln1s_ref, dln1b_ref, dln2s_ref, dln2b_ref,
                    dln3s_ref, dln3b_ref):
            ref[...] = jnp.zeros_like(ref)

    dsa_wqkv_ref[...] += dsa_wqkv
    dsa_bqkv_ref[...] += dsa_bqkv
    dsa_wout_ref[...] += dsa_wout
    dsa_bout_ref[...] += dsa_bout
    dca_wq_ref[...] += dca_wq
    dca_bq_ref[...] += dca_bq
    dca_wk_ref[...] += dca_wk
    dca_bk_ref[...] += dca_bk
    dca_wv_ref[...] += dca_wv
    dca_bv_ref[...] += dca_bv
    dca_wout_ref[...] += dca_wout
    dca_bout_ref[...] += dca_bout
    dw1_ref[...] += dw1
    db1_ref[...] += db1
    dw2_ref[...] += dw2
    db2_ref[...] += db2
    dln1s_ref[...] += dsc1
    dln1b_ref[...] += dbi1
    dln2s_ref[...] += dsc2
    dln2b_ref[...] += dbi2
    dln3s_ref[...] += dsc3
    dln3b_ref[...] += dbi3


def _prep(x, kvalid, mem, mvalid, sa_wqkv, sa_bqkv, sa_wout,
          ca_wqkv, ca_bqkv, H, S, L, block_samples):
    """Pad/remap everything to the kernel layout."""
    M0, D = x.shape
    B = M0 // S
    Dh = D // H
    Sp = -(-S // 8) * 8
    if Sp != S:
        pad = ((0, 0), (0, Sp - S), (0, 0))
        x = jnp.pad(x.reshape(B, S, D), pad).reshape(B * Sp, D)
        kvalid = jnp.pad(kvalid.reshape(B, S, 1), pad).reshape(B * Sp, 1)
    Lp = -(-L // 8) * 8
    if Lp != L:
        mem = jnp.pad(mem, ((0, 0), (0, Lp - L), (0, 0)))
        mvalid = jnp.pad(mvalid, ((0, 0), (0, Lp - L)))
    Bb = max(1, min(block_samples, B))
    Bp = -(-B // Bb) * Bb
    if Bp != B:
        x = jnp.pad(x, ((0, (Bp - B) * Sp), (0, 0)))
        kvalid = jnp.pad(kvalid, ((0, (Bp - B) * Sp), (0, 0)))
        mem = jnp.pad(mem, ((0, Bp - B), (0, 0), (0, 0)))
        mvalid = jnp.pad(mvalid, ((0, Bp - B), (0, 0)))
    dtype = x.dtype
    mem_rows = mem.reshape(Bp * Lp, D).astype(dtype)
    mval_rows = mvalid.reshape(Bp * Lp, 1).astype(jnp.float32)
    sa_wqkv_slots = jnp.concatenate([
        pad_head_columns(sa_wqkv[:, :D], H, Dh),
        pad_head_columns(sa_wqkv[:, D:2 * D], H, Dh),
        pad_head_columns(sa_wqkv[:, 2 * D:], H, Dh),
    ], axis=1).astype(dtype)
    sa_bqkv_slots = jnp.concatenate([
        pad_head_columns(sa_bqkv[:D], H, Dh),
        pad_head_columns(sa_bqkv[D:2 * D], H, Dh),
        pad_head_columns(sa_bqkv[2 * D:], H, Dh),
    ], axis=-1).reshape(1, -1).astype(dtype)
    sa_wout_slots = pad_head_rows(sa_wout, H, Dh).astype(dtype)
    ca_wq = pad_head_columns(ca_wqkv[:, :D], H, Dh).astype(dtype)
    ca_bq = pad_head_columns(ca_bqkv[:D], H, Dh).reshape(1, -1).astype(dtype)
    ca_wk = pad_head_columns(ca_wqkv[:, D:2 * D], H, Dh).astype(dtype)
    ca_bk = pad_head_columns(ca_bqkv[D:2 * D], H, Dh
                             ).reshape(1, -1).astype(dtype)
    ca_wv = ca_wqkv[:, 2 * D:].astype(dtype)
    ca_bv = ca_bqkv[2 * D:].reshape(1, -1).astype(dtype)
    return (x, kvalid.astype(jnp.float32), mem_rows, mval_rows,
            sa_wqkv_slots, sa_bqkv_slots, sa_wout_slots,
            ca_wq, ca_bq, ca_wk, ca_bk, ca_wv, ca_bv,
            B, Bp, Bb, Sp, Lp, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19, 20, 21, 22, 23))
def train_decoder_layer(x, kvalid, mem, mvalid,
                        sa_wqkv, sa_bqkv, sa_wout, sa_bout,
                        ca_wqkv, ca_bqkv, ca_wout, ca_bout,
                        w1, b1, w2, b2, lns, seed,
                        H: int, S: int, L: int, rate: float = 0.0,
                        activation: str = "gelu", block_samples: int = 2):
    """Fused training post-norm DECODER layer.

    x: [B*S, D] frame-query rows; kvalid: [B*S, 1]; mem: [B, L, D] latent
    memory; mvalid: [B, L] memory validity.  sa_*/ca_*: torch-layout
    fused in_proj ([D, 3D]/[3D]) + out projection for the self- and
    cross-attention.  ``lns``: tuple of the six LayerNorm tensors
    (ln1s, ln1b, ln2s, ln2b, ln3s, ln3b).  ``seed`` drives the in-kernel
    dropout PRNG.  Differentiable in x, mem, and every parameter.
    """
    # the cross-attn probs-dropout masks are (Sp, 128) draws sliced to
    # the padded memory width (a draw's lane count must be tile-legal)
    assert L <= 128, f"memory length {L} > 128 unsupported with dropout"
    out, _ = _fwd(x, kvalid, mem, mvalid, sa_wqkv, sa_bqkv, sa_wout,
                  sa_bout, ca_wqkv, ca_bqkv, ca_wout, ca_bout,
                  w1, b1, w2, b2, lns, seed,
                  H, S, L, rate, activation, block_samples)
    return out


def _specs(Bb, Sp, Lp, D, F, HP):
    rows = lambda i, *_: (i, 0)
    rep = lambda i, *_: (0, 0)
    row = lambda wdt: pl.BlockSpec((Bb * Sp, wdt), rows,
                                   memory_space=pltpu.VMEM)
    mrow = lambda wdt: pl.BlockSpec((Bb * Lp, wdt), rows,
                                    memory_space=pltpu.VMEM)
    mat = lambda a, b: pl.BlockSpec((a, b), rep, memory_space=pltpu.VMEM)
    return row, mrow, mat


def _fwd(x, kvalid, mem, mvalid, sa_wqkv, sa_bqkv, sa_wout, sa_bout,
         ca_wqkv, ca_bqkv, ca_wout, ca_bout, w1, b1, w2, b2, lns, seed,
         H, S, L, rate, activation, block_samples):
    res = (x, kvalid, mem, mvalid, sa_wqkv, sa_bqkv, sa_wout, sa_bout,
           ca_wqkv, ca_bqkv, ca_wout, ca_bout, w1, b1, w2, b2, lns, seed)
    (xp, kvp, mem_rows, mval_rows, sa_wqkv_s, sa_bqkv_s, sa_wout_s,
     ca_wq, ca_bq, ca_wk, ca_bk, ca_wv, ca_bv,
     B, Bp, Bb, Sp, Lp, D) = _prep(x, kvalid, mem, mvalid, sa_wqkv,
                                   sa_bqkv, sa_wout, ca_wqkv, ca_bqkv,
                                   H, S, L, block_samples)
    F = w1.shape[1]
    HP = H * 128
    dtype = xp.dtype
    row, mrow, mat = _specs(Bb, Sp, Lp, D, F, HP)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    ln1s, ln1b, ln2s, ln2b, ln3s, ln3b = lns
    kernel = functools.partial(_fwd_kernel, Bb=Bb, Sp=Sp, Lp=Lp, H=H,
                               rate=rate, activation=activation)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // Bb,),
            in_specs=[row(D), row(1), mrow(D), mrow(1),
                      mat(D, 3 * HP), mat(1, 3 * HP), mat(HP, D), mat(1, D),
                      mat(D, HP), mat(1, HP), mat(D, HP), mat(1, HP),
                      mat(D, D), mat(1, D), mat(D, D), mat(1, D),
                      mat(D, F), mat(1, F), mat(F, D), mat(1, D),
                      mat(1, D), mat(1, D), mat(1, D), mat(1, D),
                      mat(1, D), mat(1, D)],
            out_specs=row(D),
        ),
        out_shape=jax.ShapeDtypeStruct((Bp * Sp, D), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem(max(
                16, decoder_layer_vmem_mb(S, L, D, H, F,
                                          block_samples) // 2))),
    )(seed_arr, xp, kvp, mem_rows, mval_rows,
      sa_wqkv_s, sa_bqkv_s, sa_wout_s,
      sa_bout.reshape(1, -1).astype(dtype),
      ca_wq, ca_bq, ca_wk, ca_bk, ca_wv, ca_bv,
      ca_wout.astype(dtype), ca_bout.reshape(1, -1).astype(dtype),
      w1.astype(dtype), b1.reshape(1, -1),
      w2.astype(dtype), b2.reshape(1, -1),
      ln1s.reshape(1, -1), ln1b.reshape(1, -1),
      ln2s.reshape(1, -1), ln2b.reshape(1, -1),
      ln3s.reshape(1, -1), ln3b.reshape(1, -1))
    if Sp != S or Bp != B:
        out = out.reshape(Bp, Sp, D)[:B, :S].reshape(B * S, D)
    return out, res


def _bwd(H, S, L, rate, activation, block_samples, res, dout):
    (x, kvalid, mem, mvalid, sa_wqkv, sa_bqkv, sa_wout, sa_bout,
     ca_wqkv, ca_bqkv, ca_wout, ca_bout, w1, b1, w2, b2, lns, seed) = res
    (xp, kvp, mem_rows, mval_rows, sa_wqkv_s, sa_bqkv_s, sa_wout_s,
     ca_wq, ca_bq, ca_wk, ca_bk, ca_wv, ca_bv,
     B, Bp, Bb, Sp, Lp, D) = _prep(x, kvalid, mem, mvalid, sa_wqkv,
                                   sa_bqkv, sa_wout, ca_wqkv, ca_bqkv,
                                   H, S, L, block_samples)
    F = w1.shape[1]
    HP = H * 128
    Dh = D // H
    dtype = xp.dtype
    doutp = dout.astype(dtype)
    if Sp != S or Bp != B:
        doutp = jnp.pad(doutp.reshape(B, S, D),
                        ((0, Bp - B), (0, Sp - S), (0, 0))
                        ).reshape(Bp * Sp, D)
    row, mrow, mat = _specs(Bb, Sp, Lp, D, F, HP)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    ln1s, ln1b, ln2s, ln2b, ln3s, ln3b = lns
    f32 = jnp.float32
    kernel = functools.partial(_bwd_kernel, Bb=Bb, Sp=Sp, Lp=Lp, H=H,
                               rate=rate, activation=activation)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // Bb,),
            in_specs=[row(D), row(D), row(1), mrow(D), mrow(1),
                      mat(D, 3 * HP), mat(1, 3 * HP), mat(HP, D), mat(1, D),
                      mat(D, HP), mat(1, HP), mat(D, HP), mat(1, HP),
                      mat(D, D), mat(1, D), mat(D, D), mat(1, D),
                      mat(D, F), mat(1, F), mat(F, D), mat(1, D),
                      mat(1, D), mat(1, D), mat(1, D), mat(1, D),
                      mat(1, D), mat(1, D)],
            out_specs=[row(D), mrow(D),
                       mat(D, 3 * HP), mat(1, 3 * HP), mat(HP, D), mat(1, D),
                       mat(D, HP), mat(1, HP), mat(D, HP), mat(1, HP),
                       mat(D, D), mat(1, D), mat(D, D), mat(1, D),
                       mat(D, F), mat(1, F), mat(F, D), mat(1, D),
                       mat(1, D), mat(1, D), mat(1, D), mat(1, D),
                       mat(1, D), mat(1, D)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Bp * Sp, D), dtype),
            jax.ShapeDtypeStruct((Bp * Lp, D), f32),
            jax.ShapeDtypeStruct((D, 3 * HP), f32),
            jax.ShapeDtypeStruct((1, 3 * HP), f32),
            jax.ShapeDtypeStruct((HP, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, HP), f32),
            jax.ShapeDtypeStruct((1, HP), f32),
            jax.ShapeDtypeStruct((D, HP), f32),
            jax.ShapeDtypeStruct((1, HP), f32),
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, F), f32),
            jax.ShapeDtypeStruct((1, F), f32),
            jax.ShapeDtypeStruct((F, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem(max(
                48, decoder_layer_vmem_mb(S, L, D, H, w1.shape[1],
                                          block_samples)))),
    )(seed_arr, xp, doutp, kvp, mem_rows, mval_rows,
      sa_wqkv_s, sa_bqkv_s, sa_wout_s,
      sa_bout.reshape(1, -1).astype(dtype),
      ca_wq, ca_bq, ca_wk, ca_bk, ca_wv, ca_bv,
      ca_wout.astype(dtype), ca_bout.reshape(1, -1).astype(dtype),
      w1.astype(dtype), b1.reshape(1, -1),
      w2.astype(dtype), b2.reshape(1, -1),
      ln1s.reshape(1, -1), ln1b.reshape(1, -1),
      ln2s.reshape(1, -1), ln2b.reshape(1, -1),
      ln3s.reshape(1, -1), ln3b.reshape(1, -1))
    (dx, dmem_rows, dsa_wqkv_s, dsa_bqkv_s, dsa_wout_s, dsa_bout,
     dca_wq_s, dca_bq_s, dca_wk_s, dca_bk_s, dca_wv, dca_bv,
     dca_wout, dca_bout, dw1, db1, dw2, db2,
     dl1s, dl1b, dl2s, dl2b, dl3s, dl3b) = outs
    if Sp != S or Bp != B:
        dx = dx.reshape(Bp, Sp, D)[:B, :S].reshape(B * S, D)
    dmem = dmem_rows.reshape(Bp, Lp, D)[:B, :L]
    # un-map slot-layout weight grads back to the torch layouts
    dsa_wqkv = jnp.concatenate([
        _unpad_head_columns(dsa_wqkv_s[:, :HP], H, Dh),
        _unpad_head_columns(dsa_wqkv_s[:, HP:2 * HP], H, Dh),
        _unpad_head_columns(dsa_wqkv_s[:, 2 * HP:], H, Dh),
    ], axis=1)
    dsa_bqkv = jnp.concatenate([
        _unpad_head_columns(dsa_bqkv_s[:, :HP], H, Dh),
        _unpad_head_columns(dsa_bqkv_s[:, HP:2 * HP], H, Dh),
        _unpad_head_columns(dsa_bqkv_s[:, 2 * HP:], H, Dh),
    ], axis=1).reshape(-1)
    dsa_wout = _unpad_head_rows(dsa_wout_s, H, Dh)
    dca_wqkv = jnp.concatenate([
        _unpad_head_columns(dca_wq_s, H, Dh),
        _unpad_head_columns(dca_wk_s, H, Dh),
        dca_wv,
    ], axis=1)
    dca_bqkv = jnp.concatenate([
        _unpad_head_columns(dca_bq_s, H, Dh),
        _unpad_head_columns(dca_bk_s, H, Dh),
        dca_bv,
    ], axis=1).reshape(-1)
    shp = lambda g, p: g.reshape(p.shape).astype(p.dtype)
    dlns = tuple(shp(g.reshape(-1), p) for g, p in
                 zip((dl1s, dl1b, dl2s, dl2b, dl3s, dl3b), lns))
    return (dx, jnp.zeros_like(kvalid), shp(dmem, mem),
            jnp.zeros_like(mvalid),
            shp(dsa_wqkv, sa_wqkv), shp(dsa_bqkv, sa_bqkv),
            shp(dsa_wout, sa_wout), shp(dsa_bout.reshape(-1), sa_bout),
            shp(dca_wqkv, ca_wqkv), shp(dca_bqkv, ca_bqkv),
            shp(dca_wout, ca_wout), shp(dca_bout.reshape(-1), ca_bout),
            shp(dw1, w1), shp(db1.reshape(-1), b1),
            shp(dw2, w2), shp(db2.reshape(-1), b2), dlns,
            np.zeros(jnp.shape(seed), jax.dtypes.float0))


train_decoder_layer.defvjp(_fwd, _bwd)
