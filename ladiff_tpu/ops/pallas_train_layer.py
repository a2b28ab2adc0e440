"""Whole-layer training kernel: self-attention + FFN tail in ONE call.

PERF.md roadmap item: the split training path runs a post-norm encoder
layer as TWO custom_vjp Pallas segments (pallas_train_attention.py then
pallas_train_ffn.py), which costs an extra HBM round trip of the
intermediate residual ``r = x + dropout(attn)`` in the forward (written
by the attention kernel, re-read by the tail kernel) and stores ``r`` as
the tail's residual for the backward.  This module fuses the ENTIRE
post-norm encoder layer for training —

    qkv  = x @ Wqkv + b                # fused in-projection, torch layout
    p    = softmax(q k^T / sqrt(Dh) + key-validity bias)   (per head)
    a    = dropout(p)                  # torch MHA probs dropout
    attn = (a @ v) @ Wout + bout
    r    = x + dropout(attn)           # residual dropout
    h    = LN1(r)
    g    = dropout(act(h @ W1 + b1))   # FFN with two dropouts
    out  = LN2(h + dropout(g @ W2 + b2))

— as ONE forward and ONE backward pallas_call through ``jax.custom_vjp``,
blocked over samples.  The only residuals are the layer INPUTS: the
backward re-derives the whole chain from x (flash-style remat) and
regenerates all four dropout mask groups from the same counter-based
seed.  Per-head q/k/v live in 128-lane head slots with per-sample
attention blocks (the "slots" layout of pallas_train_attention.py;
slot-layout weight gradients are un-mapped outside the kernel).  This
opt-in whole-layer kernel stays pinned to "slots" — it was measured a
wash vs the split kernels (PERF.md) and is not on the default path, so
it did not get the round-3 packed-layout treatment.

Semantics match TransformerEncoderLayer's post-norm XLA path site-for-
site (ops/transformer.py; reference cross_attention.py:264-329).  Mask
draw order: per-(sample, head) probs masks, residual mask, FFN act mask,
FFN out mask — fwd and bwd draw the identical list.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ladiff_tpu.ops.pallas_common import dot as _dot, dot_t as _dot_t, \
    dropout_masks as _masks, train_vmem_params as _vmem
from ladiff_tpu.ops.pallas_train_attention import (_attn_bwd_core,
                                                   _attn_fwd_core, _prep,
                                                   _unpad_head_columns,
                                                   _unpad_head_rows)
from ladiff_tpu.ops.pallas_train_ffn import (_act_fwd, _act_grad, _ln_bwd,
                                             _ln_fwd)

__all__ = ["train_encoder_layer", "encoder_layer_vmem_mb"]


def encoder_layer_vmem_mb(S: int, D: int, H: int, F: int,
                          block_samples: int = 2) -> int:
    """Conservative scoped-VMEM estimate (MB) for the backward kernel.

    Element model: slot weights + f32 grad accumulators
    2*(4*D*HP + 2*D*F), row tensors Bb*Sp*(3D + 6HP + 3F), 1.3x margin.
    Used as the kernel's vmem_limit default (env can only raise) and as
    an engagement cap — callers should fall back to XLA beyond ~96MB.
    """
    HP = H * 128
    Sp = -(-S // 8) * 8
    Bb = max(1, block_samples)
    el = (2 * (4 * D * HP + 2 * D * F)
          + Bb * Sp * (3 * D + 6 * HP + 3 * F) + 3 * Sp * Sp)
    return int(el * 4 * 1.3 / (1024 * 1024)) + 1


def _mask_shapes(Bb, Sp, H, M, D, F):
    # draw order: per-(sample, head) probs, residual, FFN act, FFN out
    return [(Sp, Sp)] * (Bb * H) + [(M, D)] + [(M, F)] + [(M, D)]


def _fwd_kernel(seed_ref, x_ref, kvalid_ref, wqkv_ref, bqkv_ref,
                wout_ref, bout_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, out_ref,
                *, Bb: int, Sp: int, H: int, rate: float, activation: str):
    M = Bb * Sp
    D = x_ref.shape[1]
    F = w1_ref.shape[1]
    dtype = x_ref.dtype
    x = x_ref[...]
    kval = kvalid_ref[...].astype(jnp.float32).reshape(1, M)
    masks = _masks(seed_ref, rate, _mask_shapes(Bb, Sp, H, M, D, F))
    m_resid, m1, m2 = masks[-3], masks[-2], masks[-1]

    # attention segment
    _, _, _, ctx = _attn_fwd_core(x, kval, wqkv_ref[...], bqkv_ref[...],
                                  masks, Bb=Bb, Sp=Sp, H=H, dtype=dtype)
    attn = _dot(ctx.astype(dtype), wout_ref[...]) \
        + bout_ref[...].astype(jnp.float32)
    r = x.astype(jnp.float32) + attn * m_resid

    # FFN tail
    h, _, _ = _ln_fwd(r, ln1s_ref[...].astype(jnp.float32),
                      ln1b_ref[...].astype(jnp.float32))
    a2 = _dot(h.astype(dtype), w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    gd = _act_fwd(a2, activation) * m1
    y = _dot(gd.astype(dtype), w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    out, _, _ = _ln_fwd(h + y * m2, ln2s_ref[...].astype(jnp.float32),
                        ln2b_ref[...].astype(jnp.float32))
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, dout_ref, kvalid_ref, wqkv_ref, bqkv_ref,
                wout_ref, bout_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref,
                dln1s_ref, dln1b_ref, dln2s_ref, dln2b_ref,
                *, Bb: int, Sp: int, H: int, rate: float, activation: str):
    M = Bb * Sp
    D = x_ref.shape[1]
    F = w1_ref.shape[1]
    HP = H * 128
    dtype = x_ref.dtype
    scale = 1.0 / ((D // H) ** 0.5)
    x = x_ref[...]
    dout = dout_ref[...].astype(jnp.float32)
    kval = kvalid_ref[...].astype(jnp.float32).reshape(1, M)

    # recompute the forward chain with identical mask draws
    masks = _masks(seed_ref, rate, _mask_shapes(Bb, Sp, H, M, D, F))
    m_resid, m1, m2 = masks[-3], masks[-2], masks[-1]
    q, k, v, ctx = _attn_fwd_core(x, kval, wqkv_ref[...], bqkv_ref[...],
                                  masks, Bb=Bb, Sp=Sp, H=H, dtype=dtype)
    attn = _dot(ctx.astype(dtype), wout_ref[...]) \
        + bout_ref[...].astype(jnp.float32)
    r = x.astype(jnp.float32) + attn * m_resid
    ln1s = ln1s_ref[...].astype(jnp.float32)
    h, xhat1, inv1 = _ln_fwd(r, ln1s, ln1b_ref[...].astype(jnp.float32))
    a2 = _dot(h.astype(dtype), w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    g = _act_fwd(a2, activation)
    gd = g * m1
    y = _dot(gd.astype(dtype), w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    s = h + y * m2
    ln2s = ln2s_ref[...].astype(jnp.float32)
    _, xhat2, inv2 = _ln_fwd(s, ln2s, ln2b_ref[...].astype(jnp.float32))

    # --- backward: FFN tail (mirror of pallas_train_ffn._bwd_kernel) ----
    ds, dsc2, dbi2 = _ln_bwd(dout, xhat2, inv2, ln2s)
    dy = ds * m2
    dgd = jax.lax.dot_general(dy.astype(dtype), w2_ref[...],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    da2 = dgd * m1 * _act_grad(a2, activation)
    dh_ffn = jax.lax.dot_general(da2.astype(dtype), w1_ref[...],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dh = ds + dh_ffn
    dr, dsc1, dbi1 = _ln_bwd(dh, xhat1, inv1, ln1s)
    dw1 = jax.lax.dot_general(h.astype(dtype), da2.astype(dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(gd.astype(dtype), dy.astype(dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(da2, axis=0, keepdims=True)
    db2 = jnp.sum(dy, axis=0, keepdims=True)

    # --- backward: attention segment (upstream grad is dr) --------------
    dattn = (dr * m_resid).astype(dtype)
    dctx = _dot_t(dattn, wout_ref[...])                      # [M, HP]
    dwout = jax.lax.dot_general(ctx.astype(dtype), dattn,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbout = jnp.sum(dattn.astype(jnp.float32), axis=0, keepdims=True)

    dqkv = _attn_bwd_core(q, k, v, dctx, kval, masks, Bb=Bb, Sp=Sp, H=H,
                          scale=scale, dtype=dtype)

    dwqkv = jax.lax.dot_general(x, dqkv.astype(dtype),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dx = dr + _dot_t(dqkv.astype(dtype), wqkv_ref[...])
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
                    dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dln1s_ref, dln1b_ref, dln2s_ref, dln2b_ref):
            ref[...] = jnp.zeros_like(ref)

    dwqkv_ref[...] += dwqkv
    dbqkv_ref[...] += dbqkv
    dwout_ref[...] += dwout
    dbout_ref[...] += dbout
    dw1_ref[...] += dw1
    db1_ref[...] += db1
    dw2_ref[...] += dw2
    db2_ref[...] += db2
    dln1s_ref[...] += dsc1
    dln1b_ref[...] += dbi1
    dln2s_ref[...] += dsc2
    dln2b_ref[...] += dbi2


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19))
def train_encoder_layer(x, kvalid, wqkv, bqkv, wout, bout,
                        w1, b1, w2, b2, ln1s, ln1b, ln2s, ln2b, seed,
                        H: int, S: int, rate: float = 0.0,
                        activation: str = "gelu", block_samples: int = 2):
    """Fused training post-norm encoder layer (attention + FFN tail).

    x: [B*S, D] rows; kvalid: [B*S, 1] f32 key validity; wqkv/bqkv: torch
    in_proj layout ([D, 3D] / [3D]); wout/bout: out projection; w1/b1/
    w2/b2: FFN; ln1*/ln2*: the two post-norm LayerNorms.  ``seed`` drives
    the in-kernel dropout PRNG (int32 scalar).  Differentiable in x and
    all parameter tensors.
    """
    out, _ = _fwd(x, kvalid, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
                  ln1s, ln1b, ln2s, ln2b, seed, H, S, rate, activation,
                  block_samples)
    return out


def _fwd(x, kvalid, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
         ln1s, ln1b, ln2s, ln2b, seed, H, S, rate, activation,
         block_samples):
    res = (x, kvalid, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
           ln1s, ln1b, ln2s, ln2b, seed)
    (xp, kvp, wqkv_s, bqkv_s, wout_s, bout_r,
     B, Bp, Bb, Sp, D) = _prep(x, kvalid, wqkv, bqkv, wout, bout, H, S,
                               block_samples, "slots")
    F = w1.shape[1]
    HP = H * 128
    dtype = xp.dtype
    rows = lambda i, *_: (i, 0)
    rep = lambda i, *_: (0, 0)
    row = lambda wdt: pl.BlockSpec((Bb * Sp, wdt), rows,
                                   memory_space=pltpu.VMEM)
    mat = lambda a, b: pl.BlockSpec((a, b), rep, memory_space=pltpu.VMEM)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    kernel = functools.partial(_fwd_kernel, Bb=Bb, Sp=Sp, H=H, rate=rate,
                               activation=activation)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // Bb,),
            in_specs=[row(D), row(1), mat(D, 3 * HP), mat(1, 3 * HP),
                      mat(HP, D), mat(1, D), mat(D, F), mat(1, F),
                      mat(F, D), mat(1, D),
                      mat(1, D), mat(1, D), mat(1, D), mat(1, D)],
            out_specs=row(D),
        ),
        out_shape=jax.ShapeDtypeStruct((Bp * Sp, D), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem(max(
                16, encoder_layer_vmem_mb(S, D, H, F, block_samples) // 2))),
    )(seed_arr, xp, kvp, wqkv_s, bqkv_s, wout_s, bout_r,
      w1.astype(dtype), b1.reshape(1, -1),
      w2.astype(dtype), b2.reshape(1, -1),
      ln1s.reshape(1, -1), ln1b.reshape(1, -1),
      ln2s.reshape(1, -1), ln2b.reshape(1, -1))
    if Sp != S or Bp != B:
        out = out.reshape(Bp, Sp, D)[:B, :S].reshape(B * S, D)
    return out, res


def _bwd(H, S, rate, activation, block_samples, res, dout):
    (x, kvalid, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
     ln1s, ln1b, ln2s, ln2b, seed) = res
    (xp, kvp, wqkv_s, bqkv_s, wout_s, bout_r,
     B, Bp, Bb, Sp, D) = _prep(x, kvalid, wqkv, bqkv, wout, bout, H, S,
                               block_samples, "slots")
    F = w1.shape[1]
    HP = H * 128
    Dh = D // H
    dtype = xp.dtype
    doutp = dout.astype(dtype)
    if Sp != S or Bp != B:
        doutp = jnp.pad(doutp.reshape(B, S, D),
                        ((0, Bp - B), (0, Sp - S), (0, 0))
                        ).reshape(Bp * Sp, D)
    rows = lambda i, *_: (i, 0)
    rep = lambda i, *_: (0, 0)
    row = lambda wdt: pl.BlockSpec((Bb * Sp, wdt), rows,
                                   memory_space=pltpu.VMEM)
    mat = lambda a, b: pl.BlockSpec((a, b), rep, memory_space=pltpu.VMEM)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    f32 = jnp.float32
    kernel = functools.partial(_bwd_kernel, Bb=Bb, Sp=Sp, H=H, rate=rate,
                               activation=activation)
    (dx, dwqkv_s, dbqkv_s, dwout_s, dbout,
     dw1, db1, dw2, db2, dl1s, dl1b, dl2s, dl2b) = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // Bb,),
            in_specs=[row(D), row(D), row(1), mat(D, 3 * HP),
                      mat(1, 3 * HP), mat(HP, D), mat(1, D),
                      mat(D, F), mat(1, F), mat(F, D), mat(1, D),
                      mat(1, D), mat(1, D), mat(1, D), mat(1, D)],
            out_specs=[row(D), mat(D, 3 * HP), mat(1, 3 * HP),
                       mat(HP, D), mat(1, D), mat(D, F), mat(1, F),
                       mat(F, D), mat(1, D),
                       mat(1, D), mat(1, D), mat(1, D), mat(1, D)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Bp * Sp, D), dtype),
            jax.ShapeDtypeStruct((D, 3 * HP), f32),
            jax.ShapeDtypeStruct((1, 3 * HP), f32),
            jax.ShapeDtypeStruct((HP, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, F), f32),
            jax.ShapeDtypeStruct((1, F), f32),
            jax.ShapeDtypeStruct((F, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        # the Bb=2 bwd at production shapes needs 16.2M scoped VMEM —
        # marginally over the 16M default; raising the scope only here is
        # safe (fwd/bwd mask agreement depends on block GEOMETRY, not on
        # the VMEM budget)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem(max(
                24, encoder_layer_vmem_mb(S, D, H, w1.shape[1],
                                          block_samples)))),
    )(seed_arr, xp, doutp, kvp, wqkv_s, bqkv_s, wout_s, bout_r,
      w1.astype(dtype), b1.reshape(1, -1),
      w2.astype(dtype), b2.reshape(1, -1),
      ln1s.reshape(1, -1), ln1b.reshape(1, -1),
      ln2s.reshape(1, -1), ln2b.reshape(1, -1))
    if Sp != S or Bp != B:
        dx = dx.reshape(Bp, Sp, D)[:B, :S].reshape(B * S, D)
    # un-map the slot-layout attention weight grads back to torch layouts
    dwqkv = jnp.concatenate([
        _unpad_head_columns(dwqkv_s[:, :HP], H, Dh),
        _unpad_head_columns(dwqkv_s[:, HP:2 * HP], H, Dh),
        _unpad_head_columns(dwqkv_s[:, 2 * HP:], H, Dh),
    ], axis=1)
    dbqkv = jnp.concatenate([
        _unpad_head_columns(dbqkv_s[:, :HP], H, Dh),
        _unpad_head_columns(dbqkv_s[:, HP:2 * HP], H, Dh),
        _unpad_head_columns(dbqkv_s[:, 2 * HP:], H, Dh),
    ], axis=1).reshape(-1)
    dwout = _unpad_head_rows(dwout_s, H, Dh)
    shp = lambda g, p: g.reshape(p.shape).astype(p.dtype)
    return (dx, jnp.zeros_like(kvalid), shp(dwqkv, wqkv),
            shp(dbqkv, bqkv), shp(dwout, wout),
            shp(dbout.reshape(-1), bout),
            shp(dw1, w1), shp(db1.reshape(-1), b1),
            shp(dw2, w2), shp(db2.reshape(-1), b2),
            shp(dl1s.reshape(-1), ln1s), shp(dl1b.reshape(-1), ln1b),
            shp(dl2s.reshape(-1), ln2s), shp(dl2b.reshape(-1), ln2b),
            np.zeros(jnp.shape(seed), jax.dtypes.float0))


train_encoder_layer.defvjp(_fwd, _bwd)
