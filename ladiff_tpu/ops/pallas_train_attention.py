"""Training-mode fused self-attention segment: fwd + bwd Pallas kernels.

Companion to pallas_train_ffn.py (VERDICT r1 weakness #3 follow-through):
fuses the OTHER half of a post-norm transformer layer for training —

    qkv  = x @ Wqkv + b            # fused in-projection, torch layout
    p    = softmax(q k^T / sqrt(Dh) + key-validity bias)   (per head)
    a    = dropout(p)              # torch MHA probs dropout
    ctx  = a @ v
    attn = ctx @ Wout + bout
    out  = x + dropout(attn)       # the layer's residual dropout

as ONE forward and ONE backward pallas_call through ``jax.custom_vjp``,
blocked over samples.  Attention is computed per sample (no
block-diagonal waste), and both dropout masks regenerate in the backward
from the same counter-based seed — the only residuals are the inputs,
flash-style.

Head layout (LADIFF_TRAIN_ATTN_LAYOUT, or the ``layout`` argument):
``packed`` (default) keeps all projections compact — 128//Dh heads per
128-lane slot, separated in-kernel by lane masks on q (scores) and on
the value-GEMM output; score/value MXU passes match the slot layout
(the MXU rounds K=64 contractions up to 128 regardless) while the
fwd+bwd projection GEMMs, weight-grad GEMMs and their VMEM residency
shed the 2x slot padding, and the weight grads come out directly in the
torch layouts (no unpad step).  ``slots`` is the round-2 layout: per-head
q/k/v in 128-lane head slots (pad_head_columns / pad_head_rows remaps
outside the kernel, gradients un-mapped back).

Semantics match MultiHeadAttention + the residual dropout of the
encoder/decoder layers (ops/attention.py:137-186; reference
``torch.nn.MultiheadAttention`` + cross_attention.py:300-329): the
key-validity mask gates KEYS only, probs dropout and residual dropout
share the layer rate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ladiff_tpu.ops.pallas_common import NEG_INF as _NEG_INF, dot as _dot, \
    dot_t as _dot_t, \
    dropout_masks as _masks, train_vmem_params as _vmem
from ladiff_tpu.ops.pallas_decoder_layer import (pad_head_columns,
                                                 pad_head_rows)

__all__ = ["train_self_attention", "attn_block_default",
           "resolve_attn_layout"]


def attn_block_default(S: int, D: int, H: int) -> int:
    """Largest sample block whose BACKWARD footprint fits the VMEM scope.

    f32-conservative element model: slot weights + their f32 grad
    accumulators cost 2*(3*D*HP + HP*D), each row costs ~(3D + 6HP)
    across x/dout/dx and qkv/dqkv, plus a few [Sp, Sp] score blocks.
    Returns 2 or 1, or 0 when even one sample per block exceeds the
    budget — the caller then falls back to the XLA path (a D=512 f32
    layer's weights alone approach the scope; caught by the novae
    family's denoiser on hardware).  At the tuned production shape
    (D=256, S=206) this returns the original default of 2.
    """
    HP = H * 128
    Sp = -(-S // 8) * 8
    budget_el = 13 * 1024 * 1024 // 4
    weights_el = 2 * 4 * D * HP
    per_row = 3 * D + 6 * HP
    for bb in (2, 1):
        if weights_el + bb * Sp * per_row + 3 * Sp * Sp <= budget_el:
            return bb
    return 0


def _unpad_head_columns(w_pad, H, Dh):
    """Inverse of pad_head_columns: [..., H*128] -> [..., H*Dh]."""
    return jnp.concatenate(
        [w_pad[..., h * 128:h * 128 + Dh] for h in range(H)], axis=-1)


def _unpad_head_rows(w_pad, H, Dh):
    """Inverse of pad_head_rows: [H*128, ...] -> [H*Dh, ...]."""
    return jnp.concatenate(
        [w_pad[h * 128:h * 128 + Dh] for h in range(H)], axis=0)


def _mask_shapes(Bb, Sp, H, M, D):
    # draw order: per-(sample, head) probs masks, then the residual mask
    return [(Sp, Sp)] * (Bb * H) + [(M, D)]


def resolve_attn_layout(layout, D=None, H=None):
    """None -> env default (LADIFF_TRAIN_ATTN_LAYOUT, "packed"); falls
    back to "slots" when the packed geometry doesn't apply (Dh must
    divide 128, 128 must divide D).  Callers (ops/transformer.py) resolve
    ONCE and pass the result through ``train_self_attention``'s static
    ``layout`` argument, so the env var is read at a single point per
    trace and _fwd/_bwd can never disagree (the env is a trace-time
    static like the sibling kernels' layout knobs: flipping it takes
    effect on the next trace, e.g. a freshly built train step)."""
    if layout is None:
        import os
        layout = os.environ.get("LADIFF_TRAIN_ATTN_LAYOUT", "packed")
    if (layout == "packed" and D is not None
            and (128 % (D // H) != 0 or D % 128 != 0)):
        return "slots"
    return layout


def _attn_fwd_core(x, kval, wqkv, bqkv, masks, *, Bb, Sp, H, dtype):
    """Shared forward chain (slot layout): (q, k, v, ctx [M, HP] f32)."""
    HP = H * 128
    scale = 1.0 / ((wqkv.shape[0] // H) ** 0.5)
    qkv = _dot(x, wqkv) + bqkv.astype(jnp.float32)
    q = qkv[:, :HP].astype(dtype)
    k = qkv[:, HP:2 * HP].astype(dtype)
    v = qkv[:, 2 * HP:].astype(dtype)
    parts = []
    for s in range(Bb):
        sl = slice(s * Sp, (s + 1) * Sp)
        bias = jnp.where(kval[:, sl] > 0.5, 0.0, _NEG_INF)   # [1, Sp]
        outs = []
        for h in range(H):
            hs = slice(h * 128, (h + 1) * 128)
            sc = _dot_t(q[sl, hs], k[sl, hs]) * scale + bias
            p = jax.nn.softmax(sc, axis=-1)
            a = (p * masks[s * H + h]).astype(dtype)
            outs.append(_dot(a, v[sl, hs]))
        parts.append(jnp.concatenate(outs, axis=1))
    return q, k, v, jnp.concatenate(parts, axis=0)


def _attn_fwd_core_packed(x, kval, wqkv, bqkv, masks, *, Bb, Sp, H, dtype):
    """Packed-layout forward: wqkv compact [D, 3D], 128//Dh heads per
    128-lane slot, separated by lane masks (see pallas_md_layer's packed
    docs — identical score/value MXU passes, no projection padding).
    Returns (q, k, v [M, D] views, ctx [M, D] f32)."""
    D = wqkv.shape[0]
    Dh = D // H
    scale = 1.0 / (Dh ** 0.5)
    S_ps = 128 // Dh                      # heads per slot
    G = D // 128                          # slots
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // Dh
    qkv = _dot(x, wqkv) + bqkv.astype(jnp.float32)
    q = qkv[:, :D].astype(dtype)
    k = qkv[:, D:2 * D].astype(dtype)
    v = qkv[:, 2 * D:].astype(dtype)
    parts = []
    for s in range(Bb):
        sl = slice(s * Sp, (s + 1) * Sp)
        bias = jnp.where(kval[:, sl] > 0.5, 0.0, _NEG_INF)   # [1, Sp]
        slots = []
        for g in range(G):
            gs = slice(g * 128, (g + 1) * 128)
            acc = jnp.zeros((Sp, 128), jnp.float32)
            for j in range(S_ps):
                h = g * S_ps + j
                hm = (lane == j).astype(dtype)
                sc = _dot_t(q[sl, gs] * hm, k[sl, gs]) * scale + bias
                p = jax.nn.softmax(sc, axis=-1)
                a = (p * masks[s * H + h]).astype(dtype)
                acc = acc + _dot(a, v[sl, gs]) * hm.astype(jnp.float32)
            slots.append(acc)
        parts.append(jnp.concatenate(slots, axis=1))
    return q, k, v, jnp.concatenate(parts, axis=0)


def _attn_bwd_core(q, k, v, dctx, kval, masks, *, Bb, Sp, H, scale, dtype):
    """Backward of _attn_fwd_core's per-sample per-head attention.

    Single home for the softmax+probs-dropout VJP (like dropout_masks: a
    change here must apply to every training kernel at once or their
    backwards silently diverge — this loop is shared by the split
    attention kernel and both whole-layer kernels).  ``dctx`` [M, H*128]
    f32 is the upstream gradient at the head-slot context; ``scale`` is
    1/sqrt(Dh) (not derivable here: q/k/v are slot-padded to 128 lanes);
    returns dqkv [M, 3*H*128] f32 in slot layout.
    """
    dq_parts, dk_parts, dv_parts = [], [], []
    for s in range(Bb):
        sl = slice(s * Sp, (s + 1) * Sp)
        bias = jnp.where(kval[:, sl] > 0.5, 0.0, _NEG_INF)
        dqs, dks, dvs = [], [], []
        for h in range(H):
            hs = slice(h * 128, (h + 1) * 128)
            qh, kh, vh = q[sl, hs], k[sl, hs], v[sl, hs]
            sc = _dot_t(qh, kh) * scale + bias
            p = jax.nn.softmax(sc, axis=-1)
            m = masks[s * H + h]
            a = (p * m).astype(dtype)
            dctx_h = dctx[sl, hs].astype(dtype)
            da = _dot_t(dctx_h, vh)                          # [Sp, Sp]
            dvs.append(jax.lax.dot_general(
                a, dctx_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dp = da * m
            ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                  ).astype(dtype)
            dqs.append(_dot(ds, kh) * scale)
            dks.append(jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        dq_parts.append(jnp.concatenate(dqs, axis=1))
        dk_parts.append(jnp.concatenate(dks, axis=1))
        dv_parts.append(jnp.concatenate(dvs, axis=1))
    return jnp.concatenate([
        jnp.concatenate(dq_parts, axis=0),
        jnp.concatenate(dk_parts, axis=0),
        jnp.concatenate(dv_parts, axis=0),
    ], axis=1)                                               # [M, 3HP] f32


def _attn_bwd_core_packed(q, k, v, dctx, kval, masks, *, Bb, Sp, H, scale,
                          Dh, dtype):
    """Backward of _attn_fwd_core_packed.  ``dctx`` [M, D] f32 compact;
    returns dqkv [M, 3D] f32 compact.  Per head the fwd used masked-q
    scores and lane-masked value accumulation, so: dq gets the head mask
    re-applied (q entered masked), dk/dv inherit lane confinement from
    the masked operands — each head's gradients land exactly in its own
    Dh lanes, summing across a slot's heads into disjoint ranges."""
    S_ps = 128 // Dh
    G = (H * Dh) // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // Dh
    dq_parts, dk_parts, dv_parts = [], [], []
    for s in range(Bb):
        sl = slice(s * Sp, (s + 1) * Sp)
        bias = jnp.where(kval[:, sl] > 0.5, 0.0, _NEG_INF)
        dq_slots, dk_slots, dv_slots = [], [], []
        for g in range(G):
            gs = slice(g * 128, (g + 1) * 128)
            qg, kg, vg = q[sl, gs], k[sl, gs], v[sl, gs]
            dqg = jnp.zeros((Sp, 128), jnp.float32)
            dkg = jnp.zeros((Sp, 128), jnp.float32)
            dvg = jnp.zeros((Sp, 128), jnp.float32)
            for j in range(S_ps):
                h = g * S_ps + j
                hm = (lane == j).astype(dtype)
                qm = qg * hm
                sc = _dot_t(qm, kg) * scale + bias
                p = jax.nn.softmax(sc, axis=-1)
                m = masks[s * H + h]
                a = (p * m).astype(dtype)
                dctx_h = (dctx[sl, gs] * hm.astype(jnp.float32)
                          ).astype(dtype)
                da = _dot_t(dctx_h, vg)                      # [Sp, Sp]
                dvg = dvg + jax.lax.dot_general(
                    a, dctx_h, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dp = da * m
                ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                      ).astype(dtype)
                dqg = dqg + (_dot(ds, kg) * scale
                             ) * hm.astype(jnp.float32)
                dkg = dkg + jax.lax.dot_general(
                    ds, qm, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            dq_slots.append(dqg)
            dk_slots.append(dkg)
            dv_slots.append(dvg)
        dq_parts.append(jnp.concatenate(dq_slots, axis=1))
        dk_parts.append(jnp.concatenate(dk_slots, axis=1))
        dv_parts.append(jnp.concatenate(dv_slots, axis=1))
    return jnp.concatenate([
        jnp.concatenate(dq_parts, axis=0),
        jnp.concatenate(dk_parts, axis=0),
        jnp.concatenate(dv_parts, axis=0),
    ], axis=1)                                               # [M, 3D] f32


def _fwd_kernel(seed_ref, x_ref, kvalid_ref, wqkv_ref, bqkv_ref,
                wout_ref, bout_ref, out_ref, *, Bb: int, Sp: int, H: int,
                rate: float, layout: str):
    M = Bb * Sp
    D = x_ref.shape[1]
    dtype = x_ref.dtype
    x = x_ref[...]
    kval = kvalid_ref[...].astype(jnp.float32).reshape(1, M)
    masks = _masks(seed_ref, rate, _mask_shapes(Bb, Sp, H, M, D))
    core = (_attn_fwd_core_packed if layout == "packed"
            else _attn_fwd_core)
    _, _, _, ctx = core(x, kval, wqkv_ref[...], bqkv_ref[...],
                        masks, Bb=Bb, Sp=Sp, H=H, dtype=dtype)
    attn = _dot(ctx.astype(dtype), wout_ref[...]) \
        + bout_ref[...].astype(jnp.float32)
    out = x.astype(jnp.float32) + attn * masks[-1]
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, dout_ref, kvalid_ref, wqkv_ref, bqkv_ref,
                wout_ref, bout_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
                *, Bb: int, Sp: int, H: int, rate: float, layout: str):
    M = Bb * Sp
    D = x_ref.shape[1]
    dtype = x_ref.dtype
    Dh = D // H
    scale = 1.0 / (Dh ** 0.5)
    x = x_ref[...]
    dout = dout_ref[...].astype(jnp.float32)
    kval = kvalid_ref[...].astype(jnp.float32).reshape(1, M)

    # recompute the forward chain with identical mask draws
    masks = _masks(seed_ref, rate, _mask_shapes(Bb, Sp, H, M, D))
    fwd_core = (_attn_fwd_core_packed if layout == "packed"
                else _attn_fwd_core)
    q, k, v, ctx = fwd_core(x, kval, wqkv_ref[...], bqkv_ref[...],
                            masks, Bb=Bb, Sp=Sp, H=H, dtype=dtype)

    # backward through residual + out projection
    dattn = (dout * masks[-1]).astype(dtype)
    dctx = _dot_t(dattn, wout_ref[...])                      # [M, HP]
    dwout = jax.lax.dot_general(ctx.astype(dtype), dattn,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbout = jnp.sum(dattn.astype(jnp.float32), axis=0, keepdims=True)

    # backward through per-sample per-head attention (shared core)
    if layout == "packed":
        dqkv = _attn_bwd_core_packed(q, k, v, dctx, kval, masks, Bb=Bb,
                                     Sp=Sp, H=H, scale=scale, Dh=Dh,
                                     dtype=dtype)
    else:
        dqkv = _attn_bwd_core(q, k, v, dctx, kval, masks, Bb=Bb, Sp=Sp,
                              H=H, scale=scale, dtype=dtype)

    dwqkv = jax.lax.dot_general(x, dqkv.astype(dtype),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dx = dout + _dot_t(dqkv.astype(dtype), wqkv_ref[...])
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    dwqkv_ref[...] += dwqkv
    dbqkv_ref[...] += dbqkv
    dwout_ref[...] += dwout
    dbout_ref[...] += dbout


def _prep(x, kvalid, wqkv, bqkv, wout, bout, H, S, block_samples, layout):
    """Pad/remap everything to the kernel layout; returns the padded
    operands plus the geometry tuple."""
    M0, D = x.shape
    B = M0 // S
    Dh = D // H
    Sp = -(-S // 8) * 8
    if Sp != S:
        pad = ((0, 0), (0, Sp - S), (0, 0))
        x = jnp.pad(x.reshape(B, S, D), pad).reshape(B * Sp, D)
        kvalid = jnp.pad(kvalid.reshape(B, S, 1),
                         pad).reshape(B * Sp, 1)
    Bb = max(1, min(block_samples, B))
    Bp = -(-B // Bb) * Bb
    if Bp != B:
        x = jnp.pad(x, ((0, (Bp - B) * Sp), (0, 0)))
        kvalid = jnp.pad(kvalid, ((0, (Bp - B) * Sp), (0, 0)))
    dtype = x.dtype
    if layout == "packed":
        # compact weights straight through; heads separated in-kernel
        wqkv_slots = wqkv.astype(dtype)
        bqkv_slots = bqkv.reshape(1, -1).astype(dtype)
        wout_slots = wout.astype(dtype)
    else:
        wqkv_slots = jnp.concatenate([
            pad_head_columns(wqkv[:, :D], H, Dh),
            pad_head_columns(wqkv[:, D:2 * D], H, Dh),
            pad_head_columns(wqkv[:, 2 * D:], H, Dh),
        ], axis=1).astype(dtype)
        bqkv_slots = jnp.concatenate([
            pad_head_columns(bqkv[:D], H, Dh),
            pad_head_columns(bqkv[D:2 * D], H, Dh),
            pad_head_columns(bqkv[2 * D:], H, Dh),
        ], axis=-1).reshape(1, -1).astype(dtype)
        wout_slots = pad_head_rows(wout, H, Dh).astype(dtype)
    return (x, kvalid, wqkv_slots, bqkv_slots, wout_slots,
            bout.reshape(1, -1).astype(dtype), B, Bp, Bb, Sp, D)


def train_self_attention(x, kvalid, wqkv, bqkv, wout, bout, seed,
                         H: int, S: int, rate: float = 0.0,
                         block_samples: int = 2, layout: str = None):
    """Fused training self-attention + residual dropout.

    x: [B*S, D] rows; kvalid: [B*S, 1] f32 key validity; wqkv/bqkv: torch
    in_proj layout ([D, 3D] / [3D]); wout/bout: out projection.  ``seed``
    drives the in-kernel dropout PRNG (int32 scalar).  Differentiable in
    x and all four parameter tensors.  ``layout``: "packed" (compact
    projections, default via LADIFF_TRAIN_ATTN_LAYOUT) or "slots"
    (128-lane slot per head, the round-2 layout).

    The env default is resolved HERE, once, before the custom_vjp call —
    never inside _fwd/_bwd, whose traces can happen at different times (an
    env flip between them would make the backward unpack dwqkv_s with the
    wrong HP and silently corrupt weight gradients).
    """
    layout = resolve_attn_layout(layout, x.shape[1], H)
    return _attention_vjp(x, kvalid, wqkv, bqkv, wout, bout, seed, H, S,
                          rate, block_samples, layout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _attention_vjp(x, kvalid, wqkv, bqkv, wout, bout, seed,
                   H, S, rate, block_samples, layout):
    out, _ = _fwd(x, kvalid, wqkv, bqkv, wout, bout, seed, H, S, rate,
                  block_samples, layout)
    return out


def _fwd(x, kvalid, wqkv, bqkv, wout, bout, seed, H, S, rate,
         block_samples, layout):
    assert layout in ("packed", "slots"), layout
    res = (x, kvalid, wqkv, bqkv, wout, bout, seed)
    (xp, kvp, wqkv_s, bqkv_s, wout_s, bout_r,
     B, Bp, Bb, Sp, D) = _prep(x, kvalid, wqkv, bqkv, wout, bout, H, S,
                               block_samples, layout)
    HP = D if layout == "packed" else H * 128
    rows = lambda i, *_: (i, 0)
    rep = lambda i, *_: (0, 0)
    row = lambda w: pl.BlockSpec((Bb * Sp, w), rows,
                                 memory_space=pltpu.VMEM)
    mat = lambda a, b: pl.BlockSpec((a, b), rep, memory_space=pltpu.VMEM)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    kernel = functools.partial(_fwd_kernel, Bb=Bb, Sp=Sp, H=H, rate=rate,
                               layout=layout)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // Bb,),
            in_specs=[row(D), row(1), mat(D, 3 * HP), mat(1, 3 * HP),
                      mat(HP, D), mat(1, D)],
            out_specs=row(D),
        ),
        out_shape=jax.ShapeDtypeStruct((Bp * Sp, D), x.dtype),
    )(seed_arr, xp, kvp, wqkv_s, bqkv_s, wout_s, bout_r)
    if Sp != S or Bp != B:
        out = out.reshape(Bp, Sp, D)[:B, :S].reshape(B * S, D)
    return out, res


def _bwd(H, S, rate, block_samples, layout, res, dout):
    assert layout in ("packed", "slots"), layout  # resolved by the wrapper
    x, kvalid, wqkv, bqkv, wout, bout, seed = res
    (xp, kvp, wqkv_s, bqkv_s, wout_s, bout_r,
     B, Bp, Bb, Sp, D) = _prep(x, kvalid, wqkv, bqkv, wout, bout, H, S,
                               block_samples, layout)
    HP = D if layout == "packed" else H * 128
    Dh = D // H
    doutp = dout.astype(x.dtype)
    if Sp != S or Bp != B:
        doutp = jnp.pad(doutp.reshape(B, S, D),
                        ((0, Bp - B), (0, Sp - S), (0, 0))
                        ).reshape(Bp * Sp, D)
    rows = lambda i, *_: (i, 0)
    rep = lambda i, *_: (0, 0)
    row = lambda w: pl.BlockSpec((Bb * Sp, w), rows,
                                 memory_space=pltpu.VMEM)
    mat = lambda a, b: pl.BlockSpec((a, b), rep, memory_space=pltpu.VMEM)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    f32 = jnp.float32
    kernel = functools.partial(_bwd_kernel, Bb=Bb, Sp=Sp, H=H, rate=rate,
                               layout=layout)
    dx, dwqkv_s, dbqkv_s, dwout_s, dbout = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bp // Bb,),
            in_specs=[row(D), row(D), row(1), mat(D, 3 * HP),
                      mat(1, 3 * HP), mat(HP, D), mat(1, D)],
            out_specs=[row(D), mat(D, 3 * HP), mat(1, 3 * HP),
                       mat(HP, D), mat(1, D)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Bp * Sp, D), x.dtype),
            jax.ShapeDtypeStruct((D, 3 * HP), f32),
            jax.ShapeDtypeStruct((1, 3 * HP), f32),
            jax.ShapeDtypeStruct((HP, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem()),
    )(seed_arr, xp, doutp, kvp, wqkv_s, bqkv_s, wout_s, bout_r)
    if Sp != S or Bp != B:
        dx = dx.reshape(Bp, Sp, D)[:B, :S].reshape(B * S, D)
    if layout == "packed":
        # compact layout: grads already in the torch shapes
        dwqkv, dbqkv, dwout = dwqkv_s, dbqkv_s.reshape(-1), dwout_s
    else:
        # un-map the slot-layout weight grads back to the torch layouts
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
    import numpy as np
    shp = lambda g, p: g.reshape(p.shape).astype(p.dtype)
    return (dx, jnp.zeros_like(kvalid), shp(dwqkv, wqkv),
            shp(dbqkv, bqkv), shp(dwout, wout),
            shp(dbout.reshape(-1), bout),
            np.zeros(jnp.shape(seed), jax.dtypes.float0))


_attention_vjp.defvjp(_fwd, _bwd)
