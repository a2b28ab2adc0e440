"""Fully-fused MD denoiser layer: ONE pallas kernel per layer.

The denoiser's per-step cost is HBM/launch-bound: even with the FFN tails
fused (pallas_fused_ffn / pallas_postnorm_ffn / pallas_stylize), each MD
layer still round-trips activations through ~10 XLA kernels for the
self-attention segment.  This kernel runs the ENTIRE layer —

    tokens = [x ; text ; time]                       (extra rows as k/v only)
    sa:   qkv GEMM -> 4-head masked attention -> out proj -> +x
          -> LN -> relu FFN -> LN                    (post-norm tail)
    ca:   single-text-token collapse (v broadcast) -> AdaLN -> silu -> proj
    ffn:  gelu FFN -> AdaLN -> silu -> proj -> residual

— in one pallas_call blocked over SAMPLES, so activations live in VMEM
end-to-end and the per-sample AdaLN scale/shift/value tensors stay [B, D]
(no jnp.repeat materialization in HBM).

Attention trick: with T=9 latent + E=2 extra tokens per sample, a block of
``Bb`` samples is flattened to [Bb*T, D] rows and attention uses a
block-diagonal same-sample bias.  Head layout (LADIFF_MD_LAYOUT):

* ``packed`` (default) — projections stay COMPACT ([D, 3D] qkv, [D, D]
  out); 128//Dh heads share each 128-lane slot.  Per head, the other
  heads' lanes of q are zeroed before the score GEMM and the value GEMM's
  mixed slot output is lane-masked back to the head's range.  Score/value
  MXU passes match ``slots`` (K=128 per head either way — the MXU rounds
  sub-128 contractions up regardless), but the qkv/out projections shed
  the 2x slot-padding lanes entirely.  Measured A/B in PERF.md.
* ``slots`` — one 128-lane slot per head for q/k/v (weights remapped by
  pad_head_columns / pad_head_rows); the round-2 layout.
* ``masked`` — slots for q/k, lane-masked full-D value products (costs
  H× the value FLOPs; kept for A/B).

Exactly equivalent to MDTransformerLayer's XLA path (the reference
mdiff_transformer.py:265-321 semantics); verified in
tests/test_pallas_fused.py.
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
from ladiff_tpu.ops.pallas_decoder_layer import _heads_attention_packed

__all__ = ["fused_md_layer"]


def _expand_rows(per_sample, Bb, T, D):
    """[Bb, D] -> [Bb*T, D] (each sample's row repeated T times)."""
    return jnp.broadcast_to(per_sample[:, None, :], (Bb, T, D)).reshape(
        Bb * T, D)


def _kernel(x_ref, extra_ref, kvalid_ref, value_ref,
            ca_scale_ref, ca_shift_ref, ffn_scale_ref, ffn_shift_ref,
            wqkv_ref, bqkv_ref, wout_ref, bout_ref,
            ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            ln2s_ref, ln2b_ref,
            ca_lns_ref, ca_lnb_ref, wca_ref, bca_ref,
            f_w1_ref, f_b1_ref, f_w2_ref, f_b2_ref,
            f_lns_ref, f_lnb_ref, f_wp_ref, f_bp_ref,
            out_ref, *, T: int, E: int, H: int, layout: str):
    Bb = value_ref.shape[0]
    M = Bb * T           # latent rows in this block
    KE = Bb * E          # extra rows
    D = x_ref.shape[1]
    Dh = D // H
    HP = D if layout == "packed" else H * 128
    dtype = x_ref.dtype

    x = x_ref[...]

    # --- self-attention over [latents ; extras] -------------------------
    # "slots"/"masked": wqkv is pre-remapped so q/k — and, with "slots",
    # values too — live in 128-lane head slots (see pad_head_columns);
    # "masked" keeps v in the trailing D lanes.  "packed": wqkv stays
    # compact [D, 3D] — 128//Dh heads share each lane slot and per-head
    # separation happens via lane masks below.
    qkv = _dot(x, wqkv_ref[...]) + bqkv_ref[...].astype(jnp.float32)
    q_pad = qkv[:, :HP].astype(dtype)
    kx = qkv[:, HP:2 * HP]
    vx = qkv[:, 2 * HP:]
    qkv_e = _dot(extra_ref[...], wqkv_ref[...]) \
        + bqkv_ref[...].astype(jnp.float32)
    k_pad = jnp.concatenate([kx, qkv_e[:, HP:2 * HP]],
                            axis=0).astype(dtype)          # [M+KE, HP]
    v = jnp.concatenate([vx, qkv_e[:, 2 * HP:]],
                        axis=0).astype(dtype)   # [M+KE, D] or slots [.., HP]

    # block-diagonal same-sample bias + latent-row key validity
    rq = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // T
    rk = jnp.concatenate([
        jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) // T,
        jax.lax.broadcasted_iota(jnp.int32, (KE, 1), 0) // E,
    ], axis=0)                                           # [M+KE, 1]
    kval = jnp.concatenate([
        kvalid_ref[...].astype(jnp.float32),
        jnp.ones((KE, 1), jnp.float32),
    ], axis=0)
    same = (rq == rk.reshape(1, M + KE)) & (kval.reshape(1, M + KE) > 0.5)
    bias = jnp.where(same, 0.0, _NEG_INF)

    scale = 1.0 / (Dh ** 0.5)
    if layout == "packed":
        # compact layout — per-head lane-mask separation inside each
        # 128-lane slot; the shared helper carries the full rationale
        ctx = _heads_attention_packed(q_pad, k_pad, v, bias, H, Dh, dtype)
    elif layout == "slots":
        # values in head slots: each value GEMM contracts the head's own
        # 128-lane slot instead of a lane-masked full-D product (half the
        # value-side MXU passes for Dh=64); ctx stays in slot layout and
        # the out projection is pad_head_rows-remapped to [H*128, D]
        outs = []
        for h in range(H):
            qh = q_pad[:, h * 128:(h + 1) * 128]
            kh = k_pad[:, h * 128:(h + 1) * 128]
            s = _dot_t(qh, kh) * scale + bias            # [M, M+KE] f32
            w = jax.nn.softmax(s, axis=-1).astype(dtype)
            outs.append(_dot(w, v[:, h * 128:(h + 1) * 128]))
        ctx = jnp.concatenate(outs, axis=1)              # [M, HP]
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) // Dh
        ctx = jnp.zeros((M, D), jnp.float32)
        for h in range(H):
            qh = q_pad[:, h * 128:(h + 1) * 128]
            kh = k_pad[:, h * 128:(h + 1) * 128]
            s = _dot_t(qh, kh) * scale + bias            # [M, M+KE] f32
            w = jax.nn.softmax(s, axis=-1).astype(dtype)
            hm = (lane == h).astype(jnp.float32)
            ctx = ctx + _dot(w, v) * hm

    attn = _dot(ctx.astype(dtype), wout_ref[...]) \
        + bout_ref[...].astype(jnp.float32)
    resid = x.astype(jnp.float32) + attn

    # --- sa post-norm relu FFN tail --------------------------------------
    h1 = _ln(resid, ln1s_ref[...].astype(jnp.float32),
             ln1b_ref[...].astype(jnp.float32))
    y = _dot(h1.astype(dtype), w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    y = jnp.maximum(y, 0.0)
    y = _dot(y.astype(dtype), w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    x2 = _ln(h1 + y, ln2s_ref[...].astype(jnp.float32),
             ln2b_ref[...].astype(jnp.float32))

    # --- ca collapse (single text token) + stylization -------------------
    val_rows = _expand_rows(value_ref[...].astype(jnp.float32), Bb, T, D)
    yv = val_rows * kvalid_ref[...].astype(jnp.float32)
    h2 = _ln(yv, ca_lns_ref[...].astype(jnp.float32),
             ca_lnb_ref[...].astype(jnp.float32))
    h2 = h2 * (1.0 + _expand_rows(ca_scale_ref[...].astype(jnp.float32),
                                  Bb, T, D)) \
        + _expand_rows(ca_shift_ref[...].astype(jnp.float32), Bb, T, D)
    h2 = h2 * jax.nn.sigmoid(h2)
    x3 = x2 + _dot(h2.astype(dtype), wca_ref[...]) \
        + bca_ref[...].astype(jnp.float32)

    # --- stylized gelu FFN ------------------------------------------------
    y2 = _dot(x3.astype(dtype), f_w1_ref[...]) \
        + f_b1_ref[...].astype(jnp.float32)
    y2 = 0.5 * y2 * (1.0 + _erf(y2 * 0.7071067811865476))
    y2 = _dot(y2.astype(dtype), f_w2_ref[...]) \
        + f_b2_ref[...].astype(jnp.float32)
    h3 = _ln(y2, f_lns_ref[...].astype(jnp.float32),
             f_lnb_ref[...].astype(jnp.float32))
    h3 = h3 * (1.0 + _expand_rows(ffn_scale_ref[...].astype(jnp.float32),
                                  Bb, T, D)) \
        + _expand_rows(ffn_shift_ref[...].astype(jnp.float32), Bb, T, D)
    h3 = h3 * jax.nn.sigmoid(h3)
    out = x3 + _dot(h3.astype(dtype), f_wp_ref[...]) \
        + f_bp_ref[...].astype(jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype)


def _env_layout() -> str:
    import os
    layout = os.environ.get("LADIFF_MD_LAYOUT", "")
    if not layout:
        # Legacy knob from the slots-era A/B scripts: VSLOT=1 meant "value
        # in its own 128-lane slot" (now "slots"), VSLOT=0 meant "masked".
        # Honor those meanings when the var is EXPLICITLY set so old timing
        # scripts still measure what they name; default is "packed".
        vslot = os.environ.get("LADIFF_MD_VSLOT")
        if vslot is None:
            layout = "packed"
        else:
            layout = "slots" if vslot == "1" else "masked"
    return layout


def fused_md_layer(
    x: jax.Array,          # [B*T, D] latent rows
    extra: jax.Array,      # [B*E, D] text+time rows (k/v only)
    kvalid: jax.Array,     # [B*T, 1] f32 latent-row validity
    value: jax.Array,      # [B, D] collapsed ca text value
    ca_scale: jax.Array, ca_shift: jax.Array,    # [B, D] or [1, D]
    ffn_scale: jax.Array, ffn_shift: jax.Array,  # [B, D] or [1, D]
    sa: dict, ca_proj: dict, ffn: dict,
    *, T: int, E: int, H: int, block_samples: int = 32,
) -> jax.Array:
    """sa/ca_proj/ffn are param dicts (see MDTransformerLayer).

    Head layout comes from LADIFF_MD_LAYOUT (resolved here, OUTSIDE the
    jit, so switching it retraces instead of hitting a stale cache);
    LADIFF_MD_BLOCK (same trace-time rule) overrides the sample-block
    size for A/B sweeps."""
    import os
    D = x.shape[1]
    block_samples = int(os.environ.get("LADIFF_MD_BLOCK", block_samples))
    layout = _env_layout()
    if layout == "packed" and (128 % (D // H) != 0 or D % 128 != 0):
        layout = "slots"
    return _fused_md_layer(
        x, extra, kvalid, value, ca_scale, ca_shift, ffn_scale, ffn_shift,
        sa, ca_proj, ffn, T=T, E=E, H=H, block_samples=block_samples,
        layout=layout)


@functools.partial(jax.jit, static_argnames=("T", "E", "H", "block_samples",
                                             "layout"))
def _fused_md_layer(
    x, extra, kvalid, value, ca_scale, ca_shift, ffn_scale, ffn_shift,
    sa: dict, ca_proj: dict, ffn: dict,
    *, T: int, E: int, H: int, block_samples: int, layout: str,
) -> jax.Array:
    BT, D = x.shape
    B = BT // T
    F1 = sa["linear1"]["kernel"].shape[1]
    F2 = ffn["linear1"]["kernel"].shape[1]
    Bb = align_block_samples(block_samples, B, T, E)
    # pad the batch to a whole number of blocks: garbage out-of-bounds KEY
    # rows would poison valid queries through the score GEMM (NaN ignores
    # the additive mask)
    Bp = -(-B // Bb) * Bb
    if Bp != B:
        pad = Bp - B
        x = jnp.pad(x, ((0, pad * T), (0, 0)))
        extra = jnp.pad(extra, ((0, pad * E), (0, 0)))
        kvalid = jnp.pad(kvalid, ((0, pad * T), (0, 0)))
        zpad = lambda a: (a if a.shape[0] == 1
                          else jnp.pad(a, ((0, pad), (0, 0))))
        value, ca_scale, ca_shift = map(zpad, (value, ca_scale, ca_shift))
        ffn_scale, ffn_shift = map(zpad, (ffn_scale, ffn_shift))
    grid = (Bp // Bb,)
    dtype = x.dtype

    def rows_T(i):
        return (i, 0)

    def rep(i):
        return (0, 0)

    lat = pl.BlockSpec((Bb * T, D), rows_T, memory_space=pltpu.VMEM)
    ext = pl.BlockSpec((Bb * E, D), rows_T, memory_space=pltpu.VMEM)
    per_s = pl.BlockSpec((Bb, D), rows_T, memory_space=pltpu.VMEM)
    vecD = pl.BlockSpec((1, D), rep, memory_space=pltpu.VMEM)
    # scale/shift may be one shared row (sampling: all samples share the
    # step's time embedding) -> replicated block instead of per-sample
    ps_or_row = lambda a: vecD if a.shape[0] == 1 else per_s

    def w(shape):
        return pl.BlockSpec(shape, rep, memory_space=pltpu.VMEM)

    c = lambda a: a.astype(dtype)
    vec = lambda a: a.reshape(1, -1)
    # Head layout (LADIFF_MD_LAYOUT, default "packed"):
    #   packed — compact [D, 3D] qkv / [D, D] out projections; 128//Dh
    #            heads share each lane slot, separated by in-kernel lane
    #            masks (score/value MXU passes unchanged, projection
    #            slot-padding FLOPs gone).  Needs Dh | 128 and 128 | D.
    #   slots  — q/k/v remapped into one 128-lane slot per head
    #            (pad_head_columns / pad_head_rows); round-2 default.
    #   masked — slots for q/k only, lane-masked full-D value products.
    # Legacy LADIFF_MD_VSLOT, when explicitly set, keeps its original
    # meaning: 1 -> "slots", 0 -> "masked" (see _env_layout).
    from ladiff_tpu.ops.pallas_decoder_layer import (pad_head_columns,
                                                     pad_head_rows)
    Dh = D // H
    ipk = c(sa["self_attn"]["in_proj_kernel"])
    ipb = c(sa["self_attn"]["in_proj_bias"])
    if layout == "packed":
        wqkv_pad, bqkv_pad = ipk, ipb
        wout = c(sa["self_attn"]["out_proj"]["kernel"])
        HPW = 3 * D
    else:
        v_slots = layout == "slots"
        vpart_k = (pad_head_columns(ipk[:, 2 * D:], H, Dh) if v_slots
                   else ipk[:, 2 * D:])
        vpart_b = (pad_head_columns(ipb[2 * D:], H, Dh) if v_slots
                   else ipb[2 * D:])
        wqkv_pad = jnp.concatenate([
            pad_head_columns(ipk[:, :D], H, Dh),
            pad_head_columns(ipk[:, D:2 * D], H, Dh),
            vpart_k,
        ], axis=1)
        bqkv_pad = jnp.concatenate([
            pad_head_columns(ipb[:D], H, Dh),
            pad_head_columns(ipb[D:2 * D], H, Dh),
            vpart_b,
        ], axis=-1)
        wout = c(sa["self_attn"]["out_proj"]["kernel"])
        if v_slots:
            wout = pad_head_rows(wout, H, Dh)
        HPW = 2 * H * 128 + (H * 128 if v_slots else D)
    kernel = functools.partial(_kernel, T=T, E=E, H=H, layout=layout)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lat,                                  # x
            ext,                                  # extra
            pl.BlockSpec((Bb * T, 1), rows_T, memory_space=pltpu.VMEM),
            per_s, ps_or_row(ca_scale), ps_or_row(ca_shift),
            ps_or_row(ffn_scale), ps_or_row(ffn_shift),
            w((D, HPW)), w((1, HPW)),             # qkv (padded heads)
            w(wout.shape), vecD,                  # out proj (slot rows)
            vecD, vecD,                           # ln1
            w((D, F1)), w((1, F1)), w((F1, D)), vecD,  # sa ffn
            vecD, vecD,                           # ln2
            vecD, vecD,                           # ca ln
            w((D, D)), vecD,                      # ca proj
            w((D, F2)), w((1, F2)), w((F2, D)), vecD,  # stylized ffn
            vecD, vecD,                           # ffn ln
            w((D, D)), vecD,                      # ffn proj
        ],
        out_specs=lat,
        out_shape=jax.ShapeDtypeStruct((Bp * T, D), dtype),
    )(
        x, extra.astype(dtype), kvalid.astype(jnp.float32),
        c(value), c(ca_scale), c(ca_shift), c(ffn_scale), c(ffn_shift),
        wqkv_pad, vec(bqkv_pad),
        wout,
        vec(c(sa["self_attn"]["out_proj"]["bias"])),
        vec(sa["norm1"]["scale"]), vec(sa["norm1"]["bias"]),
        c(sa["linear1"]["kernel"]), vec(c(sa["linear1"]["bias"])),
        c(sa["linear2"]["kernel"]), vec(c(sa["linear2"]["bias"])),
        vec(sa["norm2"]["scale"]), vec(sa["norm2"]["bias"]),
        vec(ca_proj["norm"]["scale"]), vec(ca_proj["norm"]["bias"]),
        c(ca_proj["out_layers_2"]["kernel"]),
        vec(c(ca_proj["out_layers_2"]["bias"])),
        c(ffn["linear1"]["kernel"]), vec(c(ffn["linear1"]["bias"])),
        c(ffn["linear2"]["kernel"]), vec(c(ffn["linear2"]["bias"])),
        vec(ffn["proj_out"]["norm"]["scale"]),
        vec(ffn["proj_out"]["norm"]["bias"]),
        c(ffn["proj_out"]["out_layers_2"]["kernel"]),
        vec(c(ffn["proj_out"]["out_layers_2"]["bias"])),
    )
    return out[:BT]
