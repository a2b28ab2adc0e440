"""Fused CLIP-layer Pallas kernels (ops/pallas_clip_layer.py): correctness
vs the plain XLA path, in interpret mode on CPU (the real-hardware route is
exercised by bench/TPU runs, where CLIPTextLayer dispatches here)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from ladiff_tpu.models.clip_text import CLIPTextLayer
from ladiff_tpu.ops import pallas_common


def _interp(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def _ln_np(x, s, b):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-5) * s + b


def test_fused_ln_qkv_matches_plain(monkeypatch):
    from ladiff_tpu.ops.pallas_clip_layer import fused_ln_qkv

    _interp(monkeypatch)
    rng = np.random.RandomState(0)
    M, D = 24, 128
    x = rng.randn(M, D).astype(np.float32)
    ws = [rng.randn(D, D).astype(np.float32) * 0.05 for _ in range(3)]
    bs = [rng.randn(D).astype(np.float32) * 0.1 for _ in range(3)]
    lns = rng.randn(D).astype(np.float32) * 0.2 + 1.0
    lnb = rng.randn(D).astype(np.float32) * 0.1
    scale = 0.176776
    q, k, v = fused_ln_qkv(jnp.asarray(x), ws[0], bs[0], ws[1], bs[1],
                           ws[2], bs[2], lns, lnb, scale=scale)
    y = _ln_np(x, lns, lnb)
    np.testing.assert_allclose(np.asarray(q), (y @ ws[0] + bs[0]) * scale,
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(k), y @ ws[1] + bs[1],
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v), y @ ws[2] + bs[2],
                               atol=2e-5, rtol=1e-5)


def test_fused_proj_mlp_matches_plain(monkeypatch):
    from ladiff_tpu.ops.pallas_clip_layer import fused_proj_mlp

    _interp(monkeypatch)
    rng = np.random.RandomState(1)
    M, D, F = 16, 128, 512
    att = rng.randn(M, D).astype(np.float32)
    x = rng.randn(M, D).astype(np.float32)
    wo = rng.randn(D, D).astype(np.float32) * 0.05
    bo = rng.randn(D).astype(np.float32) * 0.1
    w1 = rng.randn(D, F).astype(np.float32) * 0.05
    b1 = rng.randn(F).astype(np.float32) * 0.1
    w2 = rng.randn(F, D).astype(np.float32) * 0.05
    b2 = rng.randn(D).astype(np.float32) * 0.1
    lns = rng.randn(D).astype(np.float32) * 0.2 + 1.0
    lnb = rng.randn(D).astype(np.float32) * 0.1
    got = np.asarray(fused_proj_mlp(att, x, wo, bo, w1, b1, w2, b2,
                                    lns, lnb))
    h = x + att @ wo + bo
    y = _ln_np(h, lns, lnb) @ w1 + b1
    y = y / (1.0 + np.exp(-1.702 * y))       # quick-GELU
    want = h + y @ w2 + b2
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_clip_layer_fused_path_matches_plain(monkeypatch):
    """Whole-layer equivalence: the fused dispatch (forced on, interpret
    mode) must reproduce the plain XLA CLIP layer.  bf16, because the
    dispatch gates on half precision (the f32 tower's VMEM-resident MLP
    weights would exceed the 16 MB scoped-vmem budget on hardware)."""
    rng = np.random.RandomState(2)
    B, S, D, H = 2, 8, 128, 4
    x = jnp.asarray(rng.randn(B, S, D).astype(np.float32)).astype(jnp.bfloat16)
    causal = jnp.tril(jnp.ones((S, S), bool))
    layer = CLIPTextLayer(width=D, heads=H, dtype=jnp.bfloat16)
    params = layer.init(jax.random.PRNGKey(0), x, causal)
    want = np.asarray(layer.apply(params, x, causal), np.float32)  # plain

    _interp(monkeypatch)
    monkeypatch.setattr(pallas_common, "pallas_enabled", lambda: True)
    got = np.asarray(layer.apply(params, x, causal), np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=2e-2)


def test_clip_layer_f32_stays_plain(monkeypatch):
    """The f32 tower must NOT dispatch to the fused kernels even with the
    backend gate forced on (21 MB resident weights at width 768 is a hard
    Mosaic scoped-vmem OOM on hardware) — guard the dtype gate."""
    rng = np.random.RandomState(3)
    B, S, D, H = 2, 8, 128, 4
    x = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    causal = jnp.tril(jnp.ones((S, S), bool))
    layer = CLIPTextLayer(width=D, heads=H)      # dtype f32
    params = layer.init(jax.random.PRNGKey(0), x, causal)
    monkeypatch.setattr(pallas_common, "pallas_enabled", lambda: True)

    def boom(*a, **k):                           # fused path would call this
        raise AssertionError("f32 tower dispatched to pallas")
    monkeypatch.setattr(pl, "pallas_call", boom)
    layer.apply(params, x, causal)               # must stay on plain XLA


def test_short_bucket_nonaligned_rows_stay_plain(monkeypatch):
    """A custom bucket whose B*S rows break the bf16 16-row tile rule
    (public ``buckets`` ctor knob, e.g. width 12 at B=1) must fall back
    to plain XLA instead of crashing at Mosaic lowering."""
    rng = np.random.RandomState(4)
    B, S, D, H = 1, 12, 128, 4
    x = jnp.asarray(rng.randn(B, S, D).astype(np.float32)).astype(jnp.bfloat16)
    causal = jnp.tril(jnp.ones((S, S), bool))
    layer = CLIPTextLayer(width=D, heads=H, dtype=jnp.bfloat16)
    params = layer.init(jax.random.PRNGKey(0), x, causal)
    monkeypatch.setattr(pallas_common, "pallas_enabled", lambda: True)

    def boom(*a, **k):
        raise AssertionError("non-16-aligned rows dispatched to pallas")
    monkeypatch.setattr(pl, "pallas_call", boom)
    layer.apply(params, x, causal)               # must stay on plain XLA


def test_align_block_samples_warning_scope():
    """Warn only when the aligned block exceeds the caller's configured
    block (an oversized override) — NOT on the routine small-batch clamp
    (B=3 -> 8 rows), which is bounded by the 8-row floor."""
    import warnings
    from ladiff_tpu.ops.pallas_common import align_block_samples

    with warnings.catch_warnings():
        warnings.simplefilter("error")           # silent cases must not warn
        assert align_block_samples(32, 3, 7) == 8     # small-batch clamp
        assert align_block_samples(32, 256, 7) == 32  # exact fit
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = align_block_samples(33, 256, 7)         # odd override: 33 -> 40
        assert got == 40 and len(w) == 1
        assert "bumped" in str(w[0].message)
