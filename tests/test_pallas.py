"""Pallas fused-attention kernel: correctness vs the XLA einsum pipeline
(interpret mode on CPU; real-hardware parity is exercised by bench/TPU runs)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ladiff_tpu.ops.attention import masked_attention


def _interpreted(fn):
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        return fn()
    finally:
        pl.pallas_call = orig


def test_pallas_attention_matches_einsum():
    from ladiff_tpu.ops.pallas_attention import pallas_masked_attention

    B, S, D, H = 2, 208, 256, 4
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, S) > 0.3)
    want = np.asarray(masked_attention(q, k, v, valid, num_heads=H))
    got = _interpreted(
        lambda: np.asarray(pallas_masked_attention(q, k, v, valid,
                                                   num_heads=H)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_attention_no_mask():
    from ladiff_tpu.ops.pallas_attention import pallas_masked_attention

    B, S, D, H = 2, 64, 128, 4
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    want = np.asarray(masked_attention(q, q, q, None, num_heads=H))
    got = _interpreted(
        lambda: np.asarray(pallas_masked_attention(q, q, q, None,
                                                   num_heads=H)))
    np.testing.assert_allclose(got, want, atol=1e-5)
