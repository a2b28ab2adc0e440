"""Whole-stack fused MD sampling kernel (ops/pallas_md_stack): equivalence
vs the module XLA path (interpret mode on CPU).  The kernel is OPT-IN
(LADIFF_MD_STACK=1): the TPU A/B measured it slower than the per-layer
kernels (see PERF.md), so these tests force the gate on."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from ladiff_tpu.ops.stylization import MDSkipTransformerEncoder


def _interpreted(fn):
    """Run fn with pl.pallas_call forced into interpret mode, restored by a
    pytest-managed MonkeyPatch context (exception-safe, no bare attribute
    assignment on the global module)."""
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(pl, "pallas_call",
                   functools.partial(pl.pallas_call, interpret=True))
        return fn()


def _setup(B, T=7, D=256, H=4, L=5, F=256, seed=3):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.5)
    xf = jnp.asarray(rng.randn(B, 1, D).astype(np.float32))
    # sampling-scan regime: every sample shares the step's time embedding
    time_row = jnp.asarray(rng.randn(D).astype(np.float32))
    emb = jnp.broadcast_to(time_row[None, :], (B, D))
    valid = jnp.asarray(rng.randint(1, T + 1, size=(B, 1)) >
                        np.arange(T)[None, :])
    enc = MDSkipTransformerEncoder(D, D, H, L, ffn_dim=F, dropout=0.0)
    params = enc.init(jax.random.PRNGKey(0), x, xf, emb, valid)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.RandomState(a.size % 977).randn(*a.shape)
            .astype(np.float32)) * 0.05, params)
    return enc, params, x, xf, emb, time_row, valid


def _stack_prep(enc, params, xf, time_row):
    """The sampling-scan wiring: per-layer prep -> stacked arrays + stacked
    params, step-0 slice of the [S, L, 2D] AdaLN tables."""
    prep_all = enc.apply(params, xf, time_row[None, :],
                         method=enc.precompute_prep)
    values, ca_t, ffn_t = enc.apply(params, prep_all, method=enc.stack_prep)
    stacked = enc.apply(params, method=enc.stacked_params)
    return {"stack": {"params": stacked, "values": values,
                      "ca_ss": ca_t[0], "ffn_ss": ffn_t[0]}}


def test_fused_md_stack_matches_module(monkeypatch):
    """ONE kernel over the whole skip stack == the plain XLA encoder
    forward (incl. skip fusion Denses and the final LayerNorm); B=5 also
    exercises the whole-block batch padding (Bb bumps 5 -> 8)."""
    enc, params, x, xf, emb, time_row, valid = _setup(B=5)
    want = np.asarray(enc.apply(params, x, xf, emb, valid,
                                deterministic=True))
    prep = _stack_prep(enc, params, xf, time_row)
    monkeypatch.setenv("LADIFF_MD_STACK", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = _interpreted(lambda: np.asarray(enc.apply(
        params, x, xf, emb, valid, deterministic=True, prep=prep)))
    assert not np.allclose(got, x), "stack path returned input unchanged"
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_fused_md_stack_multi_block(monkeypatch):
    """Multiple sample blocks: the [L, Bb, D] values BlockSpec must index
    per block; B=16 at LADIFF_MD_BLOCK=8 gives a 2-step grid."""
    monkeypatch.setenv("LADIFF_MD_BLOCK", "8")
    enc, params, x, xf, emb, time_row, valid = _setup(B=16, seed=11)
    want = np.asarray(enc.apply(params, x, xf, emb, valid,
                                deterministic=True))
    prep = _stack_prep(enc, params, xf, time_row)
    monkeypatch.setenv("LADIFF_MD_STACK", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = _interpreted(lambda: np.asarray(enc.apply(
        params, x, xf, emb, valid, deterministic=True, prep=prep)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_fused_md_stack_no_mask(monkeypatch):
    """latent_valid=None (TEST_EFFICIENCY ablation) routes with all-ones
    validity."""
    enc, params, x, xf, emb, time_row, _ = _setup(B=4, seed=7)
    want = np.asarray(enc.apply(params, x, xf, emb, None,
                                deterministic=True))
    prep = _stack_prep(enc, params, xf, time_row)
    monkeypatch.setenv("LADIFF_MD_STACK", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = _interpreted(lambda: np.asarray(enc.apply(
        params, x, xf, emb, None, deterministic=True, prep=prep)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_stack_prep_cpu_fallback_unstacks():
    """When the kernel gate is false (plain CPU backend), a stack prep must
    fall back through _unstack_prep to the per-layer prep path and still
    match the plain forward."""
    enc, params, x, xf, emb, time_row, valid = _setup(B=4, seed=13)
    want = np.asarray(enc.apply(params, x, xf, emb, valid,
                                deterministic=True))
    prep = _stack_prep(enc, params, xf, time_row)
    got = np.asarray(enc.apply(params, x, xf, emb, valid,
                               deterministic=True, prep=prep))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_md_stack_env_gate(monkeypatch):
    """The stack kernel is opt-in: off by default, on with
    LADIFF_MD_STACK=1 (and only with TPU + 128-aligned dims)."""
    from ladiff_tpu.ops.stylization import md_stack_enabled
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not md_stack_enabled(256, 1024, 4)
    monkeypatch.setenv("LADIFF_MD_STACK", "1")
    assert md_stack_enabled(256, 1024, 4)
    # non-128-aligned dims gate off even when opted in
    assert not md_stack_enabled(260, 1024, 4)
    assert not md_stack_enabled(256, 1000, 4)
