"""Pipeline parallelism (parallel/pp.py): GPipe schedule over the MD skip
stack — forward AND gradient parity vs the single-device encoder, on the
virtual CPU mesh (conftest provides 8 devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladiff_tpu.ops.stylization import MDSkipTransformerEncoder
from ladiff_tpu.parallel.pp import (make_pipe_mesh, pipeline_encoder_forward,
                                    stack_stage_params)


def _setup(L=9, B=8, T=7, D=64, H=4, F=96, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.5)
    xf = jnp.asarray(rng.randn(B, 1, D).astype(np.float32))
    emb = jnp.asarray(rng.randn(B, D).astype(np.float32))
    valid = jnp.asarray(rng.randint(1, T + 1, size=(B, 1)) >
                        np.arange(T)[None, :])
    enc = MDSkipTransformerEncoder(D, D, H, L, ffn_dim=F, dropout=0.0)
    params = enc.init(jax.random.PRNGKey(0), x, xf, emb, valid)["params"]
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.RandomState(a.size % 613).randn(*a.shape)
            .astype(np.float32)) * 0.05, params)
    return enc, params, x, xf, emb, valid


@pytest.mark.parametrize("L,S,n_micro", [(9, 3, 4), (3, 3, 2), (9, 1, 2)])
def test_pipeline_forward_matches_encoder(L, S, n_micro):
    """S pipeline stages x n_micro microbatches == the plain encoder
    forward, including the cross-stage U-Net skip routing."""
    enc, params, x, xf, emb, valid = _setup(L=L)
    want = np.asarray(enc.apply({"params": params}, x, xf, emb, valid,
                                deterministic=True))
    mesh = make_pipe_mesh(S)
    got = np.asarray(pipeline_encoder_forward(
        enc, params, x, xf, emb, valid, mesh=mesh, n_micro=n_micro))
    assert not np.allclose(got, x), "pipeline returned input unchanged"
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pipeline_forward_no_mask():
    enc, params, x, xf, emb, _ = _setup(L=3, seed=5)
    want = np.asarray(enc.apply({"params": params}, x, xf, emb, None,
                                deterministic=True))
    got = np.asarray(pipeline_encoder_forward(
        enc, params, x, xf, emb, None, mesh=make_pipe_mesh(3), n_micro=4))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pipeline_gradient_matches_encoder():
    """jax.grad through the whole GPipe schedule (scan + ppermute + psum)
    equals the single-device gradient leaf-for-leaf — pipeline-parallel
    training needs no hand-written backward schedule."""
    enc, params, x, xf, emb, valid = _setup(L=3, B=4, seed=2)
    rng = np.random.RandomState(9)
    w = jnp.asarray(rng.randn(*x.shape).astype(np.float32))
    mesh = make_pipe_mesh(3)

    def loss_ref(p):
        y = enc.apply({"params": p}, x, xf, emb, valid, deterministic=True)
        return jnp.sum(y * w)

    def loss_pp(p):
        y = pipeline_encoder_forward(enc, p, x, xf, emb, valid,
                                     mesh=mesh, n_micro=2)
        return jnp.sum(y * w)

    g_ref = jax.grad(loss_ref)(params)
    g_pp = jax.grad(loss_pp)(params)
    flat_ref, tdef_ref = jax.tree_util.tree_flatten(g_ref)
    flat_pp, tdef_pp = jax.tree_util.tree_flatten(g_pp)
    assert tdef_ref == tdef_pp
    assert any(float(jnp.abs(a).max()) > 0 for a in flat_ref)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=2e-5)


def test_stack_stage_params_identity_extension():
    """Non-output layers get the [[I],[0]] skip-fusion extension: the
    uniform cat-GEMM is exactly a no-op for them."""
    enc, params, x, xf, emb, valid = _setup(L=3)
    staged = stack_stage_params(params, 3, 3, enc.d_model)
    D = enc.d_model
    # layer 0 (input) and 1 (middle) are identity-extended
    for s in (0, 1):
        np.testing.assert_array_equal(
            np.asarray(staged["wlin"][s, 0]),
            np.concatenate([np.eye(D), np.zeros((D, D))], 0))
        np.testing.assert_array_equal(np.asarray(staged["blin"][s, 0]), 0.0)
    # layer 2 (output block 0) carries the real Dense params
    np.testing.assert_array_equal(
        np.asarray(staged["wlin"][2, 0]),
        np.asarray(params["linear_blocks_0"]["kernel"]))


def test_stack_stage_params_rejects_bad_split():
    enc, params, *_ = _setup(L=9)
    with pytest.raises(AssertionError):
        stack_stage_params(params, 9, 2, enc.d_model)
