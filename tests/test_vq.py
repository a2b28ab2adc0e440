"""VQ-VAE motion tokenizer: shapes, straight-through training signal,
EMA codebook updates (reference vqdiff.py/quantize_cnn.py semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from ladiff_tpu.models.vq import (EmaState, HumanVQDiff, VQVae, ema_init,
                                  ema_update, nearest_code, perplexity)


def test_vqvae_roundtrip_shapes():
    B, T, F = 2, 64, 263
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    model = VQVae(nfeats=F, nb_code=64, code_dim=512, width=128, depth=2)
    params = model.init(jax.random.PRNGKey(0), x)
    x_out, loss, perp, idx = model.apply(params, x)
    assert x_out.shape == (B, T, F)  # stride 2^3 down, x2^3 up
    assert idx.shape == (B, T // 8)
    assert np.isfinite(float(loss)) and float(perp) >= 1.0

    codes = model.apply(params, x, method=model.encode)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(idx))
    dec = model.apply(params, codes, method=model.decode_codes)
    assert dec.shape == (B, T, F)


def test_vq_gradients_flow_through_encoder():
    """Straight-through: d(recon loss)/d(encoder params) must be nonzero."""
    B, T, F = 2, 32, 64
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    model = VQVae(nfeats=F, nb_code=16, code_dim=64,
                  output_emb_width=64, width=64, depth=1)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(p):
        x_out, vq_loss, _, _ = model.apply(p, x)
        return jnp.mean((x_out - x) ** 2) + vq_loss

    grads = jax.grad(loss_fn)(params)
    enc_norm = sum(float(jnp.sum(jnp.abs(g))) for g in
                   jax.tree_util.tree_leaves(grads["params"]["encoder"]))
    cb_norm = float(jnp.sum(jnp.abs(grads["params"]["codebook"])))
    assert enc_norm > 0
    assert cb_norm > 0  # codebook loss term


def test_nearest_code_and_perplexity():
    cb = jnp.asarray(np.eye(4, 8, dtype=np.float32) * 10)
    x = jnp.asarray(np.stack([np.eye(4, 8)[2] * 9.0, np.eye(4, 8)[0] * 11.0])
                    .astype(np.float32))
    idx = nearest_code(cb, x)
    np.testing.assert_array_equal(np.asarray(idx), [2, 0])
    p_uniform = perplexity(jnp.arange(4), 4)
    assert abs(float(p_uniform) - 4.0) < 1e-3
    p_collapsed = perplexity(jnp.zeros(4, jnp.int32), 4)
    assert abs(float(p_collapsed) - 1.0) < 1e-3


def test_ema_update_moves_codebook_toward_data():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(256, 16).astype(np.float32))
    state = ema_init(x, nb_code=8, rng=jax.random.PRNGKey(0))
    assert state.codebook.shape == (8, 16)
    for i in range(10):
        idx = nearest_code(state.codebook, x)
        state = ema_update(state, x, idx, mu=0.5,
                           rng=jax.random.PRNGKey(i + 1))
    # codebook converges toward cluster means: quantization error shrinks
    idx = nearest_code(state.codebook, x)
    err = float(jnp.mean((x - state.codebook[idx]) ** 2))
    state0 = ema_init(x, nb_code=8, rng=jax.random.PRNGKey(99))
    err0 = float(jnp.mean(
        (x - state0.codebook[nearest_code(state0.codebook, x)]) ** 2))
    assert err <= err0 + 1e-6


def test_human_vqdiff_wrapper():
    B, T, F = 2, 32, 251  # KIT feature width
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    model = HumanVQDiff(nfeats=F, nb_code=32, code_dim=512)
    params = model.init(jax.random.PRNGKey(0), x)
    x_out, loss, perp, idx = model.apply(params, x)
    assert x_out.shape == (B, T, F)
    dec = model.apply(params, idx, method=model.forward_decoder)
    assert dec.shape == (B, T, F)
