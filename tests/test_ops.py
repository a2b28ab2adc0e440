"""Unit tests for core ops: attention masking, transformer blocks, PEs,
timestep embeddings.  Includes golden-parity checks against torch CPU ops
(the reference builds on torch.nn.MultiheadAttention / F.gelu semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladiff_tpu.ops.attention import MultiHeadAttention, masked_attention
from ladiff_tpu.ops.embeddings import (PositionEmbeddingLearned1D,
                                       timestep_embedding)
from ladiff_tpu.ops.stylization import MDSkipTransformerEncoder, MDTransformerLayer
from ladiff_tpu.ops.transformer import (SkipTransformerDecoder,
                                        SkipTransformerEncoder,
                                        TransformerEncoderLayer)


def test_masked_attention_ignores_invalid_keys():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (2, 4, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 8))
    valid = jnp.array([[True] * 3 + [False] * 3, [True] * 6])
    out_full = masked_attention(q, k, v, valid, num_heads=2)
    # perturb the masked keys/values: output must not change
    k2 = k.at[0, 3:].set(100.0)
    v2 = v.at[0, 3:].set(-50.0)
    out_pert = masked_attention(q, k2, v2, valid, num_heads=2)
    np.testing.assert_allclose(out_full, out_pert, atol=1e-5)


def test_mha_matches_torch():
    torch = pytest.importorskip("torch")
    D, H, B, S = 16, 4, 3, 5
    mha = MultiHeadAttention(D, H, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, D))
    params = mha.init(jax.random.PRNGKey(1), x, x, x)

    tm = torch.nn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
    p = params["params"]
    with torch.no_grad():
        tm.in_proj_weight.copy_(
            torch.tensor(np.asarray(p["in_proj_kernel"]).T))
        tm.in_proj_bias.copy_(torch.tensor(np.asarray(p["in_proj_bias"])))
        tm.out_proj.weight.copy_(torch.tensor(np.asarray(p["out_proj"]["kernel"]).T))
        tm.out_proj.bias.copy_(torch.tensor(np.asarray(p["out_proj"]["bias"])))

    valid = np.ones((B, S), dtype=bool)
    valid[0, 3:] = False
    out_jax = mha.apply(params, x, x, x, jnp.asarray(valid))
    xt = torch.tensor(np.asarray(x))
    with torch.no_grad():
        out_t, _ = tm(xt, xt, xt, key_padding_mask=torch.tensor(~valid))
    np.testing.assert_allclose(np.asarray(out_jax), out_t.numpy(), atol=2e-5)


def test_encoder_layer_postnorm_matches_torch_arith():
    """Post-norm ordering: attn -> add -> norm1 -> ffn -> add -> norm2."""
    layer = TransformerEncoderLayer(8, 2, 16, dropout=0.0, activation="gelu")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8))
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_skip_encoder_shapes_and_mask():
    enc = SkipTransformerEncoder(8, 2, 5, 16, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 8))
    valid = jnp.ones((2, 10), dtype=bool).at[0, 6:].set(False)
    params = enc.init(jax.random.PRNGKey(1), x, valid)
    out = enc.apply(params, x, valid)
    assert out.shape == (2, 10, 8)
    # masked tokens must not influence valid positions
    x2 = x.at[0, 6:].set(99.0)
    out2 = enc.apply(params, x2, valid)
    np.testing.assert_allclose(np.asarray(out[0, :6]), np.asarray(out2[0, :6]),
                               atol=1e-4)


def test_skip_decoder_memory_mask():
    dec = SkipTransformerDecoder(8, 2, 5, 16, dropout=0.0)
    tgt = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 8))
    mem = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    mem_valid = jnp.ones((2, 5), dtype=bool).at[0, 2:].set(False)
    params = dec.init(jax.random.PRNGKey(2), tgt, mem, None, mem_valid)
    out = dec.apply(params, tgt, mem, None, mem_valid)
    mem2 = mem.at[0, 2:].set(-77.0)
    out2 = dec.apply(params, tgt, mem2, None, mem_valid)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]), atol=1e-4)


def test_timestep_embedding_matches_reference_formula():
    torch = pytest.importorskip("torch")
    import math
    ts = jnp.array([0, 10, 999])
    emb = timestep_embedding(ts, 768, flip_sin_to_cos=True,
                             downscale_freq_shift=0.0)
    # independent torch re-derivation of the diffusers formula
    t = torch.tensor([0, 10, 999]).float()
    half = 384
    exponent = -math.log(10000) * torch.arange(half).float() / half
    freqs = torch.exp(exponent)
    args = t[:, None] * freqs[None]
    ref = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    ref = torch.cat([ref[:, half:], ref[:, :half]], dim=-1)
    # f32 trig of args up to 999 rad: ~1e-4 ulp-amplified error is expected
    np.testing.assert_allclose(np.asarray(emb), ref.numpy(), atol=3e-4)


def test_learned_pe_adds():
    pe = PositionEmbeddingLearned1D(8, max_len=16)
    x = jnp.zeros((2, 5, 8))
    params = pe.init(jax.random.PRNGKey(0), x)
    out = pe.apply(params, x)
    table = params["params"]["pe"]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(table[:5]))


def test_md_layer_latent_mask():
    layer = MDTransformerLayer(8, 8, 16, 2, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    xf = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8))
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    valid = jnp.ones((2, 5), dtype=bool).at[0, 2:].set(False)
    params = layer.init(jax.random.PRNGKey(3), x, xf, emb, valid)
    out = layer.apply(params, x, xf, emb, valid)
    x2 = x.at[0, 2:].set(13.0)
    out2 = layer.apply(params, x2, xf, emb, valid)
    np.testing.assert_allclose(np.asarray(out[0, :2]), np.asarray(out2[0, :2]),
                               atol=1e-4)


def test_md_skip_encoder_runs():
    enc = MDSkipTransformerEncoder(8, 8, 2, 9, 16, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    xf = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8))
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    valid = jnp.ones((2, 5), dtype=bool)
    params = enc.init(jax.random.PRNGKey(3), x, xf, emb, valid)
    out = enc.apply(params, x, xf, emb, valid)
    assert out.shape == (2, 5, 8)
    assert np.isfinite(np.asarray(out)).all()
