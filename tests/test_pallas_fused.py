"""Fused Pallas kernels (FFN tails, stylization): correctness vs the plain
XLA module paths (interpret mode on CPU; real-hardware parity is exercised
by bench/TPU runs, where the modules route through these kernels)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from ladiff_tpu.ops.stylization import LinearTemporalCrossAttention, StylizedFFN
from ladiff_tpu.ops.transformer import TransformerEncoderLayer


def _interpreted(fn):
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        return fn()
    finally:
        pl.pallas_call = orig


def test_fused_stylized_ffn_matches_module():
    from ladiff_tpu.ops.pallas_fused_ffn import fused_stylized_ffn

    B, T, D, F = 3, 9, 256, 1024
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    emb = jnp.asarray(rng.randn(B, D).astype(np.float32))
    mod = StylizedFFN(latent_dim=D, ffn_dim=F)
    params = mod.init(jax.random.PRNGKey(0), x, emb)
    # randomize the zero-init linears so the test is non-trivial
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32)) * 0.05,
        params)
    want = np.asarray(mod.apply(p, x, emb))  # CPU -> plain XLA path

    pp = p["params"]
    scale_shift = jnp.split(
        (jax.nn.silu(emb) @ pp["proj_out"]["emb_layers_1"]["kernel"]
         + pp["proj_out"]["emb_layers_1"]["bias"]), 2, axis=-1)
    got = _interpreted(lambda: np.asarray(fused_stylized_ffn(
        x.reshape(B * T, D),
        jnp.repeat(scale_shift[0], T, axis=0),
        jnp.repeat(scale_shift[1], T, axis=0),
        pp["linear1"]["kernel"], pp["linear1"]["bias"],
        pp["linear2"]["kernel"], pp["linear2"]["bias"],
        pp["proj_out"]["norm"]["scale"], pp["proj_out"]["norm"]["bias"],
        pp["proj_out"]["out_layers_2"]["kernel"],
        pp["proj_out"]["out_layers_2"]["bias"]).reshape(B, T, D)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def _postnorm_tail_ref(x, pp, activation):
    def ln(h, w):
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-5) * w["scale"] + w["bias"]

    act = jax.nn.relu if activation == "relu" else (
        lambda v: jax.nn.gelu(v, approximate=False))
    h = ln(x, pp["norm1"])
    y = act(h @ pp["linear1"]["kernel"] + pp["linear1"]["bias"])
    y = y @ pp["linear2"]["kernel"] + pp["linear2"]["bias"]
    return ln(h + y, pp["norm2"])


def test_fused_postnorm_ffn_matches_xla():
    from ladiff_tpu.ops.pallas_postnorm_ffn import fused_postnorm_ffn

    M, D, F = 40, 256, 1024
    rng = np.random.RandomState(1)
    for activation in ("relu", "gelu"):
        x = jnp.asarray(rng.randn(M, D).astype(np.float32))
        pp = {
            "linear1": {"kernel": jnp.asarray(
                rng.randn(D, F).astype(np.float32) * 0.05),
                "bias": jnp.asarray(rng.randn(F).astype(np.float32))},
            "linear2": {"kernel": jnp.asarray(
                rng.randn(F, D).astype(np.float32) * 0.05),
                "bias": jnp.asarray(rng.randn(D).astype(np.float32))},
            "norm1": {"scale": jnp.asarray(rng.randn(D).astype(np.float32)),
                      "bias": jnp.asarray(rng.randn(D).astype(np.float32))},
            "norm2": {"scale": jnp.asarray(rng.randn(D).astype(np.float32)),
                      "bias": jnp.asarray(rng.randn(D).astype(np.float32))},
        }
        want = np.asarray(_postnorm_tail_ref(x, pp, activation))
        got = _interpreted(lambda: np.asarray(fused_postnorm_ffn(
            x, pp["linear1"]["kernel"], pp["linear1"]["bias"],
            pp["linear2"]["kernel"], pp["linear2"]["bias"],
            pp["norm1"]["scale"], pp["norm1"]["bias"],
            pp["norm2"]["scale"], pp["norm2"]["bias"],
            activation=activation)))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_encoder_layer_tail_routes_identically():
    """The setup()-refactored encoder layer (param-addressable linears) must
    produce the same tree names and outputs as before the refactor."""
    B, S, D = 2, 12, 256
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, S) > 0.2)
    layer = TransformerEncoderLayer(D, 4, 1024, activation="gelu")
    params = layer.init(jax.random.PRNGKey(0), x, valid)
    names = sorted(params["params"].keys())
    assert names == ["linear1", "linear2", "norm1", "norm2", "self_attn"]
    assert params["params"]["linear1"]["kernel"].shape == (D, 1024)
    out = layer.apply(params, x, valid)
    assert out.shape == (B, S, D)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_broadcast_stylize_matches_module():
    from ladiff_tpu.ops.pallas_stylize import fused_broadcast_stylize

    B, T, D = 3, 5, 256
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    xf = jnp.asarray(rng.randn(B, 1, D).astype(np.float32))
    emb = jnp.asarray(rng.randn(B, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, T) > 0.4)
    mod = LinearTemporalCrossAttention(D, D, 4)
    params = mod.init(jax.random.PRNGKey(0), x, xf, emb, valid)
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32)) * 0.05,
        params)
    want = np.asarray(mod.apply(p, x, xf, emb, valid))  # CPU: XLA collapse

    pp = p["params"]
    tn_w = pp["text_norm"]
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    tn = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * tn_w["scale"] + tn_w["bias"]
    value = tn @ pp["value"]["kernel"] + pp["value"]["bias"]
    scale, shift = jnp.split(
        jax.nn.silu(emb) @ pp["proj_out"]["emb_layers_1"]["kernel"]
        + pp["proj_out"]["emb_layers_1"]["bias"], 2, axis=-1)
    got = _interpreted(lambda: np.asarray(fused_broadcast_stylize(
        x.reshape(B * T, D),
        jnp.repeat(value[:, 0, :], T, axis=0),
        valid.reshape(B * T, 1).astype(jnp.float32),
        jnp.repeat(scale, T, axis=0), jnp.repeat(shift, T, axis=0),
        pp["proj_out"]["norm"]["scale"], pp["proj_out"]["norm"]["bias"],
        pp["proj_out"]["out_layers_2"]["kernel"],
        pp["proj_out"]["out_layers_2"]["bias"]).reshape(B, T, D)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_n1_collapse_matches_general_einsum():
    """The single-text-token shortcut must equal the general softmax-linear
    attention formula evaluated at N=1 (reference mdiff_transformer.py:206-247)."""
    B, T, D, H = 4, 5, 64, 4
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    xf = jnp.asarray(rng.randn(B, 1, D).astype(np.float32))
    emb = jnp.asarray(rng.randn(B, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, T) > 0.4)
    mod = LinearTemporalCrossAttention(D, D, H)
    params = mod.init(jax.random.PRNGKey(1), x, xf, emb, valid)
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32)) * 0.05,
        params)
    got = np.asarray(mod.apply(p, x, xf, emb, valid))

    # general formula with the same params
    pp = p["params"]

    def ln(h, w):
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-5) * w["scale"] + w["bias"]

    xn = ln(x, pp["norm"])
    tn = ln(xf, pp["text_norm"])
    q = xn @ pp["query"]["kernel"] + pp["query"]["bias"]
    k = tn @ pp["key"]["kernel"] + pp["key"]["bias"]
    v = tn @ pp["value"]["kernel"] + pp["value"]["bias"]
    q = jax.nn.softmax(q.reshape(B, T, H, -1), axis=-1)
    k = jax.nn.softmax(k.reshape(B, 1, H, -1), axis=1)
    v = v.reshape(B, 1, H, -1)
    att = jnp.einsum("bnhd,bnhl->bhdl", k, v)
    q = q * valid[:, :, None, None]
    y = jnp.einsum("bnhd,bhdl->bnhl", q, att).reshape(B, T, D)
    scale, shift = jnp.split(
        jax.nn.silu(emb) @ pp["proj_out"]["emb_layers_1"]["kernel"]
        + pp["proj_out"]["emb_layers_1"]["bias"], 2, axis=-1)
    h = ln(y, pp["proj_out"]["norm"]) * (1 + scale[:, None, :]) + shift[:, None, :]
    h = jax.nn.silu(h)
    want = np.asarray(
        x + (h @ pp["proj_out"]["out_layers_2"]["kernel"]
             + pp["proj_out"]["out_layers_2"]["bias"]))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("layout", ["packed", "slots", "masked"])
def test_fused_md_layer_matches_module(monkeypatch, layout):
    """The whole-layer pallas kernel must equal MDTransformerLayer's XLA
    path (interpret mode; backend gate monkeypatched to route fused) —
    for every head layout (LADIFF_MD_LAYOUT)."""
    monkeypatch.setenv("LADIFF_MD_LAYOUT", layout)
    from ladiff_tpu.ops.stylization import MDTransformerLayer

    B, T, D, H = 4, 9, 256, 4
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.5)
    xf = jnp.asarray(rng.randn(B, 1, D).astype(np.float32))
    emb = jnp.asarray(rng.randn(B, D).astype(np.float32))
    valid = jnp.asarray(
        np.arange(T)[None, :] < np.array([[3], [9], [5], [1]]))

    layer = MDTransformerLayer(D, D, 1024, H, dropout=0.0)
    params = layer.init(jax.random.PRNGKey(0), x, xf, emb, valid)
    # randomize zero-init projections so every segment contributes
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.RandomState(a.size % 977).randn(*a.shape)
            .astype(np.float32)) * 0.05, params)

    want = np.asarray(layer.apply(params, x, xf, emb, valid))  # CPU XLA path

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = _interpreted(
        lambda: np.asarray(layer.apply(params, x, xf, emb, valid)))
    assert not np.allclose(got, x), "fused path returned input unchanged"
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_fused_md_layer_no_mask(monkeypatch):
    from ladiff_tpu.ops.stylization import MDTransformerLayer

    B, T, D, H = 2, 9, 256, 4
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.5)
    xf = jnp.asarray(rng.randn(B, 1, D).astype(np.float32))
    emb = jnp.asarray(rng.randn(B, D).astype(np.float32))
    layer = MDTransformerLayer(D, D, 1024, H, dropout=0.0)
    params = layer.init(jax.random.PRNGKey(1), x, xf, emb, None)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.RandomState(a.size % 991).randn(*a.shape)
            .astype(np.float32)) * 0.05, params)
    want = np.asarray(layer.apply(params, x, xf, emb, None))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = _interpreted(
        lambda: np.asarray(layer.apply(params, x, xf, emb, None)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("layout", ["packed", "slots"])
def test_fused_decoder_layer_matches_module(monkeypatch, layout):
    """The whole decoder-layer kernel (self-attn + cross-attn + FFN) must
    equal TransformerDecoderLayer's post-norm XLA path — for both head
    layouts (LADIFF_DECODE_LAYOUT)."""
    monkeypatch.setenv("LADIFF_DECODE_LAYOUT", layout)
    from ladiff_tpu.ops.transformer import TransformerDecoderLayer

    B, T, L, D, H = 3, 20, 5, 256, 4
    rng = np.random.RandomState(7)
    tgt = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.5)
    mem = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    tv = jnp.asarray(np.arange(T)[None, :] < np.array([[12], [20], [7]]))
    mv = jnp.asarray(np.arange(L)[None, :] < np.array([[2], [5], [1]]))

    layer = TransformerDecoderLayer(D, H, 1024, dropout=0.0,
                                    activation="gelu")
    params = layer.init(jax.random.PRNGKey(0), tgt, mem, tv, mv)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.RandomState(a.size % 983).randn(*a.shape)
            .astype(np.float32)) * 0.05, params)

    want = np.asarray(layer.apply(params, tgt, mem, tv, mv))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = _interpreted(
        lambda: np.asarray(layer.apply(params, tgt, mem, tv, mv)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_fused_decoder_layer_no_masks(monkeypatch):
    from ladiff_tpu.ops.transformer import TransformerDecoderLayer

    B, T, L, D, H = 2, 12, 7, 256, 4
    rng = np.random.RandomState(8)
    tgt = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.5)
    mem = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    layer = TransformerDecoderLayer(D, H, 1024, dropout=0.0,
                                    activation="relu")
    params = layer.init(jax.random.PRNGKey(1), tgt, mem)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.RandomState(a.size % 971).randn(*a.shape)
            .astype(np.float32)) * 0.05, params)
    want = np.asarray(layer.apply(params, tgt, mem))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = _interpreted(lambda: np.asarray(layer.apply(params, tgt, mem)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_fused_decoder_layer_joint_attention_path(monkeypatch):
    """per_sample_attention=False keeps the original joint (block-diagonal
    masked) layout — must match the XLA module exactly like the default."""
    from ladiff_tpu.ops.transformer import TransformerDecoderLayer

    B, T, L, D, H = 3, 20, 5, 256, 4
    rng = np.random.RandomState(9)
    tgt = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.5)
    mem = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    tv = jnp.asarray(np.arange(T)[None, :] < np.array([[12], [20], [7]]))
    mv = jnp.asarray(np.arange(L)[None, :] < np.array([[2], [5], [1]]))
    layer = TransformerDecoderLayer(D, H, 1024, dropout=0.0,
                                    activation="gelu")
    params = layer.init(jax.random.PRNGKey(0), tgt, mem, tv, mv)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.RandomState(a.size % 983).randn(*a.shape)
            .astype(np.float32)) * 0.05, params)
    want = np.asarray(layer.apply(params, tgt, mem, tv, mv))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("LADIFF_DECODE_PERSAMPLE", "0")
    got = _interpreted(
        lambda: np.asarray(layer.apply(params, tgt, mem, tv, mv)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_train_postnorm_ffn_rate0_matches_xla():
    """Training-mode fused tail at dropout 0: forward + EVERY gradient must
    match the XLA chain (interpret mode; the dropout path needs the TPU
    hardware PRNG and is validated by scripts/validate_train_fused.py)."""
    from ladiff_tpu.ops.pallas_train_ffn import train_postnorm_ffn

    rs = np.random.RandomState(0)
    M, D, F = 40, 128, 256
    args = tuple(jnp.asarray(a) for a in (
        rs.randn(M, D).astype(np.float32) * 0.5,
        rs.randn(D, F).astype(np.float32) * 0.05,
        rs.randn(F).astype(np.float32) * 0.1,
        rs.randn(F, D).astype(np.float32) * 0.05,
        rs.randn(D).astype(np.float32) * 0.1,
        (1 + 0.1 * rs.randn(D)).astype(np.float32),
        0.1 * rs.randn(D).astype(np.float32),
        (1 + 0.1 * rs.randn(D)).astype(np.float32),
        0.1 * rs.randn(D).astype(np.float32)))
    seed = jnp.int32(7)

    def xla_ref(x, w1, b1, w2, b2, l1s, l1b, l2s, l2b):
        def ln(v, s, b):
            mu = v.mean(-1, keepdims=True)
            var = ((v - mu) ** 2).mean(-1, keepdims=True)
            return (v - mu) * jax.lax.rsqrt(var + 1e-5) * s + b
        h = ln(x, l1s, l1b)
        y = jax.nn.gelu(h @ w1 + b1, approximate=False) @ w2 + b2
        return ln(h + y, l2s, l2b)

    got = _interpreted(lambda: np.asarray(
        train_postnorm_ffn(*args, seed, "gelu", 0.0)))
    want = np.asarray(xla_ref(*args))
    np.testing.assert_allclose(got, want, atol=5e-5)

    gk = _interpreted(lambda: jax.grad(
        lambda *a: jnp.sum(train_postnorm_ffn(*a, seed, "gelu", 0.0) ** 2),
        argnums=tuple(range(9)))(*args))
    gx = jax.grad(lambda *a: jnp.sum(xla_ref(*a) ** 2),
                  argnums=tuple(range(9)))(*args)
    for i, (a, b) in enumerate(zip(gk, gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"grad argnum {i}")


def test_md_encoder_prep_matches_inline(monkeypatch):
    """precompute_prep + per-step slices must give the same output as the
    layers computing their prep inline (both through the fused kernels)."""
    from ladiff_tpu.ops.stylization import MDSkipTransformerEncoder

    B, T, D, H, L = 3, 7, 256, 4, 3
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.5)
    xf = jnp.asarray(rng.randn(B, 1, D).astype(np.float32))
    embs = jnp.asarray(rng.randn(2, D).astype(np.float32))  # 2-step table
    emb = jnp.broadcast_to(embs[0][None], (B, D))
    valid = jnp.asarray(np.arange(T)[None, :] < np.array([[3], [7], [1]]))

    enc = MDSkipTransformerEncoder(D, D, H, L, 1024, dropout=0.0)
    params = enc.init(jax.random.PRNGKey(0), x, xf, emb, valid)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.RandomState(a.size % 967).randn(*a.shape)
            .astype(np.float32)) * 0.05, params)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def run():
        inline = enc.apply(params, x, xf, emb, valid)
        prep_all = enc.apply(params, xf, embs,
                             method=enc.precompute_prep)
        step0 = {k: {"value": v["value"], "ca_ss": v["ca_ss"][0],
                     "ffn_ss": v["ffn_ss"][0]} for k, v in prep_all.items()}
        with_prep = enc.apply(params, x, xf, emb, valid, prep=step0)
        return np.asarray(inline), np.asarray(with_prep)

    inline, with_prep = _interpreted(run)
    np.testing.assert_allclose(with_prep, inline, atol=1e-5, rtol=1e-5)


def test_joint_stage_grad_with_fused_gates(monkeypatch):
    """Differentiating the joint vae_diffusion loss with the fused-kernel
    gates OPEN must work: the frozen encode is stop-gradient'd at the
    params (stays out of the AD region) and the finetune-decoder generation
    decode runs under no_pallas() (regression: on TPU this tripped
    'Linearization failed' — inference kernels define no VJP)."""
    from ladiff_tpu.models.ladiff import LADiffSystem

    nfeats, T = 263, 16
    system = LADiffSystem(
        nfeats=nfeats, njoints=22, max_frames=T, latent_dim=(2, 256),
        ff_size=128, num_layers=3, num_heads=4, dropout=0.0,
        text_encoded_dim=48, num_inference_timesteps=2,
        mean=np.zeros(nfeats, np.float32), std=np.ones(nfeats, np.float32))
    params = system.init_params(jax.random.PRNGKey(0))  # pre-patch: XLA
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rng.randn(2, T, nfeats).astype(np.float32) * .3),
        "length": jnp.asarray(np.array([16, 9], np.int32)),
        "text_emb": jnp.asarray(rng.randn(2, 1, 48).astype(np.float32)),
    }
    uncond = jnp.zeros((1, 1, 48), jnp.float32)

    def loss(p):
        total, _ = system.vae_diffusion_forward(
            p, batch, jax.random.PRNGKey(1), uncond, train=True)
        return total

    g = _interpreted(lambda: jax.grad(loss)(params))
    leaves = jax.tree.leaves(jax.tree.map(
        lambda a: float(jnp.abs(a).max()), g))
    assert np.isfinite(leaves).all()
    # decoder finetune gradient actually flows
    assert max(jax.tree.leaves(jax.tree.map(
        lambda a: float(jnp.abs(a).max()), g["vae"]))) > 0


@pytest.mark.parametrize("layout", ["packed", "slots"])
def test_train_self_attention_rate0_matches_xla(monkeypatch, layout):
    """Fused training self-attention at dropout 0: forward + every gradient
    must match the XLA chain (interpret mode; the dropout path needs the
    TPU hardware PRNG — scripts/validate_train_fused.py) — for both head
    layouts (LADIFF_TRAIN_ATTN_LAYOUT)."""
    monkeypatch.setenv("LADIFF_TRAIN_ATTN_LAYOUT", layout)
    from ladiff_tpu.ops.pallas_train_attention import train_self_attention

    rs = np.random.RandomState(1)
    B, S, D, H = 3, 12, 256, 4
    M = B * S
    x = jnp.asarray(rs.randn(M, D).astype(np.float32) * 0.5)
    kv = jnp.asarray((np.arange(S)[None, :]
                      < np.array([[8], [12], [5]])).astype(np.float32)
                     .reshape(M, 1))
    wqkv = jnp.asarray(rs.randn(D, 3 * D).astype(np.float32) * 0.05)
    bqkv = jnp.asarray(rs.randn(3 * D).astype(np.float32) * 0.1)
    wout = jnp.asarray(rs.randn(D, D).astype(np.float32) * 0.05)
    bout = jnp.asarray(rs.randn(D).astype(np.float32) * 0.1)
    seed = jnp.int32(3)

    def xla_ref(x, wqkv, bqkv, wout, bout):
        qkv = x.reshape(B, S, D) @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        Dh = D // H
        qh = q.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh / np.sqrt(Dh), kh)
        mask = kv.reshape(B, S)[:, None, None, :] > 0.5
        logits = jnp.where(mask, logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, D)
        return (x.reshape(B, S, D) + (ctx @ wout + bout)).reshape(M, D)

    got = _interpreted(lambda: np.asarray(train_self_attention(
        x, kv, wqkv, bqkv, wout, bout, seed, H, S, 0.0)))
    want = np.asarray(xla_ref(x, wqkv, bqkv, wout, bout))
    np.testing.assert_allclose(got, want, atol=2e-4)

    gk = _interpreted(lambda: jax.grad(
        lambda *a: jnp.sum(train_self_attention(
            a[0], kv, a[1], a[2], a[3], a[4], seed, H, S, 0.0) ** 2),
        argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv, wout, bout))
    gx = jax.grad(lambda *a: jnp.sum(xla_ref(*a) ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv, wout, bout)
    for i, (a, b) in enumerate(zip(gk, gx)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 2e-4, (i, rel)


def test_train_fused_layer_rate0_matches_deterministic(monkeypatch):
    """With dropout 0, a TRAINING forward through the fused attention +
    fused FFN tail must equal the layer's deterministic XLA output — for
    the encoder layer and the decoder layer's self-attention segment."""
    from ladiff_tpu.ops.transformer import (TransformerDecoderLayer,
                                            TransformerEncoderLayer)

    rng = np.random.RandomState(5)
    # S >= 32: below that the train-attention kernel gates itself off
    # (tiny streams stay on XLA) and this test would not exercise it
    B, S, L, D, H = 2, 35, 4, 256, 4
    src = jnp.asarray(rng.randn(B, S, D).astype(np.float32) * 0.5)
    mem = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    kvalid = jnp.asarray(np.arange(S)[None, :] < np.array([[21], [35]]))
    mvalid = jnp.asarray(np.arange(L)[None, :] < np.array([[2], [4]]))

    enc = TransformerEncoderLayer(D, H, 1024, dropout=0.0, activation="gelu")
    p_enc = enc.init(jax.random.PRNGKey(0), src, kvalid)
    want = np.asarray(enc.apply(p_enc, src, kvalid))  # deterministic XLA
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = _interpreted(lambda: np.asarray(enc.apply(
        p_enc, src, kvalid, deterministic=False)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    monkeypatch.undo()
    dec = TransformerDecoderLayer(D, H, 1024, dropout=0.0, activation="gelu")
    p_dec = dec.init(jax.random.PRNGKey(1), src, mem, kvalid, mvalid)
    want = np.asarray(dec.apply(p_dec, src, mem, kvalid, mvalid))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = _interpreted(lambda: np.asarray(dec.apply(
        p_dec, src, mem, kvalid, mvalid, deterministic=False)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_train_encoder_layer_rate0_matches_xla():
    """Whole-layer training kernel (attention + FFN tail in one call) at
    dropout 0: forward + EVERY gradient must match the XLA chain
    (interpret mode; dropout path -> scripts/validate_train_fused.py)."""
    from ladiff_tpu.ops.pallas_train_layer import train_encoder_layer

    rs = np.random.RandomState(4)
    # D=128/F=256 keep every layout path (head slots, 128-lane gates)
    # exercised at a fraction of the interpret-mode cost
    B, S, D, H, F = 3, 12, 128, 4, 256
    M = B * S
    x = jnp.asarray(rs.randn(M, D).astype(np.float32) * 0.5)
    kv = jnp.asarray((np.arange(S)[None, :]
                      < np.array([[8], [12], [5]])).astype(np.float32)
                     .reshape(M, 1))
    args = tuple(jnp.asarray(a) for a in (
        rs.randn(D, 3 * D).astype(np.float32) * 0.05,   # wqkv
        rs.randn(3 * D).astype(np.float32) * 0.1,       # bqkv
        rs.randn(D, D).astype(np.float32) * 0.05,       # wout
        rs.randn(D).astype(np.float32) * 0.1,           # bout
        rs.randn(D, F).astype(np.float32) * 0.05,       # w1
        rs.randn(F).astype(np.float32) * 0.1,           # b1
        rs.randn(F, D).astype(np.float32) * 0.05,       # w2
        rs.randn(D).astype(np.float32) * 0.1,           # b2
        (1 + 0.1 * rs.randn(D)).astype(np.float32),     # ln1s
        0.1 * rs.randn(D).astype(np.float32),           # ln1b
        (1 + 0.1 * rs.randn(D)).astype(np.float32),     # ln2s
        0.1 * rs.randn(D).astype(np.float32)))          # ln2b
    seed = jnp.int32(9)

    def xla_ref(x, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
                l1s, l1b, l2s, l2b):
        qkv = x.reshape(B, S, D) @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        Dh = D // H
        qh = q.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh / np.sqrt(Dh), kh)
        mask = kv.reshape(B, S)[:, None, None, :] > 0.5
        logits = jnp.where(mask, logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, D)
        r = (x.reshape(B, S, D) + (ctx @ wout + bout)).reshape(M, D)

        def ln(v_, s_, b_):
            mu = v_.mean(-1, keepdims=True)
            var = ((v_ - mu) ** 2).mean(-1, keepdims=True)
            return (v_ - mu) * jax.lax.rsqrt(var + 1e-5) * s_ + b_
        h = ln(r, l1s, l1b)
        y = jax.nn.gelu(h @ w1 + b1, approximate=False) @ w2 + b2
        return ln(h + y, l2s, l2b)

    got = _interpreted(lambda: np.asarray(train_encoder_layer(
        x, kv, *args, seed, H, S, 0.0, "gelu")))
    want = np.asarray(xla_ref(x, *args))
    np.testing.assert_allclose(got, want, atol=5e-4)

    argnums = tuple(range(13))  # x plus the 12 parameter tensors
    gk = _interpreted(lambda: jax.grad(
        lambda x0, *a: jnp.sum(train_encoder_layer(
            x0, kv, *a, seed, H, S, 0.0, "gelu") ** 2),
        argnums=argnums)(x, *args))
    gx = jax.grad(lambda x0, *a: jnp.sum(xla_ref(x0, *a) ** 2),
                  argnums=argnums)(x, *args)
    for i, (a, b) in enumerate(zip(gk, gx)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        assert rel < 5e-4, (i, rel)


def test_train_decoder_layer_rate0_matches_xla():
    """Whole-DECODER-layer training kernel at dropout 0: forward + every
    gradient (including the MEMORY gradient) must match the XLA chain
    (interpret mode; dropout path -> scripts/validate_train_fused.py)."""
    from ladiff_tpu.ops.pallas_train_decoder_layer import train_decoder_layer

    rs = np.random.RandomState(6)
    B, S, L, D, H, F = 2, 12, 5, 128, 4, 256
    M = B * S
    x = jnp.asarray(rs.randn(M, D).astype(np.float32) * 0.5)
    mem = jnp.asarray(rs.randn(B, L, D).astype(np.float32) * 0.5)
    kv = jnp.asarray((np.arange(S)[None, :]
                      < np.array([[8], [12]])).astype(np.float32)
                     .reshape(M, 1))
    mv = jnp.asarray((np.arange(L)[None, :] < np.array([[3], [5]]))
                     .astype(np.float32))
    args = tuple(jnp.asarray(a) for a in (
        rs.randn(D, 3 * D).astype(np.float32) * 0.05,   # sa_wqkv
        rs.randn(3 * D).astype(np.float32) * 0.1,       # sa_bqkv
        rs.randn(D, D).astype(np.float32) * 0.05,       # sa_wout
        rs.randn(D).astype(np.float32) * 0.1,           # sa_bout
        rs.randn(D, 3 * D).astype(np.float32) * 0.05,   # ca_wqkv
        rs.randn(3 * D).astype(np.float32) * 0.1,       # ca_bqkv
        rs.randn(D, D).astype(np.float32) * 0.05,       # ca_wout
        rs.randn(D).astype(np.float32) * 0.1,           # ca_bout
        rs.randn(D, F).astype(np.float32) * 0.05,       # w1
        rs.randn(F).astype(np.float32) * 0.1,           # b1
        rs.randn(F, D).astype(np.float32) * 0.05,       # w2
        rs.randn(D).astype(np.float32) * 0.1))          # b2
    lns = tuple(jnp.asarray(a) for a in (
        (1 + 0.1 * rs.randn(D)).astype(np.float32),
        0.1 * rs.randn(D).astype(np.float32),
        (1 + 0.1 * rs.randn(D)).astype(np.float32),
        0.1 * rs.randn(D).astype(np.float32),
        (1 + 0.1 * rs.randn(D)).astype(np.float32),
        0.1 * rs.randn(D).astype(np.float32)))
    seed = jnp.int32(17)

    def ln_(v_, s_, b_):
        mu = v_.mean(-1, keepdims=True)
        var = ((v_ - mu) ** 2).mean(-1, keepdims=True)
        return (v_ - mu) * jax.lax.rsqrt(var + 1e-5) * s_ + b_

    def mha(q, kvd, valid, wqkv, bqkv, wout, bout, Sq, Sk):
        Dh = D // H
        qq = (q.reshape(B, Sq, D) @ wqkv[:, :D] + bqkv[:D]) \
            .reshape(B, Sq, H, Dh).transpose(0, 2, 1, 3)
        kk = (kvd @ wqkv[:, D:2 * D] + bqkv[D:2 * D]) \
            .reshape(B, Sk, H, Dh).transpose(0, 2, 1, 3)
        vv = (kvd @ wqkv[:, 2 * D:] + bqkv[2 * D:]) \
            .reshape(B, Sk, H, Dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qq / np.sqrt(Dh), kk)
        logits = jnp.where(valid[:, None, None, :] > 0.5, logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", w, vv)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Sq, D)
        return ctx @ wout + bout

    def xla_ref(x, mem, sa_wqkv, sa_bqkv, sa_wout, sa_bout,
                ca_wqkv, ca_bqkv, ca_wout, ca_bout, w1, b1, w2, b2, lns):
        l1s, l1b, l2s, l2b, l3s, l3b = lns
        sa = mha(x, x.reshape(B, S, D), kv.reshape(B, S),
                 sa_wqkv, sa_bqkv, sa_wout, sa_bout, S, S)
        t1 = ln_((x.reshape(B, S, D) + sa).reshape(M, D), l1s, l1b)
        ca = mha(t1, mem, mv, ca_wqkv, ca_bqkv, ca_wout, ca_bout, S, L)
        h = ln_((t1.reshape(B, S, D) + ca).reshape(M, D), l2s, l2b)
        y = jax.nn.gelu(h @ w1 + b1, approximate=False) @ w2 + b2
        return ln_(h + y, l3s, l3b)

    got = _interpreted(lambda: np.asarray(train_decoder_layer(
        x, kv, mem, mv, *args, lns, seed, H, S, L, 0.0, "gelu")))
    want = np.asarray(xla_ref(x, mem, *args, lns))
    np.testing.assert_allclose(got, want, atol=5e-4)

    argnums = (0, 1) + tuple(range(2, 15))  # x, mem, 12 params, lns
    gk = _interpreted(lambda: jax.grad(
        lambda x0, m0, *a: jnp.sum(train_decoder_layer(
            x0, kv, m0, mv, *a, seed, H, S, L, 0.0, "gelu") ** 2),
        argnums=argnums)(x, mem, *args, lns))
    gx = jax.grad(lambda x0, m0, *a: jnp.sum(xla_ref(x0, m0, *a) ** 2),
                  argnums=argnums)(x, mem, *args, lns)
    names = ["x", "mem", "sa_wqkv", "sa_bqkv", "sa_wout", "sa_bout",
             "ca_wqkv", "ca_bqkv", "ca_wout", "ca_bout",
             "w1", "b1", "w2", "b2", "lns"]
    for n, a, b in zip(names, gk, gx):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            rel = float(jnp.abs(la - lb).max() / (jnp.abs(lb).max() + 1e-9))
            assert rel < 5e-4, (n, rel)


def test_train_whole_layer_route_rate0_matches_deterministic(monkeypatch):
    """With LADIFF_TRAIN_WHOLE_LAYER=1, a dropout-0 TRAINING forward must
    route through the whole-layer kernels (encoder AND decoder) and equal
    the deterministic XLA output.  The whole-layer kernels are opt-in
    (measured slower than the split kernels at production shapes on v5e —
    PERF.md); this keeps the integration path covered.  Kernel calls are
    COUNTED: a silently broken routing gate would fall through to the
    split kernels and still match at rate 0."""
    import ladiff_tpu.ops.pallas_train_decoder_layer as ptdl
    import ladiff_tpu.ops.pallas_train_layer as ptl
    from ladiff_tpu.ops.transformer import (TransformerDecoderLayer,
                                            TransformerEncoderLayer)

    rng = np.random.RandomState(8)
    B, S, L, D, H = 2, 35, 4, 256, 4
    src = jnp.asarray(rng.randn(B, S, D).astype(np.float32) * 0.5)
    mem = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    kvalid = jnp.asarray(np.arange(S)[None, :] < np.array([[21], [35]]))
    mvalid = jnp.asarray(np.arange(L)[None, :] < np.array([[2], [4]]))

    calls = {"enc": 0, "dec": 0}
    real_enc, real_dec = ptl.train_encoder_layer, ptdl.train_decoder_layer

    def count_enc(*a, **k):
        calls["enc"] += 1
        return real_enc(*a, **k)

    def count_dec(*a, **k):
        calls["dec"] += 1
        return real_dec(*a, **k)

    monkeypatch.setattr(ptl, "train_encoder_layer", count_enc)
    monkeypatch.setattr(ptdl, "train_decoder_layer", count_dec)
    monkeypatch.setenv("LADIFF_TRAIN_WHOLE_LAYER", "1")
    real_backend = jax.default_backend

    enc = TransformerEncoderLayer(D, H, 1024, dropout=0.0, activation="gelu")
    p_enc = enc.init(jax.random.PRNGKey(0), src, kvalid)
    want = np.asarray(enc.apply(p_enc, src, kvalid))  # CPU: plain XLA
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = _interpreted(lambda: np.asarray(enc.apply(
        p_enc, src, kvalid, deterministic=False)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
    assert calls["enc"] == 1, calls

    monkeypatch.setattr(jax, "default_backend", real_backend)
    dec = TransformerDecoderLayer(D, H, 1024, dropout=0.0, activation="gelu")
    p_dec = dec.init(jax.random.PRNGKey(1), src, mem, kvalid, mvalid)
    want = np.asarray(dec.apply(p_dec, src, mem, kvalid, mvalid))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = _interpreted(lambda: np.asarray(dec.apply(
        p_dec, src, mem, kvalid, mvalid, deterministic=False)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
    assert calls["dec"] == 1, calls


def test_decode_block_default_fits_vmem_per_dtype():
    """The decode kernel's default sample block must shrink as the dtype
    widens (VMEM buffers scale with itemsize): bb8 at f32 needs 26.3M
    scoped VMEM against the 16M budget (the benchmark-eval path runs f32 —
    a bb8-for-everything default broke test.py on hardware), and f64 would
    double again, so the block halves once more."""
    from ladiff_tpu.ops.transformer import decode_block_default

    assert decode_block_default(jnp.bfloat16) == 8
    assert decode_block_default(jnp.float32) == 4
    assert decode_block_default(jnp.float64) == 2


def test_md_env_layout_legacy_vslot(monkeypatch):
    """LADIFF_MD_VSLOT keeps its original meaning when explicitly set
    (1 = slots, 0 = masked; advisor finding, round 3); unset -> packed,
    and LADIFF_MD_LAYOUT wins when present."""
    from ladiff_tpu.ops.pallas_md_layer import _env_layout
    monkeypatch.delenv("LADIFF_MD_LAYOUT", raising=False)
    monkeypatch.delenv("LADIFF_MD_VSLOT", raising=False)
    assert _env_layout() == "packed"
    monkeypatch.setenv("LADIFF_MD_VSLOT", "1")
    assert _env_layout() == "slots"
    monkeypatch.setenv("LADIFF_MD_VSLOT", "0")
    assert _env_layout() == "masked"
    monkeypatch.setenv("LADIFF_MD_LAYOUT", "packed")
    assert _env_layout() == "packed"  # explicit layout overrides legacy
