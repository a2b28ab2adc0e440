"""MotionCLIP autoencoder + ViT-B/32 text encoder tests."""
import jax
import jax.numpy as jnp
import numpy as np

from ladiff_tpu.models.motionclip import (MotionClip, MotionClipTextEncoder)


def test_motionclip_autoencoder_shapes_and_masking():
    B, T, F = 3, 24, 263
    model = MotionClip(nfeats=F, num_layers=2, max_len=T)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    lengths = jnp.asarray([24, 10, 16])
    params = model.init(jax.random.PRNGKey(0), feats, lengths)["params"]
    recon, z = model.apply({"params": params}, feats, lengths)
    assert z.shape == (B, 512)
    assert recon.shape == (B, T, F)
    # padded frames are zeroed in the decoder output
    r = np.asarray(recon)
    assert np.abs(r[1, 10:]).max() == 0.0
    assert np.abs(r[1, :10]).max() > 0.0

    # frames beyond a sample's length must not influence its latent
    feats2 = feats.at[1, 10:].set(99.0)
    _, z2 = model.apply({"params": params}, feats2, lengths)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-5)


def test_motionclip_alignment_matrix():
    zm = jnp.asarray(np.eye(4, 512, dtype=np.float32) * 3.0)
    zt = jnp.asarray(np.eye(4, 512, dtype=np.float32) * 7.0)
    sim = MotionClip.clip_alignment(zm, zt)
    np.testing.assert_allclose(np.asarray(sim), np.eye(4), atol=1e-5)


def test_motionclip_text_encoder_loads_hf_vitb32(tmp_path):
    """End-to-end: an HF CLIP checkpoint at ViT-B/32 text geometry converts
    into the 512-wide tower and matches torch outputs."""
    import os

    import pytest
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=512, intermediate_size=2048,
        num_hidden_layers=12, num_attention_heads=8,
        max_position_embeddings=77, projection_dim=512,
        hidden_act="quick_gelu")
    hf = CLIPTextModelWithProjection(cfg).eval()
    torch.save(dict(hf.state_dict()),
               os.path.join(tmp_path, "pytorch_model.bin"))

    enc = MotionClipTextEncoder(modelpath=str(tmp_path))
    ids = np.zeros((2, 77), np.int64)
    ids[:, 0] = 49406
    ids[0, 1:4] = [320, 1125, 2] ; ids[0, 4] = 49407
    ids[1, 1:2] = [1125] ; ids[1, 2] = 49407
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids)).text_embeds.numpy()
    got = np.asarray(enc.encode_ids(jnp.asarray(ids.astype(np.int32))))
    np.testing.assert_allclose(got[:, 0, :], want, atol=5e-4)


def test_motionclip_text_encoder_contract():
    enc = MotionClipTextEncoder()
    out = enc(["a person walks forward", "someone jumps"])
    assert out.shape == (2, 1, 512)
    assert enc.text_encoded_dim == 512
    assert np.isfinite(np.asarray(out)).all()

    hidden = MotionClipTextEncoder(last_hidden_state=True)
    out_h = hidden(["a person walks"])
    assert out_h.shape == (1, 77, 512)
