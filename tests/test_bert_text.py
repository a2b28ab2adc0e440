"""DistilBERT text encoder: tower parity vs HF torch on a tiny random
model, WordPiece tokenizer parity vs HF BertTokenizer, and the
BertTextEncoder surface."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _tiny_hf_model(tmp_path):
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(0)
    cfg = DistilBertConfig(vocab_size=120, max_position_embeddings=64,
                           dim=64, n_layers=2, n_heads=4, hidden_dim=128,
                           dropout=0.0, attention_dropout=0.0)
    model = DistilBertModel(cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=False)
    return model, cfg


def test_tower_matches_hf_distilbert(tmp_path):
    from ladiff_tpu.models.bert_text import (DistilBertTower,
                                             load_torch_distilbert_state)

    model, cfg = _tiny_hf_model(tmp_path)
    tower = DistilBertTower(vocab_size=cfg.vocab_size,
                            max_position=cfg.max_position_embeddings,
                            dim=cfg.dim, n_layers=cfg.n_layers,
                            n_heads=cfg.n_heads, hidden_dim=cfg.hidden_dim)
    params = load_torch_distilbert_state(str(tmp_path), tower)
    assert params is not None

    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size, (3, 11)).astype(np.int32)
    mask = np.ones((3, 11), bool)
    mask[1, 7:] = False
    mask[2, 4:] = False
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids.astype(np.int64)),
                     attention_mask=torch.from_numpy(mask.astype(np.int64))
                     ).last_hidden_state.numpy()
    got = np.asarray(tower.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(mask)))
    # padded rows differ (HF computes them attending nothing meaningful but
    # they are garbage either way) — compare valid rows
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-4, atol=1e-4)


def test_wordpiece_matches_hf_tokenizer():
    bert_dir = "deps/distilbert-base-uncased"
    if not os.path.exists(os.path.join(bert_dir, "vocab.txt")):
        pytest.skip("distilbert vocab asset not present")
    from transformers import DistilBertTokenizer

    from ladiff_tpu.models.bert_text import WordPieceTokenizer

    hf = DistilBertTokenizer.from_pretrained(bert_dir)
    ours = WordPieceTokenizer(os.path.join(bert_dir, "vocab.txt"))
    texts = ["a person walks forward and waves",
             "someone JUMPS, twice-ish!"]
    want = hf(texts, padding=True)["input_ids"]
    ids, mask = ours(texts)
    for i in range(len(texts)):
        assert ids[i][mask[i]].tolist() == [
            t for t in want[i] if t != hf.pad_token_id]


def test_bert_text_encoder_surface():
    from ladiff_tpu.models.bert_text import BertTextEncoder

    enc = BertTextEncoder(modelpath=None, latent_dim=256)
    out = np.asarray(enc(["a person walks", "someone jumps twice"]))
    assert out.ndim == 3 and out.shape[0] == 2 and out.shape[2] == 256
    assert np.isfinite(out).all()
    # deterministic across calls
    out2 = np.asarray(enc(["a person walks", "someone jumps twice"]))
    np.testing.assert_array_equal(out, out2)
    # padded rows zeroed
    hidden, mask = enc.last_hidden_state(["hi", "a much longer sentence"])
    assert hidden.shape[:2] == mask.shape
    short = np.asarray(enc(["hi", "a much longer sentence here"]))
    m = np.asarray(enc.tokenizer(["hi", "a much longer sentence here"])[1])
    assert np.all(short[~m] == 0)
