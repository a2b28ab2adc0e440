"""DistilBERT text encoder (the ``mld_bert`` text-encoder option).

Rebuild of /root/reference/src/ladiff/models/architectures/mld_bert.py.
The reference class is broken as shipped (``self.is_action_branch`` is read
in __init__ but never assigned — instantiation raises AttributeError) and
its live forward path (mld_bert.py:162-185) reduces to: tokenize ->
DistilBERT last_hidden_state -> ReLU+Linear projection -> [B, N, latent].
This module rebuilds that path TPU-native: a compact flax DistilBERT tower
(6 post-norm layers, learned positions, eps 1e-12 LayerNorms) whose weights
load from a local HF ``distilbert-base-uncased`` checkpoint
(assets.yaml:29) when present, a greedy WordPiece tokenizer from its
vocab.txt, and deterministic hash fallbacks for asset-free environments
(same convention as clip_text.py).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["DistilBertTower", "WordPieceTokenizer", "BertTextEncoder",
           "load_torch_distilbert_state"]


class DistilBertLayer(nn.Module):
    """Post-norm block: MHA -> sa_layer_norm -> GELU FFN ->
    output_layer_norm (HF modeling_distilbert.TransformerBlock)."""

    dim: int
    n_heads: int
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_bias: jax.Array) -> jax.Array:
        B, S, D = x.shape
        H = self.n_heads
        q = nn.Dense(D, dtype=self.dtype, name="q_lin")(x)
        k = nn.Dense(D, dtype=self.dtype, name="k_lin")(x)
        v = nn.Dense(D, dtype=self.dtype, name="v_lin")(x)
        q = q.reshape(B, S, H, -1).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, -1).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, -1).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D // H)
        scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, D)
        attn_out = nn.Dense(D, dtype=self.dtype, name="out_lin")(ctx)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                         name="sa_layer_norm")(x + attn_out)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="lin1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(D, dtype=self.dtype, name="lin2")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                            name="output_layer_norm")(x + h)


class DistilBertTower(nn.Module):
    """Embeddings + N transformer blocks -> last_hidden_state."""

    vocab_size: int = 30522
    max_position: int = 512
    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: jax.Array) -> jax.Array:
        B, S = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype,
                       name="word_embeddings")(input_ids)
        pos = nn.Embed(self.max_position, self.dim, dtype=self.dtype,
                       name="position_embeddings")(jnp.arange(S)[None])
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                         name="emb_layer_norm")(tok + pos)
        bias = jnp.where(attention_mask[:, None, None, :], 0.0,
                         jnp.finfo(jnp.float32).min)
        for i in range(self.n_layers):
            x = DistilBertLayer(self.dim, self.n_heads, self.hidden_dim,
                                dtype=self.dtype, name=f"layer_{i}")(x, bias)
        return x


class HashWordTokenizer:
    """Deterministic fallback when no vocab.txt asset exists: one id per
    word via sha256 (ids stay stable across runs/sessions)."""

    def __init__(self, vocab_size: int = 30522, max_len: int = 32):
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.cls_id, self.sep_id, self.pad_id = 101, 102, 0

    def __call__(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        import hashlib
        ids = np.full((len(texts), self.max_len), self.pad_id, np.int32)
        mask = np.zeros((len(texts), self.max_len), bool)
        for i, t in enumerate(texts):
            toks = [self.cls_id] + [
                1000 + int.from_bytes(
                    hashlib.sha256(w.encode()).digest()[:4], "little")
                % (self.vocab_size - 2000)
                for w in t.lower().split()[:self.max_len - 2]
            ] + [self.sep_id]
            ids[i, :len(toks)] = toks
            mask[i, :len(toks)] = True
        return ids, mask


class WordPieceTokenizer:
    """Greedy longest-match WordPiece over a BERT vocab.txt with basic
    lowercasing/punctuation splitting (HF BertTokenizer semantics for
    ASCII text; no CJK handling — motion captions are English)."""

    def __init__(self, vocab_path: str, max_len: int = 64):
        self.vocab = {}
        with open(vocab_path) as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\n")] = i
        self.max_len = max_len
        self.cls_id = self.vocab["[CLS]"]
        self.sep_id = self.vocab["[SEP]"]
        self.pad_id = self.vocab["[PAD]"]
        self.unk_id = self.vocab["[UNK]"]

    def _basic(self, text: str) -> List[str]:
        out, cur = [], ""
        for ch in text.lower():
            if ch.isalnum():
                cur += ch
            else:
                if cur:
                    out.append(cur)
                    cur = ""
                if not ch.isspace():
                    out.append(ch)
        if cur:
            out.append(cur)
        return out

    def _wordpiece(self, word: str) -> List[int]:
        ids, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def __call__(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        seqs = []
        for t in texts:
            toks = [self.cls_id]
            for w in self._basic(t):
                toks.extend(self._wordpiece(w))
            toks = toks[:self.max_len - 1] + [self.sep_id]
            seqs.append(toks)
        L = min(self.max_len, max(len(s) for s in seqs))
        ids = np.full((len(texts), L), self.pad_id, np.int32)
        mask = np.zeros((len(texts), L), bool)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s[:L]
            mask[i, :len(s)] = True
        return ids, mask


def load_torch_distilbert_state(modelpath: str, tower: DistilBertTower):
    """HF pytorch_model.bin -> flax param tree for DistilBertTower.
    Returns None when no loadable checkpoint exists."""
    path = None
    for name in ("pytorch_model.bin", "model.safetensors"):
        p = os.path.join(modelpath, name)
        if os.path.exists(p):
            path = p
            break
    if path is None:
        return None
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file
        sd = load_file(path)
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k.removeprefix("distilbert."): v for k, v in sd.items()}

    def g(key):
        return jnp.asarray(np.asarray(sd[key], np.float32))

    def lin(prefix):
        return {"kernel": g(prefix + ".weight").T, "bias": g(prefix + ".bias")}

    def ln(prefix):
        return {"scale": g(prefix + ".weight"), "bias": g(prefix + ".bias")}

    params = {
        "word_embeddings": {
            "embedding": g("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": g("embeddings.position_embeddings.weight")},
        "emb_layer_norm": ln("embeddings.LayerNorm"),
    }
    for i in range(tower.n_layers):
        p = f"transformer.layer.{i}"
        params[f"layer_{i}"] = {
            "q_lin": lin(f"{p}.attention.q_lin"),
            "k_lin": lin(f"{p}.attention.k_lin"),
            "v_lin": lin(f"{p}.attention.v_lin"),
            "out_lin": lin(f"{p}.attention.out_lin"),
            "sa_layer_norm": ln(f"{p}.sa_layer_norm"),
            "lin1": lin(f"{p}.ffn.lin1"),
            "lin2": lin(f"{p}.ffn.lin2"),
            "output_layer_norm": ln(f"{p}.output_layer_norm"),
        }
    return params


class _Projection(nn.Module):
    """ReLU + Linear(768 -> latent) (reference mld_bert.py:52-53)."""

    latent_dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.latent_dim, name="projection_1")(nn.relu(x))


class BertTextEncoder:
    """texts -> [B, N, latent_dim] projected DistilBERT token features
    (the reference's live forward path, mld_bert.py:162-185).

    Drop-in alternative to ClipTextEncoder for the denoiser's
    ``last_hidden_state`` conditioning mode (text token count N > 1)."""

    def __init__(self, modelpath: Optional[str] = None,
                 latent_dim: int = 256, finetune: bool = False,
                 dtype=jnp.float32, rng_seed: int = 0, **_kw):
        self.tower = DistilBertTower(dtype=dtype)
        self.latent_dim = latent_dim
        self.text_encoded_dim = latent_dim
        vocab = os.path.join(modelpath, "vocab.txt") if modelpath else None
        if vocab and os.path.exists(vocab):
            self.tokenizer = WordPieceTokenizer(vocab)
        else:
            self.tokenizer = HashWordTokenizer()
        self.params = None
        if modelpath:
            self.params = load_torch_distilbert_state(modelpath, self.tower)
        ids0 = jnp.zeros((1, 8), jnp.int32)
        m0 = jnp.ones((1, 8), bool)
        if self.params is None:
            self.params = self.tower.init(
                jax.random.PRNGKey(rng_seed), ids0, m0)["params"]
        proj = _Projection(latent_dim)
        self.proj_params = proj.init(
            jax.random.PRNGKey(rng_seed + 1),
            jnp.zeros((1, 1, self.tower.dim)))["params"]
        self._apply = jax.jit(
            lambda params, pp, ids, mask: proj.apply(
                {"params": pp},
                self.tower.apply({"params": params}, ids, mask)))

    def __call__(self, texts: List[str]) -> jax.Array:
        ids, mask = self.tokenizer(texts)
        out = self._apply(self.params, self.proj_params,
                          jnp.asarray(ids), jnp.asarray(mask))
        # zero padded token rows so downstream attention can't leak them
        return out * jnp.asarray(mask)[..., None]

    def last_hidden_state(self, texts: List[str]):
        ids, mask = self.tokenizer(texts)
        hidden = self.tower.apply({"params": self.params},
                                  jnp.asarray(ids), jnp.asarray(mask))
        return hidden, jnp.asarray(mask)
