"""Frozen CLIP ViT-L/14 text tower, JAX-native.

The reference wraps HuggingFace CLIP (``MldTextEncoder``,
/root/reference/src/ladiff/models/architectures/mld_clip.py:13-90): tokenize
to 77 ids, run the text transformer, return either pooled
``get_text_features`` ([B, 1, 768]) or the last hidden state.  Here the
tower is a flax module (quick-GELU, pre-LN, causal mask, EOT pooling +
text projection — CLIP ViT-L/14 text config: vocab 49408, width 768,
12 layers, 12 heads, context 77).

Weights: ``load_torch_clip_state`` converts a HuggingFace
``CLIPTextModelWithProjection``/``CLIPModel`` state_dict; without local
weights the tower initializes randomly (pipeline stays runnable; metric
numbers are then only self-consistent).  Tokenizer: real CLIP BPE when the
vocab files exist locally, else a deterministic hash fallback.
"""
from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["CLIPTextTower", "ClipTextEncoder", "load_torch_clip_state"]


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPTextLayer(nn.Module):
    """One pre-LN CLIP text block (HF CLIPEncoderLayer semantics).

    Inference on TPU routes the LN/projection glue through two fused
    Pallas kernels (ops/pallas_clip_layer.py: LN1+qkv prologue, then
    out-proj+residual+LN2+MLP epilogue) with the S<=77 attention core
    left on XLA — round 4 measured fused-attention variants slower at
    these shapes (PERF.md, text-tower decomposition).  Param tree is
    identical either way ({q,k,v,out}_proj/fc1/fc2 {kernel,bias},
    ln_1/ln_2 {scale,bias}), so the HF checkpoint converter is unaffected.
    """

    width: int
    heads: int
    dtype: Any = jnp.float32

    def setup(self):
        from ladiff_tpu.ops.param_layers import DenseParams, LNParams
        D = self.width
        self.ln_1 = LNParams(D, dtype=self.dtype)
        self.q_proj = DenseParams(D, D, dtype=self.dtype)
        self.k_proj = DenseParams(D, D, dtype=self.dtype)
        self.v_proj = DenseParams(D, D, dtype=self.dtype)
        self.out_proj = DenseParams(D, D, dtype=self.dtype)
        self.ln_2 = LNParams(D, dtype=self.dtype)
        self.fc1 = DenseParams(D, 4 * D, dtype=self.dtype)
        self.fc2 = DenseParams(4 * D, D, dtype=self.dtype)

    def _attention_core(self, q, k, v, causal_mask):
        """[B, S, D] q (pre-scaled), k, v -> [B, S, D]; stays on XLA."""
        B, S, D = q.shape
        H = self.heads
        qh = q.reshape(B, S, H, D // H).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, H, D // H).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, H, D // H).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(causal_mask[None, None], logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", w, vh,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        return att.transpose(0, 2, 1, 3).reshape(B, S, D)

    def __call__(self, x, causal_mask):
        from ladiff_tpu.ops.pallas_common import pallas_enabled

        D, H = self.width, self.heads
        B, S, _ = x.shape
        scale = 1.0 / np.sqrt(D // H)
        # Fuse only at the short buckets: measured on TPU, the kernels win
        # at the production 32-token bucket (12.5 vs 13.2 ms/batch-256) and
        # LOSE at the 77-pad width (45.1 vs 36.3 — XLA schedules the larger
        # activation stream better than the weight-stationary row pipeline;
        # PERF.md round-5 A/B).  LADIFF_CLIP_FUSE_S overrides the
        # crossover for re-measurement (trace-time, like LADIFF_MD_BLOCK).
        # Half-precision only: fused_proj_mlp keeps out_proj+fc1+fc2
        # VMEM-resident — 10.6 MB at bf16 width 768, but 21 MB at f32,
        # which is a hard Mosaic scoped-vmem OOM (>16 MB); the f32 tower
        # (HF-parity eval/demo default) stays on plain XLA.
        # (B*S) % 16 guards Mosaic's bf16 (16, 128) min-tile rule for the
        # row blocks: a non-multiple (possible via the public ``buckets``
        # ctor knob, e.g. bucket 12 at B=1) falls back to plain XLA
        # instead of failing at lowering.
        fuse_max_s = int(os.environ.get("LADIFF_CLIP_FUSE_S") or 32)
        if (pallas_enabled() and not self.is_initializing()
                and D % 128 == 0 and S <= fuse_max_s
                and (B * S) % 16 == 0
                and jnp.dtype(self.dtype).itemsize == 2):
            from ladiff_tpu.ops.pallas_clip_layer import (fused_ln_qkv,
                                                          fused_proj_mlp)
            cast = lambda a: a.astype(self.dtype)
            xf = x.reshape(B * S, D).astype(self.dtype)
            q, k, v = fused_ln_qkv(
                xf,
                cast(self.q_proj.kernel), cast(self.q_proj.bias),
                cast(self.k_proj.kernel), cast(self.k_proj.bias),
                cast(self.v_proj.kernel), cast(self.v_proj.bias),
                self.ln_1.scale, self.ln_1.bias, scale=float(scale))
            att = self._attention_core(q.reshape(B, S, D),
                                       k.reshape(B, S, D),
                                       v.reshape(B, S, D), causal_mask)
            out = fused_proj_mlp(
                att.reshape(B * S, D), xf,
                cast(self.out_proj.kernel), cast(self.out_proj.bias),
                cast(self.fc1.kernel), cast(self.fc1.bias),
                cast(self.fc2.kernel), cast(self.fc2.bias),
                self.ln_2.scale, self.ln_2.bias)
            return out.reshape(B, S, D)
        y = self.ln_1(x)
        att = self._attention_core(self.q_proj(y) * scale, self.k_proj(y),
                                   self.v_proj(y), causal_mask)
        x = x + self.out_proj(att)
        return x + self.fc2(quick_gelu(self.fc1(self.ln_2(x))))


class CLIPTextTower(nn.Module):
    vocab_size: int = 49408
    width: int = 768
    num_layers: int = 12
    heads: int = 12
    context_length: int = 77
    projection_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 return_hidden: bool = False) -> jax.Array:
        """input_ids [B, 77] int32 -> pooled+projected [B, projection_dim]
        (or the last hidden state [B, 77, width])."""
        B, S = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = tok + pos[None, :S].astype(self.dtype)
        causal = jnp.tril(jnp.ones((S, S), bool))
        for i in range(self.num_layers):
            x = CLIPTextLayer(self.width, self.heads, dtype=self.dtype,
                              name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        if return_hidden:
            return x
        # EOT pooling: highest token id marks end-of-text (HF CLIP semantics)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(B), eot]
        proj = self.param("text_projection",
                          nn.initializers.normal(0.01),
                          (self.width, self.projection_dim))
        return pooled @ proj.astype(self.dtype)


# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------

class HashTokenizer:
    """Deterministic fallback when the CLIP BPE vocab is unavailable.

    Maps each whitespace word to a stable id in the CLIP vocab range; keeps
    the start/end token convention (ids 49406/49407) so EOT pooling works.
    """

    sot = 49406
    eot = 49407

    def __init__(self, context_length: int = 77):
        self.context_length = context_length

    def __call__(self, texts: List[str]) -> np.ndarray:
        import hashlib

        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, t in enumerate(texts):
            words = html.unescape(t.lower().strip()).split()
            ids = [self.sot]
            for w in words[: self.context_length - 2]:
                h = int.from_bytes(
                    hashlib.sha256(w.encode()).digest()[:4], "little")
                ids.append(1 + h % (self.sot - 1))
            ids.append(self.eot)
            out[i, :len(ids)] = ids
        return out


class BPETokenizer:
    """Real CLIP byte-pair encoder, loaded from a local
    ``bpe_simple_vocab_16e6.txt.gz`` or HF ``vocab.json``+``merges.txt``."""

    sot = 49406
    eot = 49407

    def __init__(self, vocab_dir: str, context_length: int = 77):
        import json

        self.context_length = context_length
        try:
            # CLIP's exact pattern needs unicode classes (\p{L}/\p{N}),
            # which the stdlib re lacks; the regex module ships with HF
            # transformers (parity vs CLIPTokenizer pinned in
            # tests/test_clip.py::test_bpe_matches_hf_clip_tokenizer)
            import regex as re_mod
            self._re = re_mod.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
                r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+", re_mod.IGNORECASE)
        except ImportError:  # ASCII approximation (fine for HumanML3D/KIT)
            import re as re_mod
            self._re = re_mod.compile(
                r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
                r"|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+", re_mod.IGNORECASE)
        vocab_json = os.path.join(vocab_dir, "vocab.json")
        merges_txt = os.path.join(vocab_dir, "merges.txt")
        with open(vocab_json) as f:
            self.encoder: Dict[str, int] = json.load(f)
        with open(merges_txt, encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = [m for m in merges if m and not m.startswith("#version")]
        self.bpe_ranks = {tuple(m.split()): i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.cache: Dict[str, str] = {}

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1e10))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text)).strip().lower()
        ids: List[int] = []
        for token in self._re.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" ")
                       if t in self.encoder)
        return ids

    def __call__(self, texts: List[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t)[: self.context_length - 2] + [self.eot]
            out[i, :len(ids)] = ids
        return out


@functools.lru_cache()
def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


# ---------------------------------------------------------------------------
# Wrapper mirroring MldTextEncoder
# ---------------------------------------------------------------------------

class ClipTextEncoder:
    """texts -> [B, 1, 768] pooled features (reference MldTextEncoder).

    Length-bucketed context (pooled mode only): the reference always pads
    captions to the full 77-token context (``padding="max_length"``,
    /root/reference/src/ladiff/models/architectures/mld_clip.py:53-60) and
    pays the 77-token tower for every sentence.  With causal attention the
    EOT position attends only to positions <= EOT, and the masked softmax
    terms underflow to exactly zero, so the pooled/projected feature is
    mathematically invariant to truncating trailing padding — measured
    bit-exact on TPU, ~1e-7 reduction-order rounding on CPU
    (tests/test_clip.py::test_pooled_invariant_to_trailing_padding).  The
    batch is therefore run at the smallest bucket width covering its
    longest caption — typical HumanML3D captions (~15 BPE tokens) ride the
    32 bucket at ~1/3 the tower FLOPs and ~1/6 the attention-score work.
    ``last_hidden_state`` mode keeps the full context: downstream consumers
    attend over ALL hidden positions, so truncation would change outputs.
    """

    def __init__(self, modelpath: Optional[str] = None,
                 last_hidden_state: bool = False, dtype=jnp.float32,
                 rng_seed: int = 0, buckets=(16, 32, 77)):
        self.tower = CLIPTextTower(dtype=dtype)
        self.last_hidden_state = last_hidden_state
        self.text_encoded_dim = 768
        if modelpath and os.path.exists(os.path.join(modelpath, "vocab.json")):
            self.tokenizer = BPETokenizer(modelpath)
        else:
            self.tokenizer = HashTokenizer()
        full = self.tokenizer.context_length
        self.buckets = tuple(sorted({int(b) for b in buckets
                                     if 0 < int(b) <= full} | {full}))
        self.params = None
        if modelpath:
            self.params = load_torch_clip_state(modelpath, self.tower)
        if self.params is None:
            ids = jnp.zeros((1, 77), jnp.int32)
            self.params = self.tower.init(
                jax.random.PRNGKey(rng_seed), ids)["params"]
        self._apply = jax.jit(
            lambda params, ids: self.tower.apply(
                {"params": params}, ids, return_hidden=last_hidden_state))

    def encode_ids(self, input_ids: jax.Array) -> jax.Array:
        out = self._apply(self.params, input_ids)
        if self.last_hidden_state:
            return out
        return out[:, None, :]

    def bucket_ids(self, ids: np.ndarray) -> np.ndarray:
        """Truncate 77-padded ids to the smallest bucket covering the
        batch's longest caption (EOT = the max id, first occurrence)."""
        need = int(ids.argmax(axis=-1).max()) + 1
        width = next(b for b in self.buckets if b >= need)
        return ids[:, :width]

    def __call__(self, texts: List[str]) -> jax.Array:
        ids = np.asarray(self.tokenizer(texts))
        if not self.last_hidden_state:
            ids = self.bucket_ids(ids)
        return self.encode_ids(jnp.asarray(ids))


def load_torch_clip_state(modelpath: str, tower: CLIPTextTower):
    """Convert a local HF CLIP text-model checkpoint (pytorch_model.bin /
    model.safetensors) into this tower's param tree.  Returns None when no
    checkpoint is found."""
    state = None
    for fname in ("pytorch_model.bin", "model.safetensors"):
        path = os.path.join(modelpath, fname)
        if os.path.exists(path):
            if fname.endswith(".bin"):
                import torch
                state = {k: v.numpy() for k, v in
                         torch.load(path, map_location="cpu",
                                    weights_only=True).items()}
            else:
                from safetensors.numpy import load_file
                state = load_file(path)
            break
    if state is None:
        return None

    def g(key):
        for prefix in ("text_model.", "text_model.encoder.",
                       "text_projection.",):
            pass
        return state[key]

    P: Dict[str, Any] = {}
    pre = "text_model."
    P["token_embedding"] = {
        "embedding": state[pre + "embeddings.token_embedding.weight"]}
    P["positional_embedding"] = state[pre + "embeddings.position_embedding.weight"]
    for i in range(tower.num_layers):
        lp = f"{pre}encoder.layers.{i}."
        layer = {}
        for ours, theirs in (("q_proj", "self_attn.q_proj"),
                             ("k_proj", "self_attn.k_proj"),
                             ("v_proj", "self_attn.v_proj"),
                             ("out_proj", "self_attn.out_proj"),
                             ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            layer[ours] = {"kernel": state[lp + theirs + ".weight"].T,
                           "bias": state[lp + theirs + ".bias"]}
        for ours, theirs in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
            layer[ours] = {"scale": state[lp + theirs + ".weight"],
                           "bias": state[lp + theirs + ".bias"]}
        P[f"layers_{i}"] = layer
    P["ln_final"] = {"scale": state[pre + "final_layer_norm.weight"],
                     "bias": state[pre + "final_layer_norm.bias"]}
    if "text_projection.weight" in state:
        P["text_projection"] = state["text_projection.weight"].T
    elif "text_projection" in state:
        P["text_projection"] = state["text_projection"]
    else:
        P["text_projection"] = np.eye(tower.width, tower.projection_dim,
                                      dtype=np.float32)
    return jax.tree.map(jnp.asarray, P)
