"""T2M evaluator encoders (frozen, eval-only): conv movement encoder and
bidirectional-GRU motion/text encoders.

Rebuild of /root/reference/src/ladiff/models/architectures/t2m_motionenc.py
and t2m_textenc.py.  The torch originals rely on ``pack_padded_sequence``
(batch sorted by length desc); here the BiGRU is a masked ``lax.scan``:
the forward carry freezes once t >= length, and the backward direction runs
over an index-reversed copy of each sequence (gathered, so shapes stay
static).  Weight conversion from the reference's ``finest.tar`` checkpoints
is provided by ``load_t2m_checkpoint``.

These run on TPU inside the jitted eval step, so the full test.py benchmark
needs no torch.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["MovementConvEncoder", "MotionEncoderBiGRUCo",
           "TextEncoderBiGRUCo", "load_t2m_checkpoint"]


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def _gru_step(params: Dict[str, jax.Array], x: jax.Array, h: jax.Array):
    """One torch-layout GRU step.  params: w_ih [3H, I], w_hh [3H, H],
    b_ih, b_hh [3H] with (reset, update, new) gate order."""
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def bigru_last(fwd: Dict[str, jax.Array], bwd: Dict[str, jax.Array],
               x: jax.Array, lengths: jax.Array, h0: jax.Array) -> jax.Array:
    """[B, T, I] + [B] lengths -> [B, 2H]: final hidden of both directions
    with pack_padded semantics (padding never touches the carry)."""
    B, T, _ = x.shape
    idx = jnp.arange(T)

    def fwd_step(h, inp):
        xt, valid = inp
        h_new = _gru_step(fwd, xt, h)
        h = jnp.where(valid[:, None], h_new, h)
        return h, None

    valid = idx[None, :] < lengths[:, None]              # [B, T]
    h_f, _ = jax.lax.scan(fwd_step, jnp.broadcast_to(h0[0], (B, h0.shape[-1])),
                          (x.transpose(1, 0, 2), valid.T))

    # backward: gather x_rev[t] = x[len-1-t] (clamped), scan with same mask
    rev_idx = jnp.clip(lengths[:, None] - 1 - idx[None, :], 0, T - 1)  # [B,T]
    x_rev = jnp.take_along_axis(x, rev_idx[:, :, None], axis=1)

    def bwd_step(h, inp):
        xt, v = inp
        h_new = _gru_step(bwd, xt, h)
        h = jnp.where(v[:, None], h_new, h)
        return h, None

    h_b, _ = jax.lax.scan(bwd_step, jnp.broadcast_to(h0[1], (B, h0.shape[-1])),
                          (x_rev.transpose(1, 0, 2), valid.T))
    return jnp.concatenate([h_f, h_b], axis=-1)


class MovementConvEncoder(nn.Module):
    """Two stride-2 conv blocks + linear (reference t2m_motionenc.py:6-25).

    ``valid_length`` (scalar, traced) reproduces the reference's batch-max
    padding semantics under our static-length tensors: the torch pipeline
    runs the conv on tensors cropped to the batch's longest length Lb, so
    windows that cross the boundary read the convs' OWN zero padding.  With
    a static T > Lb those positions hold real (renormed-junk / bias) values
    instead; zeroing the input rows >= Lb and the post-activation rows >=
    L1 = (Lb-2)//2 + 1 (exactly where torch conv2's padding zero sits)
    makes every consumed output bit-match the cropped computation."""

    hidden_size: int = 512
    output_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 valid_length: jax.Array | None = None) -> jax.Array:
        # x: [B, T, F-4] -> [B, T//2//2, output]
        if valid_length is not None:
            idx = jnp.arange(x.shape[1])
            x = jnp.where((idx < valid_length)[None, :, None], x, 0.0)
        x = nn.Conv(self.hidden_size, (4,), strides=(2,), padding=[(1, 1)],
                    dtype=self.dtype, name="conv1")(x)
        x = leaky_relu(x)
        if valid_length is not None:
            l1 = (valid_length - 2) // 2 + 1
            idx1 = jnp.arange(x.shape[1])
            x = jnp.where((idx1 < l1)[None, :, None], x, 0.0)
        x = nn.Conv(self.output_size, (4,), strides=(2,), padding=[(1, 1)],
                    dtype=self.dtype, name="conv2")(x)
        x = leaky_relu(x)
        return nn.Dense(self.output_size, dtype=self.dtype, name="out_net")(x)


class _BiGRUCo(nn.Module):
    hidden_size: int
    output_size: int
    dtype: Any = jnp.float32

    def _gru_params(self, name: str, input_size: int):
        shape = {"w_ih": (3 * self.hidden_size, input_size),
                 "w_hh": (3 * self.hidden_size, self.hidden_size),
                 "b_ih": (3 * self.hidden_size,),
                 "b_hh": (3 * self.hidden_size,)}
        init = nn.initializers.uniform(scale=1.0 / np.sqrt(self.hidden_size))
        return {k: self.param(f"{name}_{k}", init, s) for k, s in shape.items()}

    def _encode(self, input_embs: jax.Array, lengths: jax.Array) -> jax.Array:
        fwd = self._gru_params("gru_fwd", self.hidden_size)
        bwd = self._gru_params("gru_bwd", self.hidden_size)
        h0 = self.param("hidden", nn.initializers.normal(1.0),
                        (2, 1, self.hidden_size))
        last = bigru_last(fwd, bwd, input_embs, lengths, h0[:, 0])
        y = nn.Dense(self.hidden_size, dtype=self.dtype, name="output_net_0")(last)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="output_net_1")(y)
        y = leaky_relu(y)
        return nn.Dense(self.output_size, dtype=self.dtype, name="output_net_3")(y)


class MotionEncoderBiGRUCo(_BiGRUCo):
    """reference t2m_motionenc.py:28-64; hidden 1024, output 512."""

    hidden_size: int = 1024
    output_size: int = 512

    @nn.compact
    def __call__(self, movements: jax.Array, m_lens: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="input_emb")(movements)
        return self._encode(x, m_lens)


class TextEncoderBiGRUCo(_BiGRUCo):
    """reference t2m_textenc.py:6-48; hidden 512, output 512."""

    hidden_size: int = 512
    output_size: int = 512
    word_size: int = 300

    @nn.compact
    def __call__(self, word_embs: jax.Array, pos_ohot: jax.Array,
                 cap_lens: jax.Array) -> jax.Array:
        pos = nn.Dense(self.word_size, dtype=self.dtype, name="pos_emb")(pos_ohot)
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     name="input_emb")(word_embs + pos)
        return self._encode(x, cap_lens)


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (finest.tar)
# ---------------------------------------------------------------------------

def _dense(sd, key):
    return {"kernel": np.asarray(sd[key + ".weight"]).T,
            "bias": np.asarray(sd[key + ".bias"])}


def _ln(sd, key):
    return {"scale": np.asarray(sd[key + ".weight"]),
            "bias": np.asarray(sd[key + ".bias"])}


def _gru(sd, prefix):
    out = {}
    for ours, theirs in (("gru_fwd", "l0"), ("gru_bwd", "l0_reverse")):
        out[f"{ours}_w_ih"] = np.asarray(sd[f"{prefix}.weight_ih_{theirs}"])
        out[f"{ours}_w_hh"] = np.asarray(sd[f"{prefix}.weight_hh_{theirs}"])
        out[f"{ours}_b_ih"] = np.asarray(sd[f"{prefix}.bias_ih_{theirs}"])
        out[f"{ours}_b_hh"] = np.asarray(sd[f"{prefix}.bias_hh_{theirs}"])
    return out


def load_t2m_checkpoint(path: str):
    """Convert the reference ``finest.tar`` (text_encoder, movement_encoder,
    motion_encoder state dicts; reference ladiff.py:203-212) to param trees
    for the three modules above.  Returns a dict or None if missing."""
    import os
    if not os.path.exists(path):
        return None
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)

    def np_sd(sd):
        return {k: v.numpy() for k, v in sd.items()}

    text_sd = np_sd(ckpt["text_encoder"])
    move_sd = np_sd(ckpt["movement_encoder"])
    motion_sd = np_sd(ckpt["motion_encoder"])

    text = {"pos_emb": _dense(text_sd, "pos_emb"),
            "input_emb": _dense(text_sd, "input_emb"),
            "hidden": np.asarray(text_sd["hidden"]),
            "output_net_0": _dense(text_sd, "output_net.0"),
            "output_net_1": _ln(text_sd, "output_net.1"),
            "output_net_3": _dense(text_sd, "output_net.3")}
    text.update(_gru(text_sd, "gru"))

    def conv(sd, key):
        return {"kernel": np.asarray(sd[key + ".weight"]).transpose(2, 1, 0),
                "bias": np.asarray(sd[key + ".bias"])}

    move = {"conv1": conv(move_sd, "main.0"),
            "conv2": conv(move_sd, "main.3"),
            "out_net": _dense(move_sd, "out_net")}

    motion = {"input_emb": _dense(motion_sd, "input_emb"),
              "hidden": np.asarray(motion_sd["hidden"]),
              "output_net_0": _dense(motion_sd, "output_net.0"),
              "output_net_1": _ln(motion_sd, "output_net.1"),
              "output_net_3": _dense(motion_sd, "output_net.3")}
    motion.update(_gru(motion_sd, "gru"))

    to_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)
    return {"text": to_jnp(text), "movement": to_jnp(move),
            "motion": to_jnp(motion)}
