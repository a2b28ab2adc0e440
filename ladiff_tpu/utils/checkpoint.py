"""Orbax checkpointing with the reference's resume/convention semantics.

Reference behavior mirrored:
  * periodic epoch checkpoints, keep-all
    (/root/reference/src/train.py:140-149, ModelCheckpoint every
    SACE_CHECKPOINT_EPOCH epochs with save_top_k=-1),
  * frozen submodules (CLIP text tower, T2M evaluators) are never part of
    the saved tree — the reference strips ``text_encoder.*`` keys on save
    and re-injects on load (modeltype/base.py:96-127); here they simply
    live outside the train state,
  * resume scan: newest checkpoint in the experiment dir
    (/root/reference/src/train.py:26-53).

Also provides ``load_reference_vae_checkpoint``: stage-2 boot from a
reference stage-1 torch ckpt via key-prefix surgery
(/root/reference/src/train.py:181-193) mapped onto our param tree.
"""
from __future__ import annotations

import os
import re
from os.path import join as pjoin
from typing import Any, Optional, Tuple

import numpy as np

__all__ = ["CheckpointManager", "latest_checkpoint",
           "load_reference_vae_checkpoint",
           "load_reference_denoiser_checkpoint"]


class CheckpointManager:
    """Thin orbax wrapper storing {params, opt_state?, step}."""

    def __init__(self, ckpt_dir: str):
        import orbax.checkpoint as ocp
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, tree: Any) -> str:
        path = pjoin(self.ckpt_dir, f"epoch_{step}")
        self._ckptr.save(path, tree, force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, step: Optional[int] = None,
                target: Any = None) -> Tuple[int, Any]:
        if step is None:
            found = latest_checkpoint(self.ckpt_dir)
            if found is None:
                raise FileNotFoundError(f"no checkpoints in {self.ckpt_dir}")
            step, path = found
        else:
            path = pjoin(self.ckpt_dir, f"epoch_{step}")
        tree = self._ckptr.restore(path, target)
        return step, tree


def latest_checkpoint(ckpt_dir: str) -> Optional[Tuple[int, str]]:
    """Highest ``epoch_*`` checkpoint (reference train.py:38-44 scans for
    the highest epoch=*.ckpt)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"epoch_(\d+)", name)
        if m:
            step = int(m.group(1))
            if best is None or step > best[0]:
                best = (step, pjoin(ckpt_dir, name))
    return best


# ---------------------------------------------------------------------------
# Reference torch checkpoint conversion
# ---------------------------------------------------------------------------

def _dense(sd, key):
    return {"kernel": np.asarray(sd[key + ".weight"]).T,
            "bias": np.asarray(sd[key + ".bias"])}


def _ln(sd, key):
    return {"scale": np.asarray(sd[key + ".weight"]),
            "bias": np.asarray(sd[key + ".bias"])}


def _mha(sd, key):
    """torch fused in_proj -> our fused layout (kernel transposed)."""
    return {
        "in_proj_kernel": np.asarray(sd[key + ".in_proj_weight"]).T,
        "in_proj_bias": np.asarray(sd[key + ".in_proj_bias"]),
        "out_proj": _dense(sd, key + ".out_proj"),
    }


def _encoder_layer(sd, p):
    return {
        "self_attn": _mha(sd, p + "self_attn"),
        "linear1": _dense(sd, p + "linear1"),
        "linear2": _dense(sd, p + "linear2"),
        "norm1": _ln(sd, p + "norm1"),
        "norm2": _ln(sd, p + "norm2"),
    }


def _decoder_layer(sd, p):
    out = _encoder_layer(sd, p)
    out["multihead_attn"] = _mha(sd, p + "multihead_attn")
    out["norm3"] = _ln(sd, p + "norm3")
    return out


def _skip_blocks(sd, prefix, layer_fn, num_layers):
    nb = (num_layers - 1) // 2
    out = {}
    for i in range(nb):
        out[f"input_blocks_{i}"] = layer_fn(sd, f"{prefix}input_blocks.{i}.")
        out[f"output_blocks_{i}"] = layer_fn(sd, f"{prefix}output_blocks.{i}.")
        out[f"linear_blocks_{i}"] = _dense(sd, f"{prefix}linear_blocks.{i}")
    out["middle_block"] = layer_fn(sd, f"{prefix}middle_block.")
    out["norm"] = _ln(sd, prefix + "norm")
    return out


def _stylization(sd, p):
    return {"emb_layers_1": _dense(sd, p + "emb_layers.1"),
            "norm": _ln(sd, p + "norm"),
            "out_layers_2": _dense(sd, p + "out_layers.2")}


def _md_layer(sd, p):
    return {
        "sa_block": _encoder_layer(sd, p + "sa_block."),
        "ca_block": {
            "norm": _ln(sd, p + "ca_block.norm"),
            "text_norm": _ln(sd, p + "ca_block.text_norm"),
            "query": _dense(sd, p + "ca_block.query"),
            "key": _dense(sd, p + "ca_block.key"),
            "value": _dense(sd, p + "ca_block.value"),
            "proj_out": _stylization(sd, p + "ca_block.proj_out."),
        },
        "ffn": {
            "linear1": _dense(sd, p + "ffn.linear1"),
            "linear2": _dense(sd, p + "ffn.linear2"),
            "proj_out": _stylization(sd, p + "ffn.proj_out."),
        },
    }


def _torch_load(path: str):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def load_reference_vae_checkpoint(path: str, num_layers: int = 9):
    """Reference stage-1 ckpt (``vae.*`` keys) -> our LAVae param tree."""
    sd = _torch_load(path)
    sd = {k[len("vae."):]: v for k, v in sd.items() if k.startswith("vae.")} or sd
    P = {
        "skel_embedding": _dense(sd, "skel_embedding"),
        "final_layer": _dense(sd, "final_layer"),
        "global_motion_token": np.asarray(sd["global_motion_token"]),
        "query_pos_encoder": {"pe": np.asarray(
            sd["query_pos_encoder.pe"]).squeeze(1)},
        "query_pos_decoder": {"pe": np.asarray(
            sd["query_pos_decoder.pe"]).squeeze(1)},
        "encoder": _skip_blocks(sd, "encoder.", _encoder_layer, num_layers),
        "decoder": _skip_blocks(sd, "decoder.", _decoder_layer, num_layers),
    }
    return P


def load_reference_denoiser_checkpoint(path: str, num_layers: int = 9,
                                       md_trans: bool = True):
    """Reference stage-2 ckpt (``denoiser.*`` keys) -> LADenoiser params."""
    sd = _torch_load(path)
    sd = {k[len("denoiser."):]: v for k, v in sd.items()
          if k.startswith("denoiser.")} or sd
    layer_fn = _md_layer if md_trans else _encoder_layer
    P = {
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2")},
        "emb_proj_1": _dense(sd, "emb_proj.1"),
        "query_pos": {"pe": np.asarray(sd["query_pos.pe"]).squeeze(1)},
        "encoder": _skip_blocks(sd, "encoder.", layer_fn, num_layers),
    }
    return P


def load_reference_actor_vae_checkpoint(path: str, num_layers: int = 9):
    """Reference ActorVae ckpt (``vae.*`` keys; architectures/actor_vae.py:
    11-258) -> our ActorVae param tree (models/actor_vae.py).

    Layer-name mapping: torch ``nn.TransformerEncoder/DecoderLayer`` children
    (self_attn / multihead_attn / linear1-2 / norm1-3) line up with our
    post-norm layers; the sinusoidal ``sequence_pos_encoding.pe`` buffers are
    recomputed on the fly and deliberately dropped (the reference's own
    restore does the same for the denoiser PE, train.py:205-209)."""
    sd = _torch_load(path)
    sd = {k[len("vae."):]: v for k, v in sd.items()
          if k.startswith("vae.")} or sd
    P = {
        "skel_embedding": _dense(sd, "encoder.skel_embedding"),
        "mu_token": np.asarray(sd["encoder.mu_token"]),
        "logvar_token": np.asarray(sd["encoder.logvar_token"]),
        "final_layer": _dense(sd, "decoder.final_layer"),
    }
    for i in range(num_layers):
        P[f"enc_{i}"] = _encoder_layer(
            sd, f"encoder.seqTransEncoder.layers.{i}.")
        P[f"dec_{i}"] = _decoder_layer(
            sd, f"decoder.seqTransDecoder.layers.{i}.")
    return P


def load_reference_action_denoiser_checkpoint(path: str, num_layers: int = 9,
                                              md_trans: bool = True):
    """Reference action-conditioned denoiser ckpt -> LADenoiser params:
    like load_reference_denoiser_checkpoint, but condition='action' swaps
    the ReLU+Linear text projection for the EmbedAction table
    (ladiff_denoiser.py:74-82, 298-346)."""
    sd = _torch_load(path)
    sd = {k[len("denoiser."):]: v for k, v in sd.items()
          if k.startswith("denoiser.")} or sd
    layer_fn = _md_layer if md_trans else _encoder_layer
    return {
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2")},
        "emb_proj": {"action_embedding":
                     np.asarray(sd["emb_proj.action_embedding"])},
        "query_pos": {"pe": np.asarray(sd["query_pos.pe"]).squeeze(1)},
        "encoder": _skip_blocks(sd, "encoder.", layer_fn, num_layers),
    }
