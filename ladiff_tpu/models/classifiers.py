"""Frozen action classifiers for a2m evaluation.

Rebuild of the reference evaluation classifiers:
  * GRU ``MotionDiscriminator`` for HumanAct12
    (/root/reference/src/ladiff/models/architectures/humanact12_gru.py:6-82):
    2-layer GRU over flattened pose features, last-valid-step hidden ->
    tanh(linear) 30-d feature (FID) -> linear logits.
  * ST-GCN for UESTC
    (/root/reference/src/ladiff/models/architectures/uestc_stgcn.py:8-446):
    SMPL-skeleton spatial-temporal graph conv stack with edge-importance
    weighting; 256-d pooled features (FID) -> 1x1 conv logits.

Both run frozen in eval mode, so BatchNorm is an affine transform with the
loaded running statistics.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ladiff_tpu.models.evaluators import _gru_step

__all__ = ["MotionDiscriminator", "STGCN", "smpl_graph_adjacency",
           "load_gru_classifier_checkpoint"]


class MotionDiscriminator(nn.Module):
    """[B, T, F] features + [B] lengths -> (features_30d, logits)."""

    input_size: int = 72
    hidden_size: int = 128
    hidden_layer: int = 2
    output_size: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, motion: jax.Array, lengths: jax.Array,
                 rng: Optional[jax.Array] = None):
        B, T, F = motion.shape
        H = self.hidden_size
        init = nn.initializers.uniform(scale=1.0 / np.sqrt(H))
        x = motion.astype(self.dtype)
        # reference initHidden draws torch.randn per call (unseeded); we use
        # a provided key or zeros for determinism — with trained weights the
        # GRU forgets h0 quickly, and eval must be reproducible
        for layer in range(self.hidden_layer):
            in_size = F if layer == 0 else H
            params = {k: self.param(f"gru{layer}_{k}", init, s)
                      for k, s in (("w_ih", (3 * H, in_size)),
                                   ("w_hh", (3 * H, H)),
                                   ("b_ih", (3 * H,)), ("b_hh", (3 * H,)))}
            if rng is not None:
                h0 = jax.random.normal(jax.random.fold_in(rng, layer), (B, H))
            else:
                h0 = jnp.zeros((B, H))

            def step(h, xt):
                h = _gru_step(params, xt, h)
                return h, h

            _, seq = jax.lax.scan(step, h0, x.transpose(1, 0, 2))
            x = seq.transpose(1, 0, 2)  # [B, T, H]
        # select last valid step per sample
        idx = jnp.clip(lengths - 1, 0, T - 1)
        out = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
        feat = jnp.tanh(nn.Dense(30, dtype=self.dtype, name="linear1")(out))
        logits = nn.Dense(self.output_size, dtype=self.dtype,
                          name="linear2")(feat)
        return feat, logits


def load_gru_classifier_checkpoint(path: str):
    """Convert the reference GRU classifier ckpt (``model`` state dict)."""
    import os
    if not os.path.exists(path):
        return None
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in ckpt["model"].items()}
    P = {}
    for layer in (0, 1):
        P[f"gru{layer}_w_ih"] = sd[f"recurrent.weight_ih_l{layer}"]
        P[f"gru{layer}_w_hh"] = sd[f"recurrent.weight_hh_l{layer}"]
        P[f"gru{layer}_b_ih"] = sd[f"recurrent.bias_ih_l{layer}"]
        P[f"gru{layer}_b_hh"] = sd[f"recurrent.bias_hh_l{layer}"]
    P["linear1"] = {"kernel": sd["linear1.weight"].T,
                    "bias": sd["linear1.bias"]}
    P["linear2"] = {"kernel": sd["linear2.weight"].T,
                    "bias": sd["linear2.bias"]}
    return jax.tree.map(jnp.asarray, P)


# ---------------------------------------------------------------------------
# ST-GCN
# ---------------------------------------------------------------------------

SMPL_EDGES = [
    (0, 1), (0, 2), (0, 3), (1, 4), (2, 5), (3, 6), (4, 7), (5, 8), (6, 9),
    (7, 10), (8, 11), (9, 12), (9, 13), (9, 14), (12, 15), (13, 16), (14, 17),
    (16, 18), (17, 19), (18, 20), (19, 21), (20, 22), (21, 23),
]


def smpl_graph_adjacency(num_nodes: int = 24,
                         strategy: str = "spatial") -> np.ndarray:
    """Normalized adjacency stack [K, V, V].

    Faithful rebuild of the reference ``Graph`` (uestc_stgcn.py:211-352,
    smpl layout, max_hop=1): hop distances from self-links + kinematic-tree
    edges, ``normalize_digraph`` (A @ D^-1, zero column for isolated nodes),
    and spatial partitioning stacked exactly as the reference does —
    [hop-0 root, hop-1 root+centripetal, hop-1 centrifugal] — so converted
    ``uestc_rot6d_stgcn.tar`` edge-importance tensors line up slot-for-slot.
    """
    V = num_nodes
    assert V == 24, "reference UESTC classifier uses the 24-joint smpl layout"
    edges = [(i, i) for i in range(V)] + SMPL_EDGES
    A = np.zeros((V, V), np.float64)
    for i, j in edges:
        A[i, j] = 1
        A[j, i] = 1
    # hop distance via adjacency powers (reference get_hop_distance, max_hop=1)
    hop = np.full((V, V), np.inf)
    hop[A > 0] = 1
    np.fill_diagonal(hop, 0)
    # normalize_digraph: AD = A @ Dn with Dn[i,i] = deg^-1 (0 if isolated)
    deg = A.sum(0)
    Dn = np.zeros_like(A)
    nz = deg > 0
    Dn[nz, nz] = 1.0 / deg[nz]
    AD = A @ Dn
    if strategy == "uniform":
        return AD[None].astype(np.float32)
    # spatial partitioning about center joint 0 (reference :444-466): for
    # each hop, split by center distance; hop 0 contributes its root slice,
    # hop 1 contributes (root + centripetal) and centrifugal slices
    center = 0
    out = []
    for h in (0, 1):
        a_root = np.zeros((V, V))
        a_close = np.zeros((V, V))
        a_far = np.zeros((V, V))
        for i in range(V):
            for j in range(V):
                if hop[j, i] == h:
                    if hop[j, center] == hop[i, center]:
                        a_root[j, i] = AD[j, i]
                    elif hop[j, center] > hop[i, center]:
                        a_close[j, i] = AD[j, i]
                    else:
                        a_far[j, i] = AD[j, i]
        if h == 0:
            out.append(a_root)
        else:
            out.append(a_root + a_close)
            out.append(a_far)
    return np.stack(out).astype(np.float32)


class _FrozenBN(nn.Module):
    """Eval-mode BatchNorm: x * scale/sqrt(var+eps) + (bias - mean*...)."""

    features: int
    axis_name: str = "channel"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, channel_axis=-1):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        mean = self.param("mean", nn.initializers.zeros_init(),
                          (self.features,))
        var = self.param("var", nn.initializers.ones_init(),
                         (self.features,))
        shape = [1] * x.ndim
        shape[channel_axis] = self.features
        rs = lambda v: v.reshape(shape).astype(x.dtype)
        inv = jax.lax.rsqrt(var + 1e-5)
        return x * rs(scale * inv) + rs(bias - mean * scale * inv)


class STGCNBlock(nn.Module):
    in_channels: int
    out_channels: int
    temporal_kernel: int = 9
    spatial_kernel: int = 3
    stride: int = 1
    residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, A: jax.Array) -> jax.Array:
        """x: [B, T, V, C]; A: [K, V, V]."""
        K = self.spatial_kernel
        C_out = self.out_channels
        res = x
        # spatial graph conv: 1x1 conv to K*C_out, then contract over A
        y = nn.Conv(K * C_out, (1, 1), dtype=self.dtype, name="gcn_conv")(x)
        B, T, V, _ = y.shape
        y = y.reshape(B, T, V, K, C_out)
        y = jnp.einsum("btvkc,kvw->btwc", y, A.astype(y.dtype))
        y = _FrozenBN(C_out, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        # temporal conv (k x 1) with stride on T
        pad = (self.temporal_kernel - 1) // 2
        y = nn.Conv(C_out, (self.temporal_kernel, 1),
                    strides=(self.stride, 1), padding=[(pad, pad), (0, 0)],
                    dtype=self.dtype, name="tcn_conv")(y)
        y = _FrozenBN(C_out, dtype=self.dtype, name="bn2")(y)
        if self.residual:
            if self.in_channels != C_out or self.stride != 1:
                res = nn.Conv(C_out, (1, 1), strides=(self.stride, 1),
                              dtype=self.dtype, name="res_conv")(res)
                res = _FrozenBN(C_out, dtype=self.dtype, name="res_bn")(res)
        else:
            res = 0.0
        return nn.relu(y + res)


class STGCN(nn.Module):
    """[B, T, V, C] pose sequences -> (features_256, logits).

    Input layout note (reference allsplit_step, ladiff.py:1475-1483): the
    reference feeds rot6d features reshaped CHANNEL-major —
    ``feats.view(B, T, 6, 25).permute(0, 3, 2, 1)[:, :-1]`` — i.e. feature
    ``c * 25 + v`` belongs to (channel c, node v), and the translation node
    (v = 24) is dropped before the 24-joint smpl graph.  Use
    ``stgcn_input_from_feats`` to replicate that slicing.
    """

    in_channels: int = 6
    num_class: int = 40
    num_nodes: int = 24
    edge_importance_weighting: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        A = jnp.asarray(smpl_graph_adjacency(self.num_nodes))
        B, T, V, C = x.shape
        # data_bn over V*C channels
        y = x.reshape(B, T, V * C)
        y = _FrozenBN(V * C, dtype=self.dtype, name="data_bn")(y)
        y = y.reshape(B, T, V, C)
        channels = [(self.in_channels, 64, 1, False), (64, 64, 1, True),
                    (64, 64, 1, True), (64, 64, 1, True), (64, 128, 2, True),
                    (128, 128, 1, True), (128, 128, 1, True),
                    (128, 256, 2, True), (256, 256, 1, True),
                    (256, 256, 1, True)]
        for i, (cin, cout, stride, resid) in enumerate(channels):
            if self.edge_importance_weighting:
                imp = self.param(f"edge_importance_{i}",
                                 nn.initializers.ones_init(), A.shape)
                Ai = A * imp
            else:
                Ai = A
            y = STGCNBlock(cin, cout, stride=stride, residual=resid,
                           dtype=self.dtype, name=f"st_gcn_{i}")(y, Ai)
        feat = y.mean(axis=(1, 2))  # [B, 256] global pooled features (FID)
        logits = nn.Dense(self.num_class, dtype=self.dtype,
                          name="fcn")(feat)
        return feat, logits


def stgcn_input_from_feats(feats: jax.Array) -> jax.Array:
    """[B, T, 150] rot6d+translation features -> [B, T, 24, 6] classifier
    input, replicating the reference slicing (ladiff.py:1475-1483:
    ``view(B, T, 6, 25).permute(0, 3, 2, 1)[:, :-1]``): channel-major
    reshape, translation node dropped."""
    B, T, F = feats.shape
    x = feats.reshape(B, T, 6, F // 6)       # [B, T, C=6, V]
    return x.transpose(0, 1, 3, 2)[:, :, :-1]  # [B, T, V-1, C]


def load_stgcn_checkpoint(path: str):
    """Convert the reference ``uestc_rot6d_stgcn.tar`` state dict
    (reference metrics/stgcn.py:42-45; module uestc_stgcn.py:8-110) to our
    STGCN param tree.  Returns None when the asset is missing."""
    import os
    if not os.path.exists(path):
        return None
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    sd = {k: v.numpy() for k, v in sd.items()}

    def bn(prefix):
        return {"scale": np.asarray(sd[prefix + ".weight"]),
                "bias": np.asarray(sd[prefix + ".bias"]),
                "mean": np.asarray(sd[prefix + ".running_mean"]),
                "var": np.asarray(sd[prefix + ".running_var"])}

    def conv(prefix):
        # torch Conv2d [out, in, kh, kw] -> flax [kh, kw, in, out]
        return {"kernel": np.asarray(sd[prefix + ".weight"])
                .transpose(2, 3, 1, 0),
                "bias": np.asarray(sd[prefix + ".bias"])}

    P: Dict[str, Any] = {"data_bn": bn("data_bn")}
    i = 0
    while f"st_gcn_networks.{i}.gcn.conv.weight" in sd:
        pre = f"st_gcn_networks.{i}"
        block = {"gcn_conv": conv(pre + ".gcn.conv"),
                 "bn1": bn(pre + ".tcn.0"),
                 "tcn_conv": conv(pre + ".tcn.2"),
                 "bn2": bn(pre + ".tcn.3")}
        if pre + ".residual.0.weight" in sd:
            block["res_conv"] = conv(pre + ".residual.0")
            block["res_bn"] = bn(pre + ".residual.1")
        P[f"st_gcn_{i}"] = block
        if f"edge_importance.{i}" in sd:
            P[f"edge_importance_{i}"] = np.asarray(sd[f"edge_importance.{i}"])
        i += 1
    # fcn: reference 1x1 Conv2d applied to pooled [B, 256, 1, 1]; ours Dense
    P["fcn"] = {"kernel": np.asarray(sd["fcn.weight"])[:, :, 0, 0].T,
                "bias": np.asarray(sd["fcn.bias"])}
    return jax.tree.map(jnp.asarray, P)
