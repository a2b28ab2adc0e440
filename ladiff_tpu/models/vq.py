"""VQ-VAE motion tokenizer (the reference's alternate VQ stack).

Rebuild of /root/reference/src/ladiff/models/architectures/{vqdiff.py,
encdec.py, resnet.py, quantize_cnn.py} — a T2M-GPT-style 1-D conv VQ-VAE
over motion features with four quantizer flavors (``orig`` learned
codebook, ``ema``, ``ema_reset``, ``reset``).  NB the reference copy is
dead code and broken as shipped (vqdiff.py:2 imports a nonexistent
``models.encdec`` module); this is a working TPU-native rebuild of the
same surface.

TPU-first recast:
  * channels-last [B, T, C] convolutions (XLA's native 1-D conv layout)
    instead of torch's [B, C, T] — checkpoints are layout-converted, not
    the compute;
  * the EMA codebook is explicit functional state (``EmaState``) updated
    by pure jittable functions, not module buffers mutated in-place — the
    update is one ``segment_sum`` + where, and composes with pjit (wrap
    the state update in a psum for data-parallel training);
  * straight-through estimator via ``jax.lax.stop_gradient``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Resnet1D", "Encoder1D", "Decoder1D", "VQVae", "HumanVQDiff",
           "EmaState", "ema_init", "ema_update", "nearest_code",
           "perplexity"]


def _act(name: str):
    return {"relu": nn.relu, "silu": nn.silu,
            "gelu": lambda x: nn.gelu(x, approximate=False)}[name]


class ResConv1DBlock(nn.Module):
    """Dilated 3-tap conv + 1x1 conv residual block
    (reference resnet.py:12-68)."""

    n_state: int
    dilation: int = 1
    activation: str = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = x
        if self.norm == "LN":
            h = nn.LayerNorm(epsilon=1e-5, name="norm1")(h)
        elif self.norm == "GN":
            h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(h)
        h = _act(self.activation)(h)
        h = nn.Conv(self.n_state, (3,), padding=self.dilation,
                    kernel_dilation=(self.dilation,), name="conv1")(h)
        if self.norm == "LN":
            h = nn.LayerNorm(epsilon=1e-5, name="norm2")(h)
        elif self.norm == "GN":
            h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
        h = _act(self.activation)(h)
        h = nn.Conv(x.shape[-1], (1,), name="conv2")(h)
        return x + h


class Resnet1D(nn.Module):
    """Stack with geometric dilation growth (reference resnet.py:71-83)."""

    n_depth: int
    dilation_growth_rate: int = 1
    reverse_dilation: bool = True
    activation: str = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        dil = [self.dilation_growth_rate ** d for d in range(self.n_depth)]
        if self.reverse_dilation:
            dil = dil[::-1]
        for i, d in enumerate(dil):
            x = ResConv1DBlock(x.shape[-1], d, self.activation, self.norm,
                               name=f"block_{i}")(x)
        return x


class Encoder1D(nn.Module):
    """Strided conv downsampling encoder (reference encdec.py:4-33):
    [B, T, F] -> [B, T / stride^down_t, width]."""

    output_emb_width: int = 512
    down_t: int = 3
    stride_t: int = 2
    width: int = 512
    depth: int = 3
    dilation_growth_rate: int = 3
    activation: str = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.width, (3,), padding=1, name="in_conv")(x))
        filt, pad = self.stride_t * 2, self.stride_t // 2
        for i in range(self.down_t):
            x = nn.Conv(self.width, (filt,), strides=(self.stride_t,),
                        padding=pad, name=f"down_{i}")(x)
            # NB the reference encoder keeps Resnet1D's reverse_dilation
            # default of True (encdec.py:26 passes it positionally up to
            # dilation_growth_rate only) — torch-parity-tested via
            # tests/test_mld_vae_t2m.py
            x = Resnet1D(self.depth, self.dilation_growth_rate,
                         reverse_dilation=True, activation=self.activation,
                         norm=self.norm, name=f"res_{i}")(x)
        return nn.Conv(self.output_emb_width, (3,), padding=1,
                       name="out_conv")(x)


class Decoder1D(nn.Module):
    """Nearest-upsample decoder mirror (reference encdec.py:35-67)."""

    out_feats: int = 263
    down_t: int = 3
    width: int = 512
    depth: int = 3
    dilation_growth_rate: int = 3
    activation: str = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.width, (3,), padding=1, name="in_conv")(x))
        for i in range(self.down_t):
            x = Resnet1D(self.depth, self.dilation_growth_rate,
                         reverse_dilation=True, activation=self.activation,
                         norm=self.norm, name=f"res_{i}")(x)
            B, T, C = x.shape
            x = jnp.repeat(x, 2, axis=1)  # nearest upsample x2
            x = nn.Conv(self.width, (3,), padding=1, name=f"up_{i}")(x)
        x = nn.relu(nn.Conv(self.width, (3,), padding=1, name="mid_conv")(x))
        return nn.Conv(self.out_feats, (3,), padding=1, name="out_conv")(x)


# ---------------------------------------------------------------------------
# quantizers
# ---------------------------------------------------------------------------

def nearest_code(codebook: jax.Array, x: jax.Array) -> jax.Array:
    """argmin_k ||x - c_k||^2 (reference quantize_cnn.py:82-89).
    codebook [K, C], x [..., C] -> int32 [...]."""
    flat = x.reshape(-1, x.shape[-1])
    d = (jnp.sum(flat ** 2, -1, keepdims=True)
         - 2.0 * flat @ codebook.T
         + jnp.sum(codebook ** 2, -1)[None, :])
    return jnp.argmin(d, axis=-1).reshape(x.shape[:-1]).astype(jnp.int32)


def perplexity(code_idx: jax.Array, nb_code: int) -> jax.Array:
    """exp(H[code usage]) (reference quantize_cnn.py:39-46)."""
    counts = jnp.zeros((nb_code,)).at[code_idx.reshape(-1)].add(1.0)
    prob = counts / jnp.sum(counts)
    return jnp.exp(-jnp.sum(prob * jnp.log(prob + 1e-7)))


@dataclass(frozen=True)
class EmaState:
    """Functional EMA codebook state (reference QuantizeEMAReset buffers)."""

    codebook: jax.Array    # [K, C]
    code_sum: jax.Array    # [K, C]
    code_count: jax.Array  # [K]


def ema_init(x: jax.Array, nb_code: int, rng: jax.Array) -> EmaState:
    """Tile encoder outputs (+ noise) to seed the codebook
    (reference quantize_cnn.py:21-36)."""
    flat = x.reshape(-1, x.shape[-1])
    n, c = flat.shape
    reps = (nb_code + n - 1) // n
    out = jnp.tile(flat, (reps, 1))
    out = out + jax.random.normal(rng, out.shape) * (0.01 / (c ** 0.5))
    codebook = out[:nb_code]
    return EmaState(codebook=codebook, code_sum=codebook,
                    code_count=jnp.ones((nb_code,)))


def ema_update(state: EmaState, x: jax.Array, code_idx: jax.Array,
               mu: float, rng: jax.Array, reset: bool = True) -> EmaState:
    """One EMA step (+ dead-code reset) — pure function of (state, batch)
    (reference quantize_cnn.py:48-74).  For data-parallel training, psum
    ``batch_sum``/``batch_count`` across the mesh before the blend."""
    flat = x.reshape(-1, x.shape[-1])
    idx = code_idx.reshape(-1)
    K = state.codebook.shape[0]
    batch_sum = jnp.zeros_like(state.code_sum).at[idx].add(flat)
    batch_count = jnp.zeros((K,)).at[idx].add(1.0)

    code_sum = mu * state.code_sum + (1 - mu) * batch_sum
    code_count = mu * state.code_count + (1 - mu) * batch_count
    update = code_sum / code_count[:, None]
    if reset:
        n, c = flat.shape
        reps = (K + n - 1) // n
        rand = jnp.tile(flat, (reps, 1))[:K] \
            + jax.random.normal(rng, (K, c)) * (0.01 / (c ** 0.5))
        usage = (code_count >= 1.0)[:, None]
        codebook = jnp.where(usage, update, rand)
    else:
        codebook = update
    return EmaState(codebook=codebook, code_sum=code_sum,
                    code_count=code_count)


class VQVae(nn.Module):
    """Conv encoder -> quantizer -> conv decoder
    (reference VQVAE_251, vqdiff.py:6-89).

    ``quantizer='orig'`` keeps a learned codebook parameter with the
    VQ-VAE codebook+commitment loss; the EMA flavors take the codebook as
    an argument (functional state managed by the training loop via
    ema_init/ema_update)."""

    nfeats: int = 263
    nb_code: int = 1024
    code_dim: int = 512
    output_emb_width: int = 512
    down_t: int = 3
    stride_t: int = 2
    width: int = 512
    depth: int = 3
    dilation_growth_rate: int = 3
    activation: str = "relu"
    norm: Optional[str] = None
    quantizer: str = "orig"
    beta: float = 1.0

    def setup(self):
        assert self.code_dim == self.output_emb_width, \
            "codebook entries live in the encoder's output space"
        self.encoder = Encoder1D(self.output_emb_width, self.down_t,
                                 self.stride_t, self.width, self.depth,
                                 self.dilation_growth_rate, self.activation,
                                 self.norm, name="encoder")
        self.decoder = Decoder1D(self.nfeats, self.down_t, self.width,
                                 self.depth, self.dilation_growth_rate,
                                 self.activation, self.norm, name="decoder")
        if self.quantizer == "orig":
            self.codebook_param = self.param(
                "codebook",
                lambda rng, shape: jax.random.uniform(
                    rng, shape, minval=-1.0 / self.nb_code,
                    maxval=1.0 / self.nb_code),
                (self.nb_code, self.code_dim))

    def _codebook(self, codebook: Optional[jax.Array]) -> jax.Array:
        if codebook is not None:
            return codebook
        assert self.quantizer == "orig", \
            "EMA quantizers need an explicit codebook (EmaState.codebook)"
        return self.codebook_param

    def encode(self, x: jax.Array,
               codebook: Optional[jax.Array] = None) -> jax.Array:
        """[B, T, F] motion -> [B, L] code indices (vqdiff.py:48-58)."""
        z = self.encoder(x)
        return nearest_code(self._codebook(codebook), z)

    def decode_codes(self, code_idx: jax.Array,
                     codebook: Optional[jax.Array] = None) -> jax.Array:
        """[B, L] indices -> [B, T, F] motion (vqdiff.py:81-88)."""
        z_q = self._codebook(codebook)[code_idx]
        return self.decoder(z_q)

    def __call__(self, x: jax.Array,
                 codebook: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Returns (x_out, loss, perplexity, code_idx)
        (vqdiff.py:61-78 + quantizer forwards)."""
        z = self.encoder(x)
        cb = self._codebook(codebook)
        idx = nearest_code(cb, z)
        z_q = cb[idx]
        if self.quantizer == "orig":
            # codebook loss + beta * commitment (quantize_cnn.py:151-153)
            loss = (jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
                    + self.beta
                    * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2))
        else:
            # EMA flavors: commitment only (quantize_cnn.py:116)
            loss = jnp.mean((z - jax.lax.stop_gradient(z_q)) ** 2)
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through
        x_out = self.decoder(z_q)
        return x_out, loss, perplexity(idx, self.nb_code), idx


class HumanVQDiff(nn.Module):
    """API wrapper matching the reference HumanVQDIFF (vqdiff.py:92-121)."""

    nfeats: int = 263
    nb_code: int = 512
    code_dim: int = 512
    quantizer: str = "orig"

    def setup(self):
        self.vqvae = VQVae(nfeats=self.nfeats, nb_code=self.nb_code,
                           code_dim=self.code_dim,
                           quantizer=self.quantizer, name="vqvae")

    def encode(self, x, codebook=None):
        return self.vqvae.encode(x, codebook)

    def __call__(self, x, codebook=None):
        return self.vqvae(x, codebook)

    def forward_decoder(self, code_idx, codebook=None):
        return self.vqvae.decode_codes(code_idx, codebook)
