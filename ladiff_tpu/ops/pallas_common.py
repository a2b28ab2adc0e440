"""Shared helpers for the fused Pallas kernels.

Single home for the in-kernel numerics every fused layer uses, so a change
(e.g. LN eps, the erf polynomial) applies to all kernels at once.
"""
from __future__ import annotations

import contextlib
import contextvars
import os

import jax
import jax.numpy as jnp

__all__ = ["ln", "erf", "dot", "dot_t", "NEG_INF", "pallas_enabled",
           "no_pallas", "dropout_masks", "scoped_vmem_bytes",
           "train_vmem_params", "align_block_samples"]

NEG_INF = -1e9  # large finite negative keeps softmax numerics safe in bf16

_no_pallas_ctx = contextvars.ContextVar("ladiff_no_pallas", default=False)


@contextlib.contextmanager
def no_pallas():
    """Trace-time scope that forces the plain-XLA module paths.

    Needed wherever a ``deterministic=True`` forward is DIFFERENTIATED —
    the fused inference kernels define no VJP.  The canonical case is the
    joint vae_diffusion stage's generation branch: the reference finetunes
    the decoder on generated latents through an eval-mode (no-dropout)
    decode (ladiff.py FINETUNE_DECODER), so that decode must stay on XLA
    ops while the surrounding sampler may still use the kernels.
    """
    tok = _no_pallas_ctx.set(True)
    try:
        yield
    finally:
        _no_pallas_ctx.reset(tok)


def pallas_enabled() -> bool:
    """Backend half of every fused-kernel gate (callers add their own
    shape/determinism conditions).

    LADIFF_DISABLE_PALLAS=1 forces the plain-XLA path even on TPU: the
    fused kernels define no VJP, so any caller differentiating through a
    ``deterministic=True`` forward pass needs it, and it enables
    kernel-vs-XLA A/B timing.  Read at trace time, as is the
    ``no_pallas()`` scope.
    """
    return (jax.default_backend() == "tpu"
            and not _no_pallas_ctx.get()
            and os.environ.get("LADIFF_DISABLE_PALLAS", "0") != "1")


def dropout_masks(seed_ref, rate, shapes):
    """Regenerable in-kernel dropout keep-masks, scaled by 1/keep.

    Seeded by (user seed, program_id); the TRAINING kernels call this with
    the SAME shape list in the same order in their forward and backward,
    so both passes draw identical masks (the flash-style remat contract).
    rate == 0 is specialized away at trace time.  Single home on purpose:
    a change here (threshold rounding, seed folding) must apply to every
    fused training kernel at once or fwd/bwd masks silently diverge.
    """
    if rate <= 0.0:
        return [1.0 for _ in shapes]
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    keep = 1.0 - rate
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    thresh = jnp.uint32(keep * 4294967295.0)
    out = []
    for shape in shapes:
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        out.append((bits < thresh).astype(jnp.float32) / keep)
    return out


def scoped_vmem_bytes(env_name: str, default_mb: int = 0):
    """Scoped-VMEM budget for a kernel's pallas_call (trace-time).

    The env var can only RAISE the budget above ``default_mb`` — several
    kernels share one knob (e.g. LADIFF_TRAIN_VMEM_MB covers every
    training backward), and a value tuned for one kernel's sweep must
    never lower another kernel below its known-required default (the
    whole-layer bwds need 24M/48M regardless).  0/unset anywhere = that
    side contributes nothing; both zero = compiler default (None).
    """
    mb = max(int(os.environ.get(env_name, "0") or 0), default_mb)
    return mb * 1024 * 1024 if mb else None


def train_vmem_params(default_mb: int = 0):
    """scoped_vmem_bytes under the shared training-backward knob."""
    return scoped_vmem_bytes("LADIFF_TRAIN_VMEM_MB", default_mb)


def align_block_samples(block_samples, B, *row_units):
    """Smallest sample block >= min(block_samples, B) making every
    ``Bb * unit`` row count 8-sublane aligned.

    Single home for the inference kernels' block sizing so the bump is
    deterministic AND audible where it matters: an odd LADIFF_MD_BLOCK
    override can land ABOVE the requested size, exceeding the
    VMEM-residency sizing the kernel docstrings assume — that case warns
    (trace-time, once per shape thanks to jit caching).  The routine
    small-batch bump (B=3 clamped then aligned up to <=8 rows) stays
    silent: it is bounded by the 8-row floor, always below the default
    block's residency, and was the pre-round-4 behavior for every demo
    run — warning there would only train users to ignore the signal.
    """
    import warnings
    req = max(1, min(block_samples, B))
    Bb = req
    while any((Bb * u) % 8 != 0 for u in row_units):
        Bb += 1  # terminates: any multiple of 8 aligns every unit
    if Bb > max(block_samples, 8):
        warnings.warn(
            f"block_samples={req} bumped to {Bb} for 8-row alignment "
            f"(row units {row_units}); kernel VMEM residency scales with "
            f"the block", stacklevel=2)
    return Bb


def ln(x, scale, bias):
    """LayerNorm, eps 1e-5 (torch parity)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias


def erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7).

    Mosaic implements neither erf nor erfc; 1.5e-7 is far below bf16
    activation resolution, so 'exact (erf) GELU' parity holds to well
    under the fused paths' hardware matmul tolerance (documented in
    CLAUDE.md / PERF.md).
    """
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def dot(a, b):
    """a [M, K] x b [K, N] -> [M, N], f32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def dot_t(a, b):
    """a [M, D] x b [K, D] -> [M, K] (contract on D, no transpose copy)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
