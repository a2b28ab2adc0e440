"""Sequence-parallel activation-sharding hook.

``parallel/sp.py`` shards the VAE's token axis over a ``seq`` mesh axis.
XLA's sharding propagation alone would happily all-gather the input once
and run the tower replicated; real sequence parallelism needs the
residual stream RE-constrained to the sequence sharding between layers so
LayerNorm / FFN / skip-fusion GEMMs stay 1/n-sized and only attention
pays a gather.  This module is that constraint point: a contextvar the
transformer stacks consult after every block (``constrain_seq``), set by
``parallel/sp.py``'s ``seq_sharding`` scope.  Lives in ``ops/`` (not
``parallel/``) so ``ops/transformer.py`` can import it without a cycle.

No reference counterpart: the reference's only parallelism is DDP
(/root/reference/src/train.py:153-165).
"""
from __future__ import annotations

import contextlib
import contextvars

import jax

__all__ = ["seq_sharding", "constrain_seq"]

# (jax.sharding.NamedSharding for [B, T, D] activations) or None
_seq_sharding_ctx = contextvars.ContextVar("ladiff_seq_sharding", default=None)


@contextlib.contextmanager
def seq_sharding(sharding):
    """Within this scope (at TRACE time), transformer stacks pin their
    inter-block activations to ``sharding`` ([B, T, D] layout)."""
    tok = _seq_sharding_ctx.set(sharding)
    try:
        yield
    finally:
        _seq_sharding_ctx.reset(tok)


def constrain_seq(x: jax.Array) -> jax.Array:
    """Identity outside a ``seq_sharding`` scope; inside, a
    ``with_sharding_constraint`` pinning [B, T, D] activations to the
    sequence sharding (differentiable; transpose is the same constraint)."""
    sh = _seq_sharding_ctx.get()
    if sh is None:
        return x
    return jax.lax.with_sharding_constraint(x, sh)
