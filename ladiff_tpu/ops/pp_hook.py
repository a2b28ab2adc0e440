"""Pipeline-parallel encoder-override hook.

``parallel/pp.py`` pipelines the denoiser's MD skip stack over a ``pipe``
mesh axis.  To train through that schedule without forking the model code,
the stack's flax module consults this contextvar at the top of its
``__call__``: when a ``pp_encoder_override`` scope is active (at TRACE
time, like ``sp_hook``/``no_pallas``), the bound encoder hands its inputs
to the override — ``parallel/pp.py`` routes them through the GPipe
shard_map program — instead of running its layer loop.  Lives in ``ops/``
(not ``parallel/``) so ``ops/stylization.py`` can import it without a
cycle.

No reference counterpart: the reference's only parallelism is DDP
(/root/reference/src/train.py:153-165).
"""
from __future__ import annotations

import contextlib
import contextvars

__all__ = ["pp_encoder_override", "pp_override_get"]

# callable(bound_encoder, x, xf, emb, latent_valid) -> tokens, or None
_pp_override_ctx = contextvars.ContextVar("ladiff_pp_override", default=None)


@contextlib.contextmanager
def pp_encoder_override(fn):
    """Within this scope (at trace time), MDSkipTransformerEncoder
    delegates its forward to ``fn(bound_encoder, x, xf, emb,
    latent_valid)``."""
    tok = _pp_override_ctx.set(fn)
    try:
        yield
    finally:
        _pp_override_ctx.reset(tok)


def pp_override_get():
    return _pp_override_ctx.get()
