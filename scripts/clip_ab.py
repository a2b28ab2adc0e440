"""A/B the fused CLIP-layer kernels (ops/pallas_clip_layer.py) vs the plain
XLA tower at a given token bucket, on real TPU.

    python scripts/clip_ab.py                         # fused (default gate)
    LADIFF_DISABLE_PALLAS=1 python scripts/clip_ab.py # plain XLA
    AB_WIDTH=77 python scripts/clip_ab.py             # 77-pad protocol
    # the production gate fuses only at S<=32 (measured crossover); to
    # re-measure the fused path AT 77-pad, raise it:
    AB_WIDTH=77 LADIFF_CLIP_FUSE_S=77 python scripts/clip_ab.py

Timing follows the repo protocol (CLAUDE.md): scan-amortized batches, sum
to a scalar inside jit and fetch it, subtract a best-of-N no-op round trip
(block_until_ready does not wait over the axon relay).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

BATCH = 256
K = 8          # scan batches per timed fetch


def main():
    from ladiff_tpu.utils.jax_cache import enable as _enable
    _enable()
    from ladiff_tpu.models.clip_text import CLIPTextTower

    dtype = jnp.bfloat16
    width = int(os.environ.get("AB_WIDTH", "32"))
    tower = CLIPTextTower(dtype=dtype)
    rs = np.random.RandomState(1)
    ids = jnp.asarray(rs.randint(1, 49405, size=(K, BATCH, width),
                                 dtype=np.int32))
    tp = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        tower.init(jax.random.PRNGKey(3), ids[0]))

    @jax.jit
    def run(tp, rng):
        acc, _ = jax.lax.scan(
            lambda c, i: (c + jnp.float32(jnp.sum(tower.apply(tp, i))),
                          None), jnp.float32(0.0), ids)
        return acc + jnp.float32(jax.random.uniform(rng, ()))

    @jax.jit
    def noop(rng):
        return jnp.float32(jax.random.uniform(rng, ()))

    np.asarray(run(tp, jax.random.PRNGKey(0)))
    np.asarray(noop(jax.random.PRNGKey(0)))
    best_run, best_noop = 1e9, 1e9
    for i in range(6):
        t0 = time.perf_counter()
        np.asarray(noop(jax.random.PRNGKey(i)))
        best_noop = min(best_noop, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run(tp, jax.random.PRNGKey(100 + i)))
        best_run = min(best_run, time.perf_counter() - t0)
    ms = (best_run - best_noop) / K * 1e3
    print(json.dumps({
        "pallas": os.environ.get("LADIFF_DISABLE_PALLAS", "0") != "1",
        "width": width, "batch": BATCH,
        "ms_per_batch": round(ms, 2)}))


if __name__ == "__main__":
    main()
