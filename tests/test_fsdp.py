"""FSDP (ZeRO-3 over the data axis): the fsdp=True train step must compute
the same math as the replicated DP step — parallel/fsdp.py only changes the
layout of the train state (params + AdamW moments sharded 1/n per device);
XLA's SPMD partitioner inserts the all-gather / reduce-scatter schedule."""
import jax
import pytest

pytestmark = pytest.mark.slow  # heavy harness: excluded from the fast lane
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ladiff_tpu.models.ladiff import LADiffSystem
from ladiff_tpu.parallel.fsdp import fsdp_spec_for, shard_train_state
from ladiff_tpu.parallel.mesh import make_mesh, shard_batch
from ladiff_tpu.training.trainer import (create_train_state, make_optimizer,
                                         make_vae_train_step)

NFEATS, T = 263, 32


def _system():
    return LADiffSystem(
        nfeats=NFEATS, njoints=22, max_frames=T, latent_dim=(2, 256),
        ff_size=512, num_layers=3, num_heads=4, dropout=0.0,
        text_encoded_dim=48,
        mean=np.zeros(NFEATS, np.float32), std=np.ones(NFEATS, np.float32))


def test_fsdp_step_matches_dp():
    system = _system()
    params = system.init_params(jax.random.PRNGKey(0))["vae"]
    rng = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rng.randn(8, T, NFEATS).astype(np.float32) * .3),
        "length": jnp.asarray(rng.randint(8, T + 1, 8).astype(np.int32)),
    }
    mesh = make_mesh()  # (8, 1): FSDP shards over the data axis itself
    n_dev = 8

    def run(state, fsdp, n_steps=2):
        step = make_vae_train_step(system, mesh, fsdp=fsdp)
        b = shard_batch(batch, mesh)
        losses = []
        for i in range(n_steps):
            state, logs = step(state, b, jax.random.PRNGKey(i))
            losses.append(float(logs["total"]))
        return jax.tree.map(np.asarray, jax.device_get(state.params)), losses

    # gradient parity without optimizer amplification (see test_tp.py: one
    # SGD step makes the param delta equal the gradient)
    sgd = optax.sgd(1e-2)
    g_dp, _ = run(create_train_state(
        jax.tree.map(jnp.copy, params), sgd), fsdp=False, n_steps=1)
    state_fs = shard_train_state(
        create_train_state(jax.tree.map(jnp.copy, params), sgd), mesh)
    sharded = [x for x in jax.tree.leaves(state_fs.params)
               if x.sharding.spec != P()]
    assert len(sharded) >= 4 * system.num_layers, len(sharded)
    # each sharded leaf really holds 1/n of the elements per device
    for x in sharded:
        assert int(np.prod(x.sharding.shard_shape(x.shape))) * n_dev == x.size
    g_fs, _ = run(state_fs, fsdp=True, n_steps=1)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(g_fs)[0],
            jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))

    # AdamW integration: the optimizer moments are sharded too (ZeRO), and
    # the loss trajectories agree step for step
    _, l_dp = run(create_train_state(
        jax.tree.map(jnp.copy, params), make_optimizer()), fsdp=False)
    state_fs = shard_train_state(create_train_state(
        jax.tree.map(jnp.copy, params), make_optimizer()), mesh)
    mu = state_fs.opt_state[0].mu
    assert any(x.sharding.spec != P() for x in jax.tree.leaves(mu))
    _, l_fs = run(state_fs, fsdp=True)
    # slightly looser than the TP test: the reduce-scatter gradient
    # schedule reorders f32 sums, and AdamW amplifies that by step 2
    np.testing.assert_allclose(l_fs, l_dp, rtol=1e-4)


def test_fsdp_spec_rule():
    """Largest divisible dim is sharded; indivisible leaves replicate."""
    assert fsdp_spec_for(np.zeros((256, 263)), 8) == P("data", None)
    assert fsdp_spec_for(np.zeros((263, 512)), 8) == P(None, "data")
    assert fsdp_spec_for(np.zeros((263,)), 8) == P()          # indivisible
    assert fsdp_spec_for(np.zeros((256,)), 8) == P("data")
    assert fsdp_spec_for(np.zeros(()), 8) == P()              # scalar leaf
    assert fsdp_spec_for(np.zeros((256, 512)), 1) == P()      # single device
