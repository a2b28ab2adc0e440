"""Tensor-parallel (model-axis) sharding: a TP(4,2) train step must compute
the same math as the DP(8,1) step — XLA's SPMD partitioning with the
parallel/tp.py Megatron-style specs is a layout change, not a model change."""
import jax
import pytest

pytestmark = pytest.mark.slow  # heavy harness: excluded from the fast lane
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ladiff_tpu.models.ladiff import LADiffSystem
from ladiff_tpu.parallel.mesh import make_mesh, shard_batch
from ladiff_tpu.parallel.tp import shard_train_state, tp_spec_for
import optax

from ladiff_tpu.training.trainer import (create_train_state, make_optimizer,
                                         make_vae_train_step)

NFEATS, T = 263, 32


def _system():
    return LADiffSystem(
        nfeats=NFEATS, njoints=22, max_frames=T, latent_dim=(2, 256),
        ff_size=512, num_layers=3, num_heads=4, dropout=0.0,
        text_encoded_dim=48,
        mean=np.zeros(NFEATS, np.float32), std=np.ones(NFEATS, np.float32))


def test_tp_step_matches_dp():
    system = _system()
    params = system.init_params(jax.random.PRNGKey(0))["vae"]
    rng = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rng.randn(8, T, NFEATS).astype(np.float32) * .3),
        "length": jnp.asarray(rng.randint(8, T + 1, 8).astype(np.int32)),
    }

    def run(mesh, state, n_steps=2):
        step = make_vae_train_step(system, mesh)
        b = shard_batch(batch, mesh)
        losses = []
        for i in range(n_steps):
            state, logs = step(state, b, jax.random.PRNGKey(i))
            losses.append(float(logs["total"]))
        return jax.tree.map(np.asarray, jax.device_get(state.params)), losses

    mesh_dp = make_mesh()                      # (8, 1)
    mesh_tp = make_mesh(n_model=2)             # (4, 2)

    # gradient parity without optimizer amplification: one SGD step makes
    # the param delta equal the gradient, so the comparison reads the SPMD
    # rounding directly.  (AdamW would amplify rounding on zero-gradient
    # leaves into full sign flips — mu/(sqrt(nu)+eps) of pure noise.)
    sgd = optax.sgd(1e-2)
    # the jitted steps donate their state: give each mesh its own copy
    g_dp, _ = run(mesh_dp, create_train_state(
        jax.tree.map(jnp.copy, params), sgd), n_steps=1)
    state_tp = shard_train_state(
        create_train_state(jax.tree.map(jnp.copy, params), sgd), mesh_tp)
    # the specs must actually shard the big matrices
    n_sharded = sum(x.sharding.spec != P()
                    for x in jax.tree.leaves(state_tp.params))
    assert n_sharded >= 4 * system.num_layers, n_sharded
    g_tp, _ = run(mesh_tp, state_tp, n_steps=1)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(g_tp)[0],
            jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))

    # AdamW integration: loss trajectories agree step for step
    _, l_dp = run(mesh_dp, create_train_state(
        jax.tree.map(jnp.copy, params), make_optimizer()))
    _, l_tp = run(mesh_tp, shard_train_state(create_train_state(
        jax.tree.map(jnp.copy, params), make_optimizer()), mesh_tp))
    np.testing.assert_allclose(l_tp, l_dp, rtol=2e-5)


def test_tp_spec_table():
    """Name-based rules hit the intended leaves and nothing unexpected."""
    import jax.tree_util as jtu
    system = _system()
    params = system.init_params(jax.random.PRNGKey(0))["vae"]
    flat = jtu.tree_flatten_with_path(params)[0]
    specs = {jtu.keystr(p): tp_spec_for(p, x, 2) for p, x in flat}
    col = [k for k, s in specs.items() if s == P(None, "model")]
    row = [k for k, s in specs.items() if s == P("model", None)]
    assert any("linear1" in k and "kernel" in k for k in col)
    assert any("in_proj_kernel" in k for k in col)
    assert any("linear2" in k and "kernel" in k for k in row)
    assert any("out_proj" in k and "kernel" in k for k in row)
    # LayerNorms and skip-fusion Dense blocks stay replicated
    assert all(s == P() for k, s in specs.items() if "norm" in k)
    assert all(s == P() for k, s in specs.items() if "linear_blocks" in k)
