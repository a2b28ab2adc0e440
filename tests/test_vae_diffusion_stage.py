"""Joint vae_diffusion stage: loss composition + sharded training step."""
import jax
import pytest

pytestmark = pytest.mark.slow  # heavy harness: excluded from the fast lane
import jax.numpy as jnp
import numpy as np

from ladiff_tpu.models.ladiff import LADiffSystem
from ladiff_tpu.parallel.mesh import make_mesh, shard_batch
from ladiff_tpu.training.trainer import (create_train_state, make_optimizer,
                                         make_vae_diffusion_train_step)

NFEATS, T = 263, 64


def test_vae_diffusion_joint_step():
    system = LADiffSystem(
        nfeats=NFEATS, njoints=22, max_frames=T, latent_dim=(7, 32),
        ff_size=64, num_layers=3, num_heads=4, dropout=0.0,
        text_encoded_dim=48, num_inference_timesteps=2,
        mean=np.zeros(NFEATS, np.float32), std=np.ones(NFEATS, np.float32))
    mesh = make_mesh()
    params = system.init_params(jax.random.PRNGKey(0))
    # the jitted step donates its state (first-class like the other two
    # stages), so snapshot the initial params on host for the comparison
    params0 = jax.tree.map(np.asarray, params)
    state = create_train_state(params, make_optimizer(1e-3))
    uncond = np.zeros((1, 1, 48), np.float32)
    step = make_vae_diffusion_train_step(system, mesh, uncond)

    rng = np.random.RandomState(0)
    batch = shard_batch({
        "motion": jnp.asarray(rng.randn(8, T, NFEATS).astype(np.float32) * .3),
        "length": jnp.asarray(rng.randint(16, T + 1, 8).astype(np.int32)),
        "text_emb": jnp.asarray(rng.randn(8, 1, 48).astype(np.float32)),
    }, mesh)

    losses = []
    for i in range(4):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["total"]))
    assert np.isfinite(losses).all()
    # composed loss carries all three groups
    for key in ("vae_recons_feature", "diff_inst_loss", "gen_feature"):
        assert key in logs, list(logs)
    # both subtrees updated
    moved = jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).max()),
                         params0, state.params)
    assert max(jax.tree.leaves(moved["vae"])) > 0
    assert max(jax.tree.leaves(moved["denoiser"])) > 0
