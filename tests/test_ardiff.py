"""Tests for the autoregressive (ARDIFF) diffusion variant."""
import jax
import jax.numpy as jnp
import numpy as np

from ladiff_tpu.models.ladiff import LADiffSystem

NFEATS, NJOINTS, T = 263, 22, 196


def ar_system():
    return LADiffSystem(
        nfeats=NFEATS, njoints=NJOINTS, max_frames=T, latent_dim=(7, 32),
        ff_size=64, num_layers=3, num_heads=4, text_encoded_dim=48,
        num_inference_timesteps=3, ardiff=True, motion_conditioning="last",
        mean=np.zeros(NFEATS, np.float32), std=np.ones(NFEATS, np.float32))


def test_ar_sampling_shapes_and_masking():
    system = ar_system()
    params = system.init_params(jax.random.PRNGKey(0))
    B = 3
    tc = jnp.ones((B, 1, 48))
    tu = jnp.zeros((B, 1, 48))
    lengths = jnp.array([196, 60, 48])
    z = system.diffusion_reverse_ar(params["denoiser"], tc, tu, lengths,
                                    jax.random.PRNGKey(1))
    assert z.shape == (B, 5, 32)
    # inactive rows zero: ceil(60/48)=2 active, ceil(48/48)=1 active
    assert np.abs(np.asarray(z[1, 2:])).max() == 0.0
    assert np.abs(np.asarray(z[2, 1:])).max() == 0.0
    assert np.abs(np.asarray(z[0])).max() > 0.0
    # deterministic under the same key
    z2 = system.diffusion_reverse_ar(params["denoiser"], tc, tu, lengths,
                                     jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))


def test_ar_full_conditioning_runs():
    import dataclasses
    system = dataclasses.replace(ar_system(), motion_conditioning="full")
    params = system.init_params(jax.random.PRNGKey(0))
    B = 2
    z = system.diffusion_reverse_ar(
        params["denoiser"], jnp.ones((B, 1, 48)), jnp.zeros((B, 1, 48)),
        jnp.array([196, 100]), jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(z)).all()


def test_ar_training_step_decreases_loss():
    from ladiff_tpu.parallel.mesh import make_mesh, shard_batch
    from ladiff_tpu.training.trainer import (create_train_state,
                                             make_diffusion_train_step,
                                             make_optimizer)

    system = ar_system()
    mesh = make_mesh()
    params = system.init_params(jax.random.PRNGKey(0))
    state = create_train_state(params["denoiser"], make_optimizer(1e-3))
    uncond = np.zeros((1, 1, 48), np.float32)
    step = make_diffusion_train_step(system, mesh, params["vae"], uncond)
    rng = np.random.RandomState(0)
    batch = shard_batch({
        "motion": jnp.asarray(rng.randn(8, T, NFEATS).astype(np.float32) * .3),
        "length": jnp.asarray(rng.randint(48, T + 1, 8).astype(np.int32)),
        "text_emb": jnp.asarray(rng.randn(8, 1, 48).astype(np.float32)),
    }, mesh)
    losses = []
    for i in range(14):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["total"]))
    assert np.isfinite(losses).all()
    # AR loss is noisy (random token choice + timesteps); compare means
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_ar_generate_end_to_end():
    system = ar_system()
    params = system.init_params(jax.random.PRNGKey(0))
    feats, z = system.generate(params, jnp.ones((2, 1, 48)),
                               jnp.zeros((2, 1, 48)),
                               jnp.array([196, 96]), jax.random.PRNGKey(3),
                               nframes=T)
    assert feats.shape == (2, T, NFEATS)
    assert np.abs(np.asarray(feats[1, 96:])).max() == 0.0
