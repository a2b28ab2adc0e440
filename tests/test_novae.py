"""Diffusion-only (novae) family: feature-space diffusion with no VAE
(reference config_novae_humanml3d.yaml, ladiff_denoiser.py pose embed/proj)."""
import jax
import jax.numpy as jnp
import numpy as np

from ladiff_tpu.models.ladiff import LADiffSystem

NFEATS, T = 263, 64


def novae_system():
    return LADiffSystem(
        nfeats=NFEATS, njoints=22, max_frames=T, latent_dim=(1, 64),
        ff_size=64, num_layers=3, num_heads=4, text_encoded_dim=48,
        num_inference_timesteps=2, vae_type="no", md_trans=False,
        max_it=0, lad=False,
        mean=np.zeros(NFEATS, np.float32), std=np.ones(NFEATS, np.float32))


def test_novae_generate_shapes_and_padding():
    system = novae_system()
    params = system.init_params(jax.random.PRNGKey(0))
    feats, z = system.generate(params, jnp.ones((2, 1, 48)),
                               jnp.zeros((2, 1, 48)), jnp.array([T, 40]),
                               jax.random.PRNGKey(1), nframes=T)
    assert feats.shape == (2, T, NFEATS)
    # padded frames zeroed by the denoiser's frame mask
    assert np.abs(np.asarray(feats[1, 40:])).max() == 0.0
    assert np.abs(np.asarray(feats[0])).max() > 0.0


def test_novae_training_step():
    from ladiff_tpu.parallel.mesh import make_mesh, shard_batch
    from ladiff_tpu.training.trainer import (create_train_state,
                                             make_diffusion_train_step,
                                             make_optimizer)

    system = novae_system()
    mesh = make_mesh()
    params = system.init_params(jax.random.PRNGKey(0))
    state = create_train_state(params["denoiser"], make_optimizer(1e-3))
    step = make_diffusion_train_step(system, mesh, params["vae"],
                                     np.zeros((1, 1, 48), np.float32))
    rng = np.random.RandomState(0)
    batch = shard_batch({
        "motion": jnp.asarray(rng.randn(8, T, NFEATS).astype(np.float32) * .3),
        "length": jnp.asarray(rng.randint(16, T + 1, 8).astype(np.int32)),
        "text_emb": jnp.asarray(rng.randn(8, 1, 48).astype(np.float32)),
    }, mesh)
    losses = []
    for i in range(6):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_novae_benchmark_eval_step():
    """The t2m benchmark-eval step must handle the no-vae family: the
    generated z IS the features (no decode, no vae params — regression:
    the eval path unconditionally called vae.decode and died on the
    novae family's empty vae tree during the hardware test.py drive)."""
    from ladiff_tpu.evaluation.t2m_eval import T2MEvaluator, make_eval_step

    system = novae_system()
    params = system.init_params(jax.random.PRNGKey(0))
    evaluator = T2MEvaluator.random_init(NFEATS)
    step = make_eval_step(system, evaluator, np.zeros(NFEATS, np.float32),
                          np.ones(NFEATS, np.float32), stage="diffusion")
    B = 2
    rs = np.random.RandomState(0)
    batch = {
        "motion": jnp.asarray(rs.randn(B, T, NFEATS).astype(np.float32)),
        "length": jnp.array([T, 40], jnp.int32),
        "word_embs": jnp.zeros((B, 4, 300), jnp.float32),
        "pos_ohot": jnp.zeros((B, 4, 15), jnp.float32),
        "text_len": jnp.full((B,), 4, jnp.int32),
    }
    rng = jax.random.PRNGKey(1)
    cond, uncond = jnp.ones((B, 1, 48)), jnp.zeros((B, 1, 48))
    out = step(params, batch, cond, uncond, rng)
    assert out["lat_rm"].shape == (B, 512)
    assert np.isfinite(np.asarray(out["lat_rm"])).all()
    assert out["z"].shape == (B, T, NFEATS)

    # pin the frame-masked passthrough: recompute the eval step's recons
    # embedding from the same sampler output with the mask applied — if
    # the step stopped masking padded frames (or went back through a
    # decode), this diverges
    from ladiff_tpu.utils.masks import lengths_to_mask
    z = system.diffusion_reverse(params["denoiser"], cond, uncond,
                                 batch["length"], rng)
    fv = lengths_to_mask(batch["length"], T)
    feats = jnp.where(fv[:, :, None], z, 0.0)
    want = evaluator.encode_motion(feats, batch["length"])
    # atol covers the eval step's identity renorm arithmetic (~2e-5);
    # dropping the mask moves these embeddings at the 1e-1 scale
    np.testing.assert_allclose(np.asarray(out["lat_rm"]), np.asarray(want),
                               atol=1e-3)
