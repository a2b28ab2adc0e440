"""Tests for LA-VAE, LA-denoiser, schedulers, and the scan sampler."""
import jax
import jax.numpy as jnp
import numpy as np

from ladiff_tpu.diffusion.sampling import ddim_sample, make_cfg_denoise_fn
from ladiff_tpu.diffusion.schedulers import ddim_timesteps, make_schedule
from ladiff_tpu.models.denoiser import LADenoiser
from ladiff_tpu.models.vae import LAVae
from ladiff_tpu.utils.masks import latent_valid_mask, lengths_to_mask

NFEATS = 263
T = 196
MAX_IT = 5
D = 64  # small width for test speed


def tiny_vae():
    return LAVae(nfeats=NFEATS, latent_dim=(7, D), ff_size=128, num_layers=3,
                 num_heads=4, dropout=0.0, max_it=MAX_IT, frame_per_latent=48)


def test_vae_encode_decode_shapes_and_masking():
    vae = tiny_vae()
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (3, T, NFEATS))
    lengths = jnp.array([196, 60, 48])
    params = vae.init(jax.random.PRNGKey(1), feats, lengths, jax.random.PRNGKey(2))
    z, mu, logvar, lat_valid = vae.apply(
        params, feats, lengths, rng=jax.random.PRNGKey(3), method=vae.encode)
    assert z.shape == (3, MAX_IT, D)
    # ceil(196/48)=5, ceil(60/48)=2, ceil(48/48)=1
    np.testing.assert_array_equal(
        np.asarray(lat_valid.sum(axis=1)), [5, 2, 1])
    # inactive latent rows exactly zero
    assert np.abs(np.asarray(z[1, 2:])).max() == 0.0
    assert np.abs(np.asarray(z[2, 1:])).max() == 0.0

    feats_rst = vae.apply(params, z, lengths, nframes=T, method=vae.decode)
    assert feats_rst.shape == (3, T, NFEATS)
    # padded frames zeroed
    assert np.abs(np.asarray(feats_rst[1, 60:])).max() == 0.0


def test_vae_encode_ignores_padded_frames():
    vae = tiny_vae()
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, T, NFEATS))
    lengths = jnp.array([100, 100])
    params = vae.init(jax.random.PRNGKey(1), feats, lengths, jax.random.PRNGKey(2))
    _, mu1, _, _ = vae.apply(params, feats, lengths,
                             rng=jax.random.PRNGKey(3), method=vae.encode)
    feats2 = feats.at[:, 100:].set(55.0)
    _, mu2, _, _ = vae.apply(params, feats2, lengths,
                             rng=jax.random.PRNGKey(3), method=vae.encode)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-4)


def _denoiser(md_trans):
    return LADenoiser(nfeats=NFEATS, latent_dim=(7, D), ff_size=128,
                      num_layers=3, num_heads=4, dropout=0.0,
                      text_encoded_dim=96, md_trans=md_trans)


def test_denoiser_shapes_both_wirings():
    for md in (True, False):
        den = _denoiser(md)
        sample = jax.random.normal(jax.random.PRNGKey(0), (2, MAX_IT, D))
        t = jnp.array([10, 500])
        text = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 96))
        valid = latent_valid_mask(jnp.array([196, 60]), 48, MAX_IT)
        params = den.init(jax.random.PRNGKey(2), sample, t, text, valid)
        out = den.apply(params, sample, t, text, valid)
        assert out.shape == (2, MAX_IT, D)
        assert np.isfinite(np.asarray(out)).all()


def test_denoiser_md_masked_rows_do_not_leak():
    den = _denoiser(True)
    sample = jax.random.normal(jax.random.PRNGKey(0), (2, MAX_IT, D))
    t = jnp.array([10, 500])
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 96))
    valid = latent_valid_mask(jnp.array([60, 60]), 48, MAX_IT)  # 2 active
    params = den.init(jax.random.PRNGKey(2), sample, t, text, valid)
    out1 = den.apply(params, sample, t, text, valid)
    sample2 = sample.at[:, 2:].set(42.0)
    out2 = den.apply(params, sample2, t, text, valid)
    np.testing.assert_allclose(np.asarray(out1[:, :2]), np.asarray(out2[:, :2]),
                               atol=1e-4)


def test_schedule_matches_manual_ddim():
    """Independent numpy re-derivation of diffusers DDIM math."""
    sched = make_schedule()
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp,
                               rtol=1e-6)
    ts, prev = ddim_timesteps(1000, 20, steps_offset=1)
    assert ts[0] == 951 and ts[-1] == 1 and prev[-1] == -49
    # one manual step
    x = np.random.RandomState(0).randn(2, 5, 8).astype(np.float32)
    eps = np.random.RandomState(1).randn(2, 5, 8).astype(np.float32)
    t, tp = int(ts[3]), int(prev[3])
    a_t, a_p = acp[t], acp[tp]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    want = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    got = sched.ddim_step(jnp.asarray(eps), jnp.asarray(t), jnp.asarray(tp),
                          jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    # final step uses final_alpha_cumprod = acp[0]
    t, tp = int(ts[-1]), int(prev[-1])
    a_t, a_p = acp[t], acp[0]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    want = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    got = sched.ddim_step(jnp.asarray(eps), jnp.asarray(t), jnp.asarray(tp),
                          jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_add_noise_formula():
    sched = make_schedule()
    x0 = jnp.ones((2, 5, 8))
    noise = jnp.full((2, 5, 8), 2.0)
    t = jnp.array([0, 999])
    out = sched.add_noise(x0, noise, t)
    acp = np.asarray(sched.alphas_cumprod)
    for i, ti in enumerate([0, 999]):
        want = np.sqrt(acp[ti]) * 1.0 + np.sqrt(1 - acp[ti]) * 2.0
        np.testing.assert_allclose(np.asarray(out[i]), want, rtol=1e-5)


def test_ddim_sample_respects_latent_mask_and_is_deterministic():
    sched = make_schedule()
    B, D_ = 3, 8
    valid = latent_valid_mask(jnp.array([196, 60, 48]), 48, MAX_IT)

    def denoise(latents, t, text, lv, aux=None):
        return latents * 0.1  # dummy eps predictor

    guided = make_cfg_denoise_fn(denoise, jnp.zeros((B, 1, 4)),
                                 jnp.ones((B, 1, 4)), guidance_scale=7.5)
    out1 = ddim_sample(guided, sched, jax.random.PRNGKey(0), (B, MAX_IT, D_),
                       20, latent_valid=valid)
    out2 = ddim_sample(guided, sched, jax.random.PRNGKey(0), (B, MAX_IT, D_),
                       20, latent_valid=valid)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.abs(np.asarray(out1[1, 2:])).max() == 0.0
    assert np.abs(np.asarray(out1[2, 1:])).max() == 0.0
    assert np.abs(np.asarray(out1[0])).max() > 0.0


def test_lengths_to_mask():
    m = lengths_to_mask(jnp.array([3, 0, 5]), 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[1, 1, 1, 0, 0], [0, 0, 0, 0, 0], [1, 1, 1, 1, 1]])


def test_vae_mlp_dist_ablation():
    """MLP_DIST: latent_size tokens + Linear(D->2D) mu/logvar split."""
    vae = LAVae(nfeats=NFEATS, latent_dim=(7, D), ff_size=128, num_layers=3,
                num_heads=4, dropout=0.0, max_it=0, lad=False, mlp_dist=True)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, T, NFEATS))
    lengths = jnp.array([196, 100])
    params = vae.init(jax.random.PRNGKey(1), feats, lengths, jax.random.PRNGKey(2))
    assert params["params"]["global_motion_token"].shape == (7, D)
    z, mu, logvar, _ = vae.apply(params, feats, lengths,
                                 rng=jax.random.PRNGKey(3), method=vae.encode)
    assert z.shape == (2, 7, D)
    assert np.isfinite(np.asarray(z)).all()


def test_vae_fact_and_mean_sampling():
    vae = tiny_vae()
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, T, NFEATS))
    lengths = jnp.array([196, 100])
    params = vae.init(jax.random.PRNGKey(1), feats, lengths, jax.random.PRNGKey(2))
    _, mu, _, _ = vae.apply(params, feats, lengths, sample_mean=True,
                            method=vae.encode)
    z_mean, mu2, _, _ = vae.apply(params, feats, lengths, sample_mean=True,
                                  method=vae.encode)
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(mu2))
    # fact=0 collapses the sample to the mean
    z0, mu3, _, _ = vae.apply(params, feats, lengths,
                              rng=jax.random.PRNGKey(4), fact=0.0,
                              method=vae.encode)
    lat_valid = np.asarray(z0) != 0
    np.testing.assert_allclose(np.asarray(z0)[lat_valid.nonzero()],
                               np.asarray(mu3)[lat_valid.nonzero()], atol=1e-6)
