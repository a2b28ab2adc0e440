"""KIT-ML variant: 251 feats / 21 joints through the full pipeline."""
import numpy as np

from ladiff_tpu.data.datamodule import T2MDataModule
from ladiff_tpu.data.synthetic import generate_synthetic_dataset
from ladiff_tpu.data.word_vectorizer import HashWordVectorizer


def test_kit_datamodule_and_joints(tmp_path):
    root = generate_synthetic_dataset(str(tmp_path), n_clips=16, nfeats=251,
                                      seed=0)
    dm = T2MDataModule("kit", root, HashWordVectorizer(), batch_size=4)
    assert dm.nfeats == 251 and dm.njoints == 21
    batch = next(iter(dm.loader("train")))
    assert batch["motion"].shape[2] == 251
    joints = dm.feats2joints(batch["motion"])
    assert joints.shape[-2:] == (21, 3)
    assert np.isfinite(np.asarray(joints)).all()


def test_kit_system_generation(tmp_path):
    import jax
    import jax.numpy as jnp
    from ladiff_tpu.models.ladiff import LADiffSystem

    system = LADiffSystem(
        nfeats=251, njoints=21, max_frames=64, latent_dim=(7, 32),
        ff_size=64, num_layers=3, num_heads=4, text_encoded_dim=48,
        num_inference_timesteps=2,
        mean=np.zeros(251, np.float32), std=np.ones(251, np.float32))
    params = system.init_params(jax.random.PRNGKey(0))
    feats, z = system.generate(params, jnp.ones((2, 1, 48)),
                               jnp.zeros((2, 1, 48)), jnp.array([64, 48]),
                               jax.random.PRNGKey(1), nframes=64)
    assert feats.shape == (2, 64, 251)
    joints = system.feats2joints(feats)
    assert joints.shape == (2, 64, 21, 3)
