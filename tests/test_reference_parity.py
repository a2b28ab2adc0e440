"""End-to-end checkpoint parity: build the reference torch models with random
weights, convert through our checkpoint converters, and compare full forward
passes.  This is the strongest evidence that released reference checkpoints
drop into this framework unchanged."""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy harness: excluded from the fast lane

torch = pytest.importorskip("torch")

# the reference imports optional deps (clip) at module import time; clip is
# genuinely uninstalled (guard-checked; see tests/_stubs.py), so the stub
# cannot poison later imports — nothing else can import "clip".
from _stubs import stub_missing  # noqa: E402

stub_missing("clip")
sys.path.insert(0, "/root/reference/src")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class _Ablation:
    MLP_DIST = False
    PE_TYPE = "mld"
    DIFF_PE_TYPE = "mld"
    DVAE = False
    PERCENTAGE_NOISED = 0.0
    MAX_IT = 5
    FRAME_PER_LATENT = 48
    JOINT_DISTRO_FIX = False
    LAD = True
    TEST_EFFICIENCY = False
    SKIP_CONNECT = True
    VAE_TYPE = "ladiff"
    IDEA = "ard"
    MD_TRANS = True


def test_vae_full_forward_parity(tmp_path):
    from ladiff.models.architectures.ladiff_vae import LADiffVae

    from ladiff_tpu.models.vae import LAVae
    from ladiff_tpu.utils.checkpoint import load_reference_vae_checkpoint

    torch.manual_seed(0)
    ref = LADiffVae(ablation=_Ablation(), nfeats=263, latent_dim=[7, 256],
                    ff_size=256, num_layers=3, num_heads=4, dropout=0.0,
                    arch="encoder_decoder",
                    position_embedding="learned").eval()
    ckpt = str(tmp_path / "vae.ckpt")
    torch.save({"state_dict": {("vae." + k): v
                               for k, v in ref.state_dict().items()}}, ckpt)

    params = jax.tree.map(jnp.asarray,
                          load_reference_vae_checkpoint(ckpt, 3))
    ours = LAVae(nfeats=263, latent_dim=(7, 256), ff_size=256, num_layers=3,
                 num_heads=4, dropout=0.0, max_it=5, frame_per_latent=48)

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 96, 263).astype(np.float32) * 0.3
    lengths = [96, 50]

    with torch.no_grad():
        _, dist_t, _ = ref.encode(torch.tensor(feats), lengths)
        mu_t = dist_t.loc.permute(1, 0, 2).numpy()
        feats_t = ref.decode(dist_t.loc, lengths).numpy()

    _, mu_j, _, _ = ours.apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(lengths),
        sample_mean=True, method=ours.encode)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t, atol=1e-4)

    feats_j = ours.apply({"params": params}, jnp.asarray(mu_t),
                         jnp.asarray(lengths), nframes=96, method=ours.decode)
    np.testing.assert_allclose(np.asarray(feats_j), feats_t, atol=1e-4)


def test_md_denoiser_full_forward_parity(tmp_path):
    from ladiff.models.architectures.ladiff_denoiser import LADiffDenoiser

    from ladiff_tpu.models.denoiser import LADenoiser
    from ladiff_tpu.utils.checkpoint import \
        load_reference_denoiser_checkpoint

    torch.manual_seed(1)
    ref = LADiffDenoiser(ablation=_Ablation(), nfeats=263, condition="text",
                         latent_dim=[7, 256], ff_size=256, num_layers=3,
                         num_heads=4, dropout=0.0, arch="trans_enc",
                         text_encoded_dim=96,
                         position_embedding="learned").eval()
    ckpt = str(tmp_path / "den.ckpt")
    torch.save({"state_dict": {("denoiser." + k): v
                               for k, v in ref.state_dict().items()}}, ckpt)

    params = jax.tree.map(
        jnp.asarray,
        load_reference_denoiser_checkpoint(ckpt, 3, md_trans=True))
    ours = LADenoiser(nfeats=263, latent_dim=(7, 256), ff_size=256,
                      num_layers=3, num_heads=4, dropout=0.0,
                      text_encoded_dim=96, md_trans=True)

    rng = np.random.RandomState(2)
    sample = rng.randn(2, 5, 256).astype(np.float32)
    text = rng.randn(2, 1, 96).astype(np.float32)
    lengths = [96, 50]
    mie = torch.tensor([2, 2])  # ceil(96/48), ceil(50/48)... -> [2, 2]

    with torch.no_grad():
        out_t = ref(sample=torch.tensor(sample),
                    timestep=torch.tensor(57),
                    encoder_hidden_states=torch.tensor(text),
                    max_iter_elements=mie)[0].numpy()

    valid = jnp.arange(5)[None, :] < jnp.asarray([2, 2])[:, None]
    out_j = ours.apply({"params": params}, jnp.asarray(sample),
                       jnp.full((2,), 57), jnp.asarray(text), valid)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=1e-4)
