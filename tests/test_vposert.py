"""VPosert MLP-VAE parity vs the reference torch implementation
(/root/reference/src/ladiff/models/architectures/vposert_vae.py:27-145),
including BatchNorm running-stat conversion."""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# clip is genuinely uninstalled (guard-checked; see tests/_stubs.py).
from _stubs import stub_missing  # noqa: E402

stub_missing("clip")
if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ladiff_tpu.models.vposert_vae import (VPosert,  # noqa: E402
                                           convert_torch_vposert)


def _ref_model():
    from ladiff.models.architectures.vposert_vae import VPosert as RefVPosert

    torch.manual_seed(0)
    ref = RefVPosert(cfg=None).eval()
    # randomize BN affine params and running stats so the conversion of all
    # four arrays is actually exercised (defaults are 1/0/0/1)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.2)
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
    return ref


def test_vposert_matches_reference():
    ref = _ref_model()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_torch_vposert(sd))
    model = VPosert()

    rng = np.random.RandomState(1)
    x = rng.randn(3, 196, 263).astype(np.float32)

    with torch.no_grad():
        z_ref, q_ref = ref.encode(torch.from_numpy(x))
        dec_ref = ref.decode(q_ref.mean.unsqueeze(0))

    mu, scale = model.apply(variables, jnp.asarray(x),
                            method=model.dist_params)
    np.testing.assert_allclose(np.asarray(mu), q_ref.mean.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scale), q_ref.scale.numpy(),
                               rtol=1e-4, atol=1e-4)

    dec = model.apply(variables, mu[None], method=model.decode)
    assert dec.shape == (3, 196, 263)
    np.testing.assert_allclose(np.asarray(dec),
                               dec_ref.view(3, 196, 263).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_vposert_api_shapes_and_sampling():
    model = VPosert(frames=8, nfeats=16, num_neurons=32, latent_dim=12)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16),
                    dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    z, (mu, scale) = model.apply(variables, x, method=model.encode,
                                 rng=jax.random.PRNGKey(1))
    assert z.shape == (1, 2, 12)  # reference unsqueeze(0) layout
    assert float(jnp.min(scale)) > 0  # softplus
    assert not np.allclose(np.asarray(z[0]), np.asarray(mu))  # sampled
    feats, z2, _ = model.apply(variables, x)  # rng=None -> mean path
    np.testing.assert_array_equal(np.asarray(z2[0]), np.asarray(mu))
    assert feats.shape == (2, 8, 16)
