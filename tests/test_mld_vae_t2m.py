"""MldVae (T2M-GPT conv stack) parity vs the reference torch implementation
(/root/reference/src/ladiff/models/architectures/mld_vae_t2m.py:35-111 on
encdec.py / resnet.py) — this also gives the Encoder1D/Decoder1D conv stack
its first direct torch-parity coverage (the VQ wrapper that shares it is
broken-as-shipped in the reference and untestable end-to-end)."""
import sys
import types

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

from ladiff_tpu.models.mld_vae_t2m import (MldVaeT2m,  # noqa: E402
                                           convert_torch_mld_vae_t2m)


class _Ablation:
    MLP_DIST = False
    PE_TYPE = "mld"


@pytest.fixture(scope="module")
def ref_and_ours():
    from ladiff.models.architectures.mld_vae_t2m import MldVae as RefMldVae

    torch.manual_seed(0)
    nfeats = 67
    ref = RefMldVae(_Ablation(), nfeats=nfeats).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_torch_mld_vae_t2m(sd))
    return ref, MldVaeT2m(nfeats=nfeats), variables


def test_encode_matches_reference(ref_and_ours):
    ref, model, variables = ref_and_ours
    rng = np.random.RandomState(1)
    x = rng.randn(2, 32, 67).astype(np.float32)
    with torch.no_grad():
        z_ref, dist_ref = ref.encode(torch.from_numpy(x))
    z, dist = model.apply(variables, jnp.asarray(x), method=model.encode)
    assert dist is None and dist_ref is None
    assert z.shape == (32 // 8, 2, 512)  # [L, B, C] interchange layout
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_decode_matches_reference(ref_and_ours):
    ref, model, variables = ref_and_ours
    rng = np.random.RandomState(2)
    z = rng.randn(4, 2, 512).astype(np.float32)
    with torch.no_grad():
        out_ref = ref.decode(torch.from_numpy(z), lengths=None)
    out = model.apply(variables, jnp.asarray(z), method=model.decode)
    assert out.shape == (2, 32, 67)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_roundtrip_layout(ref_and_ours):
    _, model, variables = ref_and_ours
    x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 67),
                    dtype=jnp.float32)
    feats, z, dist = model.apply(variables, x)
    assert feats.shape == x.shape and z.shape == (8, 2, 512) and dist is None
