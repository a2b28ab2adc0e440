"""Operator extras: AdaIN parity vs the reference torch module, blocks,
Hessian penalty sanity."""
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _load_ref_adain():
    spec = importlib.util.spec_from_file_location(
        "ref_adain",
        "/root/reference/src/ladiff/models/operator/adain.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_adain_matches_reference_torch():
    from ladiff_tpu.ops.extras import adaptive_instance_norm_1d

    ref = _load_ref_adain()
    B, T, C = 3, 17, 8
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, C).astype(np.float32)
    w = rng.rand(B, C).astype(np.float32) + 0.5
    b = rng.randn(B, C).astype(np.float32)

    m = ref.AdaptiveInstanceNorm1d(C)
    m.weight = torch.from_numpy(w.reshape(-1))
    m.bias = torch.from_numpy(b.reshape(-1))
    # reference takes [T, B, C]
    want = m(torch.from_numpy(x.transpose(1, 0, 2))).detach().numpy()
    want = want.transpose(1, 0, 2)

    got = np.asarray(adaptive_instance_norm_1d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # direct weighting variants (reference adain.py:27-33)
    got_dw = np.asarray(adaptive_instance_norm_1d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
        direct_weighting=True))
    np.testing.assert_allclose(got_dw, x * w[:, None, :] + b[:, None, :],
                               rtol=1e-5)


def test_split_adain_params():
    from ladiff_tpu.ops.extras import num_adain_params, split_adain_params

    sizes = [4, 6]
    assert num_adain_params(sizes) == 20
    params = jnp.arange(2 * 20, dtype=jnp.float32).reshape(2, 20)
    out = split_adain_params(params, sizes)
    assert len(out) == 2
    mean0, std0 = out[0]
    assert mean0.shape == (2, 4) and std0.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(mean0[0]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(std0[0]), [4, 5, 6, 7])


def test_blocks_and_mlp():
    from ladiff_tpu.ops.extras import MLP, ConvBlock, LinearBlock

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 24, 16).astype(np.float32))
    cb = ConvBlock(kernel_size=5, out_channels=32, norm="in")
    params = cb.init(jax.random.PRNGKey(0), x)
    out = cb.apply(params, x)
    assert out.shape == (2, 24, 32)

    mlp = MLP(dims=(384, 64), out_dim=8)
    p = mlp.init(jax.random.PRNGKey(1), x)
    y = mlp.apply(p, x)
    assert y.shape == (2, 8)

    lb = LinearBlock(12, acti="tanh")
    p = lb.init(jax.random.PRNGKey(2), jnp.ones((2, 5)))
    z = lb.apply(p, jnp.ones((2, 5)))
    assert z.shape == (2, 12) and float(jnp.abs(z).max()) <= 1.0


def test_hessian_penalty_zero_for_linear_map():
    """A linear G has zero Hessian -> penalty ~ 0; a quadratic does not."""
    from ladiff_tpu.ops.extras import hessian_penalty

    rng = np.random.RandomState(2)
    A = jnp.asarray(rng.randn(8, 8).astype(np.float32))
    z = jnp.asarray(rng.randn(4, 8).astype(np.float32))

    lin = hessian_penalty(lambda v: v @ A, z, jax.random.PRNGKey(0), k=3)
    assert abs(float(lin)) < 1e-3

    # off-diagonal quadratic interaction -> positive penalty
    quad = hessian_penalty(lambda v: (v[:, :4] * v[:, 4:]) @ A[:4, :4], z,
                           jax.random.PRNGKey(0), k=3)
    assert float(quad) > 1e-2
