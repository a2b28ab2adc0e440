"""Golden-value tests for the motion feature codec.

Fixtures in tests/golden/ were produced by running the reference
implementation (torch) once on random inputs; our jnp rebuild must match.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladiff_tpu.data.humanml.motion_repr import recover_from_ric
from ladiff_tpu.data.humanml import quaternion as Q

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_recover_from_ric_matches_reference():
    d = np.load(os.path.join(GOLDEN, "recover_from_ric.npz"))
    out22 = recover_from_ric(jnp.asarray(d["feats22"]), 22)
    np.testing.assert_allclose(np.asarray(out22), d["joints22"], atol=1e-4)
    out21 = recover_from_ric(jnp.asarray(d["feats21"]), 21)
    np.testing.assert_allclose(np.asarray(out21), d["joints21"], atol=1e-4)


def test_recover_from_ric_is_differentiable():
    d = np.load(os.path.join(GOLDEN, "recover_from_ric.npz"))
    feats = jnp.asarray(d["feats22"])

    def loss(f):
        return jnp.sum(recover_from_ric(f, 22) ** 2)

    g = jax.grad(loss)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_quaternion_roundtrip():
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference/src")
    from ladiff.data.humanml.common import quaternion as RQ

    rng = np.random.RandomState(0)
    q = rng.randn(6, 4).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.randn(6, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(Q.qrot(jnp.asarray(q), jnp.asarray(v))),
                               RQ.qrot_np(q, v), atol=1e-5)
    r = rng.randn(6, 4).astype(np.float32)
    r = r / np.linalg.norm(r, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(Q.qmul(jnp.asarray(q), jnp.asarray(r))),
                               RQ.qmul_np(q, r), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(Q.quaternion_to_cont6d(jnp.asarray(q))),
        RQ.quaternion_to_cont6d_np(q), atol=1e-5)
