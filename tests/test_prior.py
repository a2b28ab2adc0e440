"""SMPLify pose priors: parity against the reference torch implementation
(/root/reference/src/ladiff/transforms/joints2rots/prior.py) on a synthetic
GMM, plus fit.py loss plumbing."""
import importlib.util
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _load_ref(name, path):
    """Load a reference module straight from its file (the package __init__
    chain pulls in smplx/config deps we don't have).  "config" is genuinely
    uninstalled (guard-checked; see tests/_stubs.py), so the stub cannot
    poison later imports — nothing else can import it."""
    from _stubs import stub_missing

    stub_missing("config")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_REF = "/root/reference/src/ladiff/transforms/joints2rots"


def _synthetic_gmm(rng, M=6, D=69):
    means = rng.randn(M, D) * 0.3
    covs = []
    for _ in range(M):
        a = rng.randn(D, D) * 0.05
        covs.append(a @ a.T + np.eye(D) * 0.5)
    covs = np.stack(covs)
    w = rng.rand(M)
    return {"means": means, "covars": covs, "weights": w / w.sum()}


def test_gmm_prior_matches_reference(tmp_path):
    RefPrior = _load_ref("ref_prior", f"{_REF}/prior.py").MaxMixturePrior

    from ladiff_tpu.smpl.prior import MaxMixturePrior

    rng = np.random.RandomState(0)
    gmm = _synthetic_gmm(rng)
    with open(tmp_path / "gmm_06.pkl", "wb") as f:
        pickle.dump(gmm, f)

    ref = RefPrior(prior_folder=str(tmp_path), num_gaussians=6,
                   dtype=torch.float32)
    ours = MaxMixturePrior.load(str(tmp_path))
    assert ours is not None

    pose = rng.randn(8, 69).astype(np.float32)
    betas = np.zeros((8, 10), np.float32)
    want = ref(torch.from_numpy(pose), torch.from_numpy(betas)).numpy()
    got = np.asarray(ours(pose, betas))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_angle_prior_matches_reference():
    ref_ap = _load_ref("ref_closs", f"{_REF}/customloss.py").angle_prior

    from ladiff_tpu.smpl.prior import angle_prior

    rng = np.random.RandomState(1)
    pose = rng.randn(5, 69).astype(np.float32)
    want = ref_ap(torch.from_numpy(pose)).numpy()
    got = np.asarray(angle_prior(pose))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gmof_matches_reference():
    ref_gmof = _load_ref("ref_closs", f"{_REF}/customloss.py").gmof

    from ladiff_tpu.smpl.prior import gmof

    rng = np.random.RandomState(2)
    x = rng.randn(4, 24, 3).astype(np.float32) * 50
    want = ref_gmof(torch.from_numpy(x), 100.0).numpy()
    got = np.asarray(gmof(x, 100.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_create_prior_fallbacks(tmp_path):
    from ladiff_tpu.smpl.prior import create_prior, l2_prior

    assert create_prior("gmm", str(tmp_path / "missing")) is l2_prior
    assert create_prior("l2") is l2_prior
    assert create_prior("none")(np.zeros((2, 69))) == 0.0


def test_fit_sequence_with_gmm_prior(tmp_path):
    """fit.py converges on a synthetic body with the full reference loss."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("fitmod", "fit.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from ladiff_tpu.smpl.body_model import SMPLModel

    rng = np.random.RandomState(3)
    gmm = _synthetic_gmm(rng)
    with open(tmp_path / "gmm_06.pkl", "wb") as f:
        pickle.dump(gmm, f)

    model = SMPLModel.synthetic()
    pose = rng.randn(4, 24, 3).astype(np.float32) * 0.1
    trans = rng.randn(4, 3).astype(np.float32) * 0.1
    target = np.asarray(model.forward(pose, np.zeros(10, np.float32), trans))
    params, loss = mod.fit_sequence(model, target, iters=60, lr=0.03,
                                    gmm_dir=str(tmp_path))
    assert np.isfinite(loss)
    recon = np.asarray(model.forward(params["pose"], params["betas"],
                                     params["trans"]))
    err0 = np.abs(target - np.asarray(
        model.forward(np.zeros_like(pose), np.zeros(10, np.float32),
                      np.zeros_like(trans)))).mean()
    err = np.abs(recon - target).mean()
    assert err < err0  # optimization reduced the joint error
