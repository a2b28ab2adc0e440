"""Metric suite tests: parity with reference math on random data + sanity
properties (identical inputs -> zero error, FID of identical sets ~ 0)."""
import sys

import numpy as np
import pytest

from ladiff_tpu.metrics.mm import MMMetrics
from ladiff_tpu.metrics.mr import MRMetrics
from ladiff_tpu.metrics.temos import (TemosMetrics, TemosMetricsBest,
                                      TemosMetricsWorst)
from ladiff_tpu.metrics.tm2t import TM2TMetrics
from ladiff_tpu.metrics import utils as U

sys.path.insert(0, "/root/reference/src")


def _load_ref_metric_utils():
    """Load the reference metrics/utils.py directly by path (its package
    __init__ imports torchmetrics, which isn't in this image)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_metric_utils",
        "/root/reference/src/ladiff/models/metrics/utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fid_identical_is_zero():
    rng = np.random.RandomState(0)
    act = rng.randn(400, 16)
    mu, cov = U.calculate_activation_statistics(act)
    fid = U.calculate_frechet_distance(mu, cov, mu, cov)
    assert abs(fid) < 1e-6


def test_fid_matches_reference_impl():
    ref = _load_ref_metric_utils()
    calculate_activation_statistics_np = ref.calculate_activation_statistics_np
    calculate_frechet_distance_np = ref.calculate_frechet_distance_np
    rng = np.random.RandomState(1)
    a, b = rng.randn(300, 8), rng.randn(300, 8) + 0.5
    mu1, c1 = U.calculate_activation_statistics(a)
    mu2, c2 = U.calculate_activation_statistics(b)
    want = calculate_frechet_distance_np(
        *calculate_activation_statistics_np(a),
        *calculate_activation_statistics_np(b))
    got = U.calculate_frechet_distance(mu1, c1, mu2, c2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_top_k_matches_reference():
    torch = pytest.importorskip("torch")
    ref_top_k = _load_ref_metric_utils().calculate_top_k
    rng = np.random.RandomState(2)
    dist = rng.randn(32, 32)
    argsm = np.argsort(dist, axis=1)
    want = ref_top_k(torch.tensor(argsm), 3).numpy()
    got = U.calculate_top_k(argsm, 3)
    np.testing.assert_array_equal(got, want)


def test_tm2t_end_to_end_protocol():
    rng = np.random.RandomState(3)
    m = TM2TMetrics(diversity_times=30)
    # perfectly matched text/motion embeddings -> R@1 high, FID ~ 0
    for _ in range(3):
        emb = rng.randn(32, 16).astype(np.float32)
        noise = emb + 1e-4 * rng.randn(32, 16)
        m.update(emb, noise, emb, [10] * 32)
    out = m.compute()
    assert out["R_precision_top_1"] > 0.9
    assert out["FID"] < 1e-3
    assert out["Matching_score"] < 0.1
    assert "Diversity" in out


def test_mr_metrics_zero_for_identical():
    rng = np.random.RandomState(4)
    joints = rng.randn(2, 30, 22, 3)
    m = MRMetrics()
    m.update(joints, joints, [30, 20])
    out = m.compute()
    assert out["MPJPE"] < 1e-6 and out["ACCEL"] < 1e-6
    assert out["PAMPJPE"] < 1e-4


def test_pampjpe_invariant_to_similarity_transform():
    rng = np.random.RandomState(5)
    target = rng.randn(8, 22, 3)
    # preds = rotated+scaled+translated target -> PA-MPJPE ~ 0, MPJPE > 0
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    preds = 1.3 * target @ R.T + np.array([1.0, 2.0, 3.0])
    pa = U.calc_pampjpe(preds, target)
    assert np.abs(pa).max() < 1e-8
    assert U.calc_mpjpe(preds, target).max() > 0.1


def test_mm_metric():
    rng = np.random.RandomState(6)
    m = MMMetrics(mm_num_times=10)
    m.update(rng.randn(5, 30, 16), [1] * 5)
    out = m.compute()
    assert out["MultiModality"] > 0


def test_temos_ape_zero_for_identical():
    rng = np.random.RandomState(7)
    joints = np.cumsum(rng.randn(2, 40, 22, 3) * 0.01, axis=1)
    m = TemosMetrics()
    m.update(joints, joints, [40, 30])
    out = m.compute()
    for k, v in out.items():
        assert abs(v) < 1e-9, (k, v)
    m2 = TemosMetrics()
    m2.update(joints + 0.05 * rng.randn(*joints.shape), joints, [40, 30])
    out2 = m2.compute()
    assert out2["APE_root"] > 0


def test_temos_best_worst_trial_selection():
    """Best/worst variants replicate the reference's "Quick hacks" exactly:
    trial chosen by the FIRST sample's APE_root, only that first sample's
    tuple accumulated, counts advanced by the whole batch
    (compute_best.py:13-14,51-60)."""
    rng = np.random.RandomState(9)
    joints = np.cumsum(rng.randn(2, 40, 22, 3) * 0.01, axis=1)
    near = joints + 0.01 * rng.randn(*joints.shape)
    far = joints + 0.2 * rng.randn(*joints.shape)
    lengths = [40, 30]

    best, worst = TemosMetricsBest(), TemosMetricsWorst()
    for m in (best, worst):
        m.update([near, far], [joints, joints], [lengths, lengths])

    # counts cover the whole first-trial batch
    assert best.count == 70 and best.count_seq == 2
    # best picked the near trial, worst the far one — and each accumulated
    # exactly the chosen trial's first-sample tuple
    near0 = TemosMetrics()._sample_metrics(near, joints, lengths)[0]
    far0 = TemosMetrics()._sample_metrics(far, joints, lengths)[0]
    np.testing.assert_allclose(best.APE_root, near0[0])
    np.testing.assert_allclose(worst.APE_root, far0[0])
    np.testing.assert_allclose(best.AVE_joints, near0[7])
    assert best.compute()["APE_root"] < worst.compute()["APE_root"]


def test_mpjpe_family_matches_reference():
    torch = pytest.importorskip("torch")
    ref = _load_ref_metric_utils()
    rng = np.random.RandomState(8)
    preds = rng.randn(6, 22, 3).astype(np.float32)
    target = rng.randn(6, 22, 3).astype(np.float32)
    want_mpjpe = ref.calc_mpjpe(torch.tensor(preds), torch.tensor(target)).numpy()
    got_mpjpe = U.calc_mpjpe(preds, target)
    np.testing.assert_allclose(got_mpjpe, want_mpjpe, atol=1e-5)
    want_accel = ref.calc_accel(torch.tensor(preds), torch.tensor(target)).numpy()
    np.testing.assert_allclose(U.calc_accel(preds, target), want_accel,
                               atol=1e-5)
    want_pa = ref.calc_pampjpe(torch.tensor(preds), torch.tensor(target)).numpy()
    np.testing.assert_allclose(U.calc_pampjpe(preds, target), want_pa,
                               atol=1e-4)
