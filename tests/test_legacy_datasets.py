"""Legacy T2M dataset variants: semantics checks on synthetic data
(reference dataset.py:27-231, 563-977)."""
import numpy as np
import pytest

from ladiff_tpu.data.humanml.legacy import (MotionDatasetV2, RawTextDataset,
                                            Text2MotionDatasetBaseline,
                                            Text2MotionDatasetV1,
                                            TextOnlyDataset, rebias_std)
from ladiff_tpu.data.synthetic import generate_synthetic_dataset
from ladiff_tpu.data.word_vectorizer import build_word_vectorizer


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    p = tmp_path_factory.mktemp("synth")
    generate_synthetic_dataset(str(p), n_clips=24, seed=0)
    return str(p)


@pytest.fixture(scope="module")
def wvec():
    return build_word_vectorizer(None)  # hash fallback


def _paths(root):
    return dict(motion_dir=f"{root}/new_joint_vecs",
                text_dir=f"{root}/texts",
                split_file=f"{root}/train.txt")


def _stats(root):
    return np.load(f"{root}/Mean.npy"), np.load(f"{root}/Std.npy")


def test_rebias_std_channels():
    joints_num = 22
    std = np.ones(263)
    out = rebias_std(std, joints_num, feat_bias=5.0)
    assert np.allclose(out[0:4], 0.2)
    assert np.allclose(out[4:-4], 1.0)
    assert np.allclose(out[-4:], 0.2)


def test_v1_curriculum_and_items(root, wvec):
    mean, std = _stats(root)
    ds = Text2MotionDatasetV1(mean, std, w_vectorizer=wvec, is_train=True,
                              rebias=True, **_paths(root))
    n0 = len(ds)
    assert n0 > 0
    word_embs, pos_ohot, caption, sent_len, motion, m_length = ds[0]
    assert word_embs.shape[0] == pos_ohot.shape[0] == 22
    assert motion.shape[1] == 263
    # V1 crops to max_length but may REPORT a longer unit-aligned length
    assert motion.shape[0] == ds.max_length
    assert m_length >= ds.max_length
    assert isinstance(caption, str) and sent_len >= 2

    # curriculum: raising max_length advances the pointer (shorter clips
    # drop out) and lengthens the crop
    ds.reset_max_len(60)
    assert len(ds) <= n0
    item = ds[0]
    assert item[4].shape[0] == 60

    # eval mode snaps to unit_length
    ds_eval = Text2MotionDatasetV1(mean, std, w_vectorizer=wvec,
                                   is_train=False, **_paths(root))
    for i in range(min(4, len(ds_eval))):
        m = ds_eval[i]
        assert m[5] % ds_eval.unit_length == 0
        assert m[4].shape[0] == m[5]


def test_baseline_src_tgt(root, wvec):
    mean, std = _stats(root)
    ds = Text2MotionDatasetBaseline(mean, std, w_vectorizer=wvec,
                                    **_paths(root))
    word_embs, caption, sent_len, src, tgt, m_length = ds[0]
    assert src.shape == (ds.max_motion_length, 263)  # zero-padded static
    assert tgt.shape == (ds.max_length, 263)
    # tgt is the prefix of src (same crop, same normalization)
    np.testing.assert_allclose(src[:ds.max_length], tgt, atol=1e-6)
    if m_length < ds.max_motion_length:
        assert np.all(src[m_length:] == 0)


def test_motion_snippets(root):
    mean, std = _stats(root)
    ds = MotionDatasetV2(mean, std, f"{root}/train.txt",
                         motion_dir=f"{root}/new_joint_vecs",
                         window_size=32, rebias=True)
    assert len(ds) == int(np.cumsum(ds.lengths)[-1])
    first = ds[0]
    mid = ds[len(ds) // 2]
    last = ds[len(ds) - 1]
    for snip in (first, mid, last):
        assert snip.shape == (32, 263)
        assert np.isfinite(snip).all()


def test_raw_text_dataset(tmp_path, root, wvec):
    mean, std = _stats(root)
    txt = tmp_path / "prompts.txt"
    txt.write_text("a person walks forward and waves\n"
                   "someone jumps twice\n")
    ds = RawTextDataset(mean, std, str(txt), wvec)
    assert len(ds) == 2
    word_embs, pos_ohot, caption, sent_len = ds[0]
    assert word_embs.shape[0] == 22 and pos_ohot.shape[0] == 22
    assert caption == "a person walks forward and waves"
    assert sent_len == 2 + 6  # sos/eos + words


def test_text_only_dataset(root):
    mean, std = _stats(root)
    ds = TextOnlyDataset(mean, std, f"{root}/train.txt",
                         text_dir=f"{root}/texts", fixed_length=96)
    assert len(ds) > 0
    item = ds[0]
    assert item[2] and isinstance(item[2], str)
    assert item[5] == 96
    assert item[0] is None and item[6] is None
