"""Data pipeline tests: synthetic dataset generation through static-shape
batches, dataset filtering/crop semantics, datamodule helpers."""
import numpy as np
import pytest

from ladiff_tpu.data.datamodule import T2MDataModule
from ladiff_tpu.data.humanml.dataset import Text2MotionDataset, collate_t2m
from ladiff_tpu.data.synthetic import generate_synthetic_dataset
from ladiff_tpu.data.word_vectorizer import HashWordVectorizer, build_word_vectorizer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_hml3d")
    return generate_synthetic_dataset(str(root), n_clips=32, seed=0)


def test_word_vectorizer_fallback():
    wv = build_word_vectorizer(None)
    assert isinstance(wv, HashWordVectorizer)
    v1, p1 = wv["walk/VERB"]
    v2, p2 = wv["walk/NOUN"]
    np.testing.assert_array_equal(v1, v2)  # same word -> same vector
    # VIP class overrides POS: walk is Act_VIP (idx 12)
    assert p1.argmax() == 12 and p2.argmax() == 12
    v3, _ = wv["person/NOUN"]
    assert np.abs(v1 - v3).max() > 0


def test_dataset_loads_and_filters(synth_root):
    wv = HashWordVectorizer()
    ds = Text2MotionDataset(
        mean=np.load(f"{synth_root}/Mean.npy"),
        std=np.load(f"{synth_root}/Std.npy"),
        split_file=f"{synth_root}/train.txt",
        w_vectorizer=wv,
        motion_dir=f"{synth_root}/new_joint_vecs",
        text_dir=f"{synth_root}/texts",
        phase="train")
    assert len(ds) > 0
    assert ds.nfeats == 263
    # sorted by length
    assert (np.diff(ds.length_arr) >= 0).all()
    item = ds[0]
    assert item["motion"].shape[1] == 263
    assert item["word_embs"].shape == (22, 300)
    assert item["pos_ohot"].shape == (22, 15)
    assert 40 <= item["length"] < 200


def test_eval_phase_snaps_lengths(synth_root):
    wv = HashWordVectorizer()
    ds = Text2MotionDataset(
        mean=np.load(f"{synth_root}/Mean.npy"),
        std=np.load(f"{synth_root}/Std.npy"),
        split_file=f"{synth_root}/train.txt",
        w_vectorizer=wv,
        motion_dir=f"{synth_root}/new_joint_vecs",
        text_dir=f"{synth_root}/texts",
        phase="eval")
    for i in range(min(10, len(ds))):
        assert ds[i]["length"] % 4 == 0


def test_collate_static_shapes(synth_root):
    wv = HashWordVectorizer()
    ds = Text2MotionDataset(
        mean=np.load(f"{synth_root}/Mean.npy"),
        std=np.load(f"{synth_root}/Std.npy"),
        split_file=f"{synth_root}/train.txt",
        w_vectorizer=wv,
        motion_dir=f"{synth_root}/new_joint_vecs",
        text_dir=f"{synth_root}/texts",
        phase="train")
    batch = collate_t2m([ds[i] for i in range(4)], max_frames=196)
    assert batch["motion"].shape == (4, 196, 263)
    assert batch["length"].shape == (4,)
    # zero-padded beyond each length
    for i in range(4):
        assert np.abs(batch["motion"][i, batch["length"][i]:]).max() == 0.0
    # sorted by text_len desc
    assert (np.diff(batch["text_len"]) <= 0).all()


def test_datamodule_end_to_end(synth_root):
    dm = T2MDataModule("humanml3d", synth_root, HashWordVectorizer(),
                       batch_size=8)
    batches = list(dm.loader("train"))
    assert len(batches) >= 1
    b = batches[0]
    assert b["motion"].shape[1:] == (196, 263)
    joints = dm.feats2joints(b["motion"])
    assert joints.shape == (b["motion"].shape[0], 196, 22, 3)
    renormed = dm.renorm4t2m(b["motion"])
    assert renormed.shape == b["motion"].shape
    # mm_mode subsampling restricts the test split
    dm.mm_mode(True, mm_num_samples=2)
    mm_batches = list(dm.loader("test", batch_size=1))
    assert 0 < len(mm_batches) <= 2
    dm.mm_mode(False)


def test_bucketed_loader(synth_root):
    dm = T2MDataModule("humanml3d", synth_root, HashWordVectorizer(),
                       batch_size=4)
    seen_shapes = set()
    n_items = 0
    for batch in dm.loader("train", buckets=(64, 128, 196)):
        T = batch["motion"].shape[1]
        seen_shapes.add(T)
        n_items += batch["motion"].shape[0]
        # every clip fits its bucket: padded region is zero, lengths <= T
        assert (batch["length"] <= T).all()
    assert seen_shapes.issubset({64, 128, 196})
    assert len(seen_shapes) >= 2  # synthetic lengths span buckets
    # same items overall as the unbucketed epoch
    n_flat = sum(b["motion"].shape[0] for b in dm.loader("train"))
    assert n_items == n_flat
