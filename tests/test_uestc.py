"""UESTC preprocessing: view rotation, subject split, camera translation
(reference a2m/uestc.py:15-254) on a synthetic VIBE cache."""
import numpy as np
import pytest

from ladiff_tpu.data.a2m import (ACTION2MOTION_JOINTS, UESTCDataset,
                                 _yaw_rotation, a2m_collate,
                                 generate_synthetic_uestc, get_trans_from_vibe)


@pytest.fixture(scope="module")
def datapath(tmp_path_factory):
    p = tmp_path_factory.mktemp("uestc")
    generate_synthetic_uestc(str(p), n_videos=24, seed=0)
    return str(p)


def test_subject_split_and_items(datapath):
    train = UESTCDataset(datapath, split="train", num_frames=60)
    test = UESTCDataset(datapath, split="test", num_frames=60)
    assert len(train) > 0 and len(test) > 0
    # subjects: p001 -> train list, p003 -> test list
    for ds, subjects in ((train, {1}), (test, {3})):
        ids = ds._train if ds.split == "train" else ds._test
        assert {ds.info_actions[i]["subject"] for i in ids} == subjects

    item = train[0]
    assert item["motion"].shape[1] == 25 * 6  # 24 rot6d + translation row
    assert 0 <= item["action"] < 40
    assert item["action_text"].startswith("action_")

    batch = a2m_collate([train[i] for i in range(min(4, len(train)))], 60)
    assert batch["motion"].shape == (min(4, len(train)), 60, 150)
    assert batch["mask"].dtype == bool


def test_globtrans_cache_created(datapath):
    import os
    assert os.path.exists(os.path.join(datapath, "globtrans_usez.pkl"))


def test_view_rotation_front_sides_untouched(datapath):
    """side==1 videos keep their original pose; side==2 videos with view v
    get rotated by R_y(-v*pi/4)."""
    import pickle
    from os.path import join as pjoin

    from ladiff_tpu.transforms.geometry import (axis_angle_to_matrix,
                                                matrix_to_axis_angle)

    with open(pjoin(datapath, "vibe_cache_refined.pkl"), "rb") as f:
        raw = pickle.load(f)
    ds = UESTCDataset(datapath, split="train", num_frames=60)
    for i, info in enumerate(ds.info_actions):
        raw_global = raw["pose"][i][:, :3]
        if info["side"] == 1:
            np.testing.assert_allclose(ds._pose[i][:, :3], raw_global,
                                       atol=1e-6)
        elif info["view"] != 8:
            R = _yaw_rotation(info["view"])
            want = matrix_to_axis_angle(R @ axis_angle_to_matrix(raw_global))
            got_mat = axis_angle_to_matrix(ds._pose[i][:, :3])
            np.testing.assert_allclose(got_mat,
                                       axis_angle_to_matrix(want), atol=1e-5)


def test_frontview_filter(datapath):
    front = UESTCDataset(datapath, split="train", num_frames=60,
                         view="frontview")
    ids = front._train
    assert all(front.info_actions[i]["side"] == 1 for i in ids)


def test_camera_translation_zeroed_at_first_frame(datapath):
    import pickle
    from os.path import join as pjoin

    with open(pjoin(datapath, "vibe_cache_refined.pkl"), "rb") as f:
        raw = pickle.load(f)
    tr = get_trans_from_vibe(raw, 0)
    assert tr.shape == (raw["pose"][0].shape[0], 3)
    np.testing.assert_allclose(tr[0], 0.0, atol=1e-7)
    # joints carry the translation: dataset joints = selected + globtrans
    ds = UESTCDataset(datapath, split="train", num_frames=60)
    i = (ds._train + ds._test)[0]
    if ds.info_actions[i]["side"] == 1:
        want = (raw["joints3d"][i][:, ACTION2MOTION_JOINTS]
                + ds._globtrans[i][:, None])
        np.testing.assert_allclose(ds._joints[i], want, atol=1e-5)
