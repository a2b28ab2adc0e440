"""Action-to-motion datasets (HumanAct12 / UESTC).

Rebuild of /root/reference/src/ladiff/data/a2m/ (dataset.py:1-351,
humanact12poses.py:11-62, uestc.py) and the ``a2m_collate`` adapter
(data/utils.py:78-97).  Pose representation: per-joint rot6d (pytorch3d
convention: first two MATRIX ROWS) + a zero-padded global translation row,
giving 25 x 6 = 150 features for SMPL-24 + translation.

Frame sampling mirrors the reference "conseq" scheme: evenly strided window
of ``num_frames`` with a random shift; clips shorter than the request repeat
their last frame (dataset.py:149-216).

TPU-first delta: the collate pads time to a static ``num_frames`` so the
whole action pipeline compiles once.
"""
from __future__ import annotations

import os
import pickle
import random
from os.path import join as pjoin
from typing import List, Optional

import numpy as np

from ladiff_tpu.data.humanml import quaternion as Q

__all__ = ["HumanAct12Dataset", "UESTCDataset", "a2m_collate",
           "sample_frame_indices", "axis_angle_to_rot6d",
           "generate_synthetic_humanact12",
           "HUMANACT12_ACTION_NAMES"]

HUMANACT12_ACTION_NAMES = {
    0: "warm_up", 1: "walk", 2: "run", 3: "jump", 4: "drink",
    5: "lift_dumbbell", 6: "sit", 7: "eat", 8: "turn steering wheel",
    9: "phone", 10: "boxing", 11: "throw",
}


def axis_angle_to_rot6d(aa: np.ndarray) -> np.ndarray:
    """(..., 3) rotvec -> (..., 6), pytorch3d ``matrix_to_rotation_6d``
    convention (first two matrix rows flattened)."""
    m = np.asarray(Q.quaternion_to_matrix(
        Q.axis_angle_to_quaternion(aa.astype(np.float32))))
    return m[..., :2, :].reshape(aa.shape[:-1] + (6,))


def sample_frame_indices(nframes: int, num_frames: int,
                         sampling: str = "conseq", sampling_step: int = 1,
                         rng: Optional[random.Random] = None) -> np.ndarray:
    """Reference dataset.py:149-216."""
    rng = rng or random
    if num_frames > nframes:
        ntoadd = num_frames - nframes
        padding = (nframes - 1) * np.ones(ntoadd, dtype=int)
        return np.concatenate([np.arange(nframes), padding])
    if sampling in ("conseq", "random_conseq"):
        step_max = max((nframes - 1) // max(num_frames - 1, 1), 1)
        if sampling == "conseq":
            if sampling_step == -1 or sampling_step * (num_frames - 1) >= nframes:
                step = step_max
            else:
                step = sampling_step
        else:
            step = rng.randint(1, step_max)
        lastone = step * (num_frames - 1)
        shift_max = nframes - lastone - 1
        shift = rng.randint(0, max(0, shift_max - 1)) if shift_max > 1 else 0
        return shift + np.arange(0, lastone + 1, step)
    if sampling == "random":
        return np.sort(np.random.choice(nframes, num_frames, replace=False))
    raise ValueError(f"sampling {sampling} not recognized")


class _ActionDataset:
    """Common a2m logic: rot6d featurization + frame sampling."""

    num_classes: int = 12

    def __init__(self, num_frames: int = 60, sampling: str = "conseq",
                 sampling_step: int = 1, pose_rep: str = "rot6d",
                 translation: bool = True, glob: bool = True,
                 split: str = "train", seed: int = 1234):
        self.num_frames = num_frames
        self.sampling = sampling
        self.sampling_step = sampling_step
        self.pose_rep = pose_rep
        self.translation = translation
        self.glob = glob
        self.split = split
        self.rng = random.Random(seed)
        # subclasses fill: _pose (list of [T, 24*3]), _joints (list of
        # [T, J, 3] or None), _actions, _num_frames_in_video, _train/_test

    def __len__(self):
        return len(self._train if self.split == "train" else self._test)

    def _featurize(self, pose_aa: np.ndarray,
                   joints3d: Optional[np.ndarray]) -> np.ndarray:
        """[T, 24, 3] rotvecs (+ joints for translation) -> [T, J(+1), 6]."""
        pose = pose_aa
        if not self.glob:
            pose = pose[:, 1:]
        if self.pose_rep == "rot6d":
            feats = axis_angle_to_rot6d(pose)
        elif self.pose_rep == "rotvec":
            feats = np.pad(pose, ((0, 0), (0, 0), (0, 3)))
        else:
            raise ValueError(f"pose_rep {self.pose_rep} unsupported")
        if self.translation:
            assert joints3d is not None
            tr = joints3d[:, 0, :] - joints3d[0, 0, :]
            padded = np.zeros((feats.shape[0], 1, feats.shape[2]), np.float32)
            padded[:, 0, :3] = tr
            feats = np.concatenate([feats, padded], axis=1)
        return feats.astype(np.float32)

    def __getitem__(self, index: int) -> dict:
        ids = self._train if self.split == "train" else self._test
        ind = ids[index]
        nframes = self._num_frames_in_video[ind]
        frame_ix = sample_frame_indices(nframes, self.num_frames,
                                        self.sampling, self.sampling_step,
                                        self.rng)
        pose = self._pose[ind].reshape(-1, 24, 3)[frame_ix]
        joints = (self._joints[ind][frame_ix]
                  if self._joints is not None else None)
        feats = self._featurize(pose, joints)  # [T, J(+1), 6]
        action = int(self._actions[ind])
        return {
            "motion": feats.reshape(feats.shape[0], -1),  # [T, (J+1)*6]
            "action": action,
            "action_text": self._action_classes[action],
            "length": min(nframes, self.num_frames),
        }


class HumanAct12Dataset(_ActionDataset):
    """reference a2m/humanact12poses.py:11-47."""

    dataname = "humanact12"

    def __init__(self, datapath: str, **kwargs):
        super().__init__(**kwargs)
        with open(pjoin(datapath, "humanact12poses.pkl"), "rb") as f:
            data = pickle.load(f)
        self._pose = [np.asarray(x, np.float32) for x in data["poses"]]
        self._joints = [np.asarray(x, np.float32) for x in data["joints3D"]]
        self._actions = [int(x) for x in data["y"]]
        self._num_frames_in_video = [len(p) for p in self._pose]
        self.num_classes = 12
        self._action_classes = HUMANACT12_ACTION_NAMES
        self._train = list(range(len(self._pose)))
        self._test = list(range(len(self._pose)))

    @property
    def nfeats(self):
        return (24 + int(self.translation)) * 6


class UESTCDataset(_ActionDataset):
    """reference a2m/uestc.py — 40 classes; expects the preprocessed
    ``uestc_rotvec`` pickles + split info files under ``datapath``."""

    dataname = "uestc"

    def __init__(self, datapath: str, **kwargs):
        super().__init__(**kwargs)
        info_path = pjoin(datapath, "info")
        pkl_path = pjoin(datapath, "vibe_cache_refined.pkl")
        if not os.path.exists(pkl_path):
            raise FileNotFoundError(
                f"UESTC preprocessed cache not found at {pkl_path}")
        with open(pkl_path, "rb") as f:
            data = pickle.load(f)
        self._pose = [np.asarray(x, np.float32) for x in data["pose"]]
        self._joints = [np.asarray(x, np.float32) for x in data["joints3d"]] \
            if "joints3d" in data else None
        self._actions = [int(x) for x in data["y"]]
        self._num_frames_in_video = [len(p) for p in self._pose]
        self.num_classes = 40
        self._action_classes = {i: f"action_{i}" for i in range(40)}
        n = len(self._pose)
        split_at = int(0.8 * n)
        self._train = list(range(split_at))
        self._test = list(range(split_at, n))

    @property
    def nfeats(self):
        return (24 + int(self.translation)) * 6


def a2m_collate(items: List[dict], num_frames: int) -> dict:
    """Static-shape action batch (reference data/utils.py:78-97)."""
    B = len(items)
    F = items[0]["motion"].shape[1]
    motion = np.zeros((B, num_frames, F), np.float32)
    for i, b in enumerate(items):
        T = min(len(b["motion"]), num_frames)
        motion[i, :T] = b["motion"][:T]
    lengths = np.array([min(b["length"], num_frames) for b in items], np.int32)
    mask = np.arange(num_frames)[None, :] < lengths[:, None]
    return {
        "motion": motion,
        "action": np.array([[b["action"]] for b in items], np.int32),
        "action_text": [b["action_text"] for b in items],
        "mask": mask,
        "length": lengths,
    }


def generate_synthetic_humanact12(root: str, n_clips: int = 48,
                                  seed: int = 0) -> str:
    """Synthetic humanact12poses.pkl with the real file's schema."""
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    poses, joints, ys = [], [], []
    for _ in range(n_clips):
        T = rng.randint(40, 120)
        poses.append(np.cumsum(
            rng.randn(T, 72).astype(np.float32) * 0.02, axis=0))
        j = np.cumsum(rng.randn(T, 24, 3).astype(np.float32) * 0.01, axis=0)
        joints.append(j)
        ys.append(int(rng.randint(12)))
    with open(pjoin(root, "humanact12poses.pkl"), "wb") as f:
        pickle.dump({"poses": poses, "joints3D": joints, "y": ys}, f)
    return root
