"""Parity of the Blender-renderer numeric prep against the reference's own
functions (blender/joints.py imports bpy only for scene calls; the math is
importable with a stubbed bpy module)."""
import sys
import types

import numpy as np
import pytest

# joints.py builds its material list at import time — a MagicMock bpy
# satisfies both the import and those scene-side calls; the math half
# under test never touches it.  bpy is genuinely uninstalled (guard-checked;
# see tests/_stubs.py), so the mock cannot poison later imports.
from unittest.mock import MagicMock  # noqa: E402

from _stubs import stub_missing  # noqa: E402

stub_missing("bpy", MagicMock(name="bpy"))
if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

from ladiff_tpu.render import blender_prep as bp  # noqa: E402

ref_joints = pytest.importorskip("ladiff.render.blender.joints")
ref_sampler = pytest.importorskip("ladiff.render.blender.sampler")
ref_render_mod = None


def _rand_joints(T=25, J=22, seed=0):
    rs = np.random.RandomState(seed)
    j = rs.randn(T, J, 3) * 0.4
    j[..., 1] += 1.0  # plausible heights
    return j


def test_floor_matches_reference():
    j = _rand_joints()
    got = bp.get_floor(j)
    want = ref_joints.get_floor(j, jointstype="humanml3d")
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_forward_direction_matches_reference():
    j = _rand_joints(seed=1)
    got = bp.get_forward_direction(j[0], joints=bp.HUMANML3D_JOINTS)
    want = ref_joints.get_forward_direction(j[0], jointstype="humanml3d")
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_canonicalize_matches_reference():
    j = _rand_joints(seed=2)
    got = bp.canonicalize_joints(j)
    want = ref_joints.canonicalize_joints(j, jointstype="humanml3d")
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_prepare_joints_matches_reference():
    from ladiff.utils.joints import mmm_to_smplh_scaling_factor

    j = _rand_joints(seed=3)
    for on_floor in (False, True):
        got = bp.prepare_joints(j, canonicalize=True,
                                always_on_floor=on_floor,
                                scale=mmm_to_smplh_scaling_factor)
        want = ref_joints.prepare_joints(j.copy(), canonicalize=True,
                                         always_on_floor=on_floor,
                                         jointstype="humanml3d")
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_frameidx_matches_reference():
    for mode, kw in (("video", {}), ("sequence", {}),
                     ("frame", {"exact_frame": 0.5})):
        got = bp.get_frameidx(mode=mode, nframes=57,
                              exact_frame=kw.get("exact_frame"),
                              frames_to_keep=8)
        want = ref_sampler.get_frameidx(mode=mode, nframes=57,
                                        exact_frame=kw.get("exact_frame"),
                                        frames_to_keep=8)
        assert list(got) == list(want), mode


def test_prune_begin_end():
    d = np.arange(20)
    assert list(bp.prune_begin_end(d, 0.2)) == list(d[4:-4])
    assert list(bp.prune_begin_end(d, 0.0)) == list(d)
