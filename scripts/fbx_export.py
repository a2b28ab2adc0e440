"""FBX export (runs INSIDE Blender's Python).

Counterpart of the reference FBX scripts
(/root/reference/src/scripts/fbx_output*.py, ~700 LoC): converts fitted
SMPL parameters (the ``*_smpl.npz`` written by ``fit.py``: pose [T, 24, 3]
axis-angle, trans [T, 3], betas [10]) into an animated armature and exports
FBX for DCC tools / game engines.

  blender --background --python scripts/fbx_export.py -- \
      --npz sample_smpl.npz [--out sample.fbx] [--fps 20]
"""
import argparse
import math
import os
import sys

try:
    import bpy
    from mathutils import Vector
except ImportError:  # pragma: no cover
    raise SystemExit("run inside Blender: blender --background --python "
                     "scripts/fbx_export.py -- --npz <file>")

import numpy as np

SMPL_PARENTS = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
                16, 17, 18, 19, 20, 21]
SMPL_JOINT_NAMES = [
    "pelvis", "left_hip", "right_hip", "spine1", "left_knee", "right_knee",
    "spine2", "left_ankle", "right_ankle", "spine3", "left_foot",
    "right_foot", "neck", "left_collar", "right_collar", "head",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hand", "right_hand"]
# rest-pose joint offsets (approximate canonical skeleton, meters)
REST_OFFSETS = np.array([
    [0, 0, 0], [0.07, -0.09, 0], [-0.07, -0.09, 0], [0, 0.11, 0],
    [0.04, -0.38, 0], [-0.04, -0.38, 0], [0, 0.14, 0], [0.01, -0.40, 0],
    [-0.01, -0.40, 0], [0, 0.06, 0], [0.04, -0.06, 0.12],
    [-0.04, -0.06, 0.12], [0, 0.22, 0], [0.08, 0.11, 0], [-0.08, 0.11, 0],
    [0, 0.09, 0], [0.09, 0.04, 0], [-0.09, 0.04, 0], [0.26, 0, 0],
    [-0.26, 0, 0], [0.25, 0, 0], [-0.25, 0, 0], [0.08, 0, 0],
    [-0.08, 0, 0]], np.float32)


def parse_args():
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--fps", type=int, default=20)
    return ap.parse_args(argv)


def build_armature():
    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete(use_global=False)
    bpy.ops.object.armature_add(enter_editmode=True)
    arm = bpy.context.object
    arm.name = "SMPL"
    ebones = arm.data.edit_bones
    ebones.remove(ebones[0])
    # absolute rest positions from parent-relative offsets
    abs_pos = np.zeros((24, 3), np.float32)
    for j in range(1, 24):
        abs_pos[j] = abs_pos[SMPL_PARENTS[j]] + REST_OFFSETS[j]
    for j, name in enumerate(SMPL_JOINT_NAMES):
        b = ebones.new(name)
        head = abs_pos[j][[0, 2, 1]]  # y-up -> z-up
        b.head = Vector(head)
        b.tail = Vector(head + np.array([0, 0, 0.05]))
        if SMPL_PARENTS[j] >= 0:
            b.parent = ebones[SMPL_JOINT_NAMES[SMPL_PARENTS[j]]]
    bpy.ops.object.mode_set(mode="POSE")
    return arm


def main():
    args = parse_args()
    data = np.load(args.npz)
    pose = data["pose"]          # [T, 24, 3] axis-angle
    trans = data.get("trans")    # [T, 3]
    T = len(pose)

    arm = build_armature()
    scene = bpy.context.scene
    scene.frame_start, scene.frame_end = 1, T
    scene.render.fps = args.fps

    for t in range(T):
        scene.frame_set(t + 1)
        for j, name in enumerate(SMPL_JOINT_NAMES):
            pb = arm.pose.bones[name]
            aa = pose[t, j]
            angle = float(np.linalg.norm(aa))
            pb.rotation_mode = "AXIS_ANGLE"
            if angle > 1e-8:
                axis = aa / angle
                pb.rotation_axis_angle = (angle, axis[0], axis[2], axis[1])
            else:
                pb.rotation_axis_angle = (0.0, 0.0, 0.0, 1.0)
            pb.keyframe_insert("rotation_axis_angle")
        if trans is not None:
            root = arm.pose.bones[SMPL_JOINT_NAMES[0]]
            tr = trans[t][[0, 2, 1]]
            root.location = Vector(tr)
            root.keyframe_insert("location")

    out = args.out or args.npz.rsplit(".", 1)[0] + ".fbx"
    bpy.ops.object.mode_set(mode="OBJECT")
    bpy.ops.export_scene.fbx(filepath=out, use_selection=False,
                             add_leaf_bones=False, bake_anim=True)
    print("wrote", out)


if __name__ == "__main__":
    main()
