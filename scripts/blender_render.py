"""Blender-side renderer (runs INSIDE Blender's Python).

Counterpart of the reference Blender pipeline
(/root/reference/src/ladiff/render/blender/, ~1050 LoC: scene/camera/floor/
material setup, per-frame meshes, Cycles stills, ffmpeg assembly).  Launched
as an external process by the repo's ``render.py --blender <binary>``:

  blender --background --python scripts/blender_render.py -- \
      --npy sample.npy [--out out_dir] [--fps 20] [--res 512] \
      [--mode video|sequence] [--sphere-radius 0.035]

Renders each frame's joints as spheres + bone cylinders over a checkered
floor with a tracking camera, then assembles an mp4 via Blender's own
sequencer (no ffmpeg dependency).
"""
import argparse
import math
import os
import sys

try:
    import bpy
except ImportError:  # pragma: no cover - only runs inside Blender
    raise SystemExit("this script must run inside Blender: "
                     "blender --background --python scripts/blender_render.py"
                     " -- --npy <file>")

import numpy as np

KINEMATIC_CHAINS_22 = [[0, 2, 5, 8, 11], [0, 1, 4, 7, 10],
                       [0, 3, 6, 9, 12, 15], [9, 14, 17, 19, 21],
                       [9, 13, 16, 18, 20]]
KINEMATIC_CHAINS_21 = [[0, 11, 12, 13, 14, 15], [0, 16, 17, 18, 19, 20],
                       [0, 1, 2, 3, 4], [3, 5, 6, 7], [3, 8, 9, 10]]


def parse_args():
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    ap = argparse.ArgumentParser()
    ap.add_argument("--npy", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--fps", type=int, default=20)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--mode", default="video", choices=["video", "sequence"])
    ap.add_argument("--sphere-radius", type=float, default=0.035)
    ap.add_argument("--samples", type=int, default=16)
    return ap.parse_args(argv)


def clear_scene():
    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete(use_global=False)


def setup_scene(res, samples):
    scene = bpy.context.scene
    scene.render.engine = "CYCLES"
    scene.cycles.samples = samples
    scene.render.resolution_x = res
    scene.render.resolution_y = res
    # floor
    bpy.ops.mesh.primitive_plane_add(size=20, location=(0, 0, 0))
    floor = bpy.context.object
    mat = bpy.data.materials.new("floor")
    mat.use_nodes = True
    checker = mat.node_tree.nodes.new("ShaderNodeTexChecker")
    checker.inputs["Scale"].default_value = 8.0
    bsdf = mat.node_tree.nodes["Principled BSDF"]
    mat.node_tree.links.new(checker.outputs["Color"],
                            bsdf.inputs["Base Color"])
    floor.data.materials.append(mat)
    # light
    bpy.ops.object.light_add(type="SUN", location=(3, -3, 6))
    bpy.context.object.data.energy = 4.0
    # camera
    bpy.ops.object.camera_add(location=(4.5, -4.5, 2.2),
                              rotation=(math.radians(72), 0,
                                        math.radians(45)))
    scene.camera = bpy.context.object
    return scene


def body_material():
    mat = bpy.data.materials.new("body")
    mat.use_nodes = True
    bsdf = mat.node_tree.nodes["Principled BSDF"]
    bsdf.inputs["Base Color"].default_value = (0.25, 0.45, 0.9, 1.0)
    return mat


def add_frame_objects(joints, chains, radius, mat):
    """joints: [J, 3] (y-up, converted to Blender z-up here)."""
    objs = []
    pts = joints[:, [0, 2, 1]].copy()  # y-up -> z-up
    for p in pts:
        bpy.ops.mesh.primitive_uv_sphere_add(radius=radius, location=tuple(p))
        o = bpy.context.object
        o.data.materials.append(mat)
        objs.append(o)
    for chain in chains:
        for a, b in zip(chain[:-1], chain[1:]):
            pa, pb = pts[a], pts[b]
            mid = (pa + pb) / 2
            d = pb - pa
            length = float(np.linalg.norm(d))
            if length < 1e-6:
                continue
            bpy.ops.mesh.primitive_cylinder_add(
                radius=radius * 0.6, depth=length, location=tuple(mid))
            o = bpy.context.object
            # rotate cylinder (z-axis) onto the bone direction
            dn = d / length
            axis = np.cross([0, 0, 1], dn)
            s = float(np.linalg.norm(axis))
            angle = math.atan2(s, float(dn[2]))
            if s > 1e-8:
                o.rotation_mode = "AXIS_ANGLE"
                o.rotation_axis_angle = (angle, *(axis / s))
            o.data.materials.append(mat)
            objs.append(o)
    return objs


def main():
    args = parse_args()
    joints = np.load(args.npy)  # [T, J, 3]
    assert joints.ndim == 3 and joints.shape[2] == 3, joints.shape
    chains = (KINEMATIC_CHAINS_22 if joints.shape[1] == 22 else
              KINEMATIC_CHAINS_21 if joints.shape[1] == 21 else
              [[j, j + 1] for j in range(joints.shape[1] - 1)])
    out_dir = args.out or (args.npy.rsplit(".", 1)[0] + "_frames")
    os.makedirs(out_dir, exist_ok=True)

    clear_scene()
    scene = setup_scene(args.res, args.samples)
    mat = body_material()

    # floor-align like the reference plotter
    joints = joints - joints[..., 1].min()

    frame_paths = []
    for t in range(len(joints)):
        objs = add_frame_objects(joints[t], chains, args.sphere_radius, mat)
        scene.render.filepath = os.path.join(out_dir, f"frame_{t:04d}.png")
        bpy.ops.render.render(write_still=True)
        frame_paths.append(scene.render.filepath)
        for o in objs:
            bpy.data.objects.remove(o, do_unlink=True)

    if args.mode == "video":
        # assemble with Blender's sequencer
        scene.sequence_editor_create()
        for i, p in enumerate(frame_paths):
            scene.sequence_editor.sequences.new_image(
                name=os.path.basename(p), filepath=p, channel=1,
                frame_start=i + 1)
        scene.frame_end = len(frame_paths)
        scene.render.fps = args.fps
        scene.render.image_settings.file_format = "FFMPEG"
        scene.render.ffmpeg.format = "MPEG4"
        scene.render.filepath = args.npy.rsplit(".", 1)[0] + "_blender.mp4"
        bpy.ops.render.render(animation=True)
        print("wrote", scene.render.filepath)


if __name__ == "__main__":
    main()
