"""Stack per-frame SMPL mesh .ply files into one [T, 6890, 3] .npy.

Rebuild of the reference's ply→npy collector
(/root/reference/src/scripts/plys2npy.py:32-53): natural-sorted,
``*_gt.ply`` excluded, ``SMPLFit_`` prefix stripped from the output name.
Dependency-light: a minimal PLY vertex reader (ascii +
binary_little_endian) replaces trimesh, and a regex natural sort replaces
natsort.
"""
from __future__ import annotations

import argparse
import os
import re
import struct
from pathlib import Path

import numpy as np


def natural_sorted(names):
    def key(s):
        return [int(t) if t.isdigit() else t.lower()
                for t in re.split(r"(\d+)", s)]
    return sorted(names, key=key)


def read_ply_vertices(path: str) -> np.ndarray:
    """Vertex positions [V, 3] from an ascii or binary_little_endian PLY."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        n_verts = None
        props = []          # (name, struct char) for the vertex element
        in_vertex = False
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: truncated header")
            parts = line.decode("ascii", "replace").strip().split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                in_vertex = parts[1] == "vertex"
                if in_vertex:
                    n_verts = int(parts[2])
            elif parts[0] == "property" and in_vertex:
                char = {"float": "f", "float32": "f", "double": "d",
                        "uchar": "B", "uint8": "B", "char": "b",
                        "int": "i", "uint": "I", "short": "h",
                        "ushort": "H"}[parts[1]]
                props.append((parts[2], char))
            elif parts[0] == "end_header":
                break
        names = [n for n, _ in props]
        ix, iy, iz = names.index("x"), names.index("y"), names.index("z")
        if fmt == "ascii":
            out = np.empty((n_verts, 3), np.float64)
            for i in range(n_verts):
                vals = f.readline().split()
                out[i] = [float(vals[ix]), float(vals[iy]), float(vals[iz])]
            return out
        if fmt != "binary_little_endian":
            raise ValueError(f"{path}: unsupported PLY format {fmt}")
        rec = struct.Struct("<" + "".join(c for _, c in props))
        buf = f.read(rec.size * n_verts)
        out = np.empty((n_verts, 3), np.float64)
        for i, vals in enumerate(rec.iter_unpack(buf)):
            out[i] = (vals[ix], vals[iy], vals[iz])
        return out


def plys2npy(ply_dir: str, out_dir: str) -> str:
    ply_dir = Path(ply_dir)
    paths = [ply_dir / n for n in natural_sorted(os.listdir(ply_dir))
             if n.endswith(".ply") and not n.endswith("_gt.ply")]
    if not paths:
        raise FileNotFoundError(f"no .ply frames under {ply_dir}")
    frames = [read_ply_vertices(str(p)) for p in paths]
    meshs = np.stack(frames).astype(np.float64)

    basename = os.path.basename(str(ply_dir).rstrip("/"))
    if basename.startswith("SMPLFit_"):
        basename = basename[len("SMPLFit_"):]
    os.makedirs(out_dir, exist_ok=True)
    file_name = os.path.join(out_dir, basename + "_mesh.npy")
    np.save(file_name, meshs)
    print("mesh npy file saved to ", file_name)
    return file_name


def main():
    parser = argparse.ArgumentParser()
    group = parser.add_argument_group("Params")
    group.add_argument("--ply_dir", type=str, required=True, help="ply set")
    group.add_argument("--out_dir", type=str, required=True,
                       help="output folder")
    params = parser.parse_args()
    plys2npy(params.ply_dir, params.out_dir)


if __name__ == "__main__":
    main()
