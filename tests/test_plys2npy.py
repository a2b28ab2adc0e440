"""plys2npy collector: PLY parsing, natural sort, _gt exclusion."""
import os
import struct

import numpy as np


def _load_plys2npy():
    """Import scripts/plys2npy.py by path.  Deliberately NOT via
    sys.path.insert at module level: pytest imports every test module at
    collection time, and scripts/ on sys.path shadowed the stdlib
    ``profile`` module, breaking later ``transformers`` torch-model
    imports suite-wide (GenerationMixin ImportError)."""
    import importlib.util
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "plys2npy.py")
    spec = importlib.util.spec_from_file_location("ladiff_plys2npy", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_plys2npy_binary_ascii_and_filters(tmp_path):
    plys2npy = _load_plys2npy().plys2npy

    seq = tmp_path / "SMPLFit_testseq"
    seq.mkdir()
    rng = np.random.RandomState(0)
    frames = []
    for t in range(3):
        v = rng.randn(10, 3).astype(np.float32)
        frames.append(v)
        with open(seq / f"frame{t:03d}.ply", "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n"
                    b"element vertex 10\nproperty float x\nproperty float y\n"
                    b"property float z\nproperty uchar red\nend_header\n")
            for i in range(10):
                f.write(struct.pack("<fffB", *v[i], 128))
    # ascii frame named so lexical sort would misplace it (natural sort
    # puts frame10 after frame003) + a _gt.ply that must be skipped
    with open(seq / "frame10.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 10\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        for i in range(10):
            f.write(f"{i} {i + 1} {i + 2}\n")
    (seq / "skip_gt.ply").write_text("junk")

    out = plys2npy(str(seq), str(tmp_path / "out"))
    m = np.load(out)
    assert m.shape == (4, 10, 3)
    np.testing.assert_allclose(m[0], frames[0], atol=1e-6)
    np.testing.assert_allclose(m[3][:, 0], np.arange(10))
    assert os.path.basename(out) == "testseq_mesh.npy"
