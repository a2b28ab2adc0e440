"""fit.py entry-point smoke tests (reference /root/reference/src/fit.py):
the 143-line driver itself — arg parsing, both joint-count branches
(HumanML3D 22-joint pass-through, KIT 21-joint 100->12.5 fps decimation +
smplh rescale), the save format and --save_folder routing — on a tiny
SMPL pkl fixture with a handful of Adam iters.  The fitting math itself
is parity-tested in tests/test_smpl.py / test_prior.py."""
import os
import pickle
import sys

import numpy as np
import pytest


@pytest.fixture()
def smpl_pkl(tmp_path):
    """Tiny but structurally real SMPL asset (same layout as the on-disk
    release: kintree [2, J], 3-D posedirs, wide shapedirs)."""
    rs = np.random.RandomState(0)
    V, J = 40, 24
    kintree = np.zeros((2, J), np.int64)
    kintree[0] = np.concatenate(
        [[2 ** 32 - 1], [rs.randint(0, j) for j in range(1, J)]])
    d = {
        "v_template": rs.randn(V, 3) * 0.1,
        "shapedirs": rs.randn(V, 3, 16) * 0.01,
        "posedirs": rs.randn(V, 3, (J - 1) * 9) * 0.01,
        "J_regressor": np.abs(rs.rand(J, V)),
        "weights": np.abs(rs.rand(V, J)),
        "kintree_table": kintree,
    }
    d["J_regressor"] /= d["J_regressor"].sum(1, keepdims=True)
    d["weights"] /= d["weights"].sum(1, keepdims=True)
    path = str(tmp_path / "SMPL_NEUTRAL.pkl")
    with open(path, "wb") as f:
        pickle.dump(d, f)
    return path


def _run_fit(monkeypatch, argv):
    # Load OUR fit.py by explicit path: a bare `import fit` resolves to the
    # reference's src/fit.py when a parity test earlier in the suite has
    # prepended /root/reference/src to sys.path (order-dependent failure
    # seen in the first full round-5 run).
    import importlib.util
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_ladiff_fit_entry", os.path.join(repo, "fit.py"))
    fit = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fit)
    monkeypatch.setattr(sys, "argv", ["fit.py"] + argv)
    fit.main()


def test_fit_humanml3d_branch_end_to_end(tmp_path, smpl_pkl, monkeypatch,
                                         capsys):
    """22-joint input: no resample; output _smpl.npz next to the input
    with [T, 24, 3] pose, [10] betas, [T, 3] trans, all finite."""
    T = 6
    rs = np.random.RandomState(1)
    joints = (rs.randn(T, 22, 3) * 0.05).astype(np.float32)
    npy = str(tmp_path / "sample_000.npy")
    np.save(npy, joints)
    _run_fit(monkeypatch, ["--npy", npy, "--iters", "5",
                           "--smpl", smpl_pkl,
                           "--gmm", str(tmp_path / "no_gmm")])
    out = str(tmp_path / "sample_000_smpl.npz")
    assert os.path.isfile(out)
    saved = np.load(out)
    assert saved["pose"].shape == (T, 24, 3)
    assert saved["betas"].shape == (10,)
    assert saved["trans"].shape == (T, 3)
    for k in ("pose", "betas", "trans"):
        assert np.isfinite(saved[k]).all(), k
    assert "final loss" in capsys.readouterr().out


def test_fit_kit_branch_resamples_and_save_folder(tmp_path, smpl_pkl,
                                                  monkeypatch):
    """21-joint KIT mmm input: decimated 100 -> 12.5 fps (reference
    fit.py:171-185) before fitting, and --save_folder reroutes the
    output."""
    from ladiff_tpu.data.framerate import subsample

    T = 40
    rs = np.random.RandomState(2)
    joints = (rs.randn(T, 21, 3) * 50.0).astype(np.float32)  # mmm units
    npy = str(tmp_path / "kit_000.npy")
    np.save(npy, joints)
    out_dir = str(tmp_path / "fits")
    _run_fit(monkeypatch, ["--npy", npy, "--iters", "3",
                           "--smpl", smpl_pkl, "--num_joints", "21",
                           "--gmm", str(tmp_path / "no_gmm"),
                           "--save_folder", out_dir])
    out = os.path.join(out_dir, "kit_000_smpl.npz")
    assert os.path.isfile(out)
    want_T = len(subsample(T, 100, 12.5))
    saved = np.load(out)
    assert saved["pose"].shape == (want_T, 24, 3)
    assert np.isfinite(saved["pose"]).all()


def test_fit_requires_input_and_skips_malformed(tmp_path, smpl_pkl,
                                                monkeypatch, capsys):
    """No --npy/--dir errors out (argparse exit 2); a non-[T, J, 3] file
    is skipped with a message instead of crashing the batch."""
    with pytest.raises(SystemExit):
        _run_fit(monkeypatch, ["--smpl", smpl_pkl])
    bad = str(tmp_path / "bad.npy")
    np.save(bad, np.zeros((5, 3), np.float32))
    _run_fit(monkeypatch, ["--npy", bad, "--iters", "1",
                           "--smpl", smpl_pkl,
                           "--gmm", str(tmp_path / "no_gmm")])
    assert "skipping" in capsys.readouterr().out
    assert not os.path.exists(str(tmp_path / "bad_smpl.npz"))
