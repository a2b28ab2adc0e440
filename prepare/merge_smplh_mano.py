"""Merge a SMPL+H body model with the MANO hand PCA models into the single
SMPLH_{GENDER}.npz file ladiff_tpu/smpl/body_model.py loads.

Fresh implementation of the asset-preparation step the reference performs
in src/prepare/merge_smplh_mano.py (itself derived from the smplx tools):
the MANO release ships ``hands_components`` (PCA basis), ``hands_coeffs``
and ``hands_mean`` per hand; the SMPL+H transform stack needs them embedded
in the body npz under l/r-suffixed keys.  Any chumpy arrays in the MPI
pickles are converted to plain numpy.  (NB the reference's own
``load_npz_into_dict`` reads a global instead of its argument — harmless
there, avoided here.)

Inputs require registration at https://mano.is.tue.mpg.de; see
prepare/smplh.sh for the end-to-end flow.
"""
from __future__ import annotations

import argparse
import os
import pickle
import warnings

import numpy as np


def _to_numpy_tree(d: dict) -> dict:
    return {k: (np.array(v) if "chumpy" in str(type(v)) else v)
            for k, v in d.items()}


def load_model(path: str) -> dict:
    ext = os.path.splitext(path)[-1].lower()
    if ext == ".npz":
        data = dict(np.load(path, allow_pickle=True))
    elif ext == ".pkl":
        with open(path, "rb") as f:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", DeprecationWarning)
                data = pickle.load(f, encoding="latin1")
    else:
        raise TypeError(f"expected .npz or .pkl, got {path}")
    return _to_numpy_tree(data)


def output_name(smplh_path: str) -> str:
    """SMPLH_{MALE,FEMALE,NEUTRAL}.npz by gender found in the input path
    (the MANO release stores one model.npz per gender subfolder)."""
    parent = os.path.basename(os.path.dirname(smplh_path))
    stem = (parent + "_" + os.path.basename(smplh_path)).lower()
    for gender in ("female", "neutral", "male"):  # female before male!
        if gender in stem:
            return f"SMPLH_{gender.upper()}.npz"
    return os.path.basename(smplh_path)


def merge(smplh_path: str, mano_left: str, mano_right: str,
          out_dir: str) -> str:
    body = load_model(smplh_path)
    hands = {"l": load_model(mano_left), "r": load_model(mano_right)}
    for side, mano in hands.items():
        for key in ("hands_components", "hands_coeffs", "hands_mean"):
            body[key + side] = np.asarray(mano[key])
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, output_name(smplh_path))
    np.savez_compressed(out_path, **_to_numpy_tree(body))
    print(f"wrote {out_path}")
    return out_path


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--smplh", required=True,
                    help="SMPL+H model.npz (per-gender folder)")
    ap.add_argument("--mano-left", required=True, help="MANO_LEFT.pkl")
    ap.add_argument("--mano-right", required=True, help="MANO_RIGHT.pkl")
    ap.add_argument("--out", required=True, help="output folder")
    args = ap.parse_args()
    merge(args.smplh, args.mano_left, args.mano_right, args.out)


if __name__ == "__main__":
    main()
