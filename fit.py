"""SMPL fitting entry point: generated joints -> SMPL pose parameters.

Rebuild of the reference SMPLify-3D path (/root/reference/src/fit.py +
ladiff/transforms/joints2rots/{smplify,customloss,prior}.py, ~1.1k LoC):
optimize per-frame SMPL pose + global translation (+ shared betas) so the
regressed joints match target 3D joints.  TPU-native recast: instead of the
reference's staged LBFGS with a GMM pose prior over per-frame loops, the
whole sequence is fit jointly with Adam through the jitted differentiable
LBS — every frame in parallel on the accelerator.

Usage:
  python fit.py --npy sample.npy [--dir folder] [--iters 300]
                [--smpl deps/smpl_models/smpl/SMPL_NEUTRAL.pkl]
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def fit_sequence(model, target_joints: np.ndarray, iters: int = 300,
                 lr: float = 0.05, pose_reg: float = 1e-3,
                 verbose: bool = False):
    """target_joints: [T, J<=24, 3] -> dict of pose/betas/trans + losses."""
    import jax
    import jax.numpy as jnp
    import optax

    T, J, _ = target_joints.shape
    target = jnp.asarray(target_joints, jnp.float32)

    params = {
        "pose": jnp.zeros((T, 24, 3)),
        "betas": jnp.zeros((10,)),
        "trans": jnp.asarray(
            np.repeat(target_joints[:, :1].mean(1), 1, axis=0)),
    }

    def loss_fn(p):
        joints = model.forward(p["pose"], p["betas"], p["trans"])
        jl = jnp.mean((joints[:, :J] - target) ** 2)
        # pose regularizer stands in for the reference's GMM prior
        # (prior.py MaxMixturePrior) — keeps rotations near rest
        reg = pose_reg * jnp.mean(p["pose"] ** 2)
        smooth = pose_reg * jnp.mean((p["pose"][1:] - p["pose"][:-1]) ** 2)
        return jl + reg + smooth

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(iters):
        params, opt_state, loss = step(params, opt_state)
        if verbose and (i % 50 == 0 or i == iters - 1):
            print(f"  iter {i:4d}  loss {float(loss):.6f}")
    return {k: np.asarray(v) for k, v in params.items()}, float(loss)


def main():
    from ladiff_tpu.smpl.body_model import SMPLModel

    ap = argparse.ArgumentParser()
    ap.add_argument("--npy", type=str, default=None)
    ap.add_argument("--dir", type=str, default=None)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--smpl", type=str,
                    default="deps/smpl_models/smpl/SMPL_NEUTRAL.pkl")
    args = ap.parse_args()

    model = SMPLModel.load(args.smpl)
    if model is None:
        print(f"WARNING: SMPL model not found at {args.smpl}; using a "
              "synthetic body model (outputs are only structurally valid)")
        model = SMPLModel.synthetic()

    files = []
    if args.npy:
        files.append(args.npy)
    if args.dir:
        files.extend(sorted(glob.glob(os.path.join(args.dir, "*.npy"))))
    if not files:
        ap.error("provide --npy or --dir")

    for f in files:
        joints = np.load(f)
        if joints.ndim != 3:
            print(f"skipping {f}: expected [T, J, 3]")
            continue
        print(f"fitting {f} ({joints.shape[0]} frames)...")
        params, loss = fit_sequence(model, joints, iters=args.iters,
                                    verbose=True)
        out = f.rsplit(".", 1)[0] + "_smpl.npz"
        np.savez(out, **params)
        print(f"  -> {out} (final loss {loss:.6f})")


if __name__ == "__main__":
    main()
