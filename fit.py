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
                 lr: float = 0.05, smooth_weight: float = 1e-3,
                 gmm_dir: str = "deps/gmm", verbose: bool = False):
    """target_joints: [T, J<=24, 3] -> dict of pose/betas/trans + losses.

    Loss follows the reference's ``body_fitting_loss_3d``
    (customloss.py:128-183): Geman-McClure joint error (sigma 100, weight
    500²), GMM max-mixture pose prior (weight (4.78·1.5)², L2 fallback when
    the gmm_06.pkl asset is absent), knee/elbow angle prior (15.2²) and
    betas shape prior (5²) — plus a temporal smoothness term the reference
    doesn't need (it seeds each frame with the previous frame's fit; we fit
    all frames in parallel instead)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ladiff_tpu.smpl.prior import angle_prior, create_prior, gmof

    T, J, _ = target_joints.shape
    target = jnp.asarray(target_joints, jnp.float32)
    pose_prior = create_prior("gmm", gmm_dir)
    # normalize the reference's summed loss by T*J so lr behaves across
    # sequence lengths
    scale = 1.0 / (T * J)

    params = {
        "pose": jnp.zeros((T, 24, 3)),
        "betas": jnp.zeros((10,)),
        "trans": jnp.asarray(
            np.repeat(target_joints[:, :1].mean(1), 1, axis=0)),
    }

    def loss_fn(p):
        joints = model.forward(p["pose"], p["betas"], p["trans"])
        body_pose = p["pose"][:, 1:].reshape(T, 69)
        jl = (500.0 ** 2) * gmof(joints[:, :J] - target, 100.0).sum((-1, -2))
        prior_l = ((4.78 * 1.5) ** 2) * pose_prior(body_pose, p["betas"])
        ang_l = (15.2 ** 2) * angle_prior(body_pose).sum(-1)
        shape_l = (5.0 ** 2) * jnp.sum(p["betas"] ** 2)
        smooth = smooth_weight * jnp.sum((p["pose"][1:] - p["pose"][:-1]) ** 2)
        return scale * (jnp.sum(jl + prior_l + ang_l) + shape_l + smooth)

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
    ap.add_argument("--gmm", type=str, default="deps/gmm",
                    help="folder with gmm_06.pkl (SMPLify pose prior); "
                         "falls back to an L2 prior when absent")
    ap.add_argument("--num_joints", type=int, default=0,
                    help="22 = HumanML3D (no resample), 21 = KIT mmm "
                         "(100 -> 12.5 fps decimation + smplh scaling, "
                         "reference fit.py:171-185); 0 = infer from data")
    ap.add_argument("--save_folder", type=str, default=None,
                    help="write <name>_smpl.npz files here instead of "
                         "next to the inputs (reference fit.py --save_folder)")
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

    from ladiff_tpu.data.framerate import subsample
    from ladiff_tpu.utils.joints import mmm_to_smplh_scaling_factor

    for f in files:
        joints = np.load(f)
        if joints.ndim != 3:
            print(f"skipping {f}: expected [T, J, 3]")
            continue
        nj = args.num_joints or joints.shape[1]
        if nj == 21:
            # KIT mmm joints: 100 fps capture decimated to 12.5 fps and
            # rescaled into smpl-h units (reference fit.py:177-185)
            joints = joints[subsample(len(joints), 100, 12.5)]
            joints = joints * mmm_to_smplh_scaling_factor
        print(f"fitting {f} ({joints.shape[0]} frames)...")
        params, loss = fit_sequence(model, joints, iters=args.iters,
                                    gmm_dir=args.gmm, verbose=True)
        out = f.rsplit(".", 1)[0] + "_smpl.npz"
        if args.save_folder:
            os.makedirs(args.save_folder, exist_ok=True)
            out = os.path.join(args.save_folder, os.path.basename(out))
        np.savez(out, **params)
        print(f"  -> {out} (final loss {loss:.6f})")


if __name__ == "__main__":
    main()
