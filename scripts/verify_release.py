"""Release-verification gate: populated deps/ -> benchmark -> paper deltas.

The FID-within-2%-of-released-checkpoint leg of the project north star
(BASELINE.json) as ONE command, runnable the moment the released assets
land.  Protocol is the reference benchmark (/root/reference/src/test.py:
136-166 — REPLICATION_TIMES full T2M passes, mean ± 1.96σ/√n) driven
through the production `test.run_test`.

Steps:
  1. audit the deps/ + datasets/ layout (prepare/*.sh fills it) and report
     anything missing,
  2. convert the released torch checkpoint (vae.* + denoiser.* keys) to
     our param tree via the tested converters in utils/checkpoint.py,
  3. run the benchmark,
  4. print metric ± CI rows and, when --expected is given, per-metric
     deltas with a PASS/FAIL on |ΔFID| <= --fid-tolerance (relative).

--expected takes a JSON file {"FID": 0.xx, "R_precision_top_1": ...}
holding the paper's table for the config's dataset (arXiv:2407.11532);
both tables ship in-tree as scripts/paper_humanml3d.json and
scripts/paper_kit.json ("_"-prefixed keys are provenance metadata,
skipped by compare()).  Both released checkpoints are covered: the deps
audit, converters and benchmark all key off the config, so the KIT gate
is the same command with the KIT config
(--cfg configs/config_ladiff_kit.yaml --expected scripts/paper_kit.json).

--dry-run exercises the identical pipeline on synthetic data with
random-init weights and 1 replication (no assets needed), so the gate
itself is testable in this no-egress image: tests/test_verify_release.py.

Usage:
  python scripts/verify_release.py --ckpt deps/ladiff_humanml3d.ckpt \\
      --expected scripts/paper_humanml3d.json
  python scripts/verify_release.py --cfg configs/config_ladiff_kit.yaml \\
      --ckpt deps/ladiff_kit.ckpt --expected scripts/paper_kit.json
  python scripts/verify_release.py --dry-run
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (label, any-of paths, providing script) — shared + per-dataset tables;
# the KIT evaluator release ships under Comp_v6_KLD005 (reference
# get_data.py:28-32)
DEPS_COMMON = [
    ("CLIP ViT-L/14 text tower",
     ["deps/clip-vit-large-patch14/model.safetensors",
      "deps/clip-vit-large-patch14/pytorch_model.bin"],
     "prepare/prepare_clip.sh"),
    ("GloVe word vectors", ["deps/glove/our_vab_data.npy"],
     "see prepare/README.md (HumanML3D release)"),
]
DEPS_BY_DATASET = {
    "humanml3d": [
        ("T2M evaluators", ["deps/t2m/t2m/text_mot_match/model/finest.tar"],
         "prepare/download_t2m_evaluators.sh"),
        ("evaluator norm stats",
         ["deps/t2m/t2m/Comp_v6_KLD01/meta/mean.npy"],
         "prepare/download_t2m_evaluators.sh"),
        ("HumanML3D dataset", ["datasets/humanml3d/Mean.npy"],
         "see prepare/README.md (EricGuo5513/HumanML3D pipeline)"),
    ],
    "kit": [
        ("KIT evaluators", ["deps/t2m/kit/text_mot_match/model/finest.tar"],
         "prepare/download_t2m_evaluators.sh"),
        ("evaluator norm stats",
         ["deps/t2m/kit/Comp_v6_KLD005/meta/mean.npy"],
         "prepare/download_t2m_evaluators.sh"),
        ("KIT-ML dataset", ["datasets/kit-ml/Mean.npy"],
         "see prepare/README.md (KIT-ML release)"),
    ],
}


def audit_deps(root: str, dataset: str = "humanml3d"):
    """Returns ([present labels], [(label, hint, expected_path) missing])."""
    present, missing = [], []
    table = DEPS_COMMON + DEPS_BY_DATASET.get(dataset,
                                              DEPS_BY_DATASET["humanml3d"])
    for label, paths, hint in table:
        if any(os.path.exists(os.path.join(root, p)) for p in paths):
            present.append(label)
        else:
            missing.append((label, hint, paths[0]))
    return present, missing


def convert_release_checkpoint(ckpt_path: str, system):
    """Released stage-2 torch ckpt (vae.* + denoiser.* keys in one state
    dict) -> {"vae": ..., "denoiser": ...} param tree."""
    import jax
    import jax.numpy as jnp

    from ladiff_tpu.utils.checkpoint import (
        load_reference_denoiser_checkpoint, load_reference_vae_checkpoint)
    n_vae = system.vae_num_layers or system.num_layers
    n_den = system.denoiser_num_layers or system.num_layers
    tree = {
        "vae": load_reference_vae_checkpoint(ckpt_path, n_vae),
        "denoiser": load_reference_denoiser_checkpoint(
            ckpt_path, n_den, md_trans=system.md_trans),
    }
    return jax.tree.map(jnp.asarray, tree)


def compare(summary, expected, fid_tolerance):
    """Rows of (metric, got, conf, want, rel_delta); overall pass bool.

    Keys starting with "_" are provenance metadata (see the committed
    scripts/paper_*.json), not metrics — skipped."""
    rows, ok = [], True
    for key, want in sorted(expected.items()):
        if key.startswith("_"):
            continue
        if key not in summary:
            rows.append((key, None, None, want, None))
            ok = False
            continue
        got, conf = summary[key]
        rel = (got - want) / abs(want) if want else float("inf")
        rows.append((key, got, conf, want, rel))
        if key == "FID" and abs(rel) > fid_tolerance:
            ok = False
    return rows, ok


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="verify the released checkpoint against the paper table")
    ap.add_argument("--cfg",
                    default=os.path.join(REPO, "configs",
                                         "config_ladiff_humanml3d.yaml"))
    ap.add_argument("--cfg_assets",
                    default=os.path.join(REPO, "configs", "assets.yaml"))
    ap.add_argument("--ckpt", default=None,
                    help="released stage-2 torch checkpoint (.ckpt)")
    ap.add_argument("--expected", default=None,
                    help="JSON file of paper metric values to diff against")
    ap.add_argument("--fid-tolerance", type=float, default=0.02,
                    help="relative |ΔFID| gate (north star: 2%%)")
    ap.add_argument("--replication", type=int, default=None,
                    help="override TEST.REPLICATION_TIMES (reference: 20)")
    ap.add_argument("--steps", type=int, default=None,
                    help="override num_inference_timesteps (report at 50)")
    ap.add_argument("--dry-run", action="store_true",
                    help="synthetic data + random weights, 1 replication")
    ap.add_argument("--folder", default=None,
                    help="experiment output folder override (FOLDER)")
    ap.add_argument("--tiny", action="store_true",
                    help="with --dry-run: shrink the model/protocol so the "
                         "gate's plumbing runs in seconds (CI lane)")
    args = ap.parse_args(argv)

    if args.tiny and not args.dry_run:
        # --tiny shrinks the model to 3 layers / latent 32: converting or
        # benchmarking REAL released weights against that config would fail
        # or silently mis-report, so refuse instead
        ap.error("--tiny is a --dry-run companion (it overrides the model "
                 "architecture); combine it with --dry-run or drop it")

    # Honor a caller's JAX_PLATFORMS request (e.g. the dry-run tests set
    # "cpu").  The env var alone is NOT enough under the axon relay — its
    # sitecustomize overrides env platform selection at import — so apply
    # it through jax.config, which wins after import (CLAUDE.md traps).
    want_platform = os.environ.get("JAX_PLATFORMS")
    if want_platform:
        import jax
        jax.config.update("jax_platforms", want_platform)

    from ladiff_tpu.utils.jax_cache import enable as _enable
    _enable()

    if args.dry_run:
        os.environ["LADIFF_SYNTHETIC_DATA"] = "1"
        # enough synthetic test sequences (>32, the R-precision group
        # size) that the T2M metrics — FID included — actually compute,
        # so the dry-run exercises the same compare() rows as the real
        # gate
        os.environ.setdefault("LADIFF_SYNTHETIC_CLIPS", "400")

    from ladiff_tpu.config import assemble_config
    from ladiff_tpu.utils.logger import create_logger
    overrides = {"DEBUG": False}
    if args.folder:
        overrides["FOLDER"] = args.folder
    if args.dry_run:
        overrides.setdefault("TEST", {})["REPLICATION_TIMES"] = 1
        overrides["NAME"] = "verify_release_dryrun"
    if args.tiny:
        overrides["TEST"] = {**overrides.get("TEST", {}), "BATCH_SIZE": 8,
                             "MM_NUM_SAMPLES": 2, "MM_NUM_REPEATS": 12,
                             "MM_NUM_TIMES": 4, "DIVERSITY_TIMES": 5}
        overrides["model"] = {"num_layers": 3, "ff_size": 64,
                              "latent_dim": [7, 32],
                              "scheduler": {"num_inference_timesteps": 3}}
    if args.replication is not None:
        overrides.setdefault("TEST", {})["REPLICATION_TIMES"] = \
            args.replication
    if args.steps is not None:
        overrides.setdefault("model", {})["num_inference_timesteps"] = \
            args.steps
    cfg = assemble_config(args.cfg, args.cfg_assets, overrides=overrides)
    logger = create_logger(cfg, phase="test")

    dataset = (list(cfg.TEST.DATASETS) or ["humanml3d"])[0]
    present, missing = audit_deps(os.getcwd(), dataset)
    for label in present:
        print(f"  [ok]      {label}")
    for label, hint, path in missing:
        print(f"  [MISSING] {label} (expected {path})  ->  {hint}")
    if missing and not args.dry_run:
        print("note: missing assets fall back to deterministic stand-ins; "
              "numbers below are then self-consistent, NOT paper-comparable")

    params = None
    if args.ckpt:
        from ladiff_tpu.data.datamodule import get_datasets
        from ladiff_tpu.training.loop import build_system
        dm = get_datasets(cfg, phase="test")[0]
        system = build_system(cfg, dm)
        params = convert_release_checkpoint(args.ckpt, system)
        print(f"converted {args.ckpt}")
    elif args.dry_run:
        import jax

        from ladiff_tpu.data.datamodule import get_datasets
        from ladiff_tpu.training.loop import build_system
        dm = get_datasets(cfg, phase="test")[0]
        system = build_system(cfg, dm)
        params = system.init_params(jax.random.PRNGKey(0))
    else:
        print("no --ckpt given: falling back to TEST.CHECKPOINTS "
              f"({cfg.TEST.CHECKPOINTS})")

    from test import run_test
    summary = run_test(cfg, logger, params=params)

    print("\n==== benchmark ====")
    for k, (m, c) in sorted(summary.items()):
        print(f"{k:>24s}: {m:.4f} ± {c:.4f}")

    if args.expected:
        with open(args.expected) as f:
            expected = json.load(f)
        rows, ok = compare(summary, expected, args.fid_tolerance)
        print("\n==== vs expected ====")
        for key, got, conf, want, rel in rows:
            if got is None:
                print(f"{key:>24s}: MISSING (expected {want})")
            else:
                print(f"{key:>24s}: {got:.4f} vs {want:.4f} "
                      f"({rel:+.2%})")
        print(f"\nFID gate (|Δ| <= {args.fid_tolerance:.0%}): "
              + ("PASS" if ok else "FAIL"))
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
