"""Training entry point.

Mirrors the reference CLI (/root/reference/src/train.py):
  python train.py --cfg configs/config_vae_humanml3d.yaml \
                  --cfg_assets configs/assets.yaml            # stage 1
  python train.py --cfg configs/config_ladiff_humanml3d.yaml \
                  --cfg_assets configs/assets.yaml            # stage 2
"""
from __future__ import annotations


def main():
    from ladiff_tpu.utils.jax_cache import enable as _enable_jax_cache
    _enable_jax_cache()

    from ladiff_tpu.config import parse_args
    from ladiff_tpu.data.datamodule import get_datasets
    from ladiff_tpu.training.loop import run_training
    from ladiff_tpu.utils.logger import apply_resume, create_logger

    cfg = parse_args("train")
    # TRAIN.RESUME -> reload that run's config snapshot, newest checkpoint,
    # and WandB run id (reference src/train.py:26-53)
    cfg = apply_resume(cfg)
    logger = create_logger(cfg, phase="train")
    logger.info(f"experiment: {cfg.NAME} stage={cfg.TRAIN.STAGE}")
    dm = get_datasets(cfg, phase="train")[0]
    logger.info(f"dataset {dm.name}: nfeats={dm.nfeats} njoints={dm.njoints} "
                f"train={len(dm.dataset('train'))}")
    ckpt_dir = run_training(cfg, dm, logger)
    logger.info(f"training done; checkpoints at {ckpt_dir}")


if __name__ == "__main__":
    main()
