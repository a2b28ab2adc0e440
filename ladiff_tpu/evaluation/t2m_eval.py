"""T2M evaluation pipeline: generation + evaluator encoding on TPU.

Rebuild of the reference ``t2m_eval`` (/root/reference/src/ladiff/models/
modeltype/ladiff.py:1111-1282) and the 20-replication ``test.py`` driver
(/root/reference/src/test.py:136-166).

One jitted program per batch covers: CFG DDIM sampling -> LA-VAE decode ->
joint recovery -> evaluator re-normalization -> movement/motion/text
encoders.  Host-side numpy only accumulates embeddings and runs the
epoch-end metric math.

Reference deltas, deliberate:
  * no per-sample "repeat last frame" padding loop (ladiff.py:1219-1229):
    with a static 196-frame decode every gt length fits, so the copy/pad
    reduces to the frame mask the decoder already applies;
  * no length-desc sort (ladiff.py:1256-1262): that exists only for torch's
    pack_padded_sequence; the masked-scan BiGRU doesn't need it, and metric
    alignment only requires a consistent order across the three embeddings.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ladiff_tpu.models.evaluators import (MotionEncoderBiGRUCo,
                                          MovementConvEncoder,
                                          TextEncoderBiGRUCo)
from ladiff_tpu.models.ladiff import LADiffSystem

__all__ = ["T2MEvaluator", "make_eval_step"]


@dataclasses.dataclass
class T2MEvaluator:
    """Bundles the three frozen evaluator encoders + their params."""

    nfeats: int
    params: Dict  # {"text": ..., "movement": ..., "motion": ...}
    unit_length: int = 4

    def __post_init__(self):
        self.movement = MovementConvEncoder()
        self.motion = MotionEncoderBiGRUCo()
        self.text = TextEncoderBiGRUCo()

    @classmethod
    def random_init(cls, nfeats: int, rng_seed: int = 0) -> "T2MEvaluator":
        """Random-weight evaluators (self-consistent metrics only) for when
        the pretrained finest.tar deps are absent."""
        rng = jax.random.PRNGKey(rng_seed)
        r1, r2, r3 = jax.random.split(rng, 3)
        movement = MovementConvEncoder()
        motion = MotionEncoderBiGRUCo()
        text = TextEncoderBiGRUCo()
        params = {
            "movement": movement.init(
                r1, jnp.zeros((1, 8, nfeats - 4)))["params"],
            "motion": motion.init(
                r2, jnp.zeros((1, 2, 512)), jnp.array([2]))["params"],
            "text": text.init(
                r3, jnp.zeros((1, 4, 300)), jnp.zeros((1, 4, 15)),
                jnp.array([4]))["params"],
        }
        return cls(nfeats=nfeats, params=params)

    @classmethod
    def from_checkpoint(cls, path: str, nfeats: int) -> Optional["T2MEvaluator"]:
        from ladiff_tpu.models.evaluators import load_t2m_checkpoint
        params = load_t2m_checkpoint(path)
        if params is None:
            return None
        return cls(nfeats=nfeats, params=params)

    # -- jittable encoders ---------------------------------------------
    def encode_motion(self, feats_renormed: jax.Array,
                      lengths: jax.Array) -> jax.Array:
        """[B, T, F] renormed features -> [B, 512]
        (reference ladiff.py:1264-1267: moveencoder on feats[..., :-4],
        motionencoder with m_lens // unit_len).

        ``valid_length = max(lengths)`` replicates the reference's
        batch-max cropping (its collate pads to the batch's longest sample,
        data/utils.py:12), so boundary conv windows read the same zero
        padding they do in torch — static padding beyond the batch max
        never leaks into consumed embeddings."""
        mov = self.movement.apply({"params": self.params["movement"]},
                                  feats_renormed[..., :-4],
                                  valid_length=jnp.max(lengths))
        m_lens = jnp.maximum(lengths // self.unit_length, 1)
        return self.motion.apply({"params": self.params["motion"]}, mov, m_lens)

    def encode_text(self, word_embs: jax.Array, pos_ohot: jax.Array,
                    text_lengths: jax.Array) -> jax.Array:
        return self.text.apply({"params": self.params["text"]},
                               word_embs, pos_ohot, text_lengths)


def make_eval_step(system: LADiffSystem, evaluator: T2MEvaluator,
                   mean_eval, std_eval, stage: str = "diffusion",
                   num_inference_timesteps: Optional[int] = None,
                   mesh=None) -> Callable:
    """Returns jitted
    (params, batch, text_cond, text_uncond, rng) -> dict of embeddings/joints.

    stage "diffusion": text -> z via DDIM (reference t2m_eval :1134-1145);
    stage "vae": gt motion -> z via the encoder (reference :1150-1154).

    ``mesh``: optional data mesh — batch/text inputs shard over the ``data``
    axis, params replicate, outputs gather; the benchmark protocol then
    scales over chips exactly like the training step (the reference forces
    test to a single device, test.py:193-197 via config.py — here eval is
    the same SPMD program as everything else).
    """
    mean_eval = jnp.asarray(mean_eval)
    std_eval = jnp.asarray(std_eval)

    def step(params, batch, text_cond, text_uncond, rng):
        lengths = batch["length"]
        motions = batch["motion"]
        if stage == "diffusion":
            z = system.diffusion_reverse(
                params["denoiser"], text_cond, text_uncond, lengths, rng,
                num_inference_timesteps)
        else:
            z, _, _, _ = system.vae.apply(
                {"params": params["vae"]}, motions, lengths,
                rng=rng, deterministic=True, method=system.vae.encode)
        if system.vae_type == "no":
            # feature-space diffusion (novae family): z already IS the
            # features — mask padded frames like the sampler's row masking
            # in diffusion_reverse does (models/ladiff.py lat_valid =
            # frame_valid there; the reference instead leaves noise in
            # padded frames and zeroes at the consumer, ladiff.py:911-912)
            from ladiff_tpu.utils.masks import lengths_to_mask
            frame_valid = lengths_to_mask(lengths, motions.shape[1])
            feats_rst = jnp.where(frame_valid[:, :, None], z, 0.0)
        else:
            feats_rst = system.vae.apply(
                {"params": params["vae"]}, z, lengths,
                nframes=motions.shape[1], deterministic=True,
                method=system.vae.decode)

        joints_rst = system.feats2joints(feats_rst)
        joints_ref = system.feats2joints(motions)

        renorm = lambda f: (f * system.std + system.mean - mean_eval) / std_eval
        rst_renorm = renorm(feats_rst)
        ref_renorm = renorm(motions)

        recons_emb = evaluator.encode_motion(rst_renorm, lengths)
        motion_emb = evaluator.encode_motion(ref_renorm, lengths)
        text_emb = evaluator.encode_text(batch["word_embs"],
                                         batch["pos_ohot"],
                                         batch["text_len"])
        return {
            "lat_t": text_emb,
            "lat_rm": recons_emb,
            "lat_m": motion_emb,
            "joints_rst": joints_rst,
            "joints_ref": joints_ref,
            # [B, max_it, D] latents, for TEST.SAVE_LATENTS (reference
            # ladiff.py:1175-1191 dumps gt-encoded z during vae-stage eval)
            "z": z,
        }

    if mesh is None:
        return jax.jit(step, static_argnames=())
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ladiff_tpu.parallel.mesh import DATA_AXIS
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    batch_sh = {"motion": data, "length": data, "word_embs": data,
                "pos_ohot": data, "text_len": data}
    return jax.jit(step,
                   in_shardings=(repl, batch_sh, data, data, repl),
                   out_shardings=repl)
