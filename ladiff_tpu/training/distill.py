"""Progressive distillation of the latent denoiser (opt-in TRAIN.STAGE).

BEYOND the reference (which has no counterpart): the round-4 roofline work
(PERF.md) showed the DDIM-50 sampler is within ~2x of its MXU roofline and
block-geometry-saturated, so the remaining headline headroom is model-level
FLOP reduction — exactly what progressive distillation buys: a student
denoiser whose S DDIM steps reproduce the teacher's 2S-step trajectory
(Salimans & Ho 2022, "Progressive Distillation for Fast Sampling of
Diffusion Models"), halving sampler FLOPs per round of distillation.

Guidance is distilled INTO the student (the teacher is queried with the
production classifier-free-guidance combination, Meng et al. 2023 style),
so a distilled student samples with ``guidance_scale=1`` — no CFG batch
doubling — compounding the step-count saving to ~4x per halving round.

TPU-first shape: the whole distill step (frozen VAE encode -> teacher
2-step rollout -> student prediction -> truncated-SNR loss) is one jitted,
mesh-shardable function; the teacher rollout runs under ``stop_gradient``
on the fused inference kernels, the student under the training kernels.

Quality gate: like every training recipe here, numeric FID validation
needs the released checkpoints/datasets (scripts/verify_release.py); the
tests pin the math (the inverted-DDIM target is exact for a consistent
model) and that the loss trains.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from jax.sharding import Mesh

from ladiff_tpu.diffusion.schedulers import ddim_solve_eps_x0
from ladiff_tpu.models.ladiff import LADiffSystem
from ladiff_tpu.training.trainer import (TrainState, _jit_step, _shardings)
from ladiff_tpu.utils.masks import lengths_to_mask

__all__ = ["distill_forward", "make_distill_train_step"]


def _teacher_guided_eps(system: LADiffSystem, teacher_params, x, t,
                        cond, uncond, lat_valid, frame_valid):
    """Teacher epsilon with the production CFG combination, one doubled
    batch (uncond rows first, like diffusion_reverse's sampler batch)."""
    if system.guidance_scale <= 1.0:
        return system.denoiser.apply(
            {"params": teacher_params}, x, t, cond, lat_valid,
            frame_valid=frame_valid, deterministic=True)
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    cond2 = jnp.concatenate([jnp.broadcast_to(uncond.astype(cond.dtype),
                                              cond.shape), cond], axis=0)
    lv2 = (jnp.concatenate([lat_valid, lat_valid], axis=0)
           if lat_valid is not None else None)
    fv2 = (jnp.concatenate([frame_valid, frame_valid], axis=0)
           if frame_valid is not None else None)
    eps = system.denoiser.apply(
        {"params": teacher_params}, x2, t2, cond2, lv2,
        frame_valid=fv2, deterministic=True)
    eps_u, eps_c = jnp.split(eps, 2, axis=0)
    return eps_u + system.guidance_scale * (eps_c - eps_u)


def distill_forward(system: LADiffSystem, student_params, teacher_params,
                    vae_params, batch: Dict[str, jax.Array], rng: jax.Array,
                    uncond_emb: jax.Array, student_steps: int,
                    train: bool = True):
    """One progressive-distillation loss evaluation.

    Draws a random position on the student's S-step DDIM grid, rolls the
    frozen teacher TWO half-steps from there (with CFG), inverts the jump
    for the exact one-step target (ddim_solve_eps_x0), and penalizes the
    student's x0 prediction with the truncated-SNR weight
    max(SNR, 1) (Salimans & Ho 2022, sec. 3.2)."""
    schedule = system.schedule
    N = schedule.num_train_timesteps
    S = int(student_steps)
    ratio = N // S
    assert S * ratio == N and ratio % 2 == 0, \
        (f"student_steps={S} must divide num_train_timesteps={N} with an "
         f"even step ratio (teacher runs the 2S grid)")
    half = ratio // 2

    feats_ref = batch["motion"]
    lengths = batch["length"]
    cond = batch["text_emb"]
    B = feats_ref.shape[0]
    enc_rng, i_rng, n_rng, drop_rng = jax.random.split(rng, 4)

    if system.vae_type == "no":
        z0 = feats_ref
        lat_valid = None
        frame_valid = lengths_to_mask(lengths, feats_ref.shape[1])
    else:
        z0, _, _, lat_valid = system.vae.apply(
            {"params": jax.lax.stop_gradient(vae_params)}, feats_ref,
            lengths, rng=enc_rng, deterministic=True,
            method=system.vae.encode)
        z0 = jax.lax.stop_gradient(z0)
        frame_valid = None

    def _zero_invalid(x):
        if system.lad and lat_valid is not None:
            return jnp.where(lat_valid[:, :, None], x, 0.0)
        return x

    # student DDIM grid position per sample: t -> (teacher mid) -> t_prev
    i = jax.random.randint(i_rng, (B,), 0, S)
    t = ((S - 1 - i) * ratio + 1).astype(jnp.int32)   # ddim_timesteps grid
    t_mid = t - half
    t_prev = t - ratio

    noise = jax.random.normal(n_rng, z0.shape, z0.dtype)
    x_t = _zero_invalid(schedule.add_noise(z0, noise, t))

    # frozen teacher: two guided half-steps (inference kernels, no grads).
    # Boundary: at the student grid's FINAL index t=1 the teacher mid-point
    # t-half is negative (the diffusers offset grid ends at 1) — those rows
    # fall back to distilling the teacher's ONE guided step (pure guidance
    # distillation, Meng et al. 2023), selected with a where; the second
    # teacher call runs on clamped-safe inputs whose result is discarded.
    is_last = (t_mid < 0)
    last_b = is_last[:, None, None]
    t_mid_safe = jnp.maximum(t_mid, 0)

    def teacher_rollout(x):
        eps1 = _teacher_guided_eps(system, teacher_params, x, t, cond,
                                   uncond_emb, lat_valid, frame_valid)
        x_mid = _zero_invalid(schedule.ddim_step(eps1, t, t_mid_safe, x))
        eps2 = _teacher_guided_eps(system, teacher_params, x_mid, t_mid_safe,
                                   cond, uncond_emb, lat_valid, frame_valid)
        x_two = _zero_invalid(schedule.ddim_step(eps2, t_mid_safe, t_prev,
                                                 x_mid))
        return x_two, eps1

    x_prev, teacher_eps1 = jax.lax.stop_gradient(
        teacher_rollout(jax.lax.stop_gradient(x_t)))

    a_t = schedule.alphas_cumprod[t].reshape((B,) + (1,) * (x_t.ndim - 1))
    x0_two, _ = ddim_solve_eps_x0(schedule, x_t, x_prev, t, t_prev)
    x0_one = (x_t - jnp.sqrt(1.0 - a_t) * teacher_eps1) / jnp.sqrt(a_t)
    x0_target = jnp.where(last_b, x0_one, x0_two)
    x0_target = _zero_invalid(jax.lax.stop_gradient(x0_target))

    # student (training path; guidance already folded into the target, so
    # the student consumes the conditional embedding only)
    rngs = {"dropout": drop_rng} if train else {}
    eps_student = system.denoiser.apply(
        {"params": student_params}, x_t, t, cond, lat_valid,
        frame_valid=frame_valid, deterministic=not train, rngs=rngs)
    x0_student = (x_t - jnp.sqrt(1.0 - a_t) * eps_student) / jnp.sqrt(a_t)
    x0_student = _zero_invalid(x0_student)

    snr_w = jnp.maximum(a_t / (1.0 - a_t), 1.0)
    per_elem = snr_w * (x0_student - x0_target) ** 2
    total = jnp.mean(per_elem)
    logs = {"distill_x0": total,
            "raw_x0_mse": jnp.mean((x0_student - x0_target) ** 2),
            "total": total}
    return total, (logs, {"latent_valid": lat_valid})


def make_distill_train_step(system: LADiffSystem, mesh: Mesh,
                            vae_params, teacher_params, uncond_emb,
                            student_steps: int,
                            fsdp: bool = False) -> Callable:
    """jitted (state, batch, rng) -> (state, logs); state.params is the
    student denoiser (typically initialized FROM the teacher)."""
    repl, data = _shardings(mesh)
    vae_params = jax.device_put(vae_params, repl)
    # the student is typically initialized FROM the teacher, so the two
    # trees may alias the same buffers — and the jitted step donates the
    # student's.  Copy the teacher onto fresh buffers first.
    teacher_params = jax.device_put(jax.tree.map(jnp.copy, teacher_params),
                                    repl)
    uncond_emb = jax.device_put(jnp.asarray(uncond_emb), repl)

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        def loss_fn(params):
            total, (logs, _) = distill_forward(
                system, params, teacher_params, vae_params, batch, rng,
                uncond_emb, student_steps, train=True)
            return total, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads)
        logs = dict(logs, grad_norm=optax.global_norm(grads))
        return state, logs

    batch_sh = {"motion": data, "length": data, "text_emb": data}
    return _jit_step(step, mesh, batch_sh, repl, fsdp=fsdp)
