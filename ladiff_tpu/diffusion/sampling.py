"""On-device diffusion sampling loops.

The reference's hot loop (`_diffusion_reverse`,
/root/reference/src/ladiff/models/modeltype/ladiff.py:333-571) runs a Python
``for`` over scheduler timesteps with per-step CFG batch doubling and host
round-trips.  Here the full loop — CFG doubling, denoiser call, guidance
combine, DDIM/DDPM update, latent re-masking — compiles to one
``jax.lax.scan``, so all inference steps stay on the TPU with zero host sync.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ladiff_tpu.diffusion.schedulers import DiffusionSchedule, ddim_timesteps

__all__ = ["ddim_sample", "make_cfg_denoise_fn"]


def make_cfg_denoise_fn(
    denoise_fn: Callable[..., jax.Array],
    text_emb_uncond: jax.Array,
    text_emb_cond: jax.Array,
    guidance_scale: float,
):
    """Wraps a denoiser into a classifier-free-guided epsilon predictor.

    The reference doubles the batch ([uncond; cond], ladiff.py:470-490); we
    do the same inside jit — one denoiser call on 2B, then a fused combine.
    ``denoise_fn(latents, t, text, valid, aux)`` receives the per-step
    ``aux`` value scanned through by ``ddim_sample`` (e.g. a precomputed
    time-embedding row).
    """
    do_cfg = guidance_scale > 1.0

    def fn(latents: jax.Array, timestep: jax.Array,
           latent_valid: Optional[jax.Array], aux=None) -> jax.Array:
        B = latents.shape[0]
        if do_cfg:
            model_in = jnp.concatenate([latents, latents], axis=0)
            text = jnp.concatenate([text_emb_uncond, text_emb_cond], axis=0)
            valid = (None if latent_valid is None
                     else jnp.concatenate([latent_valid, latent_valid], axis=0))
            t = jnp.broadcast_to(timestep, (2 * B,))
            out = denoise_fn(model_in, t, text, valid, aux)
            eps_uncond, eps_text = out[:B], out[B:]
            return eps_uncond + guidance_scale * (eps_text - eps_uncond)
        t = jnp.broadcast_to(timestep, (B,))
        return denoise_fn(latents, t, text_emb_cond, latent_valid, aux)

    return fn


def ddim_sample(
    guided_denoise_fn: Callable[[jax.Array, jax.Array, Optional[jax.Array]], jax.Array],
    schedule: DiffusionSchedule,
    rng: jax.Array,
    shape: tuple,
    num_inference_steps: int,
    *,
    latent_valid: Optional[jax.Array] = None,
    eta: float = 0.0,
    steps_offset: int = 1,
    step_aux=None,
    return_trajectory: bool = False,
    kind: str = "ddim",
) -> jax.Array:
    """Full reverse process as a single scan.

    shape: [B, n_lat, D].  ``latent_valid`` rows beyond the per-sample active
    count stay exactly zero through every step (the reference zeroes init
    noise at ladiff.py:386-390 and re-zeroes at :562-569; with a zero init
    and masked updates the invariant holds at every step here).

    ``kind``: "ddim" (deterministic unless eta > 0) or "ddpm" (ancestral,
    per-step noise) — the reference selects via the configured diffusers
    scheduler class (modules*/scheduler.yaml; the novae family ships
    DDPMScheduler at 1000 steps).
    """
    assert kind in ("ddim", "ddpm"), kind
    init_rng, noise_rng = jax.random.split(rng)
    latents = jax.random.normal(init_rng, shape, jnp.float32)
    latents = latents * schedule.init_noise_sigma
    if latent_valid is not None:
        latents = jnp.where(latent_valid[:, :, None], latents, 0.0)

    ts, prev_ts = ddim_timesteps(schedule.num_train_timesteps,
                                 num_inference_steps,
                                 steps_offset if kind == "ddim" else 0)
    ts = jnp.asarray(ts)
    prev_ts = jnp.asarray(prev_ts)

    def step(carry, scanned):
        latents, rng = carry
        t, t_prev, aux = scanned
        eps = guided_denoise_fn(latents, t, latent_valid, aux)
        if kind == "ddpm" or eta > 0.0:
            rng, step_rng = jax.random.split(rng)
            noise = jax.random.normal(step_rng, latents.shape, latents.dtype)
        else:
            noise = None
        if kind == "ddpm":
            latents = schedule.ddpm_step(eps, t, latents, noise,
                                         prev_timestep=t_prev)
        else:
            latents = schedule.ddim_step(eps, t, t_prev, latents, eta=eta,
                                         noise=noise)
        if latent_valid is not None:
            latents = jnp.where(latent_valid[:, :, None], latents, 0.0)
        return (latents, rng), (latents if return_trajectory else None)

    if step_aux is None:
        step_aux = jnp.zeros((len(ts),), jnp.int32)  # dummy scanned value
    # unroll=2 measured ~3% faster on v5e (pipelines adjacent steps)
    (latents, _), traj = jax.lax.scan(step, (latents, noise_rng),
                                      (ts, prev_ts, step_aux), unroll=2)
    if return_trajectory:
        # [n_steps, B, n_lat, D] intermediate latents (reference
        # _diffusion_reverse_tsne captures these, ladiff.py:573-743)
        return latents, traj
    return latents
