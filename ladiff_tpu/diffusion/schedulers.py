"""Diffusion schedules as pure-function alpha tables.

The reference delegates to ``diffusers.DDPMScheduler`` /
``diffusers.DDIMScheduler`` (/root/reference/src/configs/modules/scheduler.yaml):
1000 train steps, ``scaled_linear`` betas in [0.00085, 0.012],
``clip_sample: false``, DDIM with ``set_alpha_to_one: false`` and
``steps_offset: 1``, eta 0.  Here the whole scheduler is a precomputed
``alphas_cumprod`` table plus a handful of jittable pure functions, so the
entire sampling loop stays on-device inside one ``lax.scan``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DiffusionSchedule", "make_schedule", "ddim_timesteps",
           "ddim_solve_eps_x0"]


def _expand_like(v: jax.Array, x: jax.Array) -> jax.Array:
    """Right-pad a per-sample scalar table lookup [B] (or a scalar) with
    singleton axes so it broadcasts against x [B, ...]."""
    v = jnp.asarray(v)
    return v.reshape(v.shape + (1,) * (x.ndim - v.ndim))


def _make_betas(num_train_timesteps: int, beta_start: float, beta_end: float,
                beta_schedule: str) -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps,
                           dtype=np.float64)
    if beta_schedule == "scaled_linear":
        # sqrt-space linspace, squared (diffusers semantics)
        return np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                           num_train_timesteps, dtype=np.float64) ** 2
    if beta_schedule == "squaredcos_cap_v2":
        steps = num_train_timesteps
        def abar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        ts = np.arange(steps, dtype=np.float64)
        return np.minimum(1 - abar((ts + 1) / steps) / abar(ts / steps), 0.999)
    raise ValueError(f"unknown beta schedule {beta_schedule}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed tables; a frozen pytree safe to close over in jit."""

    alphas_cumprod: jax.Array       # [N] float32
    betas: jax.Array                # [N] float32
    final_alpha_cumprod: jax.Array  # scalar (acp[0] when set_alpha_to_one=False)
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(metadata=dict(static=True))
    clip_sample: bool = dataclasses.field(metadata=dict(static=True))

    # -- shared ---------------------------------------------------------
    def add_noise(self, x0: jax.Array, noise: jax.Array,
                  timesteps: jax.Array) -> jax.Array:
        """q(x_t | x_0) sampling (diffusers ``add_noise``)."""
        acp = self.alphas_cumprod[timesteps]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape).astype(x0.dtype)
        sqrt_1macp = jnp.sqrt(1.0 - acp).reshape(shape).astype(x0.dtype)
        return sqrt_acp * x0 + sqrt_1macp * noise

    def _predict_x0_eps(self, model_output: jax.Array, sample: jax.Array,
                        alpha_prod_t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        alpha_prod_t = _expand_like(alpha_prod_t, sample)
        beta_prod_t = 1.0 - alpha_prod_t
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(alpha_prod_t)
            eps = model_output
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - jnp.sqrt(alpha_prod_t) * x0) / jnp.sqrt(beta_prod_t)
        elif self.prediction_type == "v_prediction":
            x0 = jnp.sqrt(alpha_prod_t) * sample - jnp.sqrt(beta_prod_t) * model_output
            eps = jnp.sqrt(alpha_prod_t) * model_output + jnp.sqrt(beta_prod_t) * sample
        else:
            raise ValueError(f"unknown prediction type {self.prediction_type}")
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0, eps

    # -- DDIM -----------------------------------------------------------
    def ddim_step(self, model_output: jax.Array, timestep: jax.Array,
                  prev_timestep: jax.Array, sample: jax.Array,
                  eta: float = 0.0,
                  noise: Optional[jax.Array] = None) -> jax.Array:
        """One DDIM update x_t -> x_{t-dt} (diffusers ``DDIMScheduler.step``).
        ``timestep``/``prev_timestep`` may be scalars (the sampling scan) or
        per-sample [B] arrays (the distillation step)."""
        alpha_prod_t = _expand_like(self.alphas_cumprod[timestep], sample)
        alpha_prod_prev = _expand_like(jnp.where(
            prev_timestep >= 0,
            self.alphas_cumprod[jnp.maximum(prev_timestep, 0)],
            self.final_alpha_cumprod), sample)
        x0, eps = self._predict_x0_eps(model_output, sample, alpha_prod_t)
        if eta > 0.0:
            beta_prod_t = 1.0 - alpha_prod_t
            variance = (1.0 - alpha_prod_prev) / beta_prod_t * (
                1.0 - alpha_prod_t / alpha_prod_prev)
            sigma = eta * jnp.sqrt(variance)
        else:
            sigma = 0.0
        direction = jnp.sqrt(1.0 - alpha_prod_prev - sigma ** 2) * eps
        prev = jnp.sqrt(alpha_prod_prev) * x0 + direction
        if eta > 0.0:
            assert noise is not None
            prev = prev + sigma * noise
        return prev

    # -- DDPM -----------------------------------------------------------
    def ddpm_step(self, model_output: jax.Array, timestep: jax.Array,
                  sample: jax.Array, noise: jax.Array,
                  variance_type: str = "fixed_small",
                  prev_timestep: Optional[jax.Array] = None) -> jax.Array:
        """One ancestral DDPM update (diffusers ``DDPMScheduler.step``).

        ``prev_timestep`` defaults to t-1 (full-grid sampling); pass the
        subsampled previous timestep when num_inference < num_train
        (diffusers ``previous_timestep``)."""
        t = timestep
        t_prev = t - 1 if prev_timestep is None else prev_timestep
        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_prev = jnp.where(
            t_prev >= 0,
            self.alphas_cumprod[jnp.maximum(t_prev, 0)],
            jnp.ones_like(alpha_prod_t))
        # effective beta over the (possibly multi-step) jump
        alpha_jump = alpha_prod_t / alpha_prod_prev
        beta_t = 1.0 - alpha_jump
        alpha_t = alpha_jump
        beta_prod_t = 1.0 - alpha_prod_t
        x0, _ = self._predict_x0_eps(model_output, sample, alpha_prod_t)
        # posterior mean coefficients
        coef_x0 = jnp.sqrt(alpha_prod_prev) * beta_t / beta_prod_t
        coef_xt = jnp.sqrt(alpha_t) * (1.0 - alpha_prod_prev) / beta_prod_t
        mean = coef_x0 * x0 + coef_xt * sample
        if variance_type == "fixed_small":
            variance = (1.0 - alpha_prod_prev) / beta_prod_t * beta_t
            variance = jnp.clip(variance, 1e-20, None)
        else:
            raise ValueError(f"unsupported variance type {variance_type}")
        add = jnp.where(t > 0, jnp.sqrt(variance) * noise, 0.0)
        return mean + add

    @property
    def init_noise_sigma(self) -> float:
        return 1.0


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    prediction_type: str = "epsilon",
    clip_sample: bool = False,
    set_alpha_to_one: bool = False,
) -> DiffusionSchedule:
    betas = _make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = np.float32(1.0) if set_alpha_to_one else np.float32(alphas_cumprod[0])
    return DiffusionSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        betas=jnp.asarray(betas, jnp.float32),
        final_alpha_cumprod=jnp.asarray(final),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
        clip_sample=clip_sample,
    )


def ddim_solve_eps_x0(schedule: DiffusionSchedule, x_t: jax.Array,
                      x_next: jax.Array, t: jax.Array,
                      t_next: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Invert one deterministic DDIM jump: given states at two timesteps,
    recover the unique (x0, eps) pair consistent with BOTH

        x_t    = sqrt(a_t)    x0 + sqrt(1 - a_t)    eps
        x_next = sqrt(a_next) x0 + sqrt(1 - a_next) eps

    — the progressive-distillation target (Salimans & Ho 2022, eq. 9): the
    epsilon a ONE-step student must predict at t so its single DDIM jump
    t -> t_next lands exactly on the teacher's two-step result.
    ``t``/``t_next`` are per-sample [B] arrays; ``t_next < 0`` selects the
    schedule's final_alpha_cumprod like ``ddim_step`` does."""
    a_t = _expand_like(schedule.alphas_cumprod[t], x_t)
    a_n = _expand_like(jnp.where(
        t_next >= 0,
        schedule.alphas_cumprod[jnp.maximum(t_next, 0)],
        schedule.final_alpha_cumprod), x_t)
    sa_t, sb_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    sa_n, sb_n = jnp.sqrt(a_n), jnp.sqrt(1.0 - a_n)
    det = sa_n * sb_t - sa_t * sb_n  # > 0 whenever a_next > a_t
    eps = (sa_n * x_t - sa_t * x_next) / det
    x0 = (sb_t * x_next - sb_n * x_t) / det
    return x0, eps


def ddim_timesteps(num_train_timesteps: int, num_inference_steps: int,
                   steps_offset: int = 1) -> np.ndarray:
    """Descending timestep grid + previous-step grid (static, host-side)."""
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(np.int32)
    ts = ts + steps_offset
    prev = ts - step_ratio
    return ts, prev
