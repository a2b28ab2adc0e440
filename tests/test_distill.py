"""Progressive distillation (training/distill.py — beyond the reference):
the inverted-DDIM target math, the SPMD train step, and few-step student
sampling.

The target-math test exploits a DDIM identity: for a denoiser whose
epsilon output is CONSTANT (independent of x and t), the deterministic
DDIM map is exactly self-consistent — two half-steps land where one full
step lands — so the inverted two-step target must equal that constant
epsilon's x0 to numerical precision.  This pins ddim_solve_eps_x0 and the
rollout plumbing without needing a trained teacher."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladiff_tpu.diffusion.schedulers import (ddim_solve_eps_x0,
                                             ddim_timesteps, make_schedule)
from ladiff_tpu.models.ladiff import LADiffSystem
from ladiff_tpu.parallel.mesh import make_mesh, shard_batch
from ladiff_tpu.training.distill import (distill_forward,
                                         make_distill_train_step)
from ladiff_tpu.training.trainer import create_train_state, make_optimizer

NFEATS, NJOINTS, T = 263, 22, 64


def tiny_system(**kw):
    defaults = dict(
        nfeats=NFEATS, njoints=NJOINTS, max_frames=T, latent_dim=(7, 32),
        ff_size=64, num_layers=3, num_heads=4, dropout=0.1,
        text_encoded_dim=48, num_inference_timesteps=4,
        guidance_scale=7.5,
        mean=np.zeros(NFEATS, np.float32), std=np.ones(NFEATS, np.float32))
    defaults.update(kw)
    return LADiffSystem(**defaults)


def make_batch(B=8):
    rng = np.random.RandomState(0)
    return {
        "motion": jnp.asarray(rng.randn(B, T, NFEATS).astype(np.float32) * 0.3),
        "length": jnp.asarray(rng.randint(16, T + 1, B).astype(np.int32)),
        "text_emb": jnp.asarray(rng.randn(B, 1, 48).astype(np.float32)),
    }


def test_ddim_solve_inverts_one_step():
    """ddim_solve_eps_x0 must recover exactly the (x0, eps) a single DDIM
    step used to produce x_next from x_t."""
    sched = make_schedule()
    rng = np.random.RandomState(1)
    B, M, D = 4, 7, 32
    x_t = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    eps = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    t = jnp.asarray([801, 401, 201, 41], jnp.int32)
    t_next = t - 40
    x_next = sched.ddim_step(eps, t, t_next, x_t)
    x0_rec, eps_rec = ddim_solve_eps_x0(sched, x_t, x_next, t, t_next)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps),
                               rtol=2e-4, atol=2e-4)
    a_t = np.asarray(sched.alphas_cumprod)[np.asarray(t)][:, None, None]
    x0_direct = (np.asarray(x_t) - np.sqrt(1 - a_t) * np.asarray(eps)) \
        / np.sqrt(a_t)
    np.testing.assert_allclose(np.asarray(x0_rec), x0_direct,
                               rtol=2e-4, atol=2e-4)


def test_two_half_steps_equal_one_for_constant_eps():
    """DDIM self-consistency for a constant-epsilon model: the basis for
    using the inverted two-step jump as the one-step student target."""
    sched = make_schedule()
    rng = np.random.RandomState(2)
    B, M, D = 3, 7, 32
    x_t = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    eps = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    t = jnp.asarray([801, 401, 41], jnp.int32)
    t_mid, t_prev = t - 20, t - 40
    one = sched.ddim_step(eps, t, t_prev, x_t)
    x_mid = sched.ddim_step(eps, t, t_mid, x_t)
    two = sched.ddim_step(eps, t_mid, t_prev, x_mid)
    np.testing.assert_allclose(np.asarray(two), np.asarray(one),
                               rtol=1e-5, atol=1e-5)
    # and the inverted target therefore recovers that epsilon
    _, eps_rec = ddim_solve_eps_x0(sched, x_t, two, t, t_prev)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps),
                               rtol=2e-4, atol=2e-4)


def test_distill_step_trains_student_only():
    system = tiny_system()
    mesh = make_mesh()
    params = system.init_params(jax.random.PRNGKey(0))
    teacher = params["denoiser"]
    # host copy BEFORE stepping: the jitted step donates state buffers and
    # the student state is initialized from these same arrays
    teacher0 = jax.tree.map(np.asarray, teacher)
    state = create_train_state(teacher, make_optimizer(1e-3))
    uncond = np.zeros((1, 1, 48), np.float32)
    step = make_distill_train_step(system, mesh, params["vae"], teacher,
                                   uncond, student_steps=25)
    batch = shard_batch(make_batch(), mesh)
    losses = []
    for i in range(6):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(logs["total"]))
        losses.append(float(logs["total"]))
    assert losses[-1] < losses[0]
    # the student moved away from the (frozen) teacher it was initialized
    # from — i.e. grads flowed into the student
    moved = sum(float(np.sum(np.abs(np.asarray(a) - b))) for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(teacher0)))
    assert moved > 0


def test_distill_forward_rejects_bad_grid():
    system = tiny_system()
    params = system.init_params(jax.random.PRNGKey(0))
    with pytest.raises(AssertionError, match="student_steps"):
        # ratio 1000//200 = 5 is odd: no teacher 2S grid exists
        distill_forward(system, params["denoiser"], params["denoiser"],
                        params["vae"], make_batch(2), jax.random.PRNGKey(0),
                        jnp.zeros((1, 1, 48)), student_steps=200)


def test_student_sampling_runs_without_cfg_doubling():
    """A distilled student samples at guidance_scale=1 (guidance folded
    in) and S steps — the production few-step path."""
    system = tiny_system(guidance_scale=1.0, num_inference_timesteps=4)
    params = system.init_params(jax.random.PRNGKey(0))
    B = 4
    rng = np.random.RandomState(3)
    text = jnp.asarray(rng.randn(B, 1, 48).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    z = system.diffusion_reverse(params["denoiser"], text,
                                 jnp.zeros_like(text), lengths,
                                 jax.random.PRNGKey(1),
                                 num_inference_timesteps=4)
    assert z.shape == (B, system.max_it, 32)
    assert np.all(np.isfinite(np.asarray(z)))
