"""Pipeline parallelism (parallel/pp.py): GPipe schedule over the MD skip
stack — forward AND gradient parity vs the single-device encoder, on the
virtual CPU mesh (conftest provides 8 devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ladiff_tpu.ops.stylization import MDSkipTransformerEncoder
from ladiff_tpu.parallel.pp import (make_pipe_mesh, pipeline_encoder_forward,
                                    stack_stage_params)


def _setup(L=9, B=8, T=7, D=64, H=4, F=96, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.5)
    xf = jnp.asarray(rng.randn(B, 1, D).astype(np.float32))
    emb = jnp.asarray(rng.randn(B, D).astype(np.float32))
    valid = jnp.asarray(rng.randint(1, T + 1, size=(B, 1)) >
                        np.arange(T)[None, :])
    enc = MDSkipTransformerEncoder(D, D, H, L, ffn_dim=F, dropout=0.0)
    params = enc.init(jax.random.PRNGKey(0), x, xf, emb, valid)["params"]
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.RandomState(a.size % 613).randn(*a.shape)
            .astype(np.float32)) * 0.05, params)
    return enc, params, x, xf, emb, valid


@pytest.mark.parametrize("L,S,n_micro", [(9, 3, 4), (3, 3, 2), (9, 1, 2)])
def test_pipeline_forward_matches_encoder(L, S, n_micro):
    """S pipeline stages x n_micro microbatches == the plain encoder
    forward, including the cross-stage U-Net skip routing."""
    enc, params, x, xf, emb, valid = _setup(L=L)
    want = np.asarray(enc.apply({"params": params}, x, xf, emb, valid,
                                deterministic=True))
    mesh = make_pipe_mesh(S)
    got = np.asarray(pipeline_encoder_forward(
        enc, params, x, xf, emb, valid, mesh=mesh, n_micro=n_micro))
    assert not np.allclose(got, x), "pipeline returned input unchanged"
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pipeline_forward_no_mask():
    enc, params, x, xf, emb, _ = _setup(L=3, seed=5)
    want = np.asarray(enc.apply({"params": params}, x, xf, emb, None,
                                deterministic=True))
    got = np.asarray(pipeline_encoder_forward(
        enc, params, x, xf, emb, None, mesh=make_pipe_mesh(3), n_micro=4))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pipeline_gradient_matches_encoder():
    """jax.grad through the whole GPipe schedule (scan + ppermute + psum)
    equals the single-device gradient leaf-for-leaf — pipeline-parallel
    training needs no hand-written backward schedule."""
    enc, params, x, xf, emb, valid = _setup(L=3, B=4, seed=2)
    rng = np.random.RandomState(9)
    w = jnp.asarray(rng.randn(*x.shape).astype(np.float32))
    mesh = make_pipe_mesh(3)

    def loss_ref(p):
        y = enc.apply({"params": p}, x, xf, emb, valid, deterministic=True)
        return jnp.sum(y * w)

    def loss_pp(p):
        y = pipeline_encoder_forward(enc, p, x, xf, emb, valid,
                                     mesh=mesh, n_micro=2)
        return jnp.sum(y * w)

    g_ref = jax.grad(loss_ref)(params)
    g_pp = jax.grad(loss_pp)(params)
    flat_ref, tdef_ref = jax.tree_util.tree_flatten(g_ref)
    flat_pp, tdef_pp = jax.tree_util.tree_flatten(g_pp)
    assert tdef_ref == tdef_pp
    assert any(float(jnp.abs(a).max()) > 0 for a in flat_ref)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=2e-5)


def test_stack_stage_params_identity_extension():
    """Non-output layers get the [[I],[0]] skip-fusion extension: the
    uniform cat-GEMM is exactly a no-op for them."""
    enc, params, x, xf, emb, valid = _setup(L=3)
    staged = stack_stage_params(params, 3, 3, enc.d_model)
    D = enc.d_model
    # layer 0 (input) and 1 (middle) are identity-extended
    for s in (0, 1):
        np.testing.assert_array_equal(
            np.asarray(staged["wlin"][s, 0]),
            np.concatenate([np.eye(D), np.zeros((D, D))], 0))
        np.testing.assert_array_equal(np.asarray(staged["blin"][s, 0]), 0.0)
    # layer 2 (output block 0) carries the real Dense params
    np.testing.assert_array_equal(
        np.asarray(staged["wlin"][2, 0]),
        np.asarray(params["linear_blocks_0"]["kernel"]))


def test_stack_stage_params_rejects_bad_split():
    enc, params, *_ = _setup(L=9)
    with pytest.raises(AssertionError):
        stack_stage_params(params, 9, 2, enc.d_model)


def test_make_pipeline_encoder_stages_once():
    """The factory (production forward shape) equals the one-shot wrapper
    across repeated calls without re-staging params."""
    enc, params, x, xf, emb, valid = _setup(L=3, seed=7)
    mesh = make_pipe_mesh(3)
    from ladiff_tpu.parallel.pp import make_pipeline_encoder
    fwd = make_pipeline_encoder(enc, params, mesh=mesh, n_micro=2)
    want = np.asarray(enc.apply({"params": params}, x, xf, emb, valid,
                                deterministic=True))
    for _ in range(2):  # second call reuses the staged placement
        np.testing.assert_allclose(np.asarray(fwd(x, xf, emb, valid)),
                                   want, atol=1e-5, rtol=1e-5)


def _tiny_system(**kw):
    from ladiff_tpu.models.ladiff import LADiffSystem
    defaults = dict(
        nfeats=19, njoints=0, max_frames=24, latent_dim=(5, 32),
        ff_size=64, num_layers=3, num_heads=4, dropout=0.0,
        text_encoded_dim=48, num_inference_timesteps=4,
        mean=np.zeros(19, np.float32), std=np.ones(19, np.float32))
    defaults.update(kw)
    return LADiffSystem(**defaults)


def _diff_batch(B=8, T=24, nfeats=19):
    rng = np.random.RandomState(0)
    return {
        "motion": jnp.asarray(rng.randn(B, T, nfeats).astype(np.float32) * .3),
        "length": jnp.asarray(rng.randint(8, T + 1, B).astype(np.int32)),
        "text_emb": jnp.asarray(rng.randn(B, 1, 48).astype(np.float32)),
    }


def test_pp_train_grads_match_plain_diffusion_forward():
    """The TRAIN mechanism behind make_pp_diffusion_train_step: gradients
    of the diffusion loss with the encoder rerouted through the GPipe
    program (ops/pp_hook scope, staging traced INSIDE jit) equal the plain
    diffusion_forward gradients leaf-for-leaf."""
    from ladiff_tpu.ops.pp_hook import pp_encoder_override
    from ladiff_tpu.parallel.pp import (_make_modules, _pipeline_apply,
                                        make_pipe_mesh)

    system = _tiny_system()
    params = system.init_params(jax.random.PRNGKey(0))
    batch = _diff_batch()
    uncond = jnp.zeros((1, 1, 48))
    rng = jax.random.PRNGKey(3)
    mesh = make_pipe_mesh(3)
    from ladiff_tpu.parallel.pp import denoiser_encoder_hp
    enc_hp = denoiser_encoder_hp(system.denoiser)
    modules = _make_modules(enc_hp)  # outside the flax scope, like the factory

    def loss_plain(p):
        total, _ = system.diffusion_forward(p, params["vae"], batch, rng,
                                            uncond, train=True)
        return total

    def override(enc_bound, x, xf, emb, valid):
        staged = stack_stage_params(enc_bound.variables["params"],
                                    enc_hp.num_layers, 3, enc_hp.d_model)
        return _pipeline_apply(enc_hp, staged,
                               enc_bound.variables["params"]["norm"],
                               x, xf, emb, valid, mesh=mesh, n_micro=2,
                               modules=modules)

    def loss_pp(p):
        with pp_encoder_override(override):
            total, _ = system.diffusion_forward(p, params["vae"], batch,
                                                rng, uncond, train=True)
        return total

    g_plain = jax.grad(loss_plain)(params["denoiser"])
    g_pp = jax.jit(jax.grad(loss_pp))(params["denoiser"])
    flat_a, tdef_a = jax.tree_util.tree_flatten(g_plain)
    flat_b, tdef_b = jax.tree_util.tree_flatten(g_pp)
    assert tdef_a == tdef_b
    assert any(float(jnp.abs(a).max()) > 0 for a in flat_a)
    for a, b in zip(flat_a, flat_b):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-5 * max(float(np.abs(a).max()), 1.0)
        np.testing.assert_allclose(b, a, atol=tol, rtol=1e-4)


def test_make_pp_diffusion_train_step_trains():
    """The full jitted PP train step: loss finite and decreasing, params
    move — pipeline-parallel TRAINING through the loop-facing factory."""
    from ladiff_tpu.parallel.pp import (make_pipe_mesh,
                                        make_pp_diffusion_train_step)
    from ladiff_tpu.training.trainer import (create_train_state,
                                             make_optimizer)

    system = _tiny_system()
    params = system.init_params(jax.random.PRNGKey(0))
    p0 = jax.tree.map(np.asarray, params["denoiser"])
    mesh = make_pipe_mesh(3)
    step = make_pp_diffusion_train_step(
        system, mesh, params["vae"], np.zeros((1, 1, 48), np.float32),
        n_micro=2)
    state = create_train_state(params["denoiser"], make_optimizer(1e-3))
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state = jax.device_put(state, repl)
    batch = jax.device_put(_diff_batch(), repl)
    losses = []
    for i in range(6):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    moved = sum(float(np.abs(np.asarray(a) - b).max()) for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(p0)))
    assert moved > 0
