"""Qin stage-2 imperceptible attack end-to-end + remaining purifier variants."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_for_audio_defense_tpu.attacks import AudioAttack, PsychoacousticMasker
from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.purify import ReDiffWavePurifier
from diffusion_model_for_audio_defense_tpu.purify.spec import RevImprovedDiffusionPurifier

L = 16000
NCLS = 4


def toy_model(x, rng=None):
    w = jax.random.normal(jax.random.PRNGKey(42), (L, NCLS)) * 0.2
    return x[:, 0, :] @ w


def test_qin_stage2_end_to_end(rng_np):
    t = np.linspace(0, 1, L)
    tone = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng_np.standard_normal(L)
    x = jnp.asarray(np.stack([tone, -tone])[:, None, :].astype(np.float32))
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    atk = AudioAttack(
        lambda xx, k: toy_model(xx),
        masker=PsychoacousticMasker(),
        eps=2000.0,
        norm="linf",
        max_iter_1=10,
        max_iter_2=8,
        learning_rate_1=400.0,
        learning_rate_2=50.0,
        num_iter_increase_alpha=4,
        num_iter_decrease_alpha=4,
        verbose=0,
    )
    x_adv, (s1, s2) = atk.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(0))
    assert x_adv.shape == x.shape
    assert s2 is not None and len(s2) == 2
    assert np.isfinite(np.asarray(x_adv)).all()
    # stage-2 output stays in valid range and differs from the input
    assert float(jnp.abs(x_adv).max()) <= 1.0 + 1e-6
    assert not np.allclose(np.asarray(x_adv), np.asarray(x))


def test_qin_stage2_fused_matches_host(rng_np):
    """The on-device lax.while_loop stage 2 must replay the host loop: same
    key schedule, best-recording, adaptive-α cadences, and θ early stop."""
    t = np.linspace(0, 1, L)
    tone = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng_np.standard_normal(L)
    x = jnp.asarray(np.stack([tone, -tone])[:, None, :].astype(np.float32))
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    kw = dict(
        masker=PsychoacousticMasker(), eps=2000.0, norm="linf",
        max_iter_1=6, max_iter_2=9, learning_rate_1=400.0, learning_rate_2=50.0,
        num_iter_increase_alpha=3, num_iter_decrease_alpha=4, verbose=0,
    )
    for model_fn in (lambda xx, k: toy_model(xx),
                     lambda xx, k: toy_model(xx + jax.random.normal(k, xx.shape) * 0.01)):
        host = AudioAttack(model_fn, **kw)
        fused = AudioAttack(model_fn, fused_stage_2=True, **kw)
        adv_h, (_, s2_h) = host.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(9))
        adv_f, (_, s2_f) = fused.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(9))
        assert s2_h == s2_f
        np.testing.assert_allclose(np.asarray(adv_h), np.asarray(adv_f), atol=2e-5)


def test_qin_stage2_fused_early_stop_parity(rng_np):
    """loss_theta_min high enough that θ early-stop fires mid-run — both
    paths must exit identically (the fused path's stop flag placement)."""
    t = np.linspace(0, 1, L)
    tone = 0.2 * np.sin(2 * np.pi * 330 * t) + 0.01 * rng_np.standard_normal(L)
    x = jnp.asarray(np.stack([tone, -tone])[:, None, :].astype(np.float32))
    y = np.asarray(jnp.argmax(toy_model(x), axis=-1))
    kw = dict(
        masker=PsychoacousticMasker(), eps=2000.0, norm="linf",
        max_iter_1=4, max_iter_2=12, learning_rate_1=400.0, learning_rate_2=20.0,
        loss_theta_min=1e6, verbose=0,  # huge: early stop fires on iter 1
    )
    host = AudioAttack(lambda xx, k: toy_model(xx), **kw)
    fused = AudioAttack(lambda xx, k: toy_model(xx), fused_stage_2=True, **kw)
    adv_h, (_, s2_h) = host.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(4))
    adv_f, (_, s2_f) = fused.generate(x, jnp.asarray(y), targeted=False, rng=jax.random.PRNGKey(4))
    assert s2_h == s2_f
    np.testing.assert_allclose(np.asarray(adv_h), np.asarray(adv_f), atol=2e-5)


def test_rediffwave_purifier(rng_np):
    sched = linear_schedule(200)
    eps_fn = lambda x, t: 0.1 * jnp.tanh(x)
    p = ReDiffWavePurifier(None, None, sched, reverse_timestep=10, num_re=3)
    p._eps_fn = eps_fn
    x = jnp.asarray(rng_np.standard_normal((2, 1, 256)).astype(np.float32) * 0.2)
    out = p(x, jax.random.PRNGKey(0))
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_spec_sde_rand_t(rng_np):
    model_fn = lambda x, t: 0.05 * jnp.tanh(x)
    p = RevImprovedDiffusionPurifier(model_fn, t=20, rand_t=True, t_delta=5)
    spec = jnp.asarray(rng_np.uniform(-90, 30, (1, 1, 32, 32)).astype(np.float32))
    np.random.seed(0)
    out = p(spec, jax.random.PRNGKey(1))
    assert out.shape == spec.shape and np.isfinite(np.asarray(out)).all()


def test_sample_step_concatenates(rng_np):
    model_fn = lambda x, t: 0.05 * jnp.tanh(x)
    p = RevImprovedDiffusionPurifier(model_fn, t=5, sample_step=2)
    spec = jnp.asarray(rng_np.uniform(-90, 30, (1, 1, 32, 32)).astype(np.float32))
    out = p(spec, jax.random.PRNGKey(2))
    assert out.shape == (2, 1, 32, 32)  # reference concatenates sample_step outputs


def test_rand_t_keyed_and_reproducible(rng_np):
    """rand_t draws its jitter from the threaded key (repo PRNG convention),
    not numpy's global RNG: same key => same output, global seed irrelevant."""
    from diffusion_model_for_audio_defense_tpu.purify.sde import RevDiffWavePurifier

    model_fn = lambda x, t: 0.05 * jnp.tanh(x)
    p = RevImprovedDiffusionPurifier(model_fn, t=20, rand_t=True, t_delta=5)
    spec = jnp.asarray(rng_np.uniform(-90, 30, (1, 1, 32, 32)).astype(np.float32))
    np.random.seed(0)
    o1 = p(spec, jax.random.PRNGKey(7))
    np.random.seed(12345)  # must not matter
    o2 = p(spec, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=0)

    eps_fn = lambda x, t: 0.05 * jnp.tanh(x)
    w = RevDiffWavePurifier.from_eps_fn(eps_fn, t=10, rand_t=True, t_delta=4)
    xw = jnp.asarray(rng_np.standard_normal((1, 1, 256)).astype(np.float32) * 0.1)
    np.random.seed(0)
    w1 = w(xw, jax.random.PRNGKey(3))
    np.random.seed(999)
    w2 = w(xw, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=0)


def test_rand_t_jits_with_traced_key(rng_np):
    """The rand_t jitter must stay traced: attack CLIs jit the whole system
    with the PRNG key as an argument, so int(randint(...)) would raise
    ConcretizationTypeError. The masked-suffix scan keeps it jittable, and
    eager == jitted for the same key."""
    from diffusion_model_for_audio_defense_tpu.purify.sde import RevDiffWavePurifier

    eps_fn = lambda x, t: 0.05 * jnp.tanh(x)
    w = RevDiffWavePurifier.from_eps_fn(eps_fn, t=10, rand_t=True, t_delta=4)
    xw = jnp.asarray(rng_np.standard_normal((1, 1, 256)).astype(np.float32) * 0.1)
    jitted = jax.jit(lambda x, k: w(x, k))
    out_j = jitted(xw, jax.random.PRNGKey(3))
    out_e = w(xw, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(out_e), atol=1e-6)

    model_fn = lambda x, t: 0.05 * jnp.tanh(x)
    p = RevImprovedDiffusionPurifier(model_fn, t=20, rand_t=True, t_delta=5)
    spec = jnp.asarray(rng_np.uniform(-90, 30, (1, 1, 32, 32)).astype(np.float32))
    sp_j = jax.jit(lambda x, k: p(x, k))(spec, jax.random.PRNGKey(9))
    sp_e = p(spec, jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(sp_j), np.asarray(sp_e), atol=1e-4)


def test_rand_t_clamps_low_t(rng_np):
    """t=1 with t_delta=15 (the CLI defaults) must clamp t* to >= 1 instead of
    drawing t* <= 0 (which would skip purification and wrap the schedule
    index)."""
    from diffusion_model_for_audio_defense_tpu.purify.sde import RevDiffWavePurifier

    eps_fn = lambda x, t: 0.05 * jnp.tanh(x)
    w = RevDiffWavePurifier.from_eps_fn(eps_fn, t=1, rand_t=True, t_delta=15)
    xw = jnp.asarray(rng_np.standard_normal((1, 1, 256)).astype(np.float32) * 0.1)
    for seed in range(4):
        out = jax.jit(lambda x, k: w(x, k))(xw, jax.random.PRNGKey(seed))
        assert np.isfinite(np.asarray(out)).all()
        # a clamped t* >= 1 runs at least one reverse step, so the output is
        # never exactly the q-jumped input passthrough
        assert float(jnp.abs(out).max()) < 10.0


def test_grid_active_mask_matches_static_grid():
    """The masked-suffix scheme: for every t* <= t_max the active steps of
    the t_max grid are exactly the static t* grid (wave dt=1/N; spec dt=1e-3
    with N dividing 1000)."""
    from diffusion_model_for_audio_defense_tpu.purify.sde import _sde_grid, grid_active_mask

    N, t_max = 200, 25
    taus_max, _ = _sde_grid(t_max, N)
    for t_star in (1, 2, 7, 24, 25):
        taus_static, _ = _sde_grid(t_star, N)
        active = np.asarray(grid_active_mask(jnp.asarray(taus_max, jnp.float32), t_star, N, 1.0 / N))
        assert active.sum() == len(taus_static), (t_star, active.sum(), len(taus_static))
        np.testing.assert_allclose(taus_max[active], taus_static, atol=1e-6)

    # spec solver lattice: dt = 1e-3 fixed, N = 500 (1/N = 2*dt)
    dt, N2, t_max2 = 1e-3, 500, 30
    grid = np.arange(1.0 - t_max2 / N2, 1.0 - 1e-5, dt)
    taus2 = np.concatenate([grid, [1.0 - 1e-5]])[:-1]
    for t_star in (1, 9, 30):
        static = np.arange(1.0 - t_star / N2, 1.0 - 1e-5, dt)
        active = np.asarray(grid_active_mask(jnp.asarray(taus2, jnp.float32), t_star, N2, dt))
        assert active.sum() == len(static), (t_star, active.sum(), len(static))
