"""Purifier math: scan-based reverse loop vs hand-unrolled loop, one/two-shot
formulas, VP-SDE grid/dynamics, differentiability through the purifier."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.purify import (
    q_jump,
    ddpm_reverse,
    ddpm_purify,
    one_shot_denoise,
    two_shot_denoise,
    fast_reverse,
)
from diffusion_model_for_audio_defense_tpu.purify.sde import _sde_grid, vpsde_reverse

SCHED = linear_schedule(200)


def dummy_eps_fn(x, t):
    """Analytic stand-in for the ε-net: smooth in x and t."""
    return 0.1 * jnp.tanh(x) * (1.0 + 0.01 * t[:, None, None])


def test_q_jump_stats():
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((256, 1, 64))
    xt = q_jump(SCHED, x0, 200, key)
    # E[x_t] = √ᾱ_T · 1, std = √(1-ᾱ_T)
    want_mean = float(SCHED.sqrt_alpha_bar[199])
    want_std = float(SCHED.sqrt_one_minus_alpha_bar[199])
    assert abs(float(xt.mean()) - want_mean) < 0.02
    assert abs(float(xt.std()) - want_std) < 0.02


def test_ddpm_reverse_matches_unrolled_loop():
    t_star = 7
    key = jax.random.PRNGKey(1)
    x_t = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 32))
    got = ddpm_reverse(dummy_eps_fn, SCHED, x_t, t_star, key)

    # hand-unrolled reference loop with the same key schedule
    keys = jax.random.split(key, t_star)
    x = x_t
    for i, t in enumerate(range(t_star - 1, -1, -1)):
        eps = dummy_eps_fn(x, jnp.full((2,), t, dtype=jnp.float32))
        mu = (x - (1 - SCHED.alpha[t]) / jnp.sqrt(1 - SCHED.alpha_bar[t]) * eps) / jnp.sqrt(SCHED.alpha[t])
        z = jax.random.normal(keys[i], x.shape)
        x = mu + SCHED.sigma[t] * z if t > 0 else mu
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-5)


def test_one_shot_denoise_formula():
    t_star = 25
    x_t = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 32))
    got = one_shot_denoise(dummy_eps_fn, SCHED, x_t, t_star)
    t = t_star - 1
    eps = dummy_eps_fn(x_t, jnp.full((2,), t, dtype=jnp.float32))
    want = jnp.sqrt(1.0 / SCHED.alpha_bar[t]) * x_t - jnp.sqrt(1.0 / SCHED.alpha_bar[t] - 1.0) * eps
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_one_shot_denoise_traced_t_star():
    # certification varies t* with σ — must work with a traced scalar, one compile
    x_t = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 16))
    f = jax.jit(lambda x, ts: one_shot_denoise(dummy_eps_fn, SCHED, x, ts))
    a = np.asarray(f(x_t, jnp.asarray(25)))
    b = np.asarray(one_shot_denoise(dummy_eps_fn, SCHED, x_t, 25))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_two_shot_denoise_runs():
    x_t = jax.random.normal(jax.random.PRNGKey(5), (2, 1, 32))
    out = two_shot_denoise(dummy_eps_fn, SCHED, x_t, 25)
    assert out.shape == x_t.shape and np.isfinite(np.asarray(out)).all()


def test_fast_reverse_runs():
    x_t = jax.random.normal(jax.random.PRNGKey(6), (2, 1, 32))
    out = fast_reverse(dummy_eps_fn, SCHED, x_t, 25, jax.random.PRNGKey(7))
    assert out.shape == x_t.shape and np.isfinite(np.asarray(out)).all()


def test_purify_is_differentiable():
    x0 = jax.random.normal(jax.random.PRNGKey(8), (1, 1, 32)) * 0.1

    def loss(x):
        out = ddpm_purify(dummy_eps_fn, SCHED, x, 5, jax.random.PRNGKey(9))
        return jnp.sum(out**2)

    g = jax.grad(loss)(x0)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_sde_grid_matches_torchsde_convention():
    # t*=5, N=200: t0=0.975, t1=1-1e-5 → 5 steps: 4 full 1/200 + fractional
    taus, hs = _sde_grid(5, 200)
    assert len(taus) == len(hs) == 5
    np.testing.assert_allclose(hs[:-1], np.full(4, 1.0 / 200), atol=1e-12)
    assert 0 < hs[-1] <= 1.0 / 200
    np.testing.assert_allclose(taus[0], 0.975, atol=1e-12)


def test_vpsde_reverse_shapes_and_grad():
    x_t = jax.random.normal(jax.random.PRNGKey(10), (2, 1, 32))
    out = vpsde_reverse(dummy_eps_fn, SCHED, x_t, 5, jax.random.PRNGKey(11))
    assert out.shape == x_t.shape and np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda x: jnp.sum(vpsde_reverse(dummy_eps_fn, SCHED, x, 3, jax.random.PRNGKey(12)) ** 2))(x_t)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_vpsde_low_noise_preserves_signal():
    # small t*: purifier output should stay close to a clean input
    x0 = jnp.sin(jnp.linspace(0, 20, 64)).reshape(1, 1, 64) * 0.3
    x_t = q_jump(SCHED, x0, 3, jax.random.PRNGKey(13))
    out = vpsde_reverse(lambda x, t: jnp.zeros_like(x), SCHED, x_t, 3, jax.random.PRNGKey(14))
    assert float(jnp.mean((out - x0) ** 2)) < 0.05
