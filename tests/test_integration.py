"""End-to-end integration: real (tiny) WaveNet through every seam —
purify→classify, certify with denoised smoothing on the 8-device mesh,
adaptive attack through the purifier, torch one-shot parity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffusion_model_for_audio_defense_tpu.attacks import AudioAttack
from diffusion_model_for_audio_defense_tpu.certify import RandomizedSmoothing
from diffusion_model_for_audio_defense_tpu.core import compute_t_star, linear_schedule
from diffusion_model_for_audio_defense_tpu.models import M5, WaveNet
from diffusion_model_for_audio_defense_tpu.purify import (
    DiffWavePurifier,
    RevDiffWavePurifier,
    one_shot_denoise,
)
from diffusion_model_for_audio_defense_tpu.system import AcousticSystem

TINY = dict(res_channels=8, skip_channels=8, num_res_layers=2, dilation_cycle=2,
            diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
            diffusion_step_embed_dim_out=16)
L = 8192  # M5 needs >= ~6k samples before conv4; shorter inputs yield empty pools


def _setup(rng_np):
    sched = linear_schedule(200)
    wavenet = WaveNet(**TINY)
    wv = wavenet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))
    # randomize the zero-init output head so the purifier actually denoises
    import flax

    wv = flax.core.unfreeze(wv)
    fc2 = wv["params"]["final_conv2"]["Conv_0"]
    fc2["kernel"] = jnp.asarray(rng_np.standard_normal(fc2["kernel"].shape).astype(np.float32) * 0.05)
    eps_fn = lambda x, t: wavenet.apply(wv, x, t[:, None])

    m5 = M5(n_output=4, first_kernel_size=80)
    mv = m5.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, L)))
    clf = lambda x: m5.apply(mv, x)
    return sched, eps_fn, clf


def test_full_system_attack_through_real_purifier(rng_np):
    sched, eps_fn, clf = _setup(rng_np)
    purifier = DiffWavePurifier.from_eps_fn(eps_fn, sched, reverse_timestep=3)
    system = AcousticSystem(clf, None, purifier, "wave")
    x = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32) * 0.05)
    y = jnp.argmax(system(x, jax.random.PRNGKey(2), defend=True), -1)
    atk = AudioAttack(lambda xx, k: system(xx, k, defend=True), eps=500, max_iter_1=3,
                      max_iter_2=0, learning_rate_1=100, verbose=0)
    adv, (succ, _) = atk.generate(x, y, targeted=False, rng=jax.random.PRNGKey(3))
    assert adv.shape == x.shape
    assert float(jnp.abs(adv - x).max()) <= 500 * 2**-15 + 1e-6


def test_certify_with_real_wavenet_on_mesh(rng_np):
    sched, eps_fn, clf = _setup(rng_np)
    rs = RandomizedSmoothing(clf, transform=None, eps_fn=eps_fn, schedule=sched,
                             num_classes=4, batch_size=16)
    x = jnp.asarray(rng_np.standard_normal((1, 1, L)).astype(np.float32) * 0.05)
    counts = rs.smooth_predict(x, num_sampling=256, sigma=0.5, rng=jax.random.PRNGKey(4))
    assert counts.sum() == 256
    y_pred, radius = rs.certify(x, sigma=0.5, n_0=32, n=256, rng=jax.random.PRNGKey(5))
    assert y_pred.shape == (1,) and radius.shape == (1,)


def test_sde_purifier_system_grad(rng_np):
    sched, eps_fn, clf = _setup(rng_np)
    # an untrained ε-net explodes the reverse SDE near d→0 (score is
    # ε/√(1-ᾱ_d) with √(1-ᾱ_0)=0.01): damp ε so the integration stays finite
    damped_eps = lambda x, t: 0.01 * eps_fn(x, t)
    purifier = RevDiffWavePurifier.from_eps_fn(damped_eps, sched, t=3)
    system = AcousticSystem(clf, None, purifier, "wave")
    x = jnp.asarray(rng_np.standard_normal((1, 1, L)).astype(np.float32) * 0.05)
    g = jax.grad(lambda v: float(0) + jnp.sum(system(v, jax.random.PRNGKey(6), defend=True)))(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_one_shot_denoise_matches_torch_formula(rng_np):
    """Golden check of the denoised-smoothing fast path against the exact
    torch recursion from diffwave_ddpm.py:174-205 (same ε injected)."""
    sched, eps_fn, _ = _setup(rng_np)
    t_star = compute_t_star(sched, 0.5)
    x_t = jnp.asarray(rng_np.standard_normal((2, 1, L)).astype(np.float32))
    ours = np.asarray(one_shot_denoise(eps_fn, sched, x_t, t_star))

    # torch-side formula with the same eps values
    eps = np.asarray(eps_fn(x_t, jnp.full((2,), float(t_star - 1))))
    T, b0, bT = 200, 1e-4, 0.02
    Beta = torch.linspace(b0, bT, T)
    Alpha_bar = 1 - Beta
    for t in range(1, T):
        Alpha_bar[t] *= Alpha_bar[t - 1]
    t = t_star - 1
    sqrt_recip = (1 / Alpha_bar).sqrt()[t].item()
    sqrt_recipm1 = (1 / Alpha_bar - 1).sqrt()[t].item()
    want = sqrt_recip * np.asarray(x_t) - sqrt_recipm1 * eps
    np.testing.assert_allclose(ours, want, atol=2e-4, rtol=1e-4)
