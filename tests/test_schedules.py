"""Schedule parity vs the reference recursion (torch CPU golden)."""

import numpy as np
import torch

from diffusion_model_for_audio_defense_tpu.core import (
    linear_schedule,
    vpsde_schedule,
    compute_t_star,
)


def torch_calc_diffusion_hyperparams(T, beta_0, beta_T):
    """Reference recursion, DiffWave_Unconditional/util.py:96-123."""
    Beta = torch.linspace(beta_0, beta_T, T)
    Alpha = 1 - Beta
    Alpha_bar = Alpha + 0
    Beta_tilde = Beta + 0
    for t in range(1, T):
        Alpha_bar[t] *= Alpha_bar[t - 1]
        Beta_tilde[t] *= (1 - Alpha_bar[t - 1]) / (1 - Alpha_bar[t])
    Sigma = torch.sqrt(Beta_tilde)
    return Beta.numpy(), Alpha.numpy(), Alpha_bar.numpy(), Sigma.numpy()


def test_linear_schedule_matches_reference():
    T, b0, bT = 200, 1e-4, 0.02
    beta_t, alpha_t, abar_t, sigma_t = torch_calc_diffusion_hyperparams(T, b0, bT)
    s = linear_schedule(T, b0, bT)
    np.testing.assert_allclose(np.asarray(s.beta), beta_t, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s.alpha), alpha_t, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s.alpha_bar), abar_t, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.sigma), sigma_t, rtol=1e-4, atol=1e-6)


def test_vpsde_schedule_equals_linear_for_diffwave_params():
    # beta_min=0.0001*T, beta_max=0.02*T with N=T collapses to the linear schedule
    a = vpsde_schedule(200, beta_min=0.02, beta_max=4.0)
    b = linear_schedule(200, 1e-4, 0.02)
    np.testing.assert_allclose(np.asarray(a.beta), np.asarray(b.beta), rtol=1e-12)


def test_derived_quantities_consistent():
    s = linear_schedule(200)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_alpha_bar) ** 2 + np.asarray(s.sqrt_one_minus_alpha_bar) ** 2,
        np.ones(200),
        atol=1e-6,
    )


def test_compute_t_star_matches_reference_rule():
    s = linear_schedule(200)
    abar = np.asarray(s.alpha_bar)
    for sigma in (0.25, 0.5, 1.0):
        target = 1.0 / (1.0 + sigma**2)
        expected = int(np.argmin(np.abs(abar - target))) + 1
        assert compute_t_star(s, sigma) == expected
    # sanity: bigger sigma → deeper t*
    assert compute_t_star(s, 1.0) > compute_t_star(s, 0.25)
