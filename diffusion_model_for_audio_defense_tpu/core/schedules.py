"""Diffusion noise schedules.

TPU-native equivalent of the reference's schedule code
(``DiffWave_Unconditional/util.py:96-123`` — ``calc_diffusion_hyperparams``,
and ``improved_diffusion/gaussian_diffusion.py:18-62`` — beta schedules).

All schedule tensors are precomputed in float64 on host (numpy) and stored as
float32 device constants inside a pytree dataclass, so they fold into the
compiled XLA program instead of being recomputed per step.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DiffusionSchedule:
    """Precomputed DDPM schedule quantities (all shape ``(T,)``).

    Mirrors the dict returned by the reference
    ``calc_diffusion_hyperparams`` (T, Beta, Alpha, Alpha_bar, Sigma), with
    the extra derived arrays the purifiers and trainers need so nothing is
    recomputed inside traced code.
    """

    T: int = struct.field(pytree_node=False)
    # static endpoints (python floats): usable inside jit without concretizing
    beta_start: float = struct.field(pytree_node=False)
    beta_end: float = struct.field(pytree_node=False)
    beta: jnp.ndarray
    alpha: jnp.ndarray
    alpha_bar: jnp.ndarray
    sigma: jnp.ndarray  # sqrt(beta_tilde): posterior std used by the reverse loop
    sqrt_alpha_bar: jnp.ndarray
    sqrt_one_minus_alpha_bar: jnp.ndarray
    sqrt_recip_alpha_bar: jnp.ndarray
    sqrt_recipm1_alpha_bar: jnp.ndarray

    def q_sample_coeffs(self, t):
        """(sqrt(ᾱ_t), sqrt(1-ᾱ_t)) for integer timestep array ``t``."""
        return self.sqrt_alpha_bar[t], self.sqrt_one_minus_alpha_bar[t]


def _finalize(beta: np.ndarray) -> DiffusionSchedule:
    beta = beta.astype(np.float64)
    alpha = 1.0 - beta
    alpha_bar = np.cumprod(alpha)
    # beta_tilde_t = beta_t * (1 - abar_{t-1}) / (1 - abar_t); beta_tilde_0 = beta_0
    alpha_bar_prev = np.concatenate([[1.0], alpha_bar[:-1]])
    # match reference recursion exactly: Beta_tilde[0] stays Beta[0]
    beta_tilde = beta.copy()
    beta_tilde[1:] = beta[1:] * (1.0 - alpha_bar[:-1]) / (1.0 - alpha_bar[1:])
    del alpha_bar_prev
    sigma = np.sqrt(beta_tilde)
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DiffusionSchedule(
        T=int(len(beta)),
        beta_start=float(beta[0]),
        beta_end=float(beta[-1]),
        beta=f32(beta),
        alpha=f32(alpha),
        alpha_bar=f32(alpha_bar),
        sigma=f32(sigma),
        sqrt_alpha_bar=f32(np.sqrt(alpha_bar)),
        sqrt_one_minus_alpha_bar=f32(np.sqrt(1.0 - alpha_bar)),
        sqrt_recip_alpha_bar=f32(np.sqrt(1.0 / alpha_bar)),
        sqrt_recipm1_alpha_bar=f32(np.sqrt(1.0 / alpha_bar - 1.0)),
    )


def linear_schedule(T: int, beta_0: float = 1e-4, beta_T: float = 0.02) -> DiffusionSchedule:
    """Linear beta schedule (reference ``calc_diffusion_hyperparams``)."""
    return _finalize(np.linspace(beta_0, beta_T, T))


def cosine_schedule(T: int, max_beta: float = 0.999) -> DiffusionSchedule:
    """Nichol & Dhariwal cosine schedule
    (reference ``gaussian_diffusion.py:36-62``)."""
    f = lambda t: math.cos((t / T + 0.008) / 1.008 * math.pi / 2) ** 2
    betas = np.array([min(1 - f(t + 1) / f(t), max_beta) for t in range(T)])
    return _finalize(betas)


def vpsde_schedule(T: int = 200, beta_min: float = 0.02, beta_max: float = 4.0) -> DiffusionSchedule:
    """Discretized VP-SDE betas: ``linspace(beta_min/N, beta_max/N, N)``
    (reference ``diffwave_sde.py:56``; DiffWave uses beta_min=0.0001*T,
    beta_max=0.02*T so this coincides with the linear schedule)."""
    return _finalize(np.linspace(beta_min / T, beta_max / T, T))


def compute_t_star(schedule: DiffusionSchedule, sigma: float) -> int:
    """Denoised-smoothing timestep: the t whose ᾱ best matches 1/(1+σ²).

    Mirrors ``robustness_eval/certified_robust.py:102-110`` (1-based,
    i.e. the returned value is used as ``reverse_timestep`` and the model is
    conditioned on ``t_star - 1``). Host-side helper — returns a python int.
    """
    alpha_bar_star = 1.0 / (1.0 + sigma**2)
    alpha_bar = np.asarray(schedule.alpha_bar)
    return int(np.argmin(np.abs(alpha_bar - alpha_bar_star))) + 1
