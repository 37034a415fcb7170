"""DDPM diffusion purification (waveform domain).

TPU-native rebuild of ``diffusion_models/diffwave_ddpm.py``:

- the forward "noising" is the closed-form q-jump
  ``x_t = √ᾱ_{t*-1}·x_0 + √(1-ᾱ_{t*-1})·z`` (reference ``:66-67``)
- the reverse denoise is a ``jax.lax.scan`` over t = t*-1 … 0 with the ε-net
  call rematerialized (``jax.checkpoint``), so the whole purifier is
  differentiable by construction — attacks backprop straight through the scan
  instead of relying on torchsde's adjoint or BPDA (reference ``:95-104``
  keeps grad enabled for the same reason)
- ``one_shot_denoise`` / ``two_shot_denoise`` / ``fast_reverse`` mirror the
  reference's accelerated variants (``:106-141, 174-193``)

``eps_fn(x, t)`` is any ε-predictor: x ``(B, 1, L)``, t ``(B,)`` float
timesteps → ε ``(B, 1, L)``. Typically
``lambda x, t: wavenet.apply(params, x, t[:, None])``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.schedules import DiffusionSchedule

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def q_jump(schedule: DiffusionSchedule, x0: jnp.ndarray, t_star: int, rng) -> jnp.ndarray:
    """Closed-form forward diffusion to step ``t_star`` (1-based)."""
    z = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
    a, b = schedule.sqrt_alpha_bar[t_star - 1], schedule.sqrt_one_minus_alpha_bar[t_star - 1]
    return a * x0 + b * z


def _reverse_step(eps_fn: EpsFn, schedule: DiffusionSchedule, x, t, key):
    """One ancestral reverse step x_t → x_{t-1} (reference ``compute_coefficients``)."""
    bsz = x.shape[0]
    eps = eps_fn(x, jnp.full((bsz,), t, dtype=jnp.float32))
    coef = (1.0 - schedule.alpha[t]) / schedule.sqrt_one_minus_alpha_bar[t]
    mu = (x - coef * eps) * jax.lax.rsqrt(schedule.alpha[t])
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    return jnp.where(t > 0, mu + schedule.sigma[t] * z, mu)


def ddpm_reverse(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_t: jnp.ndarray,
    t_star: int,
    rng,
    remat: bool = True,
) -> jnp.ndarray:
    """Full step-by-step reverse loop t*-1 … 0 as a differentiable scan."""
    ts = jnp.arange(t_star - 1, -1, -1)
    keys = jax.random.split(rng, t_star)

    def body(x, inp):
        t, key = inp
        return _reverse_step(eps_fn, schedule, x, t, key), None

    if remat:
        body = jax.checkpoint(body)
    x0, _ = jax.lax.scan(body, x_t, (ts, keys))
    return x0


def ddpm_purify(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    t_star: int,
    rng,
    remat: bool = True,
) -> jnp.ndarray:
    """q-jump to t* then reverse — the reference ``DiffWave.forward``."""
    k1, k2 = jax.random.split(rng)
    return ddpm_reverse(eps_fn, schedule, q_jump(schedule, x0, t_star, k1), t_star, k2, remat=remat)


def predict_x0_from_eps(schedule: DiffusionSchedule, x_t, t, eps):
    """x̂_0 = √(1/ᾱ_t)·x_t − √(1/ᾱ_t − 1)·ε (reference ``:195-205``).

    ``t`` may be a traced integer scalar — keeps the certification path
    recompile-free across σ (each σ implies a different t*).
    """
    return schedule.sqrt_recip_alpha_bar[t] * x_t - schedule.sqrt_recipm1_alpha_bar[t] * eps


def one_shot_denoise(eps_fn: EpsFn, schedule: DiffusionSchedule, x_t, t_star):
    """Single ε call + x̂_0 prediction (reference ``:174-182``) — the
    denoised-smoothing fast path used by certification."""
    t = jnp.asarray(t_star) - 1
    bsz = x_t.shape[0]
    eps = eps_fn(x_t, jnp.full((bsz,), 1.0, dtype=jnp.float32) * t.astype(jnp.float32))
    return predict_x0_from_eps(schedule, x_t, t, eps)


def two_shot_denoise(eps_fn: EpsFn, schedule: DiffusionSchedule, x_t, t_star):
    """Predict x̂_1 from ε then take the final deterministic step to x̂_0
    (reference ``:184-226``)."""
    t = t_star - 1
    bsz = x_t.shape[0]
    eps = eps_fn(x_t, jnp.full((bsz,), t, dtype=jnp.float32))
    # x̂_1: invert q(x_t | x_1) (reference ``_predict_x1_from_eps``, :207-218)
    mu = jnp.sqrt(schedule.alpha_bar[t] / schedule.alpha[0])
    sig = jnp.sqrt(1.0 - schedule.alpha_bar[t] - (schedule.alpha_bar[t] / schedule.alpha[0]) * schedule.beta[0] ** 2)
    x1 = (x_t - sig * eps) / mu
    # deterministic step 0: μ_θ(x_1, 0)
    eps0 = eps_fn(x1, jnp.zeros((bsz,), dtype=jnp.float32))
    coef = (1.0 - schedule.alpha[0]) / schedule.sqrt_one_minus_alpha_bar[0]
    return (x1 - coef * eps0) * jax.lax.rsqrt(schedule.alpha[0])


def fast_reverse(eps_fn: EpsFn, schedule: DiffusionSchedule, x_t, t_star: int, rng, K: int = 3):
    """K-step strided reverse with a re-derived β schedule
    (reference ``fast_reverse``, ``:106-141``)."""
    alpha_bar = np.asarray(schedule.alpha_bar, dtype=np.float64)
    S = np.round(np.linspace(1, t_star, K)).astype(int) - 1
    beta_new = np.empty(K)
    beta_tilde_new = np.empty(K)
    beta_new[0] = 1 - alpha_bar[S[0]]
    beta_tilde_new[0] = 0.0
    for i in range(1, K):
        beta_new[i] = 1 - alpha_bar[S[i]] / alpha_bar[S[i - 1]]
        beta_tilde_new[i] = (1 - alpha_bar[S[i - 1]]) / (1 - alpha_bar[S[i]]) * beta_new[i]
    alpha_new = 1 - beta_new
    alpha_bar_new = np.cumprod(alpha_new)

    x = x_t
    keys = jax.random.split(rng, K)
    bsz = x.shape[0]
    for t in range(K - 1, -1, -1):  # K is tiny and static — unrolled
        eps = eps_fn(x, jnp.full((bsz,), float(S[t]), dtype=jnp.float32))
        mu = (x - (1 - alpha_new[t]) / np.sqrt(1 - alpha_bar_new[t]) * eps) / np.sqrt(alpha_new[t])
        # NOTE: reference multiplies by β̃ (not √β̃) here — kept for parity
        x = mu + beta_tilde_new[t] * jax.random.normal(keys[t], x.shape, dtype=x.dtype)
    return x


class DiffWavePurifier:
    """OO convenience wrapper mirroring the reference ``DiffWave`` module.

    Holds ``(apply_fn, params, schedule, reverse_timestep)``; ``__call__`` is
    the diffuse→reverse purification. All methods are pure given the rng.
    """

    def __init__(self, apply_fn, params, schedule: DiffusionSchedule, reverse_timestep: int = 25, remat: bool = True):
        self.apply_fn = apply_fn
        self.params = params
        self.schedule = schedule
        self.reverse_timestep = reverse_timestep
        self.remat = remat
        self._eps_fn = None

    @classmethod
    def from_eps_fn(cls, eps_fn: EpsFn, schedule: DiffusionSchedule, reverse_timestep: int = 25, **kw):
        self = cls(None, None, schedule, reverse_timestep, **kw)
        self._eps_fn = eps_fn
        return self

    @property
    def eps_fn(self) -> EpsFn:
        if self._eps_fn is not None:
            return self._eps_fn
        return lambda x, t: self.apply_fn(self.params, x, t[:, None])

    def __call__(self, x, rng):
        return ddpm_purify(self.eps_fn, self.schedule, x, self.reverse_timestep, rng, remat=self.remat)

    def diffuse(self, x0, rng):
        return q_jump(self.schedule, x0, self.reverse_timestep, rng)

    def reverse(self, x_t, rng):
        return ddpm_reverse(self.eps_fn, self.schedule, x_t, self.reverse_timestep, rng, remat=self.remat)

    def one_shot_denoise(self, x_t, t_star=None):
        return one_shot_denoise(self.eps_fn, self.schedule, x_t, t_star or self.reverse_timestep)

    def two_shot_denoise(self, x_t, t_star=None):
        return two_shot_denoise(self.eps_fn, self.schedule, x_t, t_star or self.reverse_timestep)

    def fast_reverse(self, x_t, rng, K: int = 3):
        return fast_reverse(self.eps_fn, self.schedule, x_t, self.reverse_timestep, rng, K=K)

    def compute_eps_t(self, x_t, t):
        eps_fn = self.eps_fn
        bsz = x_t.shape[0]
        return jax.lax.stop_gradient(eps_fn(x_t, jnp.full((bsz,), 1.0, dtype=jnp.float32) * t))


class ReDiffWavePurifier(DiffWavePurifier):
    """Iterated diffuse + one-shot-denoise × num_re (reference ``ReffWave``,
    ``diffwave_ddpm.py:251-313``)."""

    def __init__(self, apply_fn, params, schedule, reverse_timestep: int = 25, num_re: int = 5):
        super().__init__(apply_fn, params, schedule, reverse_timestep)
        self.num_re = num_re

    def __call__(self, x, rng):
        for key in jax.random.split(rng, self.num_re):
            x = self.one_shot_denoise(self.diffuse(x, key))
        return x
