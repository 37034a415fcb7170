"""VP-SDE (DiffPure-style) purification — waveform domain.

Rebuild of ``diffusion_models/diffwave_sde.py`` without torchsde: the solver
there is plain Euler–Maruyama on a fixed grid (``sdeint_adjoint(...,
method='euler', dt=1/N)``, reference ``:199-203``), so the TPU-native
equivalent is a ~20-line ``jax.lax.scan`` with per-step Gaussian increments.
Gradients flow through the scan (with remat on the step body), replacing the
adjoint method the reference needs only to bound memory.

Intentional fixes vs the reference (documented deviations):
- ``rand_t`` jitters BOTH the q-jump noise level and the reverse-integration
  start. The reference noises to the jittered t* but always integrates from
  the un-jittered ``1 - t/N`` (``diffwave_sde.py:185-193``), leaving the two
  inconsistent; and its jitter can go <= 0 (wrapping the ᾱ index to the end
  of the schedule — near-pure noise). Here t* is clamped to [1, t+t_delta].

Math parity (reference ``RevVPSDE``, ``diffwave_sde.py:34-133``):
- reversed time τ = 1 - t; at physical time s: β(s) = β₀ + (s·N-1)/(N-1)·(β₁-β₀)
- score(x, s) = -ε_θ(x, d)/√(1-ᾱ_d) with discrete step d = ⌊s·N⌋
- drift(τ) = -[ -½β·x - β·score ]; diffusion(τ) = √β · √((1-ᾱ_{d-1})/(1-ᾱ_d))
- Euler grid: τ ∈ [1 - t*/N, 1 - 1e-5], step 1/N (+ one fractional final step)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.schedules import DiffusionSchedule, vpsde_schedule
from .ddpm import EpsFn, q_jump


def _sde_grid(t_star: int, N: int, epsilon_dt1: float = 1e-5):
    """Euler time grid in reversed time τ, matching torchsde's fixed-dt grid."""
    t0 = 1.0 - t_star / N
    t1 = 1.0 - epsilon_dt1
    dt = 1.0 / N
    grid = np.arange(t0, t1, dt)
    grid = np.concatenate([grid, [t1]])
    taus = grid[:-1]
    hs = np.diff(grid)
    return taus, hs


def grid_active_mask(taus_j: jnp.ndarray, t_star, N: int, dt: float) -> jnp.ndarray:
    """Steps of the t_max Euler grid that a (possibly traced) ``t_star``
    actually runs: τ ≥ 1 − t*/N, with a ½·dt tolerance so lattice round-off
    can't drop/add a step. Exact (the active steps are precisely the static
    t* grid) whenever 1/N is an integer multiple of ``dt`` — always true for
    the waveform solver (dt = 1/N) and for the spec solver's torchsde default
    dt=1e-3 with N dividing 1000."""
    return taus_j >= 1.0 - jnp.asarray(t_star, jnp.float32) / N - 0.5 * dt


def vpsde_reverse(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x_t: jnp.ndarray,
    t_star,
    rng,
    beta_min: float | None = None,
    beta_max: float | None = None,
    remat: bool = True,
    t_max: int | None = None,
) -> jnp.ndarray:
    """Integrate the reverse VP-SDE from noise level ``t_star`` back to 0.

    ``t_star`` may be a traced scalar (e.g. the ``rand_t`` jitter drawn under
    jit) if ``t_max`` bounds it: the Euler grid for any t* is an exact suffix
    of the t_max grid (same 1/N lattice), so the scan runs the t_max grid and
    masks the leading steps where τ < 1 − t*/N.
    """
    N = schedule.T
    beta_0 = beta_min if beta_min is not None else schedule.beta_start * N
    beta_1 = beta_max if beta_max is not None else schedule.beta_end * N
    static_t = t_max is None
    if static_t and isinstance(t_star, jax.core.Tracer):
        raise TypeError(
            "vpsde_reverse: t_star is a traced value but t_max is None - the "
            "Euler grid length would depend on a tracer. Pass a static upper "
            "bound t_max (the scan then runs the t_max grid and masks steps "
            "above the drawn t*, see RevDiffWavePurifier.rand_t)."
        )
    taus, hs = _sde_grid(int(t_star) if static_t else int(t_max), N)
    keys = jax.random.split(rng, len(taus))
    bsz = x_t.shape[0]
    taus_j = jnp.asarray(taus, jnp.float32)
    if static_t:
        active = jnp.ones((len(taus),), bool)
    else:
        active = grid_active_mask(taus_j, t_star, N, 1.0 / N)

    one_minus_abar = 1.0 - schedule.alpha_bar  # (T,)

    def body(x, inp):
        tau, h, key, on = inp
        s = 1.0 - tau  # physical diffusion time in (0, 1]
        beta_s = beta_0 + (s * N - 1.0) / (N - 1.0) * (beta_1 - beta_0)
        # reference _scale_timesteps truncates s·N, whose exact-math value is an
        # integer on this grid — round() realizes that robustly in floating point
        d = jnp.clip(jnp.round(s * N).astype(jnp.int32), 0, N - 1)
        eps = eps_fn(x, jnp.full((bsz,), 1.0, dtype=jnp.float32) * d.astype(jnp.float32))
        score = -eps / jnp.sqrt(one_minus_abar[d])
        # forward drift is -½β·x; reverse drift (in reversed time) is its negation plus the score term
        drift = -(-0.5 * beta_s * x - beta_s * score)
        scale = jnp.where(d > 0, jnp.sqrt(one_minus_abar[jnp.maximum(d - 1, 0)] / one_minus_abar[d]), 0.0)
        g = scale * jnp.sqrt(beta_s)
        z = jax.random.normal(key, x.shape, dtype=x.dtype)
        x = jnp.where(on, x + drift * h + g * jnp.sqrt(h) * z, x)
        return x, None

    if remat:
        body = jax.checkpoint(body)
    x0, _ = jax.lax.scan(body, x_t, (taus_j, jnp.asarray(hs, jnp.float32), keys, active))
    return x0


def vpsde_purify(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    t_star,
    rng,
    sample_step: int = 1,
    remat: bool = True,
    t_max: int | None = None,
) -> jnp.ndarray:
    """Diffuse to t* then solve the reverse SDE; ``sample_step`` outer
    iterations are concatenated on the batch axis like the reference
    ``audio_editing_sample`` (``diffwave_sde.py:182-211``)."""
    outs = []
    for key in jax.random.split(rng, sample_step):
        k1, k2 = jax.random.split(key)
        x_t = q_jump(schedule, x0, t_star, k1)
        x0 = vpsde_reverse(eps_fn, schedule, x_t, t_star, k2, remat=remat, t_max=t_max)
        outs.append(x0)
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


class RevDiffWavePurifier:
    """OO wrapper mirroring the reference ``RevDiffWave`` defender."""

    def __init__(
        self,
        apply_fn,
        params,
        schedule: DiffusionSchedule | None = None,
        t: int = 5,
        sample_step: int = 1,
        rand_t: bool = False,
        t_delta: int = 15,
        remat: bool = True,
    ):
        self.apply_fn = apply_fn
        self.params = params
        self.schedule = schedule if schedule is not None else vpsde_schedule(200, 0.02, 4.0)
        self.t = t
        self.sample_step = sample_step
        self.rand_t = rand_t
        self.t_delta = t_delta
        self.remat = remat
        self._eps_fn = None

    @classmethod
    def from_eps_fn(cls, eps_fn: EpsFn, schedule=None, **kw):
        self = cls(None, None, schedule, **kw)
        self._eps_fn = eps_fn
        return self

    @property
    def eps_fn(self) -> EpsFn:
        if self._eps_fn is not None:
            return self._eps_fn
        return lambda x, t: self.apply_fn(self.params, x, t[:, None])

    def __call__(self, x, rng):
        t_star, t_max = self.t, None
        if self.rand_t:
            # t* jitter (reference diffwave_sde.py:182-189). Drawn from the
            # threaded key, not the global RNG, so runs are reproducible —
            # and kept traced so the purifier still jits (the scan runs the
            # t+t_delta grid and masks steps above the drawn t*). Clamped to
            # [1, t_max]: t + randint can go <= 0 at small t (the CLIs default
            # t=1..5 with t_delta=15), which would silently skip purification
            # and wrap the q_jump schedule index.
            rng, k = jax.random.split(rng)
            t_max = self.t + self.t_delta
            t_star = jnp.clip(self.t + jax.random.randint(k, (), -self.t_delta, self.t_delta), 1, t_max)
        return vpsde_purify(self.eps_fn, self.schedule, x, t_star, rng,
                            sample_step=self.sample_step, remat=self.remat, t_max=t_max)
