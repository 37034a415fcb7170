"""Timestep schedule samplers for diffusion training.

Rebuild of ``improved_diffusion/resample.py``: uniform sampling and the
loss-second-moment importance sampler. The reference synchronizes per-rank
(t, loss) histories with ``dist.all_gather`` (``resample.py:83-104``) so all
ranks hold identical weights; here training runs single-controller over a
mesh, so every host already sees the global per-sample losses — the sampler
just consumes them directly (the collective disappears by construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class UniformSampler:
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, batch_size: int, rng):
        t = jax.random.randint(rng, (batch_size,), 0, self.num_timesteps)
        weights = jnp.ones((batch_size,), dtype=jnp.float32)
        return t, weights

    def update_with_all_losses(self, ts, losses):
        pass


class LossSecondMomentResampler:
    """Importance-sample t ∝ √E[loss²] with a uniform floor
    (reference ``resample.py:59-104``)."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10, uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros([num_timesteps, history_per_term], dtype=np.float64)
        self._loss_counts = np.zeros([num_timesteps], dtype=int)

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones([self.num_timesteps], dtype=np.float64)
        w = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def sample(self, batch_size: int, rng):
        w = self.weights()
        p = w / w.sum()
        # host-side choice keeps the numpy RNG path identical to the reference
        seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
        ts = np.random.default_rng(seed).choice(len(p), size=(batch_size,), p=p)
        weights = 1.0 / (len(p) * p[ts])
        return jnp.asarray(ts), jnp.asarray(weights, dtype=jnp.float32)

    def update_with_all_losses(self, ts, losses):
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def _warmed_up(self) -> bool:
        return (self._loss_counts == self.history_per_term).all()


def create_named_schedule_sampler(name: str, num_timesteps: int):
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
