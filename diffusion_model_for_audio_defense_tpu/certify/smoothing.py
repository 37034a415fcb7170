"""Randomized-smoothing certified robustness — the north-star kernel.

Rebuild of ``robustness_eval/certified_robust.py`` (Cohen-style certify with
the denoised-smoothing trick) designed for a TPU pod instead of the
reference's serial chunk loop + host-sharded processes
(``scripts/parallel_certified_robust_eval.sh``):

- the N noise draws for one utterance are sharded over a device mesh with
  ``shard_map``; each chip runs a ``lax.scan`` over its chunk of draws and
  produces a local class-count histogram; one ``psum`` over ICI merges them
- t* is a *traced* scalar, so one compiled program serves every σ
- the Clopper–Pearson lower bound is an exact Beta quantile on host
  (replaces statsmodels ``proportion_confint(method='beta')``,
  reference ``certified_robust.py:113-117``) — off the hot path

The per-draw forward is: x+δ → ·√ᾱ* → one-shot denoise at t* → mel →
classifier → argmax (reference ``:44-67``), with
ᾱ* = 1/(1+σ²) (reference ``:50-54``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
from scipy.stats import beta as _beta_dist
from scipy.stats import norm as _norm

from ..core.functional import jit_hoisted
from ..core.schedules import DiffusionSchedule
from ..purify.ddpm import one_shot_denoise


def clopper_pearson_lower(k: int, n: int, alpha: float = 0.001) -> float:
    """One-sided (1-alpha) lower confidence bound on a binomial proportion.

    Equals ``statsmodels.proportion_confint(k, n, alpha=2·alpha,
    method='beta')[0]``.
    """
    k = int(k)
    if k <= 0:
        return 0.0
    if k >= n:
        return float(_beta_dist.ppf(alpha, k, 1)) if k == n else 1.0
    return float(_beta_dist.ppf(alpha, k, n - k + 1))


def make_smoothed_counts_fn(
    classifier: Callable[[jnp.ndarray], jnp.ndarray],
    transform: Optional[Callable],
    eps_fn: Optional[Callable],
    schedule: Optional[DiffusionSchedule],
    num_classes: int = 10,
    batch_size: int = 64,
    mesh: Optional[Mesh] = None,
    axis: str = "dp",
):
    """Build ``counts_fn(x, sigma, t_star, sqrt_abar_star, n, rng) -> (C,)``.

    - ``x``: one utterance ``(1, 1, L)`` (replicated to every chip)
    - ``n``: static total number of draws; draws are padded up to
      ``ndev × ceil(n/(ndev·B))·B`` and the surplus masked out, so counts are
      exactly over n draws
    - ``sigma, t_star, sqrt_abar_star``: traced scalars → one compile for all σ
    """
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (axis,))
    ndev = mesh.devices.size

    def _predict(xb, t_star, sqrt_abar_star):
        if eps_fn is not None:
            xb = sqrt_abar_star * xb
            xb = one_shot_denoise(eps_fn, schedule, xb, t_star)
        if transform is not None:
            xb = transform(xb)
        return jnp.argmax(classifier(xb), axis=-1)

    def _chunk_histogram(xi, key, sigma, t_star, sqrt_abar_star, valid):
        # one chunk of `batch_size` noisy draws of a single utterance xi
        # (1, L) → masked class-count histogram (C,). Shared by both shard_map
        # bodies so the predict pipeline / noise / masking can never diverge
        # between the n0 selection pass and the main counting pass.
        x_rep = jnp.broadcast_to(xi, (batch_size,) + xi.shape)
        delta = sigma * jax.random.normal(key, x_rep.shape, dtype=x_rep.dtype)
        preds = _predict(x_rep + delta, t_star, sqrt_abar_star)
        onehot = jax.nn.one_hot(preds, num_classes, dtype=jnp.int32) * valid[:, None].astype(jnp.int32)
        return onehot.sum(axis=0)

    def _device_counts(chunks_per_dev, x, sigma, t_star, sqrt_abar_star, rng, n_arr):
        # runs per device under shard_map; x (1,1,L) replicated
        didx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(rng, didx)
        n = n_arr[0]

        def chunk(carry, ck):
            counts, key = carry
            key, k1 = jax.random.split(key)
            # global draw index of each element in this chunk (device-major)
            base = (didx * chunks_per_dev + ck) * batch_size
            valid = base + jnp.arange(batch_size) < n
            hist = _chunk_histogram(x[0], k1, sigma, t_star, sqrt_abar_star, valid)
            return (counts + hist, key), None

        counts0 = jnp.zeros((num_classes,), dtype=jnp.int32)
        (counts, _), _ = jax.lax.scan(chunk, (counts0, key), jnp.arange(chunks_per_dev))
        return jax.lax.psum(counts, axis)

    def _device_counts_batch(chunks_per_dev, chunks_per_utt, n_utt,
                             x_all, sigma, t_star, sqrt_abar_star, rng, n_arr):
        # batched n0-selection pass: the scan walks (utterance, chunk) pairs so
        # a whole batch of utterances costs ONE host round-trip instead of one
        # per utterance (VERDICT r1 #9). x_all (Bu,1,L) replicated.
        didx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(rng, didx)
        n = n_arr[0]

        def chunk(carry, ck):
            counts, key = carry  # (Bu, C)
            g = didx * chunks_per_dev + ck
            u = jnp.minimum(g // chunks_per_utt, n_utt - 1)
            j = g % chunks_per_utt
            key, k1 = jax.random.split(key)
            xi = jax.lax.dynamic_index_in_dim(x_all, u, axis=0, keepdims=False)
            valid = (j * batch_size + jnp.arange(batch_size) < n) & (
                g < n_utt * chunks_per_utt)
            hist = _chunk_histogram(xi, k1, sigma, t_star, sqrt_abar_star, valid)
            return (counts.at[u].add(hist), key), None

        counts0 = jnp.zeros((n_utt, num_classes), dtype=jnp.int32)
        (counts, _), _ = jax.lax.scan(chunk, (counts0, key), jnp.arange(chunks_per_dev))
        return jax.lax.psum(counts, axis)

    _sharded_cache = {}

    def counts_fn(x, sigma, t_star, sqrt_abar_star, n: int, rng):
        chunks_per_dev = max(1, math.ceil(n / (ndev * batch_size)))
        if chunks_per_dev not in _sharded_cache:
            fn = shard_map(
                partial(_device_counts, chunks_per_dev),
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(), P()),
                out_specs=P(),
                check_vma=False,
            )
            # hoisted: classifier/eps-net params ride as replicated runtime
            # args through the shard_map instead of baked HLO constants
            _sharded_cache[chunks_per_dev] = jit_hoisted(fn)
        sigma = jnp.asarray(sigma, jnp.float32)
        t_star = jnp.asarray(t_star, jnp.int32)
        sqrt_abar_star = jnp.asarray(sqrt_abar_star, jnp.float32)
        n_arr = jnp.asarray([n], jnp.int32)
        return _sharded_cache[chunks_per_dev](x, sigma, t_star, sqrt_abar_star, rng, n_arr)

    _batch_cache = {}

    def counts_batch_fn(x_all, sigma, t_star, sqrt_abar_star, n: int, rng):
        n_utt = x_all.shape[0]
        chunks_per_utt = max(1, math.ceil(n / batch_size))
        chunks_per_dev = max(1, math.ceil(n_utt * chunks_per_utt / ndev))
        sig = (chunks_per_dev, chunks_per_utt, n_utt)
        if sig not in _batch_cache:
            fn = shard_map(
                partial(_device_counts_batch, *sig),
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(), P()),
                out_specs=P(),
                check_vma=False,
            )
            _batch_cache[sig] = jit_hoisted(fn)
        sigma = jnp.asarray(sigma, jnp.float32)
        t_star = jnp.asarray(t_star, jnp.int32)
        sqrt_abar_star = jnp.asarray(sqrt_abar_star, jnp.float32)
        n_arr = jnp.asarray([n], jnp.int32)
        return _batch_cache[sig](x_all, sigma, t_star, sqrt_abar_star, rng, n_arr)

    counts_fn.batch = counts_batch_fn
    return counts_fn


class RandomizedSmoothing:
    """API mirror of the reference ``RobustCertificate``.

    ``certify`` returns per-example (y_pred, radius) with y_pred=-1 meaning
    abstain, exactly like ``certified_robust.py:70-100``.
    """

    def __init__(
        self,
        classifier,
        transform=None,
        eps_fn=None,
        schedule: Optional[DiffusionSchedule] = None,
        num_classes: int = 10,
        batch_size: int = 64,
        mesh: Optional[Mesh] = None,
    ):
        self.schedule = schedule
        self.num_classes = num_classes
        self._counts_fn = make_smoothed_counts_fn(
            classifier, transform, eps_fn, schedule, num_classes=num_classes, batch_size=batch_size, mesh=mesh
        )

    def compute_t_star(self, alpha_bar_star: float) -> int:
        # API mirror of the reference method; delegates to the single
        # implementation in core.schedules (alpha_bar* = 1/(1+sigma^2))
        from ..core.schedules import compute_t_star as _cts

        sigma = math.sqrt(max(1.0 / alpha_bar_star - 1.0, 0.0))
        return _cts(self.schedule, sigma)

    def _sigma_params(self, sigma: float):
        """(t*, √ᾱ*) for a smoothing σ — ONE implementation of the denoised-
        smoothing mapping (delegates to ``core.schedules.compute_t_star``)."""
        if self.schedule is None:
            return 1, 1.0
        from ..core.schedules import compute_t_star as _cts

        abar_star = 1.0 / (1.0 + sigma**2)
        return _cts(self.schedule, sigma), abar_star**0.5

    def smooth_predict(self, x, num_sampling: int, sigma: float, rng) -> np.ndarray:
        t_star, sqrt_abar_star = self._sigma_params(sigma)
        counts = self._counts_fn(x, sigma, t_star, sqrt_abar_star, num_sampling, rng)
        return np.asarray(counts)

    def smooth_predict_batch(self, x, num_sampling: int, sigma: float, rng) -> np.ndarray:
        """Counts for a whole batch of utterances ``x (Bu,1,L)`` in ONE sharded
        call — used for the cheap n0 selection pass so small-N work doesn't pay
        a host round-trip per utterance."""
        t_star, sqrt_abar_star = self._sigma_params(sigma)
        counts = self._counts_fn.batch(x, sigma, t_star, sqrt_abar_star, num_sampling, rng)
        return np.asarray(counts)

    def lower_conf_bound(self, k, n, alpha: float = 0.001) -> float:
        return clopper_pearson_lower(k, n, alpha)

    def certify(
        self,
        x,
        y=None,
        sigma: float = 0.25,
        n_0: int = 100,
        n: int = 100_000,
        alpha: float = 0.001,
        rng=None,
    ):
        """Per-utterance Cohen certification over a batch ``x (B,1,L)``."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        bsz = x.shape[0]
        y_pred = -np.ones(bsz, dtype=np.int64)
        radius = np.zeros(bsz, dtype=np.float32)
        rng, k0 = jax.random.split(rng)
        counts0_all = self.smooth_predict_batch(x, n_0, sigma, k0)
        for i in range(bsz):
            rng, k1 = jax.random.split(rng)
            xi = x[i : i + 1]
            c_a = int(counts0_all[i].argmax())
            counts = self.smooth_predict(xi, n, sigma, k1)
            pa = self.lower_conf_bound(int(counts[c_a]), n, alpha)
            if pa > 0.5:
                y_pred[i] = c_a
                radius[i] = sigma * float(_norm.ppf(pa))
        return y_pred, radius

    @staticmethod
    def certified_robust_correct(y_pred, y_target, r_c, r: float = 1.0) -> int:
        """Count examples certified correct at radius ≥ r
        (reference ``certified_robust.py:119-127``)."""
        y_pred = np.asarray(y_pred)
        y_target = np.asarray(y_target)
        r_c = np.asarray(r_c)
        return int(((y_pred == y_target) & (r_c >= r)).sum())
