"""Randomized-smoothing certification on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_for_audio_defense_tpu.certify import (
    RandomizedSmoothing,
    clopper_pearson_lower,
    make_smoothed_counts_fn,
)
from diffusion_model_for_audio_defense_tpu.core import linear_schedule


def test_clopper_pearson_against_binomial_inversion():
    # independent check: the CP lower bound p̲ solves P[Bin(n,p̲) ≥ k] = α
    from scipy.optimize import brentq
    from scipy.stats import binom

    assert clopper_pearson_lower(0, 100) == 0.0
    for k, n, a in [(99000, 100000, 0.001), (50, 100, 0.001), (99, 100, 0.001)]:
        want = brentq(lambda p: binom.sf(k - 1, n, p) - a, 1e-12, 1 - 1e-12, xtol=1e-10)
        got = clopper_pearson_lower(k, n, a)
        assert abs(got - want) < 1e-6, (k, n, got, want)
    assert clopper_pearson_lower(99, 100) > clopper_pearson_lower(90, 100)
    assert 0.93 < clopper_pearson_lower(100, 100, 0.001) < 0.94


def _margin_classifier(xb):
    """Deterministic toy classifier: class = sign of mean → 0 or 1."""
    m = jnp.mean(xb, axis=(1, 2))
    return jnp.stack([m, -m], axis=-1)  # class 0 if mean>0


def test_counts_exact_n_and_distribution():
    devs = jax.devices()
    assert len(devs) == 8, "conftest should force 8 CPU devices"
    counts_fn = make_smoothed_counts_fn(
        _margin_classifier, None, None, None, num_classes=2, batch_size=16
    )
    x = jnp.full((1, 1, 64), 0.0)  # on the decision boundary → ~50/50 split
    n = 1000  # not divisible by 8*16 → exercises masking
    counts = np.asarray(counts_fn(x, 1.0, 1, 1.0, n, jax.random.PRNGKey(0)))
    assert counts.sum() == n
    assert abs(counts[0] - n / 2) < 5 * np.sqrt(n / 4)


def test_counts_biased_input():
    counts_fn = make_smoothed_counts_fn(
        _margin_classifier, None, None, None, num_classes=2, batch_size=16
    )
    x = jnp.full((1, 1, 64), 0.5)  # mean 0.5, σ of the mean = σ/8 → class 0 a.s.
    counts = np.asarray(counts_fn(x, 0.25, 1, 1.0, 512, jax.random.PRNGKey(1)))
    assert counts.sum() == 512
    assert counts[0] > 500


def test_certify_end_to_end_toy():
    rs = RandomizedSmoothing(_margin_classifier, num_classes=2, batch_size=16)
    x = jnp.stack([jnp.full((1, 64), 0.8), jnp.full((1, 64), -0.8)])
    y_pred, radius = rs.certify(x, sigma=0.25, n_0=64, n=2048, alpha=0.001, rng=jax.random.PRNGKey(2))
    assert list(y_pred) == [0, 1]
    assert (radius > 0.3).all()  # strongly certified for a large-margin toy


def test_certify_with_denoiser_path():
    sched = linear_schedule(200)

    def eps_fn(x, t):
        return jnp.zeros_like(x)  # identity denoiser: x̂0 = x/√ᾱ

    rs = RandomizedSmoothing(
        _margin_classifier, transform=None, eps_fn=eps_fn, schedule=sched, num_classes=2, batch_size=16
    )
    x = jnp.full((2, 1, 64), 0.7)
    y_pred, radius = rs.certify(x, sigma=0.5, n_0=64, n=1024, rng=jax.random.PRNGKey(3))
    # ε=0 denoiser: scaling by √ᾱ* then dividing by √ᾱ_{t*-1} ≈ identity → class 0
    assert list(y_pred) == [0, 0]
    assert (radius > 0).all()


def test_sigma_sweep_single_compile():
    # t*/σ are traced: sweeping σ must not retrace (same chunk count)
    calls = {"n": 0}
    base = _margin_classifier

    def counting_classifier(xb):
        calls["n"] += 1
        return base(xb)

    counts_fn = make_smoothed_counts_fn(counting_classifier, None, None, None, num_classes=2, batch_size=16)
    x = jnp.full((1, 1, 64), 0.5)
    for sigma in (0.25, 0.5, 1.0):
        counts_fn(x, sigma, 1, 1.0, 256, jax.random.PRNGKey(4))
    assert calls["n"] == 1  # traced once, reused for every σ


def test_counts_batch_matches_per_utterance_stats():
    """Batched n0 pass: exact-n per row, and each row matches its utterance."""
    counts_fn = make_smoothed_counts_fn(
        _margin_classifier, None, None, None, num_classes=2, batch_size=16
    )
    x = jnp.stack([jnp.full((1, 64), 0.8), jnp.full((1, 64), -0.8), jnp.full((1, 64), 0.8)])
    n0 = 100  # not divisible by batch -> exercises per-utterance masking
    counts = np.asarray(counts_fn.batch(x, 0.25, 1, 1.0, n0, jax.random.PRNGKey(5)))
    assert counts.shape == (3, 2)
    assert (counts.sum(axis=1) == n0).all()
    assert counts[0, 0] > 95 and counts[1, 1] > 95 and counts[2, 0] > 95


def test_counts_batch_draw_count_odd_shapes():
    # 5 utterances x 3 chunks = 15 chunks over 8 devices (uneven split)
    counts_fn = make_smoothed_counts_fn(
        _margin_classifier, None, None, None, num_classes=2, batch_size=16
    )
    x = jnp.full((5, 1, 64), 0.5)
    counts = np.asarray(counts_fn.batch(x, 0.25, 1, 1.0, 40, jax.random.PRNGKey(6)))
    assert counts.shape == (5, 2)
    assert (counts.sum(axis=1) == 40).all()
    assert (counts[:, 0] > 35).all()
