"""Fixed-iteration Lloyd k-means — jittable, for the FeCo defense.

Replaces ``kmeans_pytorch`` (reference ``transforms/feature_defense.py:184-
233``): dynamic convergence loops become a fixed-iteration ``lax.scan``
(SURVEY.md §7 hard-part 6). Supports L2 and cosine distance.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _pairwise_dist(x, centers, distance: str):
    if distance == "cos":
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        cn = centers / jnp.maximum(jnp.linalg.norm(centers, axis=-1, keepdims=True), 1e-8)
        return 1.0 - xn @ cn.T
    d = jnp.sum(x**2, 1)[:, None] - 2 * x @ centers.T + jnp.sum(centers**2, 1)[None, :]
    return d


def kmeans(x: jnp.ndarray, k: int, n_iters: int = 20, distance: str = "L2", rng=None):
    """Cluster rows of ``x (n, d)`` into k clusters.

    Returns (assignments (n,), centers (k, d)). Initialization: first-k rows
    unless ``rng`` given (then a random row subset).
    """
    n, d = x.shape
    if rng is not None:
        idx = jax.random.permutation(rng, n)[:k]
    else:
        idx = jnp.arange(k)
    centers0 = x[idx]

    def step(centers, _):
        dist = _pairwise_dist(x, centers, distance)
        assign = jnp.argmin(dist, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # (n, k)
        counts = onehot.sum(0)[:, None]
        sums = onehot.T @ x
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centers)
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers0, None, length=n_iters)
    assign = jnp.argmin(_pairwise_dist(x, centers, distance), axis=1)
    return assign, centers


def differentiable_compress(x: jnp.ndarray, assign: jnp.ndarray, k: int) -> jnp.ndarray:
    """Re-average member frames per cluster (the reference's trick to make
    FeCo differentiable, ``feature_defense.py:218-233``); empty cluster i
    falls back to frame i."""
    onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # (n, k) — grads flow through x
    counts = onehot.sum(0)[:, None]
    means = (onehot.T @ x) / jnp.maximum(counts, 1.0)
    return jnp.where(counts > 0, means, x[:k])
