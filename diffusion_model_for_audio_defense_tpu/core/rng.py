"""Explicit PRNG-key discipline.

The reference uses global CUDA RNG (``torch.normal(...)`` everywhere, e.g.
``diffusion_models/diffwave_ddpm.py:66,100``). Here every stochastic function
takes a key; helpers below keep the threading terse and give each device /
noise-draw an independent fold so EOT and smoothing draws are i.i.d. across
replicas.
"""

from __future__ import annotations

import jax


def split_like(key, n: int):
    return jax.random.split(key, n)


def fold_device(key):
    """Fold the current mesh-axis index into a key (use inside shard_map)."""
    idx = jax.lax.axis_index("devices")
    return jax.random.fold_in(key, idx)


def fold_axes(key, *axis_names: str):
    for name in axis_names:
        key = jax.random.fold_in(key, jax.lax.axis_index(name))
    return key
