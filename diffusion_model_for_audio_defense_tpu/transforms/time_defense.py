"""Time-domain signal defenses (reference ``transforms/time_defense.py``).

AT: additive Gaussian at a target SNR; AS: moving-average smoothing;
MS: median smoothing. All pure jnp, shape-preserving over (T,), (B,T) or
(B,1,T) like the reference's shape guards.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


from ._shapes import as_bt as _as_bt


def AT(audio: jnp.ndarray, rng, param: float = 25.0) -> jnp.ndarray:
    """Audio turbulence: add white noise at ``param`` dB SNR
    (reference ``:80-100``)."""
    x, shape = _as_bt(audio)
    snr = 10.0 ** (param / 10.0)
    b, n = x.shape
    power = jnp.sum((x / math.sqrt(n)) ** 2, axis=1, keepdims=True)
    noise = jax.random.normal(rng, x.shape, dtype=x.dtype) * jnp.sqrt(power / snr)
    return (x + noise).reshape(shape)


def AS(audio: jnp.ndarray, param: int = 3) -> jnp.ndarray:
    """Average smoothing: moving-average conv (reference ``:102-127``)."""
    assert param % 2 == 1
    x, shape = _as_bt(audio)
    kernel = jnp.full((param,), 1.0 / param, dtype=x.dtype)
    pad = (param - 1) // 2
    y = jax.vmap(lambda row: jnp.convolve(jnp.pad(row, (pad, pad)), kernel, mode="valid"))(x)
    return y.reshape(shape)


def MS(audio: jnp.ndarray, param: int = 3) -> jnp.ndarray:
    """Median smoothing over a centered window, zero-padded
    (reference ``:130-157``)."""
    x, shape = _as_bt(audio)
    pad = (param - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    idx = jnp.arange(x.shape[1])[:, None] + jnp.arange(param)[None, :]
    windows = xp[:, idx]  # (B, T, param)
    return jnp.median(windows, axis=-1).reshape(shape)


class TimeDomainDefense:
    """Dispatcher mirroring the reference class (``:8-36``)."""

    def __init__(self, defense_type: str, param=None):
        if defense_type not in ("AT", "AS", "MS"):
            raise NotImplementedError(f"Unknown defense type: {defense_type}!")
        self.defense_type = defense_type
        self.param = param
        self.stochastic = defense_type == "AT"

    def __call__(self, x, rng=None):
        if self.defense_type == "AT":
            return AT(x, rng, self.param if self.param is not None else 25.0)
        if self.defense_type == "AS":
            return AS(x, self.param if self.param is not None else 3)
        return MS(x, self.param if self.param is not None else 3)

    def _get_name(self):
        return {"AT": "Audio_Turbulence", "AS": "Average_Smoothing", "MS": "Median_Smoothing"}[self.defense_type]
