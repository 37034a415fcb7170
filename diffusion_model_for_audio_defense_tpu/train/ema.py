"""Exponential moving average of parameters.

Rebuild of the reference's in-place EMA update
(``improved_diffusion/nn.py:55-65`` + ``train_util.py:242-252``):
``ema = rate·ema + (1-rate)·params`` per step, one tree per EMA rate.
Pure-pytree version — composable with jit/donation.
"""

from __future__ import annotations

import jax


def ema_update(ema_params, params, rate: float):
    return jax.tree.map(lambda e, p: rate * e + (1.0 - rate) * p, ema_params, params)


def init_ema(params):
    return jax.tree.map(lambda p: p, params)
