"""Expectation over Transformation.

Rebuild of ``robustness_eval/_EOT.py``: replicate the batch E times through
the stochastic system (the per-element PRNG draws inside the purifier make
each replica an independent transformation), average scores/loss/input-grad
over replicas, collect per-replica decisions for majority vote.

TPU-first: one forward over the (E·B) fused batch (big MXU batches) instead
of the reference's python loop over EOT_num_batches; the gradient is one
``jax.grad`` of the replica-averaged loss.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


class EOT:
    """``eot(x, y, rng, use_grad)`` → (scores, loss, grad, decisions).

    - ``model_fn(x, rng) -> scores`` — the (stochastic) AcousticSystem
    - ``loss_fn(scores, y) -> (B,)`` per-sample loss
    - scores/loss/grad are replica-averages; decisions is (E, B) argmaxes
    """

    def __init__(self, model_fn: Callable, loss_fn: Callable, eot_size: int = 1, use_grad: bool = True):
        self.model_fn = model_fn
        self.loss_fn = loss_fn
        self.EOT_size = eot_size
        self.use_grad = use_grad
        self._jitted = {}

    def _build(self, eot_size: int, use_grad: bool):
        model_fn, loss_fn = self.model_fn, self.loss_fn

        def fwd(x, y, rng):
            bsz = x.shape[0]
            xr = jnp.tile(x, (eot_size,) + (1,) * (x.ndim - 1))
            yr = jnp.tile(y, (eot_size,))
            scores_r = model_fn(xr, rng)
            scores = scores_r.reshape(eot_size, bsz, -1).mean(0)
            loss = loss_fn(scores_r, yr).reshape(eot_size, bsz).mean(0)
            decisions = jnp.argmax(scores_r.reshape(eot_size, bsz, -1), axis=-1)
            return scores, loss, decisions

        if not use_grad:
            return jax.jit(fwd)

        def fwd_grad(x, y, rng):
            def mean_loss(xx):
                scores, loss, decisions = fwd(xx, y, rng)
                return loss.sum(), (scores, loss, decisions)

            grad, (scores, loss, decisions) = jax.grad(mean_loss, has_aux=True)(x)
            return scores, loss, grad, decisions

        return jax.jit(fwd_grad)

    def __call__(self, x, y, rng, eot_size: int | None = None, use_grad: bool | None = None):
        eot_size = eot_size if eot_size is not None else self.EOT_size
        use_grad = use_grad if use_grad is not None else self.use_grad
        key = (eot_size, use_grad)
        if key not in self._jitted:
            self._jitted[key] = self._build(eot_size, use_grad)
        if use_grad:
            return self._jitted[key](x, y, rng)
        scores, loss, decisions = self._jitted[key](x, y, rng)
        return scores, loss, None, decisions
