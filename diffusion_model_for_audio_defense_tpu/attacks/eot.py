"""Expectation over Transformation.

Rebuild of ``robustness_eval/_EOT.py``: replicate the batch E times through
the stochastic system (the per-element PRNG draws inside the purifier make
each replica an independent transformation), average scores/loss/input-grad
over replicas, collect per-replica decisions for majority vote.

TPU-first: replicas are evaluated as fused (chunk·B) batches (big MXU
batches); ``eot_batch_size`` bounds device memory exactly like the
reference's ``EOT_num_batches`` loop (``_EOT.py:30-63``) — chunks run as
repeated calls of one compiled program and accumulate on host.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.functional import jit_hoisted


class EOT:
    """``eot(x, y, rng, use_grad)`` → (scores, loss, grad, decisions).

    - ``model_fn(x, rng) -> scores`` — the (stochastic) AcousticSystem
    - ``loss_fn(scores, y) -> (B,)`` per-sample loss
    - scores/loss/grad are replica-averages; decisions is (E, B) argmaxes
    """

    def __init__(
        self,
        model_fn: Callable,
        loss_fn: Callable,
        eot_size: int = 1,
        eot_batch_size: Optional[int] = None,
        use_grad: bool = True,
        decision_fn: Optional[Callable] = None,
    ):
        self.model_fn = model_fn
        self.loss_fn = loss_fn
        self.EOT_size = eot_size
        self.EOT_batch_size = eot_batch_size or eot_size
        self.use_grad = use_grad
        # SV/OSI threshold tasks need losses.make_decision (-1 = reject);
        # default argmax matches the reference's SCR path
        self.decision_fn = decision_fn
        self._jitted = {}

    def _build(self, n_rep: int, use_grad: bool):
        model_fn, loss_fn, decide = self.model_fn, self.loss_fn, self.decision_fn

        def fwd(x, y, rng, st):
            bsz = x.shape[0]
            xr = jnp.tile(x, (n_rep,) + (1,) * (x.ndim - 1))
            yr = jnp.tile(y, (n_rep,))
            scores_r = model_fn(xr, rng, *st)
            scores = scores_r.reshape(n_rep, bsz, -1).mean(0)
            loss = loss_fn(scores_r, yr).reshape(n_rep, bsz).mean(0)
            if decide is not None:
                decisions = decide(scores_r).reshape(n_rep, bsz)
            else:
                decisions = jnp.argmax(scores_r.reshape(n_rep, bsz, -1), axis=-1)
            return scores, loss, decisions

        if not use_grad:
            return jit_hoisted(fwd)

        def fwd_grad(x, y, rng, st):
            def mean_loss(xx):
                scores, loss, decisions = fwd(xx, y, rng, st)
                return loss.sum(), (scores, loss, decisions)

            grad, (scores, loss, decisions) = jax.grad(mean_loss, has_aux=True)(x)
            return scores, loss, grad, decisions

        return jit_hoisted(fwd_grad)

    def _call_chunk(self, n_rep, x, y, rng, use_grad, st):
        key = (n_rep, use_grad)
        if key not in self._jitted:
            self._jitted[key] = self._build(n_rep, use_grad)
        if use_grad:
            return self._jitted[key](x, y, rng, st)
        scores, loss, decisions = self._jitted[key](x, y, rng, st)
        return scores, loss, None, decisions

    def __call__(self, x, y, rng, eot_size: Optional[int] = None, use_grad: Optional[bool] = None,
                 model_state=()):
        eot_size = eot_size if eot_size is not None else self.EOT_size
        use_grad = use_grad if use_grad is not None else self.use_grad
        chunk = min(self.EOT_batch_size, eot_size)
        n_chunks = -(-eot_size // chunk)
        sizes = [chunk] * (eot_size // chunk) + ([eot_size % chunk] if eot_size % chunk else [])

        scores = loss = grad = None
        decisions = []
        total = 0
        for ci, n_rep in enumerate(sizes):
            rng, k = jax.random.split(rng)
            s, l, g, d = self._call_chunk(n_rep, x, y, k, use_grad, tuple(model_state))
            w = n_rep
            scores = s * w if scores is None else scores + s * w
            loss = l * w if loss is None else loss + l * w
            if use_grad:
                grad = g * w if grad is None else grad + g * w
            decisions.append(np.asarray(d))
            total += w
        scores = scores / total
        loss = loss / total
        if use_grad:
            grad = grad / total
        return scores, loss, grad, jnp.asarray(np.concatenate(decisions, axis=0))
