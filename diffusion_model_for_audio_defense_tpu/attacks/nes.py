"""NES black-box gradient estimation.

Rebuild of ``robustness_eval/_NES.py``: antithetic Gaussian sampling
(σ-scaled ±noise pairs), the clean point prepended for loss/decision
bookkeeping, grad = E[loss·noise]/σ. TPU-first: the whole draw is one fused
batch (B·(S+1)) forward through the stochastic system — no host loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.functional import jit_hoisted



def _nes_core(model_fn, loss_fn, samples_per_draw, sigma, decision_fn, x, y, rng, *loss_args):
    # antithetic pairs: samples_per_draw must be even (validated in nes_grad)
    bsz, nch, length = x.shape
    half = samples_per_draw // 2
    k_noise, k_model = jax.random.split(rng)
    noise = jax.random.normal(k_noise, (bsz, half, nch, length), dtype=x.dtype)
    noise = jnp.concatenate([noise, -noise], axis=1)  # antithetic
    noise = jnp.concatenate([jnp.zeros_like(x)[:, None], noise], axis=1)  # clean point first
    eval_x = (x[:, None] + sigma * noise).reshape(-1, nch, length)
    eval_y = jnp.repeat(y, samples_per_draw + 1)

    scores = model_fn(eval_x, k_model)  # (B*(S+1), C)
    loss = loss_fn(scores, eval_y, *loss_args).reshape(bsz, samples_per_draw + 1)
    decide = decision_fn if decision_fn is not None else partial(jnp.argmax, axis=-1)
    decisions = decide(scores).reshape(bsz, samples_per_draw + 1)

    adver_loss = loss[:, 0]
    adver_score = scores.reshape(bsz, samples_per_draw + 1, -1)[:, 0]
    grad = jnp.mean(loss[:, 1:, None, None] * noise[:, 1:], axis=1) / sigma
    mean_loss = loss[:, 1:].mean(axis=1)
    return mean_loss, grad, adver_loss, adver_score, decisions


def nes_grad(
    model_fn: Callable,
    loss_fn: Callable,
    samples_per_draw: int = 50,
    sigma: float = 0.001,
    decision_fn: Callable = None,
):
    """Returns jitted ``estimate(x, y, rng) -> (mean_loss, grad, adver_loss,
    adver_score, predict)`` with ``predict`` the clean-point decision
    (argmax, or ``decision_fn(scores)`` for threshold tasks where −1=reject)."""
    if samples_per_draw % 2:
        raise ValueError(f"samples_per_draw must be even (antithetic pairs), got {samples_per_draw}")
    core = jit_hoisted(partial(_nes_core, model_fn, loss_fn, samples_per_draw, sigma, decision_fn))

    def estimate(x, y, rng, *loss_args):
        # extra traced args flow to loss_fn(scores, y, *loss_args) — e.g. the
        # FAKEBOB threshold candidate, so threshold sweeps reuse one compile
        mean_loss, grad, adver_loss, adver_score, decisions = core(x, y, rng, *loss_args)
        predict = np.asarray(decisions[:, 0])
        return mean_loss, grad, adver_loss, adver_score, predict

    return estimate
