"""Attack losses + decision resolution.

Rebuild of ``robustness_eval/_utils.py``: per-sample cross-entropy for the
SCR (speech-command recognition) task, the CSI-style margin loss, the
(loss, grad_sign) resolver, and majority-vote prediction over EOT decision
lists.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cross_entropy(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample CE over logits (torch ``CrossEntropyLoss(reduction='none')``).

    The reference classifiers output either logits (ConvNets) or
    log-probabilities (M5's log_softmax); log_softmax is idempotent under the
    softmax-CE so this is correct for both.
    """
    m = jnp.max(scores, axis=-1, keepdims=True)
    logp = scores - (m + jnp.log(jnp.sum(jnp.exp(scores - m), axis=-1, keepdims=True)))
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def margin_loss(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    targeted: bool = False,
    confidence: float = 0.0,
    clip_max: bool = True,
) -> jnp.ndarray:
    """CSI-branch margin loss (reference ``SEC4SR_MarginLoss``):
    untargeted f = score_real + κ − score_other (negative ⇒ attack success)."""
    onehot = (labels[:, None] == jnp.arange(scores.shape[-1])[None, :]).astype(scores.dtype)
    score_real = jnp.sum(onehot * scores, axis=-1)
    score_other = jnp.max((1 - onehot) * scores - onehot * 10000.0, axis=-1)
    loss = (score_other + confidence - score_real) if targeted else (score_real + confidence - score_other)
    if clip_max:
        loss = jnp.maximum(loss, 0.0)
    return loss


def resolve_loss(
    loss_name: str = "Entropy",
    targeted: bool = False,
    confidence: float = 0.0,
    task: str = "SCR",
    clip_max: bool = True,
):
    """(loss_fn, grad_sign), reference ``_utils.py:116-127`` semantics."""
    if task != "SCR":
        raise NotImplementedError(f"unsupported task yet: {task}!")
    if loss_name == "Entropy":
        # ascend CE when untargeted, descend when targeted (reference
        # _utils.py:126: grad_sign = -1 if targeted else 1)
        loss = cross_entropy
        grad_sign = -1 if targeted else 1
    elif loss_name == "Margin":
        # margin loss already encodes the attack direction: minimizing it is
        # the attack, and loss < 0 ⇔ success (used by FAKEBOB/Siren early exit)
        loss = lambda s, y: margin_loss(s, y, targeted=targeted, confidence=confidence, clip_max=clip_max)
        grad_sign = -1
    else:
        raise ValueError(loss_name)
    return loss, grad_sign


def resolve_prediction(decisions) -> np.ndarray:
    """Majority vote over per-draw decisions (n_draws, n_audios) → (n_audios,)
    (reference ``_utils.py:129-136``)."""
    decisions = np.asarray(decisions)
    if decisions.ndim == 1:
        return decisions
    out = []
    for col in decisions.T:
        vals, counts = np.unique(col, return_counts=True)
        out.append(vals[np.argmax(counts)])
    return np.asarray(out)
