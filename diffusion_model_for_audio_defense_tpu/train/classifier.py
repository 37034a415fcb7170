"""Classifier training: vanilla / PGD-adversarial / Gaussian-augment /
Jacobian-regularized / mixup.

Rebuild of ``audio_models/ConvNets_SpeechCommands/{train,adv_train,
reg_train}_speech_commands.py`` + ``mixup.py``: SGD with plateau LR decay,
weighted balanced sampling (via DataLoader weights), best-acc/best-loss
checkpoints. The waveform-PGD inner loop (ε=0.002, α=0.0004, n=10,
``adv_train_speech_commands.py:147-183``) is a ``lax.fori_loop`` inside the
jitted train step; Jacobian regularization uses a Hutchinson projection
(one JVP) instead of the external ``jacobian`` package.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import logger
from ..attacks.losses import cross_entropy
from ..core.checkpoint import save_pytree


def make_classifier_train_state(model, sample_input, lr: float = 1e-2, weight_decay: float = 1e-2,
                                momentum: float = 0.9, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(rng, sample_input, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.add_decayed_weights(weight_decay), optax.sgd(lr, momentum=momentum, nesterov=True))
    return {"params": params, "batch_stats": batch_stats, "opt_state": tx.init(params)}, tx


def _apply(model, params, batch_stats, x, train: bool, rngs=None):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mut = model.apply(variables, x, train=True, mutable=["batch_stats"], rngs=rngs or {})
        return out, mut["batch_stats"]
    return model.apply(variables, x, train=False), batch_stats


def pgd_attack_waveform(loss_fn, x, y, eps: float = 0.002, alpha: float = 0.0004, n: int = 10, rand_init=None):
    """Waveform PGD used for adversarial training (reference
    ``adv_train_speech_commands.py:147-183``)."""
    delta0 = rand_init if rand_init is not None else jnp.zeros_like(x)

    def body(i, delta):
        g = jax.grad(lambda d: loss_fn(x + d, y))(delta)
        delta = jnp.clip(delta + alpha * jnp.sign(g), -eps, eps)
        return jnp.clip(x + delta, -1.0, 1.0) - x

    return x + jax.lax.fori_loop(0, n, body, delta0)


class ClassifierTrainer:
    """``mode`` ∈ {vanilla, adv, gaussian, jacobian, mixup}."""

    def __init__(
        self,
        model,
        transform: Optional[Callable] = None,  # wave→spec (None for raw-wave M5)
        mode: str = "vanilla",
        lr: float = 1e-2,
        weight_decay: float = 1e-2,
        sigma: float = 0.25,  # gaussian-augment std
        jacobian_lambda: float = 1e-8,
        mixup_alpha: float = 1.0,
        adv_eps: float = 0.002,
        adv_alpha: float = 0.0004,
        adv_steps: int = 10,
        lr_patience: int = 5,
        lr_factor: float = 0.5,
        save_dir: str = "checkpoints",
        rng=None,
        sample_input=None,
    ):
        self.model = model
        self.transform = transform
        self.mode = mode
        self.save_dir = save_dir
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.lr_patience, self.lr_factor = lr_patience, lr_factor
        self.lr_scale = 1.0
        self._plateau = 0
        self.best_acc = 0.0
        self.best_loss = np.inf

        self.rng, k = jax.random.split(self.rng)
        init_input = transform(sample_input) if transform is not None else sample_input
        self.state, self.tx = make_classifier_train_state(model, init_input, lr, weight_decay, rng=k)
        cfg = dict(mode=mode, sigma=sigma, lam=jacobian_lambda, mixup_alpha=mixup_alpha,
                   adv=(adv_eps, adv_alpha, adv_steps))
        self._train_step = jax.jit(partial(self._step, **cfg))
        self._eval_step = jax.jit(self._eval)

    # ---------------------------------------------------------------- steps

    def _forward_loss(self, params, batch_stats, x, y, rng, train=True):
        inp = self.transform(x) if self.transform is not None else x
        logits, new_stats = _apply(self.model, params, batch_stats, inp, train, rngs={"dropout": rng})
        return jnp.mean(cross_entropy(logits, y)), (logits, new_stats)

    def _step(self, state, x, y, rng, lr_scale, *, mode, sigma, lam, mixup_alpha, adv):
        params, batch_stats, opt_state = state["params"], state["batch_stats"], state["opt_state"]
        k1, k2, k3 = jax.random.split(rng, 3)

        if mode == "adv":
            eps, alpha, n = adv
            frozen_loss = lambda xx, yy: self._forward_loss(params, batch_stats, xx, yy, k2, train=False)[0]
            # reference pgd starts from delta ~ U[-eps, eps] clamped into
            # [-1, 1] (adv_train_speech_commands.py:154-156), not zero
            delta0 = eps * (2.0 * jax.random.uniform(k1, x.shape, dtype=x.dtype) - 1.0)
            delta0 = jnp.clip(x + delta0, -1.0, 1.0) - x
            x = pgd_attack_waveform(frozen_loss, x, y, eps, alpha, n, rand_init=delta0)
        elif mode == "gaussian":
            x = x + sigma * jax.random.normal(k1, x.shape, dtype=x.dtype)

        if mode == "mixup":
            lam_m = jax.random.beta(k1, mixup_alpha, mixup_alpha)
            perm = jax.random.permutation(k3, x.shape[0])
            x_mix = lam_m * x + (1 - lam_m) * x[perm]

            def loss_fn(p):
                inp = self.transform(x_mix) if self.transform is not None else x_mix
                logits, new_stats = _apply(self.model, p, batch_stats, inp, True, rngs={"dropout": k2})
                loss = lam_m * jnp.mean(cross_entropy(logits, y)) + (1 - lam_m) * jnp.mean(
                    cross_entropy(logits, y[perm])
                )
                return loss, (logits, new_stats)

        elif mode == "jacobian":

            def loss_fn(p):
                def logits_of(xx):
                    inp = self.transform(xx) if self.transform is not None else xx
                    out, new_stats = _apply(self.model, p, batch_stats, inp, True, rngs={"dropout": k2})
                    return out, new_stats

                logits, new_stats = logits_of(x)
                ce = jnp.mean(cross_entropy(logits, y))
                # Hutchinson ‖J‖²_F estimate: E_v ‖J v‖² with v ~ N(0,1)
                v = jax.random.normal(k3, x.shape, dtype=x.dtype)
                _, jv = jax.jvp(lambda xx: logits_of(xx)[0], (x,), (v,))
                reg = jnp.sum(jv**2) / x.shape[0]
                return ce + lam * reg, (logits, new_stats)

        else:

            def loss_fn(p):
                loss, aux = self._forward_loss(p, batch_stats, x, y, k2, train=True)
                return loss, aux

        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.tree.map(lambda g: g * lr_scale, grads)  # plateau LR decay
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return {"params": params, "batch_stats": new_stats, "opt_state": opt_state}, loss, acc

    def _eval(self, state, x, y):
        inp = self.transform(x) if self.transform is not None else x
        logits, _ = _apply(self.model, state["params"], state["batch_stats"], inp, False)
        return jnp.mean(cross_entropy(logits, y)), jnp.mean(jnp.argmax(logits, -1) == y)

    # ----------------------------------------------------------------- API

    def train_epoch(self, loader, epoch: int):
        losses, accs = [], []
        loader.set_epoch(epoch)
        for batch in loader:
            x = jnp.asarray(batch["samples"])[:, None, :]
            y = jnp.asarray(batch["target"])
            self.rng, k = jax.random.split(self.rng)
            self.state, loss, acc = self._train_step(self.state, x, y, k, self.lr_scale)
            losses.append(float(loss))
            accs.append(float(acc))
        logger.logkv("train_loss", np.mean(losses))
        logger.logkv("train_acc", np.mean(accs))
        return np.mean(losses), np.mean(accs)

    def evaluate(self, loader):
        losses, accs, ns = [], [], []
        for batch in loader:
            x = jnp.asarray(batch["samples"])[:, None, :]
            y = jnp.asarray(batch["target"])
            loss, acc = self._eval_step(self.state, x, y)
            losses.append(float(loss) * len(y))
            accs.append(float(acc) * len(y))
            ns.append(len(y))
        return sum(losses) / sum(ns), sum(accs) / sum(ns)

    def maybe_checkpoint(self, valid_loss: float, valid_acc: float, name: str):
        os.makedirs(self.save_dir, exist_ok=True)
        if valid_acc > self.best_acc:
            self.best_acc = valid_acc
            save_pytree(os.path.join(self.save_dir, f"{name}-best-acc"), self.state)
        if valid_loss < self.best_loss:
            self.best_loss = valid_loss
            save_pytree(os.path.join(self.save_dir, f"{name}-best-loss"), self.state)
            self._plateau = 0
        else:
            self._plateau += 1
            if self._plateau >= self.lr_patience:  # ReduceLROnPlateau
                self.lr_scale *= self.lr_factor
                self._plateau = 0
        save_pytree(os.path.join(self.save_dir, f"{name}-last"), self.state)
