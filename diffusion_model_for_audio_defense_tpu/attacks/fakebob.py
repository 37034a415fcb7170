"""FAKEBOB black-box attack (IEEE S&P'21).

Rebuild of ``robustness_eval/black_box_attack.py:13-219``: NES gradient
estimate with momentum, per-sample plateau LR decay, early stop on loss
convergence. The reference shrinks the batch by deleting solved examples
(``delete_found``, ``:135-178``) — dynamic shapes that would force
recompiles on TPU; here an *active mask* keeps shapes static and frozen
samples simply stop being updated (same iterate sequence for live samples).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.functional import jit_hoisted
from .losses import make_decision, resolve_loss
from .nes import _nes_core, nes_grad


class FAKEBOB:
    def __init__(
        self,
        model_fn,
        task: str = "SCR",
        targeted: bool = False,
        confidence: float = 0.5,
        epsilon: float = 0.002,
        max_iter: int = 200,
        max_lr: float = 0.001,
        min_lr: float = 1e-6,
        samples_per_draw: int = 50,
        samples_per_draw_batch_size: int = 50,
        sigma: float = 0.001,
        momentum: float = 0.9,
        plateau_length: int = 5,
        plateau_drop: float = 2.0,
        stop_early: bool = True,
        stop_early_iter: int = 100,
        batch_size: int = 1,
        verbose: int = 1,
        threshold: float = None,
        fused_loop: bool = False,
    ):
        self.model_fn = model_fn
        self.task = task
        self.threshold = threshold
        self.targeted = targeted
        self.confidence = confidence
        self.epsilon = epsilon
        self.max_iter = max_iter
        self.max_lr = max_lr
        self.min_lr = min_lr
        self.samples_per_draw = samples_per_draw
        self.sigma = sigma
        self.momentum = momentum
        self.plateau_length = plateau_length
        self.plateau_drop = plateau_drop
        self.stop_early = stop_early
        self.stop_early_iter = stop_early_iter
        self.batch_size = batch_size
        self.verbose = verbose
        self.fused_loop = fused_loop

    def estimate_threshold(self, x, step: float = 0.1, decision_fn=None, rng=None):
        """Decision-threshold estimation for SV/OSI tasks
        (reference ``black_box_attack.py:221-311``; the reference's active
        copy is SCR-only and its decision is a plain argmax, so its loop
        exits immediately — this realizes the SEC4SR search it derives from).

        Per rejected input: candidate θ starts at max-score + δ; an NES
        margin attack pushes the score up until the system ACCEPTS (the
        score at acceptance estimates θ) or the score crosses the candidate
        without acceptance (candidate += δ). ``decision_fn(scores) -> labels``
        is the black-box decision (−1 = reject) of the system under attack.
        Sets and returns ``self.threshold`` (mean over inputs; None if no
        input yielded an estimate).
        """
        if self.task in ("SCR", "CSI"):
            print("--- Warning: no need to estimate threshold for this task, quitting ---")
            return None
        if decision_fn is None:
            raise ValueError("SV/OSI threshold estimation needs the system's decision_fn")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x = jnp.asarray(x)
        estimates = []
        for i in range(x.shape[0]):
            rng, k = jax.random.split(rng)
            est = self._estimate_threshold_run(x[i : i + 1], step, decision_fn, k)
            if est is not None:
                estimates.append(est)
        self.threshold = float(np.mean(estimates)) if estimates else None
        return self.threshold

    def _estimate_threshold_run(self, x, step, decision_fn, rng, max_outer: int = 20,
                                max_inner: int = 200):
        rng, k0 = jax.random.split(rng)
        scores = self.model_fn(x, k0)
        if int(decision_fn(scores)[0]) != -1:
            return None  # already accepted: carries no threshold information
        init_score = float(jnp.max(scores[0]))
        delta = abs(init_score * step)
        threshold = init_score + delta
        y = jnp.asarray([-1])
        lower = jnp.clip(x - self.epsilon, min=-1.0)
        upper = jnp.clip(x + self.epsilon, max=1.0)

        adver_x = x
        grad = jnp.zeros_like(x)
        # ONE jitted estimator for the whole search: the candidate threshold
        # is a traced loss arg, so raising it costs nothing (the old
        # per-candidate resolve_loss closure recompiled the full system
        # forward on every bump — minutes each on TPU)
        from .losses import margin_loss

        _, grad_sign = resolve_loss("Margin", False, 0.0, self.task, threshold, clip_max=False)
        loss_th = lambda s, yy, th: margin_loss(s, yy, False, 0.0, self.task, th, clip_max=False)
        estimator = nes_grad(self.model_fn, loss_th, self.samples_per_draw, self.sigma)
        for _ in range(max_outer):
            last_ls = []
            lr = self.max_lr
            # bounded, unlike the reference's unbounded loop (black_box_attack.py
            # :254-295): if NES can't raise the score to the candidate within
            # max_inner steps (insensitive model / tiny epsilon), give up on
            # this candidate instead of spinning forever
            for _ in range(max_inner):
                rng, kq = jax.random.split(rng)
                scores = self.model_fn(adver_x, kq)
                score = float(jnp.max(scores[0]))
                if int(decision_fn(scores)[0]) != -1:
                    return score  # accepted: this score sits at the threshold
                if score >= threshold:
                    break  # candidate too low; raise it and keep pushing
                rng, k = jax.random.split(rng)
                prev_grad = grad
                mean_loss, g, _, _, _ = estimator(adver_x, y, k, jnp.float32(threshold))
                grad = self.momentum * prev_grad + (1.0 - self.momentum) * g
                ml = float(np.asarray(mean_loss)[0])
                last_ls = (last_ls + [ml])[-self.plateau_length:]
                if len(last_ls) == self.plateau_length and last_ls[-1] > last_ls[0]:
                    lr = max(lr / self.plateau_drop, self.min_lr)
                    last_ls = []
                adver_x = jnp.clip(adver_x + grad_sign * lr * jnp.sign(grad), lower, upper)
            else:
                return None  # NES stalled below the candidate — no estimate from this input
            threshold += delta
        return None

    def generate(self, x, y, targeted: bool = False, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.targeted = targeted
        loss_fn, self.grad_sign = resolve_loss(
            "Margin", targeted, self.confidence, self.task,
            threshold=self.threshold, clip_max=False)
        decision = None
        if self.task in ("SV", "OSI"):
            decision = lambda s: make_decision(s, self.task, self.threshold)
        estimator = nes_grad(self.model_fn, loss_fn, self.samples_per_draw, self.sigma,
                             decision_fn=decision)

        x = jnp.asarray(x)
        y = jnp.asarray(y)
        assert float(x.max()) < 1.0 and float(x.min()) >= -1.0, "inputs must be in [-1, 1) float domain"
        lower = jnp.clip(x - self.epsilon, min=-1.0)
        upper = jnp.clip(x + self.epsilon, max=1.0)

        fused_runner = None
        if self.fused_loop:
            fused_runner = self._build_fused_runner(loss_fn, decision)

        outs, succs = [], []
        bs = min(self.batch_size, x.shape[0])
        for b0 in range(0, x.shape[0], bs):
            rng, kb = jax.random.split(rng)
            if fused_runner is not None:
                adv, suc = self._attack_batch_fused(
                    x[b0 : b0 + bs], y[b0 : b0 + bs], lower[b0 : b0 + bs], upper[b0 : b0 + bs], fused_runner, kb
                )
            else:
                adv, suc = self._attack_batch(
                    x[b0 : b0 + bs], y[b0 : b0 + bs], lower[b0 : b0 + bs], upper[b0 : b0 + bs], estimator, kb, b0 // bs
                )
            outs.append(adv)
            succs += suc
        return jnp.concatenate(outs, axis=0), succs

    def _build_fused_runner(self, loss_fn, decision_fn):
        """The whole ``_attack_batch`` iteration loop as ONE ``lax.while_loop``
        on device — no per-iteration host round-trips (the host loop fetches
        losses/predictions to numpy every step, ``black_box_attack.py:128-178``
        equivalent). Exact host-loop parity: identical per-iteration key
        schedule (``rng, k = split(rng)`` then the NES draw), and the same
        bookkeeping order — success/best/freeze from this iteration's clean
        point BEFORE the momentum/plateau/step updates, early-stop every
        ``stop_early_iter`` iterations against the previous milestone loss.
        """
        core = partial(_nes_core, self.model_fn, loss_fn, self.samples_per_draw,
                       self.sigma, decision_fn)
        momentum = self.momentum
        grad_sign = self.grad_sign
        plateau = self.plateau_length
        max_iter = self.max_iter

        def run(x, y, lower, upper, rng):
            bsz = x.shape[0]
            f32 = jnp.float32
            state = dict(
                it=jnp.int32(0),
                rng=rng,
                adver_x=x,
                grad=jnp.zeros_like(x),
                best_adver_x=x,
                best_loss=jnp.full((bsz,), jnp.inf, f32),
                success=jnp.zeros((bsz,), bool),
                active=jnp.ones((bsz,), bool),
                # sliding window of the last `plateau` mean losses + a fill
                # count (reset on plateau trigger), replacing the host's
                # per-sample python lists
                win=jnp.zeros((bsz, plateau), f32),
                cnt=jnp.zeros((bsz,), jnp.int32),
                lr=jnp.full((bsz,), self.max_lr, f32),
                prev_loss=jnp.full((bsz,), jnp.inf, f32),
            )

            def cond(s):
                return (s["it"] <= max_iter) & jnp.any(s["active"])

            def body(s):
                it = s["it"]
                rng, k = jax.random.split(s["rng"])
                mean_loss, g_raw, adver_loss, _, decisions = core(s["adver_x"], y, k)
                mean_loss = mean_loss.astype(f32)
                adver_loss = adver_loss.astype(f32)
                y_pred = decisions[:, 0]
                hit = (y_pred == y) if self.targeted else (y_pred != y)
                active = s["active"]
                success = s["success"] | (hit & active)
                better = (adver_loss < s["best_loss"]) & active
                best_loss = jnp.where(better, adver_loss, s["best_loss"])
                best_adver_x = jnp.where(better[:, None, None], s["adver_x"], s["best_adver_x"])
                active = active & ~(adver_loss < 0)  # margin < 0 ⇔ solved; freeze

                # ---- step updates (host: the `it < max_iter` block; running
                # them when the loop is about to exit is dead state) ----
                grad = momentum * s["grad"] + (1.0 - momentum) * g_raw
                win = jnp.where(active[:, None],
                                jnp.concatenate([s["win"][:, 1:], mean_loss[:, None]], axis=1),
                                s["win"])
                cnt = jnp.where(active, jnp.minimum(s["cnt"] + 1, plateau), s["cnt"])
                trig = active & (cnt == plateau) & (win[:, -1] > win[:, 0])
                lr = jnp.where(trig, jnp.maximum(s["lr"] / self.plateau_drop, self.min_lr), s["lr"])
                cnt = jnp.where(trig, 0, cnt)
                step = grad_sign * lr[:, None, None] * jnp.sign(grad) * active[:, None, None].astype(x.dtype)
                adver_x = jnp.clip(s["adver_x"] + step, lower, upper)

                es = jnp.bool_(self.stop_early) & (it % self.stop_early_iter == 0)
                converged = s["prev_loss"] * 0.9999 - mean_loss
                active = jnp.where(es & (converged < 0), False, active)
                prev_loss = jnp.where(es, mean_loss, s["prev_loss"])

                return dict(it=it + 1, rng=rng, adver_x=adver_x, grad=grad,
                            best_adver_x=best_adver_x, best_loss=best_loss,
                            success=success, active=active, win=win, cnt=cnt,
                            lr=lr, prev_loss=prev_loss)

            out = lax.while_loop(cond, body, state)
            return out["best_adver_x"], out["success"]

        return jit_hoisted(run)

    def _attack_batch_fused(self, x, y, lower, upper, runner, rng):
        best_adver_x, success = runner(x, y, lower, upper, rng)
        return best_adver_x, [bool(s) for s in np.asarray(success)]

    def _attack_batch(self, x, y, lower, upper, estimator, rng, batch_id):
        bsz = x.shape[0]
        y_np = np.asarray(y)
        adver_x = x
        grad = jnp.zeros_like(x)
        best_adver_x = np.asarray(x).copy()
        best_loss = np.full(bsz, np.inf)
        success = [False] * bsz
        active = np.ones(bsz, dtype=bool)
        last_ls = [[] for _ in range(bsz)]
        lr = np.full(bsz, self.max_lr)
        prev_loss = np.full(bsz, np.inf)

        for it in range(self.max_iter + 1):
            rng, k = jax.random.split(rng)
            prev_grad = grad
            mean_loss, grad, adver_loss, _, y_pred = estimator(adver_x, y, k)
            adver_loss_np = np.asarray(adver_loss)
            mean_loss_np = np.asarray(mean_loss)

            for ii in range(bsz):
                if not active[ii]:
                    continue
                hit = (y_pred[ii] != y_np[ii]) if not self.targeted else (y_pred[ii] == y_np[ii])
                if hit:
                    success[ii] = True
                if adver_loss_np[ii] < best_loss[ii]:
                    best_loss[ii] = adver_loss_np[ii]
                    best_adver_x[ii] = np.asarray(adver_x[ii])
                if adver_loss_np[ii] < 0:  # margin loss < 0 ⇔ solved; freeze
                    active[ii] = False

            if self.verbose:
                print(
                    f"batch: {batch_id} iter: {it}, loss: {adver_loss_np}, y: {y_np}, "
                    f"y_pred: {y_pred}, best loss: {best_loss}"
                )
            if not active.any():
                break

            if it < self.max_iter:
                grad = self.momentum * prev_grad + (1.0 - self.momentum) * grad
                for jj in range(bsz):
                    if not active[jj]:
                        continue
                    last_ls[jj].append(mean_loss_np[jj])
                    last_ls[jj] = last_ls[jj][-self.plateau_length :]
                    if len(last_ls[jj]) == self.plateau_length and last_ls[jj][-1] > last_ls[jj][0]:
                        if lr[jj] > self.min_lr:
                            lr[jj] = max(lr[jj] / self.plateau_drop, self.min_lr)
                        last_ls[jj] = []

                lr_t = jnp.asarray(lr, dtype=x.dtype)[:, None, None]
                act = jnp.asarray(active.astype(np.float32))[:, None, None]
                step = self.grad_sign * lr_t * jnp.sign(grad) * act
                adver_x = jnp.clip(adver_x + step, lower, upper)

                if self.stop_early and it % self.stop_early_iter == 0:
                    converged = prev_loss * 0.9999 - mean_loss_np
                    for jj in np.nonzero(converged < 0)[0]:
                        active[jj] = False
                    if not active.any():
                        break
                    prev_loss = mean_loss_np.copy()

        return jnp.asarray(best_adver_x), success
