"""White-box attack: CW/PGD stage-1 + Qin psychoacoustic stage-2.

Rebuild of ``robustness_eval/white_box_attack.py`` (``AudioAttack``):
- stage 1: iterative signed-gradient ascent on CE with per-sample shrinking
  ε-ball (×decrease_factor every num_iter_decrease_eps iters on success),
  linf clamp / l2 projection, re-clamp to [-1,1] (reference ``:362-468``)
- stage 2: hinge loss of the perturbation's approximate PSD against the
  precomputed psychoacoustic masking threshold, with per-sample adaptive α
  (reference ``:470-604``)
- EOT for prediction (``eot_defense_size``) and gradient (``eot_attack_size``)

Structure: the heavy compute (forward+grad through the purifier, PSD loss
grad) is jitted once; the per-sample bookkeeping (ε shrink, best-adv
tracking, α adaptation) runs on host in numpy exactly like the reference's
python loops — it is O(batch) scalar work between device steps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .eot import EOT
from .losses import cross_entropy
from ..core.functional import jit_hoisted
from ..ops.stft import stft as _stft


def project_to_norm_ball(x: jnp.ndarray, p: str, eps) -> jnp.ndarray:
    """Per-sample projection onto the ε-ball (reference ``:11-22``).

    ``eps`` may be scalar or (B,) for per-sample radii.
    """
    eps = jnp.asarray(eps, dtype=x.dtype)
    if eps.ndim == 1:
        eps = eps[:, None, None]
    if p == "linf":
        return jnp.clip(x, -eps, eps)
    if p == "l2":
        norm = jnp.sqrt(jnp.sum(x**2, axis=(1, 2), keepdims=True))
        factor = jnp.minimum(1.0, eps / jnp.maximum(norm, 1e-12))
        return x * factor
    raise NotImplementedError(f"Unsupported norm: {p}!")


def lp_norm(x: jnp.ndarray, p: str):
    if p == "linf":
        return jnp.max(jnp.abs(x))
    if p == "l2":
        return jnp.sqrt(jnp.sum(x**2, axis=tuple(range(1, x.ndim))))
    raise NotImplementedError(f"Unsupported norm: {p}!")


class AudioAttack:
    """CW/PGD (+ optional Qin imperceptibility stage).

    ``model_fn(x, rng) -> scores`` is the defended AcousticSystem. All rng is
    explicit; pass a fresh key to ``generate``.
    """

    def __init__(
        self,
        model_fn,
        masker: Optional["object"] = None,
        eps: float = 2000.0,
        norm: str = "linf",
        learning_rate_1: float = 100.0,
        max_iter_1: int = 1000,
        alpha: float = 0.05,
        learning_rate_2: float = 1.0,
        max_iter_2: int = 4000,
        loss_theta_min: float = 0.05,
        decrease_factor_eps: float = 0.8,
        num_iter_decrease_eps: int = 10,
        increase_factor_alpha: float = 1.2,
        num_iter_increase_alpha: int = 20,
        decrease_factor_alpha: float = 0.8,
        num_iter_decrease_alpha: int = 50,
        eot_attack_size: int = 1,
        eot_defense_size: int = 1,
        input_is_int16_scale: bool = False,
        verbose: int = 1,
        fused_stage_1: bool = False,
        fused_stage_2: bool = False,
    ):
        self.model_fn = model_fn
        self.masker = masker
        self.eps = eps
        self.norm = norm
        self.learning_rate_1 = learning_rate_1
        self.max_iter_1 = max_iter_1
        self.alpha = alpha
        self.learning_rate_2 = learning_rate_2
        self.max_iter_2 = max_iter_2
        self.loss_theta_min = loss_theta_min
        self.decrease_factor_eps = decrease_factor_eps
        self.num_iter_decrease_eps = num_iter_decrease_eps
        self.increase_factor_alpha = increase_factor_alpha
        self.num_iter_increase_alpha = num_iter_increase_alpha
        self.decrease_factor_alpha = decrease_factor_alpha
        self.num_iter_decrease_alpha = num_iter_decrease_alpha
        self.eot_attack_size = eot_attack_size
        self.eot_defense_size = eot_defense_size
        # reference scales ε by 2^-15 when inputs are float32 (:368-373)
        self.scale_factor = 1.0 if input_is_int16_scale else 2.0**-15
        self.verbose = verbose
        self.fused_stage_1 = fused_stage_1
        self.fused_stage_2 = fused_stage_2
        self._fused_cache = {}
        self._targeted = False

        # optional live model state: model_fn may accept (x, rng, *state) and
        # generate(..., model_state=(params, ...)) threads it as TRACED args —
        # the weights can change every call without retracing (adv_finetune
        # attacks the current weights each batch, like the reference's
        # in-place-updated torch modules)
        self._mstate = ()
        self._eot = EOT(model_fn, cross_entropy, eot_size=max(eot_attack_size, eot_defense_size))
        # jit_hoisted: system params captured by model_fn become runtime
        # args instead of HLO constants (11x faster compiles, core/functional.py)
        self._plain_scores = jit_hoisted(lambda x, rng, st: model_fn(x, rng, *st))

        def loss_and_grad(x, y, rng, st):
            def f(xx):
                return jnp.sum(cross_entropy(model_fn(xx, rng, *st), y))

            return jax.grad(f)(x)

        self._plain_grad = jit_hoisted(loss_and_grad)

    # ------------------------------------------------------------- stage 1

    def generate(self, x, y, targeted: bool = True, rng=None, model_state=()):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._targeted = targeted
        self._mstate = tuple(model_state)
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        k1, k2 = jax.random.split(rng)
        stage_1 = self.stage_1_fused if self.fused_stage_1 else self.stage_1
        x_adv, success_1 = stage_1(x, y, k1)
        if self.max_iter_2 > 0:
            stage_2 = self.stage_2_fused if self.fused_stage_2 else self.stage_2
            x_adv, success_2 = stage_2(x, x_adv, y, k2)
            return x_adv, (success_1, success_2)
        return x_adv, (success_1, None)

    def _predict(self, x_pert, y, rng):
        if self.eot_defense_size > 1:
            scores, _, _, _ = self._eot(x_pert, y, rng, eot_size=self.eot_defense_size,
                                        use_grad=False, model_state=self._mstate)
        else:
            scores = self._plain_scores(x_pert, rng, self._mstate)
        return np.asarray(jnp.argmax(scores, axis=-1))

    def _grad(self, x_pert, y, rng):
        if self.eot_attack_size > 1:
            _, _, grad, _ = self._eot(x_pert, y, rng, eot_size=self.eot_attack_size,
                                      use_grad=True, model_state=self._mstate)
        else:
            grad = self._plain_grad(x_pert, y, rng, self._mstate)
        return grad

    def stage_1(self, x, y, rng):
        eps0 = self.scale_factor * self.eps
        lr = self.scale_factor * self.learning_rate_1
        bsz = x.shape[0]
        y_np = np.asarray(y)

        delta = jnp.zeros_like(x)
        epsilon = np.full(bsz, eps0, dtype=np.float64)
        x_adv = [None] * bsz

        for i in range(self.max_iter_1 + 1):
            rng, k_pred, k_grad = jax.random.split(rng, 3)
            x_pert = x + delta
            pred = self._predict(x_pert, y, k_pred)
            hit = (pred == y_np) if self._targeted else (pred != y_np)

            x_pert_np = None
            for j in np.nonzero(hit)[0]:
                if x_pert_np is None:
                    x_pert_np = np.asarray(x_pert)
                x_adv[j] = x_pert_np[j]

            # shrink ε for currently-successful samples (reference :409-424)
            if i % self.num_iter_decrease_eps == 0 and i > 0 and hit.any():
                delta_np = np.asarray(delta)
                for j in np.nonzero(hit)[0]:
                    if self.norm == "linf":
                        pert_norm = float(np.abs(delta_np[j]).max())
                    else:
                        pert_norm = float(np.linalg.norm(delta_np[j]))
                    if epsilon[j] > pert_norm:
                        epsilon[j] = pert_norm
                    epsilon[j] *= self.decrease_factor_eps

            if i == self.max_iter_1:
                break

            grad = self._grad(x_pert, y, k_grad)
            step = lr * jnp.sign(grad)
            delta = delta - step if self._targeted else delta + step
            delta = project_to_norm_ball(delta, self.norm, jnp.asarray(epsilon, dtype=x.dtype))
            delta = jnp.clip(x + delta, -1.0, 1.0) - x

        x_pert_np = np.asarray(x + delta)
        success = [True] * bsz
        for j in range(bsz):
            if x_adv[j] is None:
                if self.verbose:
                    print(f"Adversarial attack stage 1 for x_{j} was not successful")
                x_adv[j] = x_pert_np[j]
                success[j] = False
        return jnp.asarray(np.stack(x_adv, axis=0)), success

    # ------------------------------------------- stage 1, device-resident

    def _traced_predict(self, x_pert, y, rng, st):
        """Traced mirror of ``_predict`` (same key-splitting as EOT.__call__
        so host and fused paths see identical noise)."""
        if self.eot_defense_size <= 1:
            return jnp.argmax(self.model_fn(x_pert, rng, *st), axis=-1)
        scores = None
        total = 0
        for n_rep in self._eot_chunk_sizes(self.eot_defense_size):
            rng, k = jax.random.split(rng)
            bsz = x_pert.shape[0]
            xr = jnp.tile(x_pert, (n_rep,) + (1,) * (x_pert.ndim - 1))
            s = self.model_fn(xr, k, *st).reshape(n_rep, bsz, -1).mean(0)
            scores = s * n_rep if scores is None else scores + s * n_rep
            total += n_rep
        return jnp.argmax(scores / total, axis=-1)

    def _traced_grad(self, x_pert, y, rng, st):
        if self.eot_attack_size <= 1:
            def f(xx):
                return jnp.sum(cross_entropy(self.model_fn(xx, rng, *st), y))

            return jax.grad(f)(x_pert)
        grad = None
        total = 0
        for n_rep in self._eot_chunk_sizes(self.eot_attack_size):
            rng, k = jax.random.split(rng)

            def f(xx, k=k, n_rep=n_rep):
                bsz = xx.shape[0]
                xr = jnp.tile(xx, (n_rep,) + (1,) * (xx.ndim - 1))
                yr = jnp.tile(y, (n_rep,))
                lr_ = cross_entropy(self.model_fn(xr, k, *st), yr)
                return jnp.sum(lr_.reshape(n_rep, bsz).mean(0))

            g = jax.grad(f)(x_pert)
            grad = g * n_rep if grad is None else grad + g * n_rep
            total += n_rep
        return grad / total

    def stage_1_fused(self, x, y, rng):
        """Device-resident stage 1: the whole iteration loop is ONE compiled
        ``lax.fori_loop`` with on-device ε-shrink / best-adv masking — no
        per-iteration host round-trips (the host path syncs predictions to
        numpy every iter, reference ``white_box_attack.py:380-451``; fine at
        B≤5 but max_iter_1=1000 round-trips add up). Exactly mirrors the
        host bookkeeping: latest-hit x_adv, ε ← min(ε, ‖δ‖)·factor every
        ``num_iter_decrease_eps`` iters on success, final extra prediction
        pass at i = max_iter_1. Opt in with ``fused_stage_1=True`` /
        ``--fused_stage_1`` (the host path stays default for parity).
        """
        eps0 = self.scale_factor * self.eps
        lr = self.scale_factor * self.learning_rate_1
        targeted = self._targeted
        norm = self.norm

        def run(x, y, rng, st):
            bsz = x.shape[0]

            def pert_norm(delta):
                if norm == "linf":
                    return jnp.max(jnp.abs(delta), axis=(1, 2))
                return jnp.sqrt(jnp.sum(delta**2, axis=(1, 2)))

            def bookkeep(i, k_pred, delta, epsilon, x_adv, found):
                x_pert = x + delta
                pred = self._traced_predict(x_pert, y, k_pred, st)
                hit = (pred == y) if targeted else (pred != y)
                x_adv = jnp.where(hit[:, None, None], x_pert, x_adv)
                found = found | hit
                shrink = hit & (i % self.num_iter_decrease_eps == 0) & (i > 0)
                eps_new = jnp.minimum(epsilon, pert_norm(delta)) * self.decrease_factor_eps
                epsilon = jnp.where(shrink, eps_new, epsilon)
                return x_pert, epsilon, x_adv, found

            def body(i, carry):
                key, delta, epsilon, x_adv, found = carry
                # identical key schedule to the host loop (:168)
                key, k_pred, k_grad = jax.random.split(key, 3)
                x_pert, epsilon, x_adv, found = bookkeep(
                    i, k_pred, delta, epsilon, x_adv, found)
                grad = self._traced_grad(x_pert, y, k_grad, st)
                step = lr * jnp.sign(grad)
                delta = delta - step if targeted else delta + step
                delta = project_to_norm_ball(delta, norm, epsilon.astype(x.dtype))
                delta = jnp.clip(x + delta, -1.0, 1.0) - x
                return key, delta, epsilon, x_adv, found

            delta = jnp.zeros_like(x)
            epsilon = jnp.full((bsz,), eps0, dtype=x.dtype)
            x_adv = jnp.zeros_like(x)
            found = jnp.zeros((bsz,), dtype=bool)
            key, delta, epsilon, x_adv, found = jax.lax.fori_loop(
                0, self.max_iter_1, body, (rng, delta, epsilon, x_adv, found))
            # final prediction pass (host loop iteration i == max_iter_1)
            _, k_pred, _ = jax.random.split(key, 3)
            _, _, x_adv, found = bookkeep(
                self.max_iter_1, k_pred, delta, epsilon, x_adv, found)
            x_adv = jnp.where(found[:, None, None], x_adv, x + delta)
            return x_adv, found

        cache_key = (x.shape, str(x.dtype), targeted, self.max_iter_1)
        if cache_key not in self._fused_cache:
            self._fused_cache[cache_key] = jit_hoisted(run)
        x_adv, found = self._fused_cache[cache_key](x, y, rng, self._mstate)
        found_np = np.asarray(found)
        if self.verbose:
            for j in np.nonzero(~found_np)[0]:
                print(f"Adversarial attack stage 1 for x_{j} was not successful")
        return x_adv, list(found_np)

    @staticmethod
    def _eot_chunk_sizes(eot_size):
        # mirror of EOT.__call__'s chunking (chunk = eot_batch_size = size
        # here, so a single chunk; kept as a list for exact key parity)
        return [eot_size]

    # ------------------------------------------------------------- stage 2

    def _psd_loss(self, perturbation, masking_threshold_stab, psd_max_stab):
        """Hinge loss of the perturbation PSD vs masking threshold
        (reference ``:606-678``; the 10·log terms are canceled out)."""
        win = self.masker.window_size
        hop = self.masker.hop_size
        p = perturbation[:, 0, :]  # (B, L)
        s = _stft(p, n_fft=win, hop_length=hop, center=False)  # (B, F, T)
        gain = np.sqrt(8.0 / 3.0)
        psd = (gain / win) ** 2 * (s.real**2 + s.imag**2)
        psd_approx = (10.0**9.6) / psd_max_stab[:, None, None] * psd
        return jnp.mean(jnp.maximum(psd_approx - masking_threshold_stab, 0.0), axis=(1, 2))

    def stage_2(self, x, x_adv, y, rng):
        lr = self.scale_factor * self.learning_rate_2
        bsz = x.shape[0]
        y_np = np.asarray(y)
        alpha_min = 0.0005
        alpha = np.full(bsz, self.alpha, dtype=np.float64)

        # masking threshold / PSD max from the *clean* input, host-side numpy
        thresholds, psd_maxima = [], []
        x_np = np.asarray(x)
        for xi in x_np[:, 0, :]:
            th, pm = self.masker.calculate_threshold_and_psd_maximum(xi)
            thresholds.append(th)
            psd_maxima.append(pm)
        mt_stab = jnp.asarray(10.0 ** (np.asarray(thresholds) * 0.1), dtype=x.dtype)
        pm_stab = jnp.asarray(10.0 ** (np.asarray(psd_maxima) * 0.1), dtype=x.dtype)

        def theta_loss_grad(delta):
            loss = self._psd_loss(delta, mt_stab, pm_stab)
            return loss.sum(), loss

        theta_loss_grad = jit_hoisted(jax.grad(theta_loss_grad, has_aux=True))

        delta = x_adv - x
        early_stop = np.zeros(bsz, dtype=bool)
        loss_theta_prev = np.full(bsz, np.inf)
        loss_theta = np.full(bsz, np.inf)
        x_imp = [None] * bsz

        for i in range(self.max_iter_2 + 1):
            rng, k_pred, k_grad = jax.random.split(rng, 3)
            x_pert = x + delta
            pred = self._predict(x_pert, y, k_pred)
            hit = (pred == y_np) if self._targeted else (pred != y_np)

            x_pert_np = None
            for j in np.nonzero(hit & (loss_theta < loss_theta_prev))[0]:
                if x_pert_np is None:
                    x_pert_np = np.asarray(x_pert)
                x_imp[j] = x_pert_np[j]
                loss_theta_prev[j] = loss_theta[j]

            if (i % self.num_iter_increase_alpha == 0 or i % self.num_iter_decrease_alpha == 0) and i > 0:
                for j in range(bsz):
                    if i % self.num_iter_increase_alpha == 0 and hit[j]:
                        alpha[j] *= self.increase_factor_alpha
                    if i % self.num_iter_decrease_alpha == 0 and not hit[j]:
                        alpha[j] = max(alpha[j] * self.decrease_factor_alpha, alpha_min)

            if i == self.max_iter_2:
                break

            grad_net = self._grad(x_pert, y, k_grad)
            grad_theta, lt = theta_loss_grad(delta)
            loss_theta = np.asarray(lt)
            a = jnp.asarray(alpha, dtype=x.dtype)[:, None, None]
            combined = grad_net + a * grad_theta
            delta = delta - lr * combined if self._targeted else delta + lr * combined
            delta = jnp.clip(x + delta, -1.0, 1.0) - x

            for j in range(bsz):
                if loss_theta[j] < self.loss_theta_min and not early_stop[j]:
                    if self.verbose:
                        print(f"Batch sample {j} reached minimum threshold of {self.loss_theta_min} for theta loss.")
                    early_stop[j] = True
            if early_stop.all():
                if self.verbose:
                    print(f"All batch samples reached minimum threshold for theta loss. Stopping early at iteration {i}")
                break

        x_pert_np = np.asarray(x + delta)
        success = [True] * bsz
        for j in range(bsz):
            if x_imp[j] is None:
                if self.verbose:
                    print(f"Adversarial attack stage 2 for x_{j} was not successful")
                x_imp[j] = x_pert_np[j]
                success[j] = False
        return jnp.asarray(np.stack(x_imp, axis=0)), success

    # ------------------------------------------- stage 2, device-resident

    def stage_2_fused(self, x, x_adv, y, rng):
        """Device-resident Qin stage 2: the whole imperceptibility loop is ONE
        compiled ``lax.while_loop`` with on-device best-tracking, per-sample
        adaptive α, and θ-loss early stop — no per-iteration host round-trips
        (the host path syncs predictions + θ losses to numpy every iter,
        reference ``white_box_attack.py:470-604``; max_iter_2 defaults to
        4000). Masking thresholds stay host-side numpy (clean-input data prep,
        exactly as the host path). Exact host key-schedule parity: per-iter
        ``split(rng, 3)``; the record/α steps run at i == max_iter_2 but the
        gradient update does not, matching the host break placement. Opt in
        with ``fused_stage_2=True`` / ``--fused_stage_2``.
        """
        lr = self.scale_factor * self.learning_rate_2
        targeted = self._targeted
        alpha_min = 0.0005

        thresholds, psd_maxima = [], []
        for xi in np.asarray(x)[:, 0, :]:
            th, pm = self.masker.calculate_threshold_and_psd_maximum(xi)
            thresholds.append(th)
            psd_maxima.append(pm)
        mt_stab = jnp.asarray(10.0 ** (np.asarray(thresholds) * 0.1), dtype=x.dtype)
        pm_stab = jnp.asarray(10.0 ** (np.asarray(psd_maxima) * 0.1), dtype=x.dtype)

        def run(x, x_adv0, y, rng, mt_stab, pm_stab, st):
            bsz = x.shape[0]
            inf = jnp.full((bsz,), jnp.inf, x.dtype)

            def theta_loss_grad(delta):
                def f(d):
                    loss = self._psd_loss(d, mt_stab, pm_stab)
                    return loss.sum(), loss

                return jax.grad(f, has_aux=True)(delta)

            def cond(s):
                return (s["i"] <= self.max_iter_2) & ~s["stop"]

            def body(s):
                i = s["i"]
                key, k_pred, k_grad = jax.random.split(s["rng"], 3)
                x_pert = x + s["delta"]
                pred = self._traced_predict(x_pert, y, k_pred, st)
                hit = (pred == y) if targeted else (pred != y)

                rec = hit & (s["loss_theta"] < s["loss_theta_prev"])
                x_imp = jnp.where(rec[:, None, None], x_pert, s["x_imp"])
                loss_theta_prev = jnp.where(rec, s["loss_theta"], s["loss_theta_prev"])
                has_best = s["has_best"] | rec

                inc = hit & (i % self.num_iter_increase_alpha == 0) & (i > 0)
                dec = ~hit & (i % self.num_iter_decrease_alpha == 0) & (i > 0)
                alpha = jnp.where(inc, s["alpha"] * self.increase_factor_alpha, s["alpha"])
                alpha = jnp.where(dec, jnp.maximum(alpha * self.decrease_factor_alpha, alpha_min), alpha)

                # gradient section — host runs it only for i < max_iter_2
                do_upd = i < self.max_iter_2
                grad_net = self._traced_grad(x_pert, y, k_grad, st)
                grad_theta, lt = theta_loss_grad(s["delta"])
                loss_theta = jnp.where(do_upd, lt, s["loss_theta"])
                combined = grad_net + alpha[:, None, None] * grad_theta
                new_delta = s["delta"] - lr * combined if targeted else s["delta"] + lr * combined
                new_delta = jnp.clip(x + new_delta, -1.0, 1.0) - x
                delta = jnp.where(do_upd, new_delta, s["delta"])
                early = s["early"] | (do_upd & (loss_theta < self.loss_theta_min))
                stop = jnp.all(early)
                return dict(i=i + 1, rng=key, delta=delta, alpha=alpha,
                            loss_theta=loss_theta, loss_theta_prev=loss_theta_prev,
                            x_imp=x_imp, has_best=has_best, early=early, stop=stop)

            out = jax.lax.while_loop(cond, body, dict(
                i=jnp.int32(0), rng=rng, delta=x_adv0 - x,
                alpha=jnp.full((bsz,), self.alpha, x.dtype),
                loss_theta=inf, loss_theta_prev=inf,
                x_imp=jnp.zeros_like(x), has_best=jnp.zeros((bsz,), bool),
                early=jnp.zeros((bsz,), bool), stop=jnp.bool_(False)))
            x_final = jnp.where(out["has_best"][:, None, None], out["x_imp"], x + out["delta"])
            return x_final, out["has_best"]

        cache_key = ("s2", x.shape, str(x.dtype), targeted, self.max_iter_2)
        if cache_key not in self._fused_cache:
            self._fused_cache[cache_key] = jit_hoisted(run)
        x_imp, has_best = self._fused_cache[cache_key](x, x_adv, y, rng, mt_stab, pm_stab, self._mstate)
        success_np = np.asarray(has_best)
        if self.verbose:
            for j in np.nonzero(~success_np)[0]:
                print(f"Adversarial attack stage 2 for x_{j} was not successful")
        return x_imp, [bool(s) for s in success_np]
