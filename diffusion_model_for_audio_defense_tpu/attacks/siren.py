"""SirenAttack — particle-swarm (PSO) black-box attack.

Rebuild of ``robustness_eval/black_box_attack.py:313-542``: per-epoch
re-initialized swarm keeping the best particle, pbest/gbest bookkeeping,
annealed inertia w, c1/c2 velocity updates, abort-early on gbest plateau
(inner every ``abort_early_iter`` iters, outer every ``abort_early_epoch``
epochs). The (B·P)-particle loss evaluation is one fused jitted forward;
swarm state updates are vectorized jnp; the reference's ``delete_found``
batch shrinking is replaced by a static active-mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.functional import jit_hoisted

from .losses import resolve_loss


def _finite_mean(v):
    """np.mean(v[isfinite(v)]) if any finite else np.mean(v) — the host
    inner-abort statistic, traced."""
    fin = jnp.isfinite(v)
    sel = jnp.sum(jnp.where(fin, v, 0.0)) / jnp.maximum(fin.sum(), 1)
    return jnp.where(fin.any(), sel, jnp.mean(v))


class SirenAttack:
    def __init__(
        self,
        model_fn,
        task: str = "SCR",
        targeted: bool = False,
        confidence: float = 0.0,
        epsilon: float = 0.002,
        max_epoch: int = 300,
        max_iter: int = 30,
        c1: float = 1.4961,
        c2: float = 1.4961,
        n_particles: int = 25,
        w_init: float = 0.9,
        w_end: float = 0.1,
        batch_size: int = 1,
        abort_early: bool = True,
        abort_early_iter: int = 10,
        abort_early_epoch: int = 10,
        verbose: int = 1,
        fused_loop: bool = False,
    ):
        self.model_fn = model_fn
        self.task = task
        self.targeted = targeted
        self.confidence = confidence
        self.epsilon = epsilon
        self.max_epoch = max_epoch
        self.max_iter = max_iter
        self.c1, self.c2 = c1, c2
        self.n_particles = n_particles
        self.w_init, self.w_end = w_init, w_end
        self.batch_size = batch_size
        self.abort_early = abort_early
        self.abort_early_iter = abort_early_iter
        self.abort_early_epoch = abort_early_epoch
        self.verbose = verbose
        self.fused_loop = fused_loop
        self._eval = None

    def _build_eval(self, loss_fn):
        model_fn = self.model_fn

        def ev(locations, x, y, rng):
            B, P, C, N = locations.shape
            eval_x = (locations + x[:, None]).reshape(-1, C, N)
            eval_y = jnp.repeat(y, P)
            scores = model_fn(eval_x, rng)
            loss = loss_fn(scores, eval_y).reshape(B, P)
            preds = jnp.argmax(scores, axis=-1).reshape(B, P)
            return loss, preds

        return jit_hoisted(ev)

    def generate(self, x, y, targeted: bool = False, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.targeted = targeted
        loss_fn, _ = resolve_loss("Margin", targeted, self.confidence, self.task, clip_max=False)
        self._eval = self._build_eval(loss_fn)

        x = jnp.asarray(x)
        y = jnp.asarray(y)
        assert float(x.max()) < 1.0, "inputs must be in [-1, 1) float domain"
        # distortion bounds (reference :562-563)
        lower = jnp.clip(-1.0 - x, min=-self.epsilon)
        upper = jnp.clip(1.0 - x, max=self.epsilon)

        fused_runner = self._build_fused_runner(loss_fn) if self.fused_loop else None

        outs, succs = [], []
        bs = min(self.batch_size, x.shape[0])
        for b0 in range(0, x.shape[0], bs):
            rng, kb = jax.random.split(rng)
            if fused_runner is not None:
                adv, success = fused_runner(
                    x[b0 : b0 + bs], y[b0 : b0 + bs], lower[b0 : b0 + bs], upper[b0 : b0 + bs], kb
                )
                suc = [bool(s) for s in np.asarray(success)]
            else:
                adv, suc = self._attack_batch(
                    x[b0 : b0 + bs], y[b0 : b0 + bs], lower[b0 : b0 + bs], upper[b0 : b0 + bs], kb, b0 // bs
                )
            outs.append(adv)
            succs += suc
        return jnp.concatenate(outs, axis=0), succs

    def _build_fused_runner(self, loss_fn):
        """The whole PSO (epoch × iteration) loop as nested ``lax.while_loop``s
        on device — the host loop syncs pbests/preds to numpy and runs
        per-sample gbest bookkeeping every iteration (reference
        ``black_box_attack.py:420-491``). Exact host parity: identical key
        schedule (per-epoch ``split(rng, 3)``, per-iter ``split(rng, 3)`` +
        ``fold_in(k_r, 0/1)``), keep-best-particle swarm reinit, finite-mean
        inner abort / plain-mean outer abort cadences, freeze-on-solve mask.
        """
        model_fn = self.model_fn
        P = self.n_particles
        max_iter, max_epoch = self.max_iter, self.max_epoch
        # inertia schedule precomputed in f64 exactly like the host loop's
        # python-scalar w, then rounded once — keeps the two paths bitwise-close
        w_table = jnp.asarray(
            [(self.w_init - self.w_end) * (max_iter - i - 1) / max_iter + self.w_end
             for i in range(max_iter + 1)], jnp.float32)

        def ev(locations, x, y, rng):
            B = locations.shape[0]
            C, N = locations.shape[2], locations.shape[3]
            eval_x = (locations + x[:, None]).reshape(-1, C, N)
            eval_y = jnp.repeat(y, P)
            scores = model_fn(eval_x, rng)
            return loss_fn(scores, eval_y).reshape(B, P), jnp.argmax(scores, axis=-1).reshape(B, P)

        def run(x, y, lower, upper, rng):
            B, C, N = x.shape
            lo = lower[:, None]
            hi = upper[:, None]
            v_hi = jnp.abs(lower - upper)[:, None]
            v_lo = -v_hi
            inf = jnp.full((B,), jnp.inf, x.dtype)

            def inner_body(s):
                rng, k_ev, k_r = jax.random.split(s["rng"], 3)
                loss, preds = ev(s["locations"], x, y, k_ev)
                improved = loss < s["pbests"]
                pbests = jnp.where(improved, loss, s["pbests"])
                pbest_loc = jnp.where(improved[..., None, None], s["locations"], s["pbest_loc"])

                g_idx = jnp.argmin(pbests, axis=1)
                cand = jnp.take_along_axis(pbests, g_idx[:, None], axis=1)[:, 0]
                cand_loc = jnp.take_along_axis(pbest_loc, g_idx[:, None, None, None], axis=1)[:, 0]
                upd = s["active"] & (cand < s["gbests"])
                gbests = jnp.where(upd, cand, s["gbests"])
                gbest_loc = jnp.where(upd[:, None, None], cand_loc, s["gbest_loc"])
                active = s["active"] & ~(gbests < 0)  # margin < 0 ⇔ success; freeze

                it = s["it"]
                es = bool(self.abort_early) & ((it + 1) % self.abort_early_iter == 0)
                plateaued = _finite_mean(gbests) > 0.9999 * _finite_mean(s["prev_gbest"])
                inner_stop = es & plateaued
                prev_gbest = jnp.where(es & ~plateaued, gbests, s["prev_gbest"])

                w = w_table[it]
                r1 = jax.random.uniform(jax.random.fold_in(k_r, 0), s["locations"].shape, dtype=x.dtype) + 1e-5
                r2 = jax.random.uniform(jax.random.fold_in(k_r, 1), s["locations"].shape, dtype=x.dtype) + 1e-5
                velocities = (
                    w * s["velocities"]
                    + self.c1 * r1 * (pbest_loc - s["locations"])
                    + self.c2 * r2 * (gbest_loc[:, None] - s["locations"])
                )
                locations = jnp.clip(s["locations"] + velocities, lo, hi)
                return dict(it=it + 1, rng=rng, locations=locations, velocities=velocities,
                            pbest_loc=pbest_loc, pbests=pbests, gbest_loc=gbest_loc,
                            gbests=gbests, prev_gbest=prev_gbest, active=active,
                            inner_stop=inner_stop)

            def inner_cond(s):
                return (s["it"] <= max_iter) & ~s["inner_stop"] & jnp.any(s["active"])

            def outer_body(s):
                epoch = s["epoch"]
                rng, k_init, k_vel = jax.random.split(s["rng"], 3)
                fresh = jax.random.uniform(k_init, (B, P, C, N), dtype=x.dtype) * (hi - lo) + lo
                # keep each sample's best particle, reset the rest
                # (epoch 0: everything fresh, pbests inf)
                best_idx = jnp.argmin(s["pbests"], axis=1)
                best_loc = jnp.take_along_axis(s["pbest_loc"], best_idx[:, None, None, None], axis=1)
                best_val = jnp.take_along_axis(s["pbests"], best_idx[:, None], axis=1)
                keep = jnp.concatenate([best_loc, fresh[:, 1:]], axis=1)
                keep_val = jnp.concatenate([best_val, jnp.full((B, P - 1), jnp.inf, x.dtype)], axis=1)
                first = epoch == 0
                pbest_loc = jnp.where(first, fresh, keep)
                pbests = jnp.where(first, jnp.full((B, P), jnp.inf, x.dtype), keep_val)
                velocities = jax.random.uniform(k_vel, (B, P, C, N), dtype=x.dtype) * (v_hi - v_lo) + v_lo

                inner = lax.while_loop(inner_cond, inner_body, dict(
                    it=jnp.int32(0), rng=rng, locations=pbest_loc, velocities=velocities,
                    pbest_loc=pbest_loc, pbests=pbests, gbest_loc=s["gbest_loc"],
                    gbests=s["gbests"], prev_gbest=s["prev_gbest"], active=s["active"],
                    inner_stop=jnp.bool_(False)))

                gbests = inner["gbests"]
                stop_all = ~jnp.any(inner["active"])
                ee = bool(self.abort_early) & ((epoch + 1) % self.abort_early_epoch == 0)
                stop_all = stop_all | (ee & (jnp.mean(gbests) > 0.9999 * jnp.mean(s["prev_gbest_epoch"])))
                prev_gbest_epoch = jnp.where(ee, gbests, s["prev_gbest_epoch"])
                return dict(epoch=epoch + 1, rng=inner["rng"], pbest_loc=inner["pbest_loc"],
                            pbests=inner["pbests"], gbest_loc=inner["gbest_loc"], gbests=gbests,
                            prev_gbest=inner["prev_gbest"], prev_gbest_epoch=prev_gbest_epoch,
                            active=inner["active"], stop_all=stop_all)

            def outer_cond(s):
                return (s["epoch"] < max_epoch) & ~s["stop_all"] & jnp.any(s["active"])

            out = lax.while_loop(outer_cond, outer_body, dict(
                epoch=jnp.int32(0), rng=rng,
                pbest_loc=jnp.zeros((B, P, C, N), x.dtype),
                pbests=jnp.full((B, P), jnp.inf, x.dtype),
                gbest_loc=jnp.zeros((B, C, N), x.dtype), gbests=inf,
                prev_gbest=inf, prev_gbest_epoch=inf,
                active=jnp.ones((B,), bool), stop_all=jnp.bool_(False)))
            return out["gbest_loc"] + x, out["gbests"] < 0

        return jit_hoisted(run)

    def _attack_batch(self, x, y, lower, upper, rng, batch_id):
        B, C, N = x.shape
        P = self.n_particles
        y_np = np.asarray(y)
        lo = lower[:, None]  # (B,1,C,N) broadcasting over particles
        hi = upper[:, None]
        v_hi = jnp.abs(lower - upper)[:, None]
        v_lo = -v_hi

        gbest_loc = jnp.zeros((B, C, N), dtype=x.dtype)
        gbests = np.full(B, np.inf)
        gbest_pred = np.full(B, -1)
        prev_gbest = gbests.copy()
        prev_gbest_epoch = gbests.copy()
        active = np.ones(B, dtype=bool)

        pbest_loc = None
        pbests = None
        stop_all = False

        for epoch in range(self.max_epoch):
            if stop_all or not active.any():
                break
            rng, k_init, k_vel = jax.random.split(rng, 3)
            fresh = jax.random.uniform(k_init, (B, P, C, N), dtype=x.dtype, minval=0.0, maxval=1.0) * (hi - lo) + lo
            if epoch == 0:
                pbest_loc = fresh
                pbests = jnp.full((B, P), jnp.inf, dtype=x.dtype)
            else:  # keep each sample's best particle, reset the rest (reference :376-384)
                best_idx = jnp.argmin(pbests, axis=1)
                best_loc = jnp.take_along_axis(pbest_loc, best_idx[:, None, None, None], axis=1)
                best_val = jnp.take_along_axis(pbests, best_idx[:, None], axis=1)
                pbest_loc = jnp.concatenate([best_loc, fresh[:, 1:]], axis=1)
                pbests = jnp.concatenate([best_val, jnp.full((B, P - 1), jnp.inf, dtype=x.dtype)], axis=1)

            locations = pbest_loc
            velocities = jax.random.uniform(k_vel, (B, P, C, N), dtype=x.dtype) * (v_hi - v_lo) + v_lo

            for it in range(self.max_iter + 1):
                rng, k_ev, k_r = jax.random.split(rng, 3)
                loss, preds = self._eval(locations, x, y, k_ev)

                improved = loss < pbests
                pbests = jnp.where(improved, loss, pbests)
                pbest_loc = jnp.where(improved[..., None, None], locations, pbest_loc)

                g_idx = np.asarray(jnp.argmin(pbests, axis=1))
                pbests_np = np.asarray(pbests)
                preds_np = np.asarray(preds)
                for b in range(B):
                    if not active[b]:
                        continue
                    if pbests_np[b, g_idx[b]] < gbests[b]:
                        gbests[b] = pbests_np[b, g_idx[b]]
                        gbest_loc = gbest_loc.at[b].set(pbest_loc[b, g_idx[b]])
                        gbest_pred[b] = preds_np[b, g_idx[b]]
                    if gbests[b] < 0:
                        active[b] = False  # margin < 0 ⇔ attack success; freeze

                if self.verbose:
                    print(
                        f"batch: {batch_id}, epoch: {epoch}, iter: {it}, y: {y_np.tolist()}, "
                        f"y_pred: {gbest_pred.tolist()}, gbest: {gbests.tolist()}"
                    )
                if not active.any():
                    stop_all = True
                    break

                if self.abort_early and (it + 1) % self.abort_early_iter == 0:
                    if np.mean(gbests[np.isfinite(gbests)] if np.isfinite(gbests).any() else gbests) > 0.9999 * np.mean(
                        prev_gbest[np.isfinite(prev_gbest)] if np.isfinite(prev_gbest).any() else prev_gbest
                    ):
                        if self.verbose:
                            print("Converge, Break Inner Loop")
                        break
                    prev_gbest = gbests.copy()

                if it < self.max_iter:
                    w = (self.w_init - self.w_end) * (self.max_iter - it - 1) / self.max_iter + self.w_end
                    r1 = jax.random.uniform(jax.random.fold_in(k_r, 0), (B, P, C, N), dtype=x.dtype) + 1e-5
                    r2 = jax.random.uniform(jax.random.fold_in(k_r, 1), (B, P, C, N), dtype=x.dtype) + 1e-5
                    velocities = (
                        w * velocities
                        + self.c1 * r1 * (pbest_loc - locations)
                        + self.c2 * r2 * (gbest_loc[:, None] - locations)
                    )
                    locations = jnp.clip(locations + velocities, lo, hi)

            if self.abort_early and (epoch + 1) % self.abort_early_epoch == 0:
                if np.mean(gbests) > 0.9999 * np.mean(prev_gbest_epoch):
                    if self.verbose:
                        print("Converge, Break Outer Loop")
                    stop_all = True
                prev_gbest_epoch = gbests.copy()

        success = [bool(g < 0) for g in gbests]
        return gbest_loc + x, success
