"""Improved-diffusion training loop.

Rebuild of ``improved_diffusion/train_util.py`` (``TrainLoop``): microbatch
gradient accumulation, schedule-sampler weighting (uniform /
loss-second-moment), per-EMA-rate parameter averages, linear lr anneal,
model/EMA/opt checkpoints, per-quartile loss logging.

TPU-first: DDP + fp16 loss-scale machinery (``train_util.py:95-142,231-245``)
is replaced by one jitted update over a dp mesh (psum inserted by XLA from
shardings) and bf16 activations with f32 params — no loss-scale dance
needed on TPU. Microbatches accumulate inside a ``lax.scan`` before the
single gradient application (replacing DDP ``no_sync``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import logger
from .ema import ema_update
from .resample_t import UniformSampler
from ..core.checkpoint import save_pytree


class TrainLoop:
    def __init__(
        self,
        model,
        diffusion,
        data,
        batch_size: int,
        microbatch: int = -1,
        lr: float = 1e-4,
        ema_rate="0.9999",
        log_interval: int = 10,
        save_interval: int = 10000,
        lr_anneal_steps: int = 0,
        weight_decay: float = 0.0,
        schedule_sampler=None,
        resume_params=None,
        resume_step: int = 0,
        save_dir: str = "checkpoints",
        standardize=None,
        rng=None,
    ):
        self.model = model
        self.diffusion = diffusion
        self.data = data
        self.batch_size = batch_size
        self.microbatch = microbatch if microbatch > 0 else batch_size
        self.lr = lr
        self.ema_rate = [float(x) for x in str(ema_rate).split(",")]
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.lr_anneal_steps = lr_anneal_steps
        self.schedule_sampler = schedule_sampler or UniformSampler(diffusion.num_timesteps)
        self.save_dir = save_dir
        self.standardize = standardize
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.step = 0

        if resume_params is None:
            resume_params, self.step = self._discover_resume(save_dir)
        else:
            # explicit resume: the caller supplies the step (reference parses
            # it from the filename, train_util.py:337-347) so lr anneal,
            # checkpoint numbering and the opt/EMA restore below line up
            self.step = int(resume_step)
        if resume_params is not None:
            self.params = resume_params
        else:
            self.rng, k = jax.random.split(self.rng)
            probe = next(data)
            probe = probe[0] if isinstance(probe, tuple) else probe
            self.params = model.init(k, jnp.zeros((1,) + probe.shape[1:]), jnp.zeros((1,), jnp.int32))

        sched = (
            optax.linear_schedule(lr, 0.0, lr_anneal_steps) if lr_anneal_steps else lr
        )
        # reference: torch AdamW(lr, weight_decay=wd) — DECOUPLED decay once
        # (train_util.py:107); adam when wd=0 matches AdamW(wd=0)
        self.opt = optax.adamw(sched, weight_decay=weight_decay) if weight_decay else optax.adam(sched)
        self.opt_state = self.opt.init(self.params)
        self.ema_params = [jax.tree.map(lambda p: p, self.params) for _ in self.ema_rate]
        if self.step > 0:
            self._restore_opt_ema()

        n_micro = self.batch_size // self.microbatch
        # train=True + a dropout rng: the reference trains the UNet with its
        # dropout (0.3 by default, script_util.py:24) active. Passed only
        # when the (possibly duck-typed) apply accepts the kwargs.
        import inspect

        try:
            ap = inspect.signature(model.apply).parameters
            # explicit 'train' param only: a bare **kwargs (e.g. a raw flax
            # Module.apply) says nothing about whether __call__ takes train
            dropout_capable = "train" in ap
        except (TypeError, ValueError):
            dropout_capable = False
        self.dropout_capable = dropout_capable  # introspectable (and tested)
        if not dropout_capable:
            import warnings

            warnings.warn(
                "model.apply has no explicit 'train' parameter - training will "
                "run with dropout OFF. Wrap the model so apply(params, x, t, "
                "train=...) is explicit if dropout is intended (the reference "
                "UNet trains with dropout 0.3, script_util.py:24).",
                stacklevel=2,
            )
        if dropout_capable:
            model_fn_of = lambda params, dkey: (
                lambda x, t: model.apply(params, x, t, train=True, rngs={"dropout": dkey}))
        else:
            model_fn_of = lambda params, dkey: (lambda x, t: model.apply(params, x, t))

        def loss_over_micro(params, batch, ts, ws, rng):
            # batch (n_micro, m, ...), ts/ws (n_micro, m): scan accumulates
            def micro(acc, inp):
                xb, tb, wb, key = inp
                k_noise, k_drop = jax.random.split(key)
                terms = self.diffusion.training_losses(model_fn_of(params, k_drop), xb, tb, k_noise)
                return acc + jnp.mean(terms["loss"] * wb) / n_micro, terms["loss"]

            keys = jax.random.split(rng, n_micro)
            total, losses = jax.lax.scan(micro, 0.0, (batch, ts, ws, keys))
            return total, losses

        def update(params, opt_state, emas, batch, ts, ws, rng):
            (loss, losses), grads = jax.value_and_grad(loss_over_micro, has_aux=True)(params, batch, ts, ws, rng)
            gnorm = optax.global_norm(grads)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            emas = [ema_update(e, params, r) for e, r in zip(emas, self.ema_rate)]
            return params, opt_state, emas, loss, losses, gnorm

        self._update = jax.jit(update)

    def run_step(self, batch):
        n_micro = self.batch_size // self.microbatch
        if self.standardize is not None:
            batch = self.standardize(batch)
        self.rng, k_t, k_u = jax.random.split(self.rng, 3)
        ts, ws = self.schedule_sampler.sample(self.batch_size, k_t)
        shape = (n_micro, self.microbatch)
        batch_m = jnp.asarray(batch).reshape(shape + batch.shape[1:])
        ts_m, ws_m = ts.reshape(shape), ws.reshape(shape)
        self.params, self.opt_state, self.ema_params, loss, losses, gnorm = self._update(
            self.params, self.opt_state, self.ema_params, batch_m, ts_m, ws_m, k_u
        )
        self.schedule_sampler.update_with_all_losses(np.asarray(ts), np.asarray(losses).reshape(-1))
        logger.logkv_mean("loss", float(loss))
        logger.logkv_mean("grad_norm", float(gnorm))
        logger.log_loss_dict(self.diffusion.num_timesteps, np.asarray(ts), {"loss_t": np.asarray(losses).reshape(-1)})
        self.step += 1

    @staticmethod
    def _discover_resume(save_dir: str):
        """Auto-resume from the newest ``model{step}`` checkpoint in save_dir
        (reference ``train_util.py:337-347`` newest-model discovery)."""
        import re

        from ..core.checkpoint import load_pytree

        if not os.path.isdir(save_dir):
            return None, 0
        steps = [
            int(m.group(1))
            for d in os.listdir(save_dir)
            if (m := re.fullmatch(r"model(\d+)", d))
        ]
        if not steps:
            return None, 0
        step = max(steps)
        try:
            params = load_pytree(os.path.join(save_dir, f"model{step:06d}"))
            logger.logkv("resumed_from_step", step)
            print(f"resuming from {save_dir}/model{step:06d}")
            return params, step
        except Exception as e:  # tolerate bad checkpoints like the reference
            print(f"resume discovery failed ({e}); starting fresh")
            return None, 0

    def _restore_opt_ema(self):
        """Re-load optimizer state, EMA averages and PRNG found next to the
        resumed model checkpoint (reference ``train_util.py:114-142``).
        Without this a restarted run silently resets Adam moments and EMA."""
        from ..core.checkpoint import load_pytree

        opt_path = os.path.join(self.save_dir, f"opt{self.step:06d}")
        if os.path.isdir(opt_path):
            try:
                state = load_pytree(
                    opt_path, target={"opt_state": self.opt_state, "rng": np.asarray(self.rng)}
                )
                self.opt_state = state["opt_state"]
                self.rng = jnp.asarray(state["rng"])
                print(f"restored optimizer state from {opt_path}")
            except Exception as e:
                print(f"optimizer resume failed ({e}); fresh optimizer state")
        for i, rate in enumerate(self.ema_rate):
            ema_path = os.path.join(self.save_dir, f"ema_{rate}_{self.step:06d}")
            if os.path.isdir(ema_path):
                try:
                    self.ema_params[i] = load_pytree(ema_path, target=self.params)
                    print(f"restored EMA {rate} from {ema_path}")
                except Exception as e:
                    print(f"EMA resume failed ({e}); EMA restarted from params")

    def save(self):
        os.makedirs(self.save_dir, exist_ok=True)
        save_pytree(os.path.join(self.save_dir, f"model{self.step:06d}"), self.params)
        for rate, ema in zip(self.ema_rate, self.ema_params):
            save_pytree(os.path.join(self.save_dir, f"ema_{rate}_{self.step:06d}"), ema)
        save_pytree(
            os.path.join(self.save_dir, f"opt{self.step:06d}"),
            {"opt_state": self.opt_state, "rng": np.asarray(self.rng)},
        )

    def run_loop(self, max_steps: Optional[int] = None):
        while (not self.lr_anneal_steps or self.step < self.lr_anneal_steps) and (
            max_steps is None or self.step < max_steps
        ):
            batch = next(self.data)
            batch = batch[0] if isinstance(batch, tuple) else batch
            self.run_step(batch)
            if self.step % self.log_interval == 0:
                logger.logkv("step", self.step)
                logger.logkv("samples", (self.step + 1) * self.batch_size)
                logger.dumpkvs()
            if self.step % self.save_interval == 0:
                self.save()
            # integration-test hook kept from the reference (train_util.py:175-177)
            if os.environ.get("DIFFUSION_TRAINING_TEST", "") and self.step > 0:
                return
        if (self.step - 1) % self.save_interval != 0:
            self.save()
