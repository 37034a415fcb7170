"""DiffWave purifier training — pjit update step.

Rebuild of ``DiffWave_Unconditional/{train.py,util.py:161-185,
distributed_util.py}``: the ε-MSE objective (sample t ~ U[0,T), q-sample,
``MSE(ε_θ, z)``) as one jitted update step over a device mesh. The
reference's backward-hook bucketed all-reduce (distributed_util.py:97-148)
disappears: gradients are reduced by XLA's ``psum`` inserted automatically
from the shardings (dp over batch, optional tp over WaveNet channels).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.schedules import DiffusionSchedule


def q_sample_draws(schedule: DiffusionSchedule, batch: jnp.ndarray, rng):
    """Draw (x_t, t, z) for the ε-MSE objective — ONE implementation shared
    by the GSPMD and shard_map train steps, so both mesh paths see identical
    noise by construction (the parity test depends on it)."""
    k_t, k_z = jax.random.split(rng)
    bsz = batch.shape[0]
    t = jax.random.randint(k_t, (bsz,), 0, schedule.T)
    z = jax.random.normal(k_z, batch.shape, dtype=batch.dtype)
    a = schedule.sqrt_alpha_bar[t][:, None, None]
    b = schedule.sqrt_one_minus_alpha_bar[t][:, None, None]
    return a * batch + b * z, t, z


def diffwave_loss(apply_fn, params, schedule: DiffusionSchedule, batch: jnp.ndarray, rng) -> jnp.ndarray:
    """ε-prediction MSE (reference ``util.py:161-185``). batch: (B, 1, L)."""
    x_t, t, z = q_sample_draws(schedule, batch, rng)
    eps = apply_fn(params, x_t, t.astype(jnp.float32)[:, None])
    return jnp.mean((eps - z) ** 2)


def wavenet_param_sharding(mesh: Mesh, params, tp_axis: str = "tp"):
    """Tensor-parallel shardings for WaveNet params: conv kernels split on the
    output-channel dim, dense kernels on the output dim, 1-D params replicated.
    XLA/GSPMD inserts the matching collectives."""

    def spec(x):
        if tp_axis not in mesh.axis_names:
            return NamedSharding(mesh, P())
        if x.ndim == 3 and x.shape[-1] % mesh.shape[tp_axis] == 0:
            return NamedSharding(mesh, P(None, None, tp_axis))
        if x.ndim == 2 and x.shape[-1] % mesh.shape[tp_axis] == 0:
            return NamedSharding(mesh, P(None, tp_axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def make_diffwave_train_step(
    apply_fn,
    schedule: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    dp_axis: str = "dp",
    tp_axis: str = "tp",
    donate: bool = True,
    use_shard_map: bool = False,
):
    """Returns ``step(params, opt_state, batch, rng) -> (params, opt_state, loss)``.

    With a mesh: batch sharded over ``dp``, params optionally sharded over
    ``tp`` (pass params already device_put with ``wavenet_param_sharding``).

    ``use_shard_map=True`` (mesh required) runs the model fwd/bwd inside a
    ``shard_map`` over ``dp`` with replicated params and a grad ``pmean`` —
    the composition that lets an ``apply_fn`` backed by the Pallas stack
    (which GSPMD cannot partition) keep its single-chip speedup on a
    multi-chip mesh. The t/z draws happen OUTSIDE the shard_map from the
    same global key as the GSPMD path, so both mesh paths see identical
    noise and match to kernel-numerics tolerance. Replaces the reference's
    backward-hook bucketed all-reduce (distributed_util.py:97-148) for the
    kernel path.
    """

    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(partial(diffwave_loss, apply_fn))(params, schedule, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    batch_sharding = NamedSharding(mesh, P(dp_axis))
    rng_sharding = NamedSharding(mesh, P())

    if use_shard_map:
        from jax import shard_map

        def sm_step(params, opt_state, batch, rng):
            # identical q-sample draws to the GSPMD path (shared helper):
            # one global key, arrays sharded over dp by their shardings
            # (elementwise ops — XLA partitions them without collectives)
            x_t, t, z = q_sample_draws(schedule, batch, rng)

            def per_device(params, x_t, t, z):
                def loss_fn(p):
                    eps = apply_fn(p, x_t, t.astype(jnp.float32)[:, None])
                    # equal shards ⇒ mean of per-device means == global mean
                    return jnp.mean((eps - z) ** 2)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                return (
                    jax.lax.pmean(loss, dp_axis),
                    jax.lax.pmean(grads, dp_axis),
                )

            loss, grads = shard_map(
                per_device,
                mesh=mesh,
                in_specs=(P(), P(dp_axis), P(dp_axis), P(dp_axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )(params, x_t, t, z)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(
            sm_step,
            in_shardings=(None, None, batch_sharding, rng_sharding),
            donate_argnums=(0, 1) if donate else (),
        )

    return jax.jit(
        step,
        in_shardings=(None, None, batch_sharding, rng_sharding),
        donate_argnums=(0, 1) if donate else (),
    )


class DiffWaveTrainer:
    """Reference ``DiffWave_Unconditional/train.py:19-138`` loop: Adam 2e-4,
    ε-MSE steps, checkpoint every ``iters_per_ckpt`` (resume from the highest
    saved iteration), loss logging every ``iters_per_logging``."""

    def __init__(
        self,
        model,
        schedule: DiffusionSchedule,
        learning_rate: float = 2e-4,
        output_directory: str = "exp/logs/checkpoint",
        iters_per_ckpt: int = 10000,
        iters_per_logging: int = 100,
        n_iters: int = 1_000_001,
        mesh: Optional[Mesh] = None,
        segment_length: int = 16000,
        rng=None,
        use_pallas: bool = False,
    ):
        import os

        from ..core.checkpoint import load_pytree, save_pytree
        from . import logger as _logger

        self.model = model
        self.schedule = schedule
        self.output_directory = output_directory
        self.iters_per_ckpt = iters_per_ckpt
        self.iters_per_logging = iters_per_logging
        self.n_iters = n_iters
        self.logger = _logger
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._save, self._load = save_pytree, load_pytree

        self.rng, k = jax.random.split(self.rng)
        self.params = model.init(k, jnp.zeros((1, 1, segment_length)), jnp.zeros((1, 1)))
        self.opt = optax.adam(learning_rate)
        self.opt_state = self.opt.init(self.params)
        self.n_iter = self._try_resume()
        if use_pallas:
            # fused Pallas stack with the Pallas VJP (1.77x the XLA fwd+bwd
            # at bf16 on v5e — perf/lab8_bwd.py). On a mesh the step runs the
            # kernel per-device under shard_map with a grad pmean (GSPMD
            # cannot partition a pallas_call), keeping the kernel speedup on
            # multi-chip; params stay replicated (tp requires the XLA path).
            from ..ops.pallas.wavenet_stack import wavenet_apply_stack

            apply_fn = lambda p, x, t: wavenet_apply_stack(
                p, x, t, num_res_layers=model.num_res_layers,
                dilation_cycle=model.dilation_cycle,
                dtype=model.dtype or jnp.float32, differentiable=True)
        else:
            apply_fn = lambda p, x, t: model.apply(p, x, t)
        self.step_fn = make_diffwave_train_step(
            apply_fn, schedule, self.opt, mesh=mesh, donate=False,
            use_shard_map=use_pallas and mesh is not None,
        )

    def _try_resume(self) -> int:
        """find_max_epoch-style resume (reference ``util.py:21-43``).

        Restores the FULL train state — params, Adam moments, PRNG — matching
        the reference's ``{model_state_dict, optimizer_state_dict}`` round
        trip (``train.py:82-101,131-136``). Older params-only checkpoints
        still load (optimizer state re-initialized).
        """
        import os

        import numpy as np

        if not os.path.isdir(self.output_directory):
            return 0
        iters = [int(d.split("_")[-1]) for d in os.listdir(self.output_directory) if d.startswith("ckpt_")]
        if not iters:
            return 0
        it = max(iters)
        path = os.path.join(self.output_directory, f"ckpt_{it}")
        try:
            # branch on checkpoint STRUCTURE via orbax metadata (no array
            # reads) so legacy params-only checkpoints are detected without
            # a blanket except that could silently downgrade a failed full
            # restore to params-only; each path then reads the data ONCE
            import orbax.checkpoint as ocp

            meta = ocp.PyTreeCheckpointer().metadata(os.path.abspath(path))
            has_opt = "opt_state" in meta.item_metadata.tree
            if has_opt:
                state = self._load(
                    path,
                    target={
                        "params": self.params,
                        "opt_state": self.opt_state,
                        "rng": np.asarray(self.rng),
                    },
                )
                self.params = state["params"]
                self.opt_state = state["opt_state"]
                self.rng = jnp.asarray(state["rng"])
                print(f"resumed from iteration {it} (params+opt+rng)")
            else:
                raw = self._load(path)
                self.params = raw["params"]
                self.opt_state = self.opt.init(self.params)
                print(f"resumed from iteration {it} (params only; fresh optimizer)")
            return it
        except Exception as e:  # mirror the reference's tolerant resume (train.py:96-98)
            print(f"resume failed ({e}); starting fresh")
            return 0

    def save_checkpoint(self):
        import os

        import numpy as np

        os.makedirs(self.output_directory, exist_ok=True)
        self._save(
            os.path.join(self.output_directory, f"ckpt_{self.n_iter}"),
            {"params": self.params, "opt_state": self.opt_state, "rng": np.asarray(self.rng)},
        )

    def train(self, data_iter, max_iters: Optional[int] = None):
        # max_iters counts ADDITIONAL iterations for this call; 0 is a valid
        # "already at target, train nothing" request (resume-at-end), so the
        # None check must not treat it as falsy.
        end = self.n_iters if max_iters is None else min(self.n_iters, self.n_iter + max_iters)
        loss = jnp.float32(float("nan"))  # resumed-at-end / max_iters=0: no steps run
        while self.n_iter < end:
            batch = next(data_iter)
            x = jnp.asarray(batch if not isinstance(batch, dict) else batch["samples"])
            if x.ndim == 2:
                x = x[:, None, :]
            self.rng, k = jax.random.split(self.rng)
            self.params, self.opt_state, loss = self.step_fn(self.params, self.opt_state, x, k)
            if self.n_iter % self.iters_per_logging == 0:
                self.logger.logkv("iteration", self.n_iter)
                self.logger.logkv("loss", float(loss))
                self.logger.dumpkvs()
            self.n_iter += 1
            if self.n_iter % self.iters_per_ckpt == 0:
                self.save_checkpoint()
        return float(loss)
