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


def diffwave_loss(apply_fn, params, schedule: DiffusionSchedule, batch: jnp.ndarray, rng) -> jnp.ndarray:
    """ε-prediction MSE (reference ``util.py:161-185``). batch: (B, 1, L)."""
    k_t, k_z = jax.random.split(rng)
    bsz = batch.shape[0]
    t = jax.random.randint(k_t, (bsz,), 0, schedule.T)
    z = jax.random.normal(k_z, batch.shape, dtype=batch.dtype)
    a = schedule.sqrt_alpha_bar[t][:, None, None]
    b = schedule.sqrt_one_minus_alpha_bar[t][:, None, None]
    x_t = a * batch + b * z
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
):
    """Returns ``step(params, opt_state, batch, rng) -> (params, opt_state, loss)``.

    With a mesh: batch sharded over ``dp``, params optionally sharded over
    ``tp`` (pass params already device_put with ``wavenet_param_sharding``).
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
    return jax.jit(
        step,
        in_shardings=(None, None, batch_sharding, rng_sharding),
        donate_argnums=(0, 1) if donate else (),
    )
