"""Pallas kernels composed with a multi-device mesh (interpret mode).

The ×8 certify extrapolation and the multi-chip training/attack claims rest
on the fused Pallas stack running per-device inside ``shard_map`` — a
composition GSPMD cannot produce on its own (it can't partition a
``pallas_call``). These tests exercise exactly that composition on the
forced 8-CPU-device mesh with ``interpret=True`` (VERDICT r2 #1/#2):

- the stack forward under ``shard_map`` over dp vs the unsharded XLA model
- certify's ``counts_fn`` with a Pallas ε-net vs the XLA ε-net
- the dp-mesh shard_map Pallas train step vs the GSPMD XLA mesh step
- gradients through a ``dp_shard_fn``-wrapped Pallas ε-net
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.models import WaveNet
from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack
from diffusion_model_for_audio_defense_tpu.parallel import device_mesh, dp_shard_fn, replicate

C, LAYERS, CYCLE, L = 128, 2, 2, 2048
EMB = dict(diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
           diffusion_step_embed_dim_out=16)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    model = WaveNet(res_channels=C, skip_channels=C, num_res_layers=LAYERS,
                    dilation_cycle=CYCLE, **EMB)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))
    # zero-init head → vacuous parity and no grad flow below it: randomize
    import flax

    variables = flax.core.unfreeze(variables)
    fc2 = variables["params"]["final_conv2"]["Conv_0"]
    rng = np.random.default_rng(1)
    variables["params"]["final_conv2"]["Conv_0"] = {
        "kernel": jnp.asarray(rng.standard_normal(fc2["kernel"].shape, ).astype(np.float32) * 0.05),
        "bias": jnp.asarray(rng.standard_normal(fc2["bias"].shape).astype(np.float32) * 0.05),
    }
    mesh = device_mesh(("dp",), (8,))
    rep = jax.tree.map(lambda a: jax.device_put(a, replicate(mesh)), variables)
    return model, rep, mesh


def _pallas_fn(variables, x, t2d, grad_params=True, differentiable=False):
    return wavenet_apply_stack(
        variables, x, t2d, num_res_layers=LAYERS, dilation_cycle=CYCLE,
        dtype=jnp.float32, differentiable=differentiable,
        grad_params=grad_params, interpret=True)


def test_pallas_stack_forward_under_shard_map(setup, rng_np):
    model, variables, mesh = setup
    x = jnp.asarray(rng_np.standard_normal((8, 1, L)).astype(np.float32) * 0.3)
    t = jnp.full((8, 1), 5.0, jnp.float32)

    sharded = dp_shard_fn(lambda xs, ts: _pallas_fn(variables, xs, ts), mesh)
    got = np.asarray(jax.jit(sharded)(x, t))
    want = np.asarray(model.apply(variables, x, t))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_certify_counts_pallas_matches_xla_on_mesh(setup):
    from diffusion_model_for_audio_defense_tpu.certify import make_smoothed_counts_fn
    from diffusion_model_for_audio_defense_tpu.core import compute_t_star

    model, variables, mesh = setup
    sched = linear_schedule(200)

    def classifier(xb):
        m = jnp.mean(xb, axis=(1, 2))
        return jnp.stack([m, -m], axis=-1)

    eps_xla = lambda x, t: model.apply(variables, x, t[:, None])
    eps_pal = lambda x, t: _pallas_fn(variables, x, t[:, None])

    kw = dict(num_classes=2, batch_size=4, mesh=mesh)
    fn_xla = make_smoothed_counts_fn(classifier, None, eps_xla, sched, **kw)
    fn_pal = make_smoothed_counts_fn(classifier, None, eps_pal, sched, **kw)

    sigma = 0.25
    t_star = compute_t_star(sched, sigma)
    sas = (1.0 / (1.0 + sigma**2)) ** 0.5
    x = jnp.full((1, 1, L), 0.5, jnp.float32)
    n = 100  # non-divisible → masking active on the mesh
    c_xla = np.asarray(fn_xla(x, sigma, t_star, sas, n, jax.random.PRNGKey(4)))
    c_pal = np.asarray(fn_pal(x, sigma, t_star, sas, n, jax.random.PRNGKey(4)))
    assert c_xla.sum() == n and c_pal.sum() == n
    # same keys → same noise; biased input keeps every argmax away from ties,
    # so the kernel path must reproduce the XLA counts exactly
    np.testing.assert_array_equal(c_pal, c_xla)


def test_train_step_shard_map_pallas_matches_gspmd_xla(setup, rng_np):
    from diffusion_model_for_audio_defense_tpu.train import make_diffwave_train_step

    model, variables, mesh = setup
    sched = linear_schedule(200)
    opt = optax.sgd(0.1)  # linear update: param diffs stay at kernel-numerics scale
    opt_state = opt.init(variables)
    batch = jnp.asarray(rng_np.standard_normal((8, 1, L)).astype(np.float32) * 0.3)
    rng = jax.random.PRNGKey(9)

    step_xla = make_diffwave_train_step(
        lambda p, x, t: model.apply(p, x, t), sched, opt, mesh=mesh, donate=False)
    step_pal = make_diffwave_train_step(
        lambda p, x, t: _pallas_fn(p, x, t, differentiable=True),
        sched, opt, mesh=mesh, donate=False, use_shard_map=True)

    p_x, _, loss_x = step_xla(variables, opt_state, batch, rng)
    p_p, _, loss_p = step_pal(variables, opt_state, batch, rng)
    assert abs(float(loss_x) - float(loss_p)) < 1e-5 * max(1.0, abs(float(loss_x)))
    flat_x = jax.tree.leaves(p_x)
    flat_p = jax.tree.leaves(p_p)
    for ax, ap in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(ap), np.asarray(ax), atol=2e-4, rtol=1e-3)


def test_grad_through_dp_sharded_pallas_eps(setup, rng_np):
    """Attack-mode composition: input gradient through the x-only Pallas VJP
    wrapped per-device with dp_shard_fn matches the XLA gradient."""
    model, variables, mesh = setup
    x = jnp.asarray(rng_np.standard_normal((8, 1, L)).astype(np.float32) * 0.3)
    t = jnp.full((8, 1), 3.0, jnp.float32)

    eps_sharded = dp_shard_fn(
        lambda xs, ts: _pallas_fn(variables, xs, ts, differentiable=True,
                                  grad_params=False), mesh)
    g_pal = np.asarray(jax.jit(jax.grad(lambda v: jnp.sum(eps_sharded(v, t) ** 2)))(x))
    g_xla = np.asarray(jax.grad(lambda v: jnp.sum(model.apply(variables, v, t) ** 2))(x))
    np.testing.assert_allclose(g_pal, g_xla, atol=5e-4, rtol=1e-3)
