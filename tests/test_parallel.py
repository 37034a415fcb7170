"""Multi-device training correctness on the forced 8-CPU-device mesh.

Builder-side evidence for the driver's ``dryrun_multichip`` signal: the
dp-sharded and dp×tp-sharded DiffWave train steps must match the
single-device step numerically (same loss, same updated params). Replaces
the reference's DP mechanisms P1-P3 (SURVEY.md §2.8).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.models import WaveNet
from diffusion_model_for_audio_defense_tpu.parallel import device_mesh
from diffusion_model_for_audio_defense_tpu.train import (
    make_diffwave_train_step,
    wavenet_param_sharding,
)

TINY_WN = dict(res_channels=16, skip_channels=16, num_res_layers=4, dilation_cycle=2,
               diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
               diffusion_step_embed_dim_out=16)


@pytest.fixture(scope="module")
def setup():
    model = WaveNet(**TINY_WN)
    schedule = linear_schedule(200)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 256)), jnp.zeros((1, 1)))
    opt = optax.adam(2e-4)
    batch = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 1, 256)), jnp.float32
    )
    rng = jax.random.PRNGKey(1)
    apply_fn = lambda p, x, t: model.apply(p, x, t)

    step1 = make_diffwave_train_step(apply_fn, schedule, opt, mesh=None, donate=False)
    p1, s1, l1 = step1(params, opt.init(params), batch, rng)
    return model, schedule, params, opt, batch, rng, apply_fn, (p1, s1, l1)


def _assert_matches_single(p1, l1, p2, l2, atol=1e-5):
    np.testing.assert_allclose(float(l1), float(l2), atol=atol, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=1e-4)


def test_dp_step_matches_single_device(setup):
    model, schedule, params, opt, batch, rng, apply_fn, (p1, s1, l1) = setup
    mesh = device_mesh(("dp",), (8,))
    assert mesh.devices.size == 8
    step = make_diffwave_train_step(apply_fn, schedule, opt, mesh=mesh, donate=False)
    p2, s2, l2 = step(params, opt.init(params), batch, rng)
    _assert_matches_single(p1, l1, p2, l2)


def test_dp_tp_step_matches_single_device(setup):
    model, schedule, params, opt, batch, rng, apply_fn, (p1, s1, l1) = setup
    mesh = device_mesh(("dp", "tp"), (4, 2))
    shardings = wavenet_param_sharding(mesh, params)
    params_tp = jax.tree.map(jax.device_put, params, shardings)
    # at least one large kernel must actually be split over tp
    assert any(
        s.spec != jax.sharding.PartitionSpec()
        for s in jax.tree.leaves(shardings, is_leaf=lambda x: hasattr(x, "spec"))
    )
    step = make_diffwave_train_step(apply_fn, schedule, opt, mesh=mesh, donate=False)
    p2, s2, l2 = step(params_tp, opt.init(params_tp), batch, rng)
    _assert_matches_single(p1, l1, p2, l2)


def test_dryrun_multichip_inline():
    # under the test conftest we already have 8 CPU devices, so the driver
    # entry runs its sharded step in-process
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)
    finally:
        sys.path.pop(0)
