"""Sequence parallelism: time-axis sharding of the WaveNet under GSPMD.

Validates the beyond-reference long-audio path (parallel/sequence.py): the
dilated convs must lower to halo exchanges (collective-permute), never to
sequence gathers, and the sharded forward must match the unsharded one.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.models import WaveNet
from diffusion_model_for_audio_defense_tpu.parallel import (
    device_mesh,
    make_sp_forward,
    sequence_sharding,
    shard_waveform,
)


def _tiny_model(rng_np):
    model = WaveNet(res_channels=32, skip_channels=32, num_res_layers=6, dilation_cycle=3,
                    diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
                    diffusion_step_embed_dim_out=16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 2048)), jnp.zeros((1, 1)))
    v = flax.core.unfreeze(v)
    fc2 = v["params"]["final_conv2"]["Conv_0"]  # zero-init head -> randomize
    fc2["kernel"] = jnp.asarray(rng_np.standard_normal(fc2["kernel"].shape).astype(np.float32) * 0.05)
    fc2["bias"] = jnp.asarray(rng_np.standard_normal(fc2["bias"].shape).astype(np.float32) * 0.05)
    return model, v


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)


def test_sp_forward_matches_and_uses_halo_exchange(rng_np):
    model, v = _tiny_model(rng_np)
    x = jnp.asarray(rng_np.standard_normal((2, 1, 2048)).astype(np.float32) * 0.3)
    t = jnp.ones((2, 1), jnp.float32) * 3
    ref = model.apply(v, x, t)

    mesh = device_mesh(("sp",))
    assert mesh.devices.size == 8
    fwd = make_sp_forward(model.apply, mesh)
    out = fwd(v, shard_waveform(mesh, x), t)
    assert out.sharding.spec == P(None, None, "sp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    hlo = fwd.lower(v, x, t).compile().as_text()
    # each dilated conv must halo-exchange, never gather the sequence
    assert hlo.count("collective-permute") >= model.num_res_layers
    assert "all-gather" not in hlo


def test_dp_sp_combined_mesh(rng_np):
    model, v = _tiny_model(rng_np)
    x = jnp.asarray(rng_np.standard_normal((4, 1, 1024)).astype(np.float32) * 0.3)
    t = jnp.ones((4, 1), jnp.float32) * 5
    ref = model.apply(v, x, t)

    mesh = device_mesh(("dp", "sp"), (2, 4))
    fwd = make_sp_forward(model.apply, mesh, batch_axis="dp")
    out = fwd(v, shard_waveform(mesh, x, batch_axis="dp"), t)
    assert out.sharding.spec == P("dp", None, "sp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_sp_purify_one_shot(rng_np):
    """one_shot_denoise through an sp-sharded eps net matches unsharded."""
    from diffusion_model_for_audio_defense_tpu.purify.ddpm import one_shot_denoise, q_jump

    model, v = _tiny_model(rng_np)
    sched = linear_schedule(200)
    mesh = device_mesh(("sp",))
    eps_fn = lambda x, t: model.apply(v, x, t[:, None])

    x0 = jnp.asarray(rng_np.standard_normal((2, 1, 2048)).astype(np.float32) * 0.2)
    xt = q_jump(sched, x0, 10, jax.random.PRNGKey(1))
    ref = one_shot_denoise(eps_fn, sched, xt, 10)

    wave = sequence_sharding(mesh)
    fn = jax.jit(lambda xt: one_shot_denoise(eps_fn, sched, xt, 10), out_shardings=wave)
    out = fn(jax.device_put(xt, wave))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_pgd_attack_dp_sharded_matches(rng_np):
    """Adaptive attack with the batch dp-sharded over 8 devices produces the
    same adversarial examples as unsharded — attack eval scales by data
    parallelism with no code changes (pure jitted steps + GSPMD)."""
    from diffusion_model_for_audio_defense_tpu.attacks import AudioAttack

    mesh = device_mesh(("dp",))
    w = jnp.asarray(rng_np.standard_normal((64, 10)).astype(np.float32) * 0.3)

    def model_fn(x, rng=None):
        feats = jnp.tanh(x[:, 0, ::4].reshape(x.shape[0], -1, 64).mean(axis=1))
        return feats @ w

    x = jnp.asarray(rng_np.standard_normal((8, 1, 256)).astype(np.float32) * 0.2)
    y = jnp.asarray(rng_np.integers(0, 10, (8,)))

    def run(xin):
        atk = AudioAttack(model_fn, eps=0.05, max_iter_1=8, max_iter_2=0, norm="linf")
        adv, success = atk.generate(xin, y, targeted=False, rng=jax.random.PRNGKey(0))
        return np.asarray(adv)

    ref = run(x)
    xsh = jax.device_put(x, NamedSharding(mesh, P("dp")))
    out = run(xsh)
    np.testing.assert_allclose(out, ref, atol=1e-6)
