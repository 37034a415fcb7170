"""Oracles against the ACTUAL reference ``improved_diffusion.gaussian_diffusion``
(OpenAI) class — not a re-derivation. Covers the learned-range posterior,
training losses with the frozen-mean VB term, DDIM forward/reverse steps,
the ancestral sampling loop, respacing, and the full bpd loop, with
``torch.randn_like`` monkeypatched to replay the exact JAX noise sequence.
"""

import importlib
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_model_for_audio_defense_tpu.purify.diffusion_math import (
    GaussianDiffusion,
    get_named_beta_schedule,
)
from diffusion_model_for_audio_defense_tpu.purify.respace import SpacedDiffusion, space_timesteps

REFERENCE = "/root/reference"
PKG = "diffusion_models.Improved_Diffusion_Unconditional.improved_diffusion"
T = 50
SHAPE = (2, 1, 8, 8)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "diffusion_models")),
    reason="reference repo not present",
)


@pytest.fixture(scope="module")
def ref():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    gd = importlib.import_module(PKG + ".gaussian_diffusion")
    rs = importlib.import_module(PKG + ".respace")
    return gd, rs


class _InjectedRandnLike:
    """Replay a queue of arrays through ``torch.randn_like``."""

    def __init__(self, queue):
        self.queue = [np.asarray(q, dtype=np.float32) for q in queue]

    def __enter__(self):
        self._orig = torch.randn_like
        torch.randn_like = lambda x, **kw: torch.from_numpy(self.queue.pop(0).copy())
        return self

    def __exit__(self, *exc):
        torch.randn_like = self._orig


def _mk(ref, mean_type="eps", var_type="learned_range", loss_type="rescaled_mse"):
    gd, _ = ref
    betas = get_named_beta_schedule("linear", T)
    tref = gd.GaussianDiffusion(
        betas=betas,
        model_mean_type={"eps": gd.ModelMeanType.EPSILON,
                         "xstart": gd.ModelMeanType.START_X,
                         "xprev": gd.ModelMeanType.PREVIOUS_X}[mean_type],
        model_var_type={"learned_range": gd.ModelVarType.LEARNED_RANGE,
                        "fixed_large": gd.ModelVarType.FIXED_LARGE,
                        "fixed_small": gd.ModelVarType.FIXED_SMALL}[var_type],
        loss_type={"mse": gd.LossType.MSE, "rescaled_mse": gd.LossType.RESCALED_MSE,
                   "kl": gd.LossType.KL, "rescaled_kl": gd.LossType.RESCALED_KL}[loss_type],
    )
    ours = GaussianDiffusion(betas=betas, model_mean_type=mean_type,
                             model_var_type=var_type, loss_type=loss_type)
    return tref, ours


def _const_model(out_np):
    jm = lambda x, t: jnp.asarray(out_np)
    tm = lambda x, t, **kw: torch.from_numpy(out_np.copy())
    return jm, tm


def test_schedule_and_q_process_oracle(ref, rng_np):
    tref, ours = _mk(ref)
    np.testing.assert_allclose(np.asarray(ours.betas), tref.betas, rtol=1e-12)
    x0 = rng_np.standard_normal(SHAPE).astype(np.float32)
    t = np.array([3, 41])
    noise = rng_np.standard_normal(SHAPE).astype(np.float32)
    got = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    want = tref.q_sample(torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(noise)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    gm, gv, gl = ours.q_posterior_mean_variance(jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t))
    wm, wv, wl = tref.q_posterior_mean_variance(
        torch.from_numpy(x0), torch.from_numpy(noise), torch.from_numpy(t))
    np.testing.assert_allclose(np.asarray(gm), wm.numpy(), atol=1e-6)
    # ours keeps (B,1,1,1) broadcastable logvar; the reference expands it
    np.testing.assert_allclose(np.broadcast_to(np.asarray(gl), wl.shape), wl.numpy(), atol=1e-6)


def test_p_mean_variance_learned_range_oracle(ref, rng_np):
    tref, ours = _mk(ref)
    x = rng_np.standard_normal(SHAPE).astype(np.float32)
    t = np.array([7, 30])
    out_np = rng_np.standard_normal((SHAPE[0], 2 * SHAPE[1]) + SHAPE[2:]).astype(np.float32) * 0.3
    jm, tm = _const_model(out_np)
    got = ours.p_mean_variance(jm, jnp.asarray(x), jnp.asarray(t), clip_denoised=True)
    want = tref.p_mean_variance(tm, torch.from_numpy(x), torch.from_numpy(t), clip_denoised=True)
    for k in ("mean", "variance", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(np.asarray(got[k]), want[k].numpy(), atol=2e-5, rtol=1e-4,
                                   err_msg=k)


def test_training_losses_oracle(ref, rng_np):
    tref, ours = _mk(ref)  # rescaled_mse + learned_range → mse + vb terms
    x0 = rng_np.standard_normal(SHAPE).astype(np.float32)
    t = np.array([0, 25])
    out_np = rng_np.standard_normal((SHAPE[0], 2 * SHAPE[1]) + SHAPE[2:]).astype(np.float32) * 0.3
    jm, tm = _const_model(out_np)
    rng = jax.random.PRNGKey(1)
    got = ours.training_losses(jm, jnp.asarray(x0), jnp.asarray(t), rng)
    noise = np.asarray(jax.random.normal(rng, SHAPE, dtype=jnp.float32))
    want = tref.training_losses(tm, torch.from_numpy(x0), torch.from_numpy(t),
                                noise=torch.from_numpy(noise.copy()))
    for k in ("loss", "mse", "vb"):
        np.testing.assert_allclose(np.asarray(got[k]), want[k].numpy(), atol=1e-4, rtol=1e-4,
                                   err_msg=k)


def test_ddim_steps_oracle(ref, rng_np):
    tref, ours = _mk(ref, var_type="fixed_small", loss_type="mse")
    x = rng_np.standard_normal(SHAPE).astype(np.float32)
    t = np.array([5, 20])
    eps_np = rng_np.standard_normal(SHAPE).astype(np.float32) * 0.3
    jm, tm = _const_model(eps_np)
    got_s, _ = ours.ddim_sample(jm, jnp.asarray(x), jnp.asarray(t), jax.random.PRNGKey(0),
                                clip_denoised=False, eta=0.0)
    want = tref.ddim_sample(tm, torch.from_numpy(x), torch.from_numpy(t),
                            clip_denoised=False, eta=0.0)
    np.testing.assert_allclose(np.asarray(got_s), want["sample"].numpy(), atol=2e-5, rtol=1e-4)
    got_r, _ = ours.ddim_reverse_sample(jm, jnp.asarray(x), jnp.asarray(t), clip_denoised=False)
    want_r = tref.ddim_reverse_sample(tm, torch.from_numpy(x), torch.from_numpy(t),
                                      clip_denoised=False)
    np.testing.assert_allclose(np.asarray(got_r), want_r["sample"].numpy(), atol=2e-5, rtol=1e-4)


def test_p_sample_loop_oracle(ref, rng_np):
    tref, ours = _mk(ref, var_type="fixed_large", loss_type="mse")
    eps_np = rng_np.standard_normal(SHAPE).astype(np.float32) * 0.1
    jm, tm = _const_model(eps_np)
    t_start = 8
    x_t = rng_np.standard_normal(SHAPE).astype(np.float32)
    rng = jax.random.PRNGKey(5)
    got = np.asarray(ours.p_sample_loop(jm, rng=rng, x_t=jnp.asarray(x_t), t_start=t_start,
                                        clip_denoised=True))
    keys = jax.random.split(rng, t_start)
    queue = [np.asarray(jax.random.normal(k, SHAPE, dtype=jnp.float32)) for k in keys]
    with _InjectedRandnLike(queue), torch.no_grad():
        img = torch.from_numpy(x_t.copy())
        for i in range(t_start - 1, -1, -1):
            tt = torch.full((SHAPE[0],), i, dtype=torch.long)
            img = tref.p_sample(tm, img, tt, clip_denoised=True)["sample"]
    np.testing.assert_allclose(got, img.numpy(), atol=1e-4, rtol=1e-4)


def test_respacing_oracle(ref):
    _, rs = ref
    betas = get_named_beta_schedule("linear", T)
    use = space_timesteps(T, "ddim10")
    assert use == rs.space_timesteps(T, "ddim10")
    ours = SpacedDiffusion(use_timesteps=use, betas=betas)
    gd = importlib.import_module(PKG + ".gaussian_diffusion")
    theirs = rs.SpacedDiffusion(
        use_timesteps=use, betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_LARGE,
        loss_type=gd.LossType.MSE,
    )
    np.testing.assert_allclose(np.asarray(ours.betas), theirs.betas, rtol=1e-10)
    assert ours.timestep_map == theirs.timestep_map


def test_calc_bpd_loop_oracle(ref, rng_np):
    tref, ours = _mk(ref, var_type="fixed_small", loss_type="mse")
    x0 = (rng_np.standard_normal(SHAPE).astype(np.float32) * 0.3).clip(-1, 1)
    eps_np = rng_np.standard_normal(SHAPE).astype(np.float32) * 0.1
    jm, tm = _const_model(eps_np)
    rng = jax.random.PRNGKey(9)
    got = ours.calc_bpd_loop(jm, jnp.asarray(x0), rng, clip_denoised=True)
    keys = jax.random.split(rng, T)
    queue = [np.asarray(jax.random.normal(k, SHAPE, dtype=jnp.float32)) for k in keys]
    with _InjectedRandnLike(queue), torch.no_grad():
        want = tref.calc_bpd_loop(tm, torch.from_numpy(x0), clip_denoised=True)
    for k in ("total_bpd", "prior_bpd", "vb", "xstart_mse", "mse"):
        np.testing.assert_allclose(np.asarray(got[k]), want[k].numpy(), atol=2e-4, rtol=2e-4,
                                   err_msg=k)
