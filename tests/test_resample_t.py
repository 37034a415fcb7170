"""Loss-aware timestep sampler: oracle vs the reference class + behavior.

The reference ``improved_diffusion/resample.py`` LossSecondMomentResampler's
``update_with_all_losses``/``weights`` are dist-free, so they can be driven
directly as an oracle (the all_gather lives in ``update_with_local_losses``,
which the single-controller rebuild deletes by construction).
"""

import sys

import jax
import numpy as np
import pytest

from diffusion_model_for_audio_defense_tpu.train.resample_t import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)

REF = "/root/reference/diffusion_models/Improved_Diffusion_Unconditional"


def _ref_resampler(T):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from improved_diffusion.resample import LossSecondMomentResampler as RefLSM
    except Exception as e:  # pragma: no cover - only off this machine
        pytest.skip(f"reference improved_diffusion unavailable: {e}")

    class _Diffusion:
        num_timesteps = T

    # the reference uses the np.int alias removed in numpy>=1.24
    had = hasattr(np, "int")
    if not had:
        np.int = int
    try:
        return RefLSM(_Diffusion())
    finally:
        if not had:
            del np.int


def test_loss_second_moment_weights_oracle():
    T, H = 7, 10
    ours = LossSecondMomentResampler(T, history_per_term=H)
    ref = _ref_resampler(T)
    rng = np.random.default_rng(0)

    # stream identical (t, loss) updates through both; check weights at
    # several points: cold (uniform), mid-warmup, warmed, and after the
    # rolling history starts evicting
    for step in range(40):
        ts = rng.integers(0, T, size=6)
        losses = rng.gamma(2.0, 1.0, size=6)
        np.testing.assert_allclose(ours.weights(), ref.weights(), rtol=1e-12)
        ours.update_with_all_losses(ts, losses)
        ref.update_with_all_losses(list(ts), list(losses))
    assert ours._warmed_up()
    w = ours.weights()
    np.testing.assert_allclose(w, ref.weights(), rtol=1e-12)
    # warmed-up weights: normalized with the uniform floor mixed in
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)
    assert (w >= ours.uniform_prob / T - 1e-15).all()


def test_loss_second_moment_importance_weights_unbiased():
    T = 5
    ours = LossSecondMomentResampler(T, history_per_term=2)
    rng = np.random.default_rng(1)
    for _ in range(10):
        ts = rng.integers(0, T, size=8)
        ours.update_with_all_losses(ts, rng.gamma(2.0, 1.0, size=8))
    ts, iw = ours.sample(4096, jax.random.PRNGKey(0))
    ts, iw = np.asarray(ts), np.asarray(iw)
    assert ts.min() >= 0 and ts.max() < T
    # reference formula: weights = 1 / (T * p[t]) — so E_p[w * f(t)] is the
    # uniform average; with f = indicator the estimate of each bin is ~1/T
    p = ours.weights()
    np.testing.assert_allclose(iw, 1.0 / (T * p[ts]), rtol=1e-6)
    for t in range(T):
        est = iw[ts == t].sum() / len(ts)
        np.testing.assert_allclose(est, 1.0 / T, rtol=0.15)


def test_uniform_sampler_and_factory():
    s = create_named_schedule_sampler("uniform", 20)
    assert isinstance(s, UniformSampler)
    t, w = s.sample(16, jax.random.PRNGKey(0))
    assert t.shape == (16,) and (np.asarray(w) == 1.0).all()
    assert int(np.asarray(t).max()) < 20
    assert isinstance(
        create_named_schedule_sampler("loss-second-moment", 20),
        LossSecondMomentResampler,
    )
    with pytest.raises(NotImplementedError):
        create_named_schedule_sampler("nope", 20)
