"""Training infrastructure: loss descends on toy data, EMA, samplers, logger."""

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.models import WaveNet, create_model
from diffusion_model_for_audio_defense_tpu.purify.diffusion_math import create_gaussian_diffusion
from diffusion_model_for_audio_defense_tpu.train import (
    ClassifierTrainer,
    DiffWaveTrainer,
    LossSecondMomentResampler,
    TrainLoop,
    UniformSampler,
    create_named_schedule_sampler,
    ema_update,
    pgd_attack_waveform,
)
from diffusion_model_for_audio_defense_tpu.train import logger as tlog

TINY_WN = dict(res_channels=8, skip_channels=8, num_res_layers=2, dilation_cycle=2,
               diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
               diffusion_step_embed_dim_out=16)


def test_diffwave_trainer_descends(tmp_path, rng_np):
    from diffusion_model_for_audio_defense_tpu.train import diffwave_loss

    model = WaveNet(**TINY_WN)
    sched = linear_schedule(20)
    trainer = DiffWaveTrainer(model, sched, learning_rate=1e-3,
                              output_directory=str(tmp_path), iters_per_ckpt=10,
                              iters_per_logging=1000, segment_length=128)
    batch = jnp.asarray(rng_np.standard_normal((4, 1, 128)).astype(np.float32) * 0.1)
    data = itertools.cycle([np.asarray(batch)])
    eval_loss = lambda p: float(
        diffwave_loss(lambda pp, x, t: model.apply(pp, x, t), p, sched, batch, jax.random.PRNGKey(123))
    )
    before = eval_loss(trainer.params)
    trainer.train(iter(data), max_iters=60)
    after = eval_loss(trainer.params)
    assert after < before, (before, after)
    # checkpoint written and resumable
    assert any(d.startswith("ckpt_") for d in os.listdir(tmp_path))
    t2 = DiffWaveTrainer(model, linear_schedule(20), output_directory=str(tmp_path), segment_length=128)
    assert t2.n_iter > 0
    # max_iters counts ADDITIONAL iters; 0 must mean "train nothing", not
    # "unlimited" (falsy-zero regression: a resumed-at-target run span
    # toward n_iters=1M)
    n_before = t2.n_iter
    t2.train(iter(data), max_iters=0)
    assert t2.n_iter == n_before


def test_improved_diffusion_trainloop(tmp_path, rng_np):
    from diffusion_model_for_audio_defense_tpu.models.unet import create_unet

    from conftest import train_wrapper

    model = create_unet(num_channels=16, num_res_blocks=1, dropout=0.0)
    d = create_gaussian_diffusion(steps=20)
    wrapped_model = train_wrapper(model, d)
    data = itertools.cycle([np.asarray(rng_np.standard_normal((4, 1, 32, 32)), np.float32)])
    tlog.configure(str(tmp_path), ["csv"])
    loop = TrainLoop(wrapped_model, d, iter(data), batch_size=4, microbatch=2, lr=1e-3,
                     save_interval=1000, save_dir=str(tmp_path / "ck"))
    loop.run_loop(max_steps=3)
    assert loop.step == 3
    # DIFFUSION_TRAINING_TEST hook
    os.environ["DIFFUSION_TRAINING_TEST"] = "1"
    try:
        loop.run_loop(max_steps=100)
        assert loop.step == 4
    finally:
        del os.environ["DIFFUSION_TRAINING_TEST"]


def test_classifier_trainer_modes_learn(rng_np, tmp_path):
    model = create_model("m5", num_classes=2)
    # toy separable task: positive-mean vs negative-mean waveforms
    xs = np.concatenate([rng_np.standard_normal((16, 1, 8192)) * 0.05 + 0.1,
                         rng_np.standard_normal((16, 1, 8192)) * 0.05 - 0.1]).astype(np.float32)
    ys = np.concatenate([np.zeros(16, np.int64), np.ones(16, np.int64)])

    class Loader:
        def set_epoch(self, e):
            pass

        def __iter__(self):
            yield {"samples": xs[:, 0, :], "target": ys}

    tlog.configure(str(tmp_path), ["csv"])
    for mode in ("vanilla", "gaussian", "mixup"):
        tr = ClassifierTrainer(model, transform=None, mode=mode, lr=0.05, sigma=0.05,
                               sample_input=jnp.zeros((1, 1, 8192)), save_dir=str(tmp_path / mode))
        for epoch in range(6):
            tr.train_epoch(Loader(), epoch)
        loss, acc = tr.evaluate(Loader())
        assert acc > 0.8, (mode, acc)
        tr.maybe_checkpoint(loss, acc, "vanilla")
        assert os.path.isdir(str(tmp_path / mode))


def test_adv_and_jacobian_modes_run(rng_np):
    model = create_model("m5", num_classes=2)
    xs = rng_np.standard_normal((8, 1, 8192)).astype(np.float32) * 0.05
    ys = np.zeros(8, np.int64)

    class Loader:
        def set_epoch(self, e):
            pass

        def __iter__(self):
            yield {"samples": xs[:, 0, :], "target": ys}

    for mode in ("adv", "jacobian"):
        tr = ClassifierTrainer(model, transform=None, mode=mode, lr=0.01, adv_steps=2,
                               sample_input=jnp.zeros((1, 1, 8192)))
        loss, acc = tr.train_epoch(Loader(), 0)
        assert np.isfinite(loss)


def test_pgd_attack_waveform_bounds(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 1, 64)).astype(np.float32) * 0.1)
    y = jnp.asarray([0, 1])
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
    loss_fn = lambda xx, yy: jnp.mean((xx[:, 0, :] @ w - jax.nn.one_hot(yy, 2)) ** 2)
    x_adv = pgd_attack_waveform(loss_fn, x, y, eps=0.002, alpha=0.0004, n=10)
    assert float(jnp.abs(x_adv - x).max()) <= 0.002 + 1e-6
    assert not np.allclose(np.asarray(x_adv), np.asarray(x))


def test_ema_update():
    p = {"a": jnp.ones(3)}
    e = {"a": jnp.zeros(3)}
    out = ema_update(e, p, 0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1)


def test_schedule_samplers():
    u = create_named_schedule_sampler("uniform", 100)
    t, w = u.sample(64, jax.random.PRNGKey(0))
    assert t.shape == (64,) and (np.asarray(t) < 100).all() and np.allclose(np.asarray(w), 1.0)

    s = LossSecondMomentResampler(10, history_per_term=2)
    t0, w0 = s.sample(8, jax.random.PRNGKey(1))
    assert np.allclose(np.asarray(w0), 1.0 / 10 / (1 / 10))  # uniform while warming
    # warm up with high loss at t=3
    for _ in range(2):
        s.update_with_all_losses(np.arange(10), np.where(np.arange(10) == 3, 10.0, 0.1))
    w = s.weights()
    assert w.argmax() == 3


def test_logger_kv_and_profile(tmp_path):
    lg = tlog.configure(str(tmp_path), ["csv", "json"])
    tlog.logkv("a", 1.0)
    tlog.logkv_mean("b", 1.0)
    tlog.logkv_mean("b", 3.0)
    with tlog.profile_kv("io"):
        pass
    out = tlog.dumpkvs()
    assert out["b"] == 2.0 and "wait_io" in out
    assert os.path.exists(tmp_path / "progress.csv")
    assert os.path.exists(tmp_path / "progress.json")


def test_trainloop_auto_resume(tmp_path, rng_np):
    from diffusion_model_for_audio_defense_tpu.models.unet import create_unet

    from conftest import train_wrapper

    model = create_unet(num_channels=16, num_res_blocks=1, dropout=0.0)
    d = create_gaussian_diffusion(steps=20)
    wrapped = train_wrapper(model, d)
    data = itertools.cycle([np.asarray(rng_np.standard_normal((2, 1, 32, 32)), np.float32)])
    tlog.configure(str(tmp_path), ["csv"])
    loop = TrainLoop(wrapped, d, iter(data), batch_size=2, lr=1e-3,
                     save_interval=2, save_dir=str(tmp_path / "ck"))
    loop.run_loop(max_steps=2)  # saves at step 2
    loop2 = TrainLoop(wrapped, d, iter(data), batch_size=2, lr=1e-3,
                      save_interval=100, save_dir=str(tmp_path / "ck"))
    assert loop2.step == 2  # resumed from model000002


def test_trainloop_dropout_active(tmp_path, rng_np):
    """The UNet must train with dropout ACTIVE (reference recipe: 0.3): the
    train-capable wrapper is detected by TrainLoop, and train=True with
    different dropout rngs changes the forward (a deterministic forward
    would make them equal)."""
    from diffusion_model_for_audio_defense_tpu.models.unet import create_unet

    model = create_unet(num_channels=16, num_res_blocks=1, dropout=0.5)
    d = create_gaussian_diffusion(steps=20)

    class W:
        def init(self, k, x, t):
            return model.init(k, x, t)

        def apply(self, p, x, t, train=False, rngs=None):
            return d.wrap_model(lambda xx, tt: model.apply(p, xx, tt, train=train, rngs=rngs))(x, t)

    data = itertools.cycle([np.asarray(rng_np.standard_normal((2, 1, 32, 32)), np.float32)])
    tlog.configure(str(tmp_path), ["csv"])
    loop = TrainLoop(W(), d, iter(data), batch_size=2, microbatch=2, lr=1e-3,
                     save_interval=10**6, save_dir=str(tmp_path / "ck"))
    assert loop.dropout_capable  # the train/rngs kwargs were detected

    w = W()
    # zero-init out_conv makes random-init outputs exactly 0 — randomize it
    # so the dropout comparison is not vacuously 0 == 0 (CLAUDE.md trap)
    import flax

    params = flax.core.unfreeze(loop.params)
    oc = params["params"]["out_conv"]
    oc["kernel"] = jnp.asarray(rng_np.standard_normal(oc["kernel"].shape).astype(np.float32) * 0.1)
    # ...and every ResBlock's own out_conv is zero-init too (OpenAI
    # zero_module parity) — the dropout sits before it, so randomize one
    # block's to make the dropout observable
    rc = params["params"]["mid_res_0"]["out_conv"]
    rc["kernel"] = jnp.asarray(rng_np.standard_normal(rc["kernel"].shape).astype(np.float32) * 0.1)
    loop.params = params
    x = jnp.asarray(rng_np.standard_normal((2, 1, 32, 32)).astype(np.float32))
    t = jnp.zeros((2,), jnp.int32)
    o1 = w.apply(loop.params, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(0)})
    o2 = w.apply(loop.params, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    o3 = w.apply(loop.params, x, t)  # deterministic eval path
    o4 = w.apply(loop.params, x, t)
    assert float(jnp.abs(o1 - o2).max()) > 0, "dropout inactive under train=True"
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o4), atol=0)

    # duck-typed train-less wrappers still work (capability off) — and the
    # dropout-OFF warning is asserted here, keeping the rest of the suite
    # warning-clean
    import pytest

    legacy = type("M", (), {"init": lambda self, k, x, t: model.init(k, x, t),
                            "apply": lambda self, p, x, t: d.wrap_model(
                                lambda xx, tt: model.apply(p, xx, tt))(x, t)})()
    with pytest.warns(UserWarning, match="dropout OFF"):
        loop2 = TrainLoop(legacy, d, iter(data), batch_size=2, lr=1e-3,
                          save_interval=10**6, save_dir=str(tmp_path / "ck2"))
    assert not loop2.dropout_capable
    loop2.run_loop(max_steps=1)
    assert loop2.step == 1
