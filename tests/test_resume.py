"""Full train-state checkpointing: train 2N steps ≡ train N, resume, train N.

The reference restores optimizer state on resume (DiffWave_Unconditional/
train.py:82-101,131-136; improved_diffusion/train_util.py:114-142,274-297);
these tests assert our resume restores params + Adam moments + EMA + PRNG so
a restarted run is bit-for-bit on the same trajectory.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.models import WaveNet
from diffusion_model_for_audio_defense_tpu.purify.diffusion_math import create_gaussian_diffusion
from diffusion_model_for_audio_defense_tpu.train import DiffWaveTrainer, TrainLoop
from diffusion_model_for_audio_defense_tpu.train import logger as tlog

TINY_WN = dict(res_channels=8, skip_channels=8, num_res_layers=2, dilation_cycle=2,
               diffusion_step_embed_dim_in=8, diffusion_step_embed_dim_mid=16,
               diffusion_step_embed_dim_out=16)


def _assert_trees_close(a, b, atol=1e-5):
    import jax

    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=1e-5)


def test_diffwave_trainer_resume_equivalence(tmp_path, rng_np):
    model = WaveNet(**TINY_WN)
    batches = [
        np.asarray(rng_np.standard_normal((4, 1, 128)), np.float32) * 0.1 for _ in range(2)
    ]

    def make(dirname):
        return DiffWaveTrainer(
            model, linear_schedule(20), learning_rate=1e-3,
            output_directory=str(tmp_path / dirname), iters_per_ckpt=2,
            iters_per_logging=1000, segment_length=128,
        )

    # straight-through run: 4 iterations
    a = make("a")
    a.train(itertools.cycle(batches), max_iters=4)

    # interrupted run: 2 iterations, then resume in a fresh trainer for 2 more
    b = make("b")
    b.train(itertools.cycle(batches), max_iters=2)
    c = make("b")
    assert c.n_iter == 2
    # resumed trainer must carry the Adam moments, not fresh zeros
    assert int(np.asarray(c.opt_state[0].count)) == 2
    c.train(itertools.cycle(batches), max_iters=2)

    _assert_trees_close(a.params, c.params)
    _assert_trees_close(a.opt_state, c.opt_state)
    np.testing.assert_array_equal(np.asarray(a.rng), np.asarray(c.rng))


def test_diffwave_trainer_params_only_ckpt_back_compat(tmp_path, rng_np):
    from diffusion_model_for_audio_defense_tpu.core.checkpoint import save_pytree

    model = WaveNet(**TINY_WN)
    t = DiffWaveTrainer(model, linear_schedule(20), output_directory=str(tmp_path / "x"),
                        segment_length=128)
    save_pytree(str(tmp_path / "x" / "ckpt_7"), {"params": t.params})
    t2 = DiffWaveTrainer(model, linear_schedule(20), output_directory=str(tmp_path / "x"),
                         segment_length=128)
    assert t2.n_iter == 7  # old params-only checkpoints still resume


def test_trainloop_resume_equivalence(tmp_path, rng_np):
    from diffusion_model_for_audio_defense_tpu.models.unet import create_unet

    from conftest import train_wrapper

    model = create_unet(num_channels=16, num_res_blocks=1, dropout=0.0)
    d = create_gaussian_diffusion(steps=20)
    wrapped = train_wrapper(model, d)
    # single repeated batch: the init-time probe consumes one draw, so a
    # multi-batch cycle would desync the resumed run's data stream
    batch = np.asarray(rng_np.standard_normal((2, 1, 32, 32)), np.float32)
    data = lambda: itertools.cycle([batch])
    tlog.configure(str(tmp_path), ["csv"])

    def make(dirname, save_interval):
        return TrainLoop(wrapped, d, data(), batch_size=2, lr=1e-3,
                         save_interval=save_interval, save_dir=str(tmp_path / dirname))

    a = make("a", 2)
    a.run_loop(max_steps=4)

    b = make("b", 2)
    b.run_loop(max_steps=2)
    c = make("b", 100)
    assert c.step == 2
    # Adam count restored, EMA restored (not re-seeded from params)
    import jax

    counts = [np.asarray(l) for l in jax.tree.leaves(c.opt_state) if np.asarray(l).ndim == 0]
    assert any(int(x) == 2 for x in counts)
    c.run_loop(max_steps=4)

    _assert_trees_close(a.params, c.params)
    for ea, ec in zip(a.ema_params, c.ema_params):
        _assert_trees_close(ea, ec)


def test_trainloop_explicit_resume_step(tmp_path, rng_np):
    """Explicit resume_params + resume_step: the loop continues at the given
    step (so lr anneal / checkpoint numbering / opt-EMA restore line up)
    instead of silently restarting at 0."""
    import itertools

    from diffusion_model_for_audio_defense_tpu.models.unet import create_unet
    from diffusion_model_for_audio_defense_tpu.purify.diffusion_math import create_gaussian_diffusion
    from diffusion_model_for_audio_defense_tpu.train import TrainLoop
    from diffusion_model_for_audio_defense_tpu.train import logger as tlog

    from conftest import train_wrapper

    model = create_unet(num_channels=16, num_res_blocks=1, dropout=0.0)
    d = create_gaussian_diffusion(steps=20)
    wrapped = train_wrapper(model, d)
    data = itertools.cycle([np.asarray(rng_np.standard_normal((2, 1, 32, 32)), np.float32)])
    tlog.configure(str(tmp_path), ["csv"])
    params = wrapped.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32)), jnp.zeros((1,), jnp.int32))
    loop = TrainLoop(wrapped, d, iter(data), batch_size=2, lr=1e-3,
                     save_interval=10**6, save_dir=str(tmp_path / "ck"),
                     resume_params=params, resume_step=7)
    assert loop.step == 7
    loop.run_loop(max_steps=8)  # max_steps counts total steps
    assert loop.step == 8
