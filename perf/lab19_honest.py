"""Lab 19: honest re-measurement of the WaveNet-side headline numbers.

Round-3 discovery (perf/_timing.py): through axon's remote PJRT,
``block_until_ready`` does NOT synchronize, so labs 8/9/12 (which timed
per-call loops closed by a block) measured dispatch + queue backpressure.
Backpressure made multi-hundred-ms programs *roughly* right, but every
number below is re-taken with ``timed_chain`` — k data-dependent
executions inside one jit, slope between two chain lengths — which is
immune to both the no-wait bug and the ~30 ms fetch RTT (lab7's
``float(jnp.sum(...))``-per-call numbers paid that RTT per call).

Sections (select with argv[1], default "all"):
  fwd    — production WaveNet forward B=64 L=16000 bf16, Pallas stack vs XLA
  bwd    — fwd+bwd B=16 bf16: Pallas full-AD / x-only vs XLA (input grads)
  f32    — attack shapes B=4 f32: Pallas x-only vs XLA fwd+bwd
  train  — full train step (Adam) B=16 bf16, Pallas vs XLA, chained through
           its own (params, opt_state) carry — i.e. genuine training
  attack — end-to-end attack iter B=4 f32 (lab9 graph): grad of CE through
           purify(t*=3) + mel + ResNeXt, Pallas-x vs XLA

Grad/fwd chains re-center each step (x0 + eps*f(h)) so activations keep
clean-input statistics along the chain while every execution stays
data-dependent.

Results (v5e-1, round 3) — every published number CONFIRMED within ±8%
(backpressure had kept the big-program block-timings roughly right):

    fwd B=64 bf16:        pallas 215.1 ms  xla 379.7 ms   (pub 207/409)
    fwd+bwd B=16 bf16:    pallas_ad 177.2  pallas_x 115.8  xla_ad 196.8
                                                  (pub 178.5/118.4/200)
    f32 B=4 fwd+bwd:      pallas_x 46.4    xla 156.1       (pub 49/162)
    train step B=16 bf16: pallas 180.9     xla 324.4    (pub 182.1/320.9)
    attack iter B=4 f32:  pallas_x 215.2   xla 716.2       (pub 218/700)
    purify B=64 bf16:     one-shot 215.5 ms (297 utt/s), 25-step 5383 ms
                          (11.9 utt/s)                 (pub 294/11.8)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python perf/lab19_honest.py [which]
"""
import pathlib
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from _timing import timed_chain

from diffusion_model_for_audio_defense_tpu.core.functional import enable_compilation_cache

enable_compilation_cache()


def recenter(x0, f, eps=1e-3):
    return lambda h: x0 + eps * f(h).astype(x0.dtype)


def sec_fwd():
    from diffusion_model_for_audio_defense_tpu.models import WaveNet
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack

    B, L = 64, 16000
    wn = WaveNet(dtype=jnp.bfloat16)
    v = wn.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, L)) * 0.1
    t = jnp.full((B, 1), 25.0)
    timed_chain(recenter(x, lambda h: wavenet_apply_stack(v, h, t)), x,
                k_lo=2, k_hi=8, label="fwd B=64 bf16 pallas stack")
    timed_chain(recenter(x, lambda h: wn.apply(v, h, t)), x,
                k_lo=2, k_hi=8, label="fwd B=64 bf16 xla        ")


def sec_bwd():
    from diffusion_model_for_audio_defense_tpu.models import WaveNet
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack

    B, L = 16, 16000
    wn = WaveNet(dtype=jnp.bfloat16)
    v = wn.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, L)) * 0.1
    t = jnp.full((B, 1), 25.0)

    def g(loss):
        return jax.grad(loss)

    timed_chain(recenter(x, g(lambda h: jnp.sum(wavenet_apply_stack(
        v, h, t, differentiable=True) ** 2))), x,
        k_lo=2, k_hi=8, label="fwd+bwd B=16 bf16 pallas_ad (param+x)")
    timed_chain(recenter(x, g(lambda h: jnp.sum(wavenet_apply_stack(
        v, h, t, differentiable=True, grad_params=False) ** 2))), x,
        k_lo=2, k_hi=8, label="fwd+bwd B=16 bf16 pallas_x (x only)  ")
    timed_chain(recenter(x, g(lambda h: jnp.sum(wn.apply(v, h, t) ** 2))), x,
                k_lo=2, k_hi=8, label="fwd+bwd B=16 bf16 xla_ad (x only)    ")


def sec_f32():
    from diffusion_model_for_audio_defense_tpu.models import WaveNet
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack

    B, L = 4, 16000
    wn = WaveNet()
    v = wn.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, L)) * 0.1
    t = jnp.full((B, 1), 25.0)
    timed_chain(recenter(x, jax.grad(lambda h: jnp.sum(wavenet_apply_stack(
        v, h, t, dtype=jnp.float32, differentiable=True, grad_params=False) ** 2))), x,
        label="f32 B=4 pallas_x fwd+bwd")
    timed_chain(recenter(x, jax.grad(lambda h: jnp.sum(wn.apply(v, h, t) ** 2))), x,
                label="f32 B=4 xla fwd+bwd    ")


def sec_train():
    import optax
    from diffusion_model_for_audio_defense_tpu.core import linear_schedule
    from diffusion_model_for_audio_defense_tpu.models import WaveNet
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack
    from diffusion_model_for_audio_defense_tpu.train.diffwave import make_diffwave_train_step

    B = 16
    sched = linear_schedule(200)
    model = WaveNet(dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
    opt = optax.adam(2e-4)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 16000)) * 0.1
    key = jax.random.PRNGKey(2)

    for apply_fn, label in (
        (lambda p, xx, t: wavenet_apply_stack(p, xx, t, differentiable=True),
         "train step B=16 bf16 pallas"),
        (lambda p, xx, t: model.apply(p, xx, t),
         "train step B=16 bf16 xla   "),
    ):
        step = make_diffwave_train_step(apply_fn, sched, opt, donate=False)
        s0 = (params, opt.init(params))
        d = timed_chain(lambda s: step(s[0], s[1], x, key)[:2], s0,
                        k_lo=2, k_hi=8, label=label)
        print(f"  -> {B/d:.1f} utt/s/chip", flush=True)


def sec_attack():
    from diffusion_model_for_audio_defense_tpu.core import linear_schedule
    from diffusion_model_for_audio_defense_tpu.models import WaveNet, resnext29_8_64
    from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack
    from diffusion_model_for_audio_defense_tpu.purify import DiffWavePurifier
    from diffusion_model_for_audio_defense_tpu.system import AcousticSystem

    B = 4
    sched = linear_schedule(200)
    wn = WaveNet()
    v = wn.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
    clf = resnext29_8_64()
    cv = clf.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 32, 32)))
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 16000)) * 0.1
    key = jax.random.PRNGKey(3)

    for eps_fn, label in (
        (lambda xx, tt: wavenet_apply_stack(
            v, xx, tt[:, None], dtype=jnp.float32, differentiable=True, grad_params=False),
         "attack iter B=4 f32 pallas_x"),
        (lambda xx, tt: wn.apply(v, xx, tt[:, None]), "attack iter B=4 f32 xla     "),
    ):
        purifier = DiffWavePurifier.from_eps_fn(eps_fn, sched, reverse_timestep=3)
        system = AcousticSystem(lambda s: clf.apply(cv, s), Wave2Spect(), purifier, "wave")

        def grad_iter(w):
            def loss(w):
                return -jnp.mean(jax.nn.log_softmax(system(w, key, defend=True))[:, 0])
            return jax.grad(loss)(w)

        timed_chain(recenter(x, grad_iter), x, k_lo=2, k_hi=8, label=label)


def sec_purify():
    from diffusion_model_for_audio_defense_tpu.core import linear_schedule
    from diffusion_model_for_audio_defense_tpu.models import WaveNet
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack
    from diffusion_model_for_audio_defense_tpu.purify import DiffWavePurifier
    from diffusion_model_for_audio_defense_tpu.purify.ddpm import q_jump

    B, T_STAR = 64, 25
    wn = WaveNet(dtype=jnp.bfloat16)
    v = wn.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
    sched = linear_schedule(200)
    eps_fn = lambda x, t: wavenet_apply_stack(v, x, t[:, None])
    purifier = DiffWavePurifier.from_eps_fn(eps_fn, sched, reverse_timestep=T_STAR)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 16000)) * 0.1
    key = jax.random.PRNGKey(3)

    d = timed_chain(recenter(x, lambda h: purifier.one_shot_denoise(
        q_jump(sched, h, T_STAR, key))), x, k_lo=2, k_hi=8,
        label="purify one-shot t*=25 B=64 bf16")
    print(f"  -> {B/d:.0f} utt/s/chip", flush=True)
    d = timed_chain(recenter(x, lambda h: purifier(h, key)), x, k_lo=2, k_hi=6,
                    label="purify full 25-step B=64 bf16 ")
    print(f"  -> {B/d:.1f} utt/s/chip", flush=True)


SECTIONS = {"fwd": sec_fwd, "bwd": sec_bwd, "f32": sec_f32,
            "train": sec_train, "attack": sec_attack, "purify": sec_purify}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, fn in SECTIONS.items():
        if which in (name, "all"):
            fn()
