"""Lab 13: spec-domain (Improved-Diffusion UNet) perf on TPU.

The first spectrogram-defense numbers (VERDICT r2 weak #4): every earlier
lab is WaveNet/waveform-centric. Measures, on one v5e chip:

1. UNet forward throughput (128ch/3-resblock production config, 1x32x32,
   bf16 vs f32, B=256)
2. ``RevImprovedDiffusionPurifier`` throughput (t*=3 like the shipped
   adaptive-eval default, and t*=25): wave → mel → standardize → VP-SDE
   Euler reverse → inv-standardize, utt/s/chip
3. the spec adaptive-attack iteration: grad of CE through
   mel → spec-purify → ResNeXt at B=4 f32 (reference
   ``improved_diffusion_sde.py:173-221`` driven by white_box_attack)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python perf/lab13_spec.py
"""
import time

import jax
import jax.numpy as jnp

from diffusion_model_for_audio_defense_tpu.core.functional import jit_hoisted

from diffusion_model_for_audio_defense_tpu.models import resnext29_8_64
from diffusion_model_for_audio_defense_tpu.models.unet import create_unet
from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
from diffusion_model_for_audio_defense_tpu.purify.spec import RevImprovedDiffusionPurifier


def bench(name, fn, *args, n=10):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1e3:.2f} ms (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    # ---- 1. UNet forward --------------------------------------------------
    B = 256
    spec = jax.random.normal(jax.random.PRNGKey(0), (B, 1, 32, 32))
    t = jnp.zeros((B,))
    for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        kw = {} if dtype is None else {"dtype": dtype}
        try:
            unet = create_unet(**kw)
        except TypeError:
            if dtype is not None:
                print("unet has no dtype knob; skipping bf16 variant", flush=True)
                continue
            raise
        variables = unet.init(jax.random.PRNGKey(1), spec[:1], t[:1])
        fwd = jit_hoisted(lambda s, tt, v=variables, m=unet: m.apply(v, s, tt))
        dt = bench(f"unet fwd B={B} {tag}", fwd, spec, t)
        print(f"  -> {B/dt:.0f} spec/s/chip", flush=True)

    unet = create_unet()
    variables = unet.init(jax.random.PRNGKey(1), spec[:1], t[:1])
    model_fn = lambda x, tt: unet.apply(variables, x, tt)

    # ---- 2. spec purifier throughput -------------------------------------
    w2s = Wave2Spect(n_mels=32)
    for t_star in (3, 25):
        purifier = RevImprovedDiffusionPurifier(model_fn, t=t_star, sample_step=1)
        Bp = 256

        def purify(wave, key):
            return purifier(w2s(wave), key)

        purify = jit_hoisted(purify)

        wave = jax.random.normal(jax.random.PRNGKey(2), (Bp, 1, 16000)) * 0.1
        dt = bench(f"spec purify t*={t_star} B={Bp} (mel+{t_star}-step SDE)",
                   purify, wave, jax.random.PRNGKey(3), n=5)
        print(f"  -> {Bp/dt:.0f} utt/s/chip", flush=True)

    # ---- 3. spec adaptive-attack iteration -------------------------------
    clf = resnext29_8_64(num_classes=10)
    clf_vars = clf.init(jax.random.PRNGKey(4), jnp.zeros((1, 1, 32, 32)))
    purifier = RevImprovedDiffusionPurifier(model_fn, t=3, sample_step=1)
    Ba = 4
    wave = jax.random.normal(jax.random.PRNGKey(5), (Ba, 1, 16000)) * 0.1
    y = jnp.zeros((Ba,), jnp.int32)

    def attack_grad(wave, y, key):
        def loss(w):
            s = purifier(w2s(w), key)
            logits = clf.apply(clf_vars, s)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

        return jax.grad(loss)(wave)

    # jit_hoisted is load-bearing here: with params closure-baked the grad
    # program is ~570 MB of HLO and exceeds the axon remote-compile upload
    # limit (HTTP 413); hoisted it is 2.3 MB and compiles in ~73 s
    bench(f"spec attack grad iter B={Ba} t*=3 (mel+SDE+ResNeXt bwd)",
          jit_hoisted(attack_grad), wave, y, jax.random.PRNGKey(6), n=10)


if __name__ == "__main__":
    main()
