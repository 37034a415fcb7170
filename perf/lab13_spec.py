"""Lab 13: spec-domain (Improved-Diffusion UNet) perf on TPU.

The first spectrogram-defense numbers (VERDICT r2 weak #4): every earlier
lab is WaveNet/waveform-centric. Measures, on one v5e chip:

1. UNet forward throughput (128ch/3-resblock production config, 1x32x32,
   bf16 vs f32, B=256)
2. ``RevImprovedDiffusionPurifier`` throughput (t*=3 like the shipped
   adaptive-eval default, and t*=25): standardize -> VP-SDE Euler reverse
   -> inv-standardize on the mel spec, utt/s/chip (the mel front-end is
   timed separately; it's ~1 ms at B=256)
3. the spec adaptive-attack iteration: grad of CE through
   mel -> spec-purify -> ResNeXt at B=4 f32 (reference
   ``improved_diffusion_sde.py:173-221`` driven by white_box_attack)

Timing uses perf/_timing.timed_chain (k dependent executions inside one
jit, slope between two chain lengths): through axon's remote PJRT,
``block_until_ready`` does NOT synchronize, so the per-call loop this lab
originally used measured dispatch+backpressure, not execution. Numbers
below are the honest re-measurement (round 3).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python perf/lab13_spec.py
"""
import pathlib
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from _timing import timed_chain

from diffusion_model_for_audio_defense_tpu.core.functional import jit_hoisted

from diffusion_model_for_audio_defense_tpu.models import resnext29_8_64
from diffusion_model_for_audio_defense_tpu.models.unet import create_unet
from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
from diffusion_model_for_audio_defense_tpu.purify.spec import RevImprovedDiffusionPurifier


def main():
    # ---- 1. UNet forward --------------------------------------------------
    B = 256
    spec = jax.random.normal(jax.random.PRNGKey(0), (B, 1, 32, 32))
    t = jnp.zeros((B,))
    for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        kw = {} if dtype is None else {"dtype": dtype}
        unet = create_unet(**kw)
        variables = unet.init(jax.random.PRNGKey(1), spec[:1], t[:1])
        dt = timed_chain(
            lambda s, v=variables, m=unet: m.apply(v, s, t),
            spec, label=f"unet fwd B={B} {tag}")
        print(f"  -> {B/dt:.0f} spec/s/chip", flush=True)

    unet = create_unet()
    variables = unet.init(jax.random.PRNGKey(1), spec[:1], t[:1])
    model_fn = lambda x, tt: unet.apply(variables, x, tt)

    # ---- 2. spec purifier throughput -------------------------------------
    w2s = Wave2Spect(n_mels=32)
    Bp = 256
    wave = jax.random.normal(jax.random.PRNGKey(2), (Bp, 1, 16000)) * 0.1
    mel = jit_hoisted(w2s)(wave)
    dt_mel = timed_chain(
        lambda w: w + jnp.mean(w2s(w)) * 1e-12, wave,
        label=f"mel front-end B={Bp} (chained via eps-add)")
    for t_star in (3, 25):
        purifier = RevImprovedDiffusionPurifier(model_fn, t=t_star, sample_step=1)
        key = jax.random.PRNGKey(3)
        dt = timed_chain(
            lambda s: purifier(s, key), mel,
            label=f"spec purify t*={t_star} B={Bp} ({t_star}-step SDE)",
            k_hi=10 if t_star == 25 else 18)
        print(f"  -> {Bp/(dt+dt_mel):.0f} utt/s/chip incl. mel", flush=True)

    # ---- 3. spec adaptive-attack iteration -------------------------------
    clf = resnext29_8_64(num_classes=10)
    clf_vars = clf.init(jax.random.PRNGKey(4), jnp.zeros((1, 1, 32, 32)))
    purifier = RevImprovedDiffusionPurifier(model_fn, t=3, sample_step=1)
    Ba = 4
    awave = jax.random.normal(jax.random.PRNGKey(5), (Ba, 1, 16000)) * 0.1
    y = jnp.zeros((Ba,), jnp.int32)
    key = jax.random.PRNGKey(6)

    def attack_grad(w):
        def loss(w):
            s = purifier(w2s(w), key)
            logits = clf.apply(clf_vars, s)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

        return jax.grad(loss)(w)

    # grad is wave-shaped: chain it directly (timed_chain jits via
    # jit_hoisted, so the closure-captured UNet+ResNeXt params don't bake
    # into the HLO — baked, this graph is ~570 MB and exceeds the axon
    # remote-compile upload limit).
    dt = timed_chain(attack_grad, awave,
                     label=f"spec attack grad iter B={Ba} t*=3", k_hi=10)
    print(f"  -> {dt*1e3:.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
