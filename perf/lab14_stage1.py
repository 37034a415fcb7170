"""Lab 14: host-loop vs device-resident (fused) attack stage 1 on TPU.

VERDICT r2 #6's measurement: iterations/sec of ``AudioAttack.stage_1``
(per-iteration host sync of predictions + numpy bookkeeping, mirroring the
reference ``white_box_attack.py:380-451``) vs ``stage_1_fused`` (one
``lax.fori_loop``) at B = 4…64 through the defended system (DiffWave DDPM
purifier t*=3, Pallas x-only grads + mel + ResNeXt), plus equal-success
sanity on a fixed seed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python perf/lab14_stage1.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_for_audio_defense_tpu.attacks import AudioAttack
from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.models import WaveNet, resnext29_8_64
from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack
from diffusion_model_for_audio_defense_tpu.purify import DiffWavePurifier
from diffusion_model_for_audio_defense_tpu.system import AcousticSystem

ITERS = 30


def build_system():
    wavenet = WaveNet()
    wn_vars = wavenet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
    clf = resnext29_8_64(num_classes=10)
    clf_vars = clf.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 32, 32)))
    eps_fn = lambda x, t: wavenet_apply_stack(
        wn_vars, x, t[:, None], dtype=jnp.float32, differentiable=True, grad_params=False)
    purifier = DiffWavePurifier.from_eps_fn(eps_fn, linear_schedule(200), reverse_timestep=3)
    return AcousticSystem(lambda s: clf.apply(clf_vars, s), Wave2Spect(n_mels=32), purifier, "wave")


def main():
    system = build_system()
    model_fn = lambda x, rng: system(x, rng, defend=True)

    for B in (4, 16):  # B=64 host-path compile alone is ~10 min; 4/16 span the regimes
        x = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 16000)) * 0.1
        y = jnp.zeros((B,), jnp.int32)
        results = {}
        for fused in (False, True):
            atk = AudioAttack(model_fn, eps=2000.0, norm="linf", max_iter_1=ITERS,
                              max_iter_2=0, learning_rate_1=400.0, verbose=0,
                              fused_stage_1=fused)
            gen = atk.stage_1_fused if fused else atk.stage_1
            atk._targeted = False
            # warm-up/compile
            t0 = time.time()
            out, succ = gen(x, y, jax.random.PRNGKey(3))
            np.asarray(out)  # real fetch: block_until_ready doesn't sync through axon
            compile_s = time.time() - t0
            t0 = time.time()
            out, succ = gen(x, y, jax.random.PRNGKey(3))
            np.asarray(out)  # real fetch: block_until_ready doesn't sync through axon
            dt = time.time() - t0
            tag = "fused" if fused else "host "
            print(f"B={B:3d} {tag}: {dt/ITERS*1e3:7.1f} ms/iter  "
                  f"({ITERS/dt:6.2f} it/s, first call {compile_s:.0f}s) "
                  f"success={int(sum(succ))}/{B}", flush=True)
            results[fused] = (dt, list(map(bool, succ)))
        if results[False][1] != results[True][1]:
            # f32-vs-f64 epsilon bookkeeping can drift over long runs
            print(f"B={B:3d} NOTE: host/fused success differs "
                  f"(host={results[False][1]}, fused={results[True][1]})", flush=True)
        speedup = results[False][0] / results[True][0]
        print(f"B={B:3d} fused speedup: {speedup:.2f}x", flush=True)


if __name__ == "__main__":
    main()
