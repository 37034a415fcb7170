"""Lab 10: purified utt/sec/chip — the second BASELINE.md metric.

DiffWave purification at t*=25 (reference diffwave_ddpm.py:409 default) on
the fused Pallas stack, bf16, production 256ch/36L WaveNet, B=64:

- one-shot: q-jump to t* + single-call denoise (1 WaveNet forward/utt) —
  the denoised-smoothing path (certified_robust.py).
- full reverse: q-jump + 25-step DDPM reverse scan (25 forwards/utt) —
  the adaptive-eval defense path (diffwave_ddpm.py purify loop).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python perf/lab10_purify_throughput.py
"""
import time

import jax
import jax.numpy as jnp

from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.models import WaveNet
from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack
from diffusion_model_for_audio_defense_tpu.purify import DiffWavePurifier

B, T_STAR = 64, 25


def main():
    wavenet = WaveNet(dtype=jnp.bfloat16)
    wn_vars = wavenet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
    sched = linear_schedule(200)
    eps_fn = lambda x, t: wavenet_apply_stack(wn_vars, x, t[:, None])
    purifier = DiffWavePurifier.from_eps_fn(eps_fn, sched, reverse_timestep=T_STAR)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 16000)) * 0.1
    key = jax.random.PRNGKey(3)

    @jax.jit
    def one_shot(x, key):
        from diffusion_model_for_audio_defense_tpu.purify.ddpm import q_jump
        x_t = q_jump(sched, x, T_STAR, key)
        return purifier.one_shot_denoise(x_t)

    full = jax.jit(lambda x, key: purifier(x, key))

    for name, fn, n in [("one-shot t*=25", one_shot, 20), ("full 25-step reverse", full, 5)]:
        t0 = time.time()
        out = fn(x, key)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(n):
            out = fn(x, key)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n
        print(f"purify [{name}]: {dt*1e3:.1f} ms/batch{B} = {B/dt:.1f} utt/sec/chip "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
