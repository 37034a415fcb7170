"""Lab 9: adaptive-attack iteration wall-clock, end to end on the real TPU.

One PGD/CW-style gradient step through the full defended system —
x -> DDPM purify (reverse t*=3, production 256ch/36L WaveNet) -> mel ->
ResNeXt29 -> CE -> d/dx — comparing the XLA WaveNet.apply path against the
differentiable Pallas stack in attack mode (grad_params=False). This is the
inner loop of the reference's white_box_attack.py (CW/PGD, 10-100 iters).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python perf/lab9_attack_e2e.py
"""
import time

import jax
import jax.numpy as jnp

from diffusion_model_for_audio_defense_tpu.core import linear_schedule
from diffusion_model_for_audio_defense_tpu.models import WaveNet, resnext29_8_64
from diffusion_model_for_audio_defense_tpu.ops import Wave2Spect
from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack
from diffusion_model_for_audio_defense_tpu.purify import DiffWavePurifier
from diffusion_model_for_audio_defense_tpu.system import AcousticSystem

B, T_STAR = 4, 3


def main():
    wavenet = WaveNet()
    wn_vars = wavenet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
    clf = resnext29_8_64()
    clf_vars = clf.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 32, 32)))
    sched = linear_schedule(200)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 16000)) * 0.1
    key = jax.random.PRNGKey(3)

    def make_grad(eps_fn):
        purifier = DiffWavePurifier.from_eps_fn(eps_fn, sched, reverse_timestep=T_STAR)
        system = AcousticSystem(lambda s: clf.apply(clf_vars, s), Wave2Spect(), purifier, "wave")

        def loss(x):
            return -jnp.mean(jax.nn.log_softmax(system(x, key, defend=True))[:, 0])
        return jax.jit(jax.grad(loss))

    eps_xla = lambda x, t: wavenet.apply(wn_vars, x, t[:, None])
    eps_pl = lambda x, t: wavenet_apply_stack(
        wn_vars, x, t[:, None], dtype=jnp.float32, differentiable=True, grad_params=False)

    for name, fn in [("xla", make_grad(eps_xla)), ("pallas_x", make_grad(eps_pl))]:
        t0 = time.time()
        g = fn(x)
        jax.block_until_ready(g)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(10):
            g = fn(x)
        jax.block_until_ready(g)
        dt = (time.time() - t0) / 10 * 1e3
        print(f"attack grad step [{name}]: {dt:.1f} ms/iter (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
