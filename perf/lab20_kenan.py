"""lab20: Kenansville fft host binary-search vs fused lax.fori_loop (TPU).

Companion to lab16 (FAKEBOB): the host path runs one jitted
compress+predict per iteration with numpy lo/hi bookkeeping (max_iter
round-trips); fused_loop=True keeps the whole search on device. Timing
syncs on a real np.asarray fetch (block_until_ready doesn't synchronize
through axon — perf/_timing.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/lab20_kenan.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_for_audio_defense_tpu.attacks import Kenansville
from diffusion_model_for_audio_defense_tpu.core.functional import enable_compilation_cache
from diffusion_model_for_audio_defense_tpu.models import M5


def main():
    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    model = M5()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)))
    model_fn = lambda x, rng: model.apply(variables, x)

    MAX_ITER = 15
    for B in (1, 8):
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 16000)) * 0.05
        y = jnp.argmax(model_fn(x, None), axis=-1)
        for name, fused in (("host ", False), ("fused", True)):
            atk = Kenansville(model_fn, atk_name="fft", max_iter=MAX_ITER,
                              batch_size=B, verbose=0, fused_loop=fused)
            for it in range(3):  # first = compile, report best of the rest
                t0 = time.time()
                adv, suc = atk.generate(x, y, targeted=False, rng=jax.random.PRNGKey(7))
                np.asarray(adv)  # real fetch
                dt = time.time() - t0
                if it == 0:
                    compile_s = dt
                else:
                    best = dt if it == 1 else min(best, dt)
            print(f"B={B} {name}: {best*1000/MAX_ITER:7.2f} ms/iter "
                  f"(total {best:6.2f} s, first-call {compile_s:6.1f} s)", flush=True)


if __name__ == "__main__":
    main()
