"""lab16: FAKEBOB host-loop vs fused lax.while_loop per-iteration cost (TPU).

The host loop fetches mean_loss/adver_loss/predictions to numpy every NES
iteration and runs per-sample python bookkeeping (attacks/fakebob.py
``_attack_batch``, mirroring the reference ``black_box_attack.py:128-178``);
the fused path keeps all bookkeeping on device. The question: how much do
the per-iteration host round-trips cost at CLI-default draw counts?

Setup forces the full iteration budget (impossible margin via a targeted
attack toward a fixed wrong label on a random-init M5) so both paths run
exactly max_iter+1 NES draws.

Run: python perf/lab16_fakebob.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_for_audio_defense_tpu.attacks import FAKEBOB
from diffusion_model_for_audio_defense_tpu.core.functional import enable_compilation_cache
from diffusion_model_for_audio_defense_tpu.models import M5


def main():
    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)
    model = M5()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)))
    model_fn = lambda x, rng: model.apply(variables, x)

    MAX_ITER = 50
    for B in (1, 4):
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, 16000)) * 0.05
        clean = np.asarray(jnp.argmax(model_fn(x, None), axis=-1))
        # targeted at a label the random net never reaches with eps=1e-6:
        # margin stays positive, loop never freezes, both paths run the
        # full budget
        y_t = jnp.asarray((clean + 1) % 10)
        kw = dict(task="SCR", epsilon=1e-6, max_iter=MAX_ITER, max_lr=1e-7,
                  samples_per_draw=200, samples_per_draw_batch_size=200,
                  batch_size=B, verbose=0, confidence=10.0)
        for name, fused in (("host ", False), ("fused", True)):
            atk = FAKEBOB(model_fn, fused_loop=fused, **kw)
            for it in range(3):  # first = compile, report best of the rest
                t0 = time.time()
                adv, suc = atk.generate(x, y_t, targeted=True, rng=jax.random.PRNGKey(7))
                np.asarray(adv)  # real fetch: block_until_ready doesn't sync through axon
                dt = time.time() - t0
                if it == 0:
                    compile_s = dt
                else:
                    best = dt if it == 1 else min(best, dt)
            assert not any(suc)
            print(f"B={B} {name}: {best*1000/ (MAX_ITER+1):7.2f} ms/iter "
                  f"(total {best:6.2f} s, first-call {compile_s:6.1f} s)")


if __name__ == "__main__":
    main()
