"""Perf lab: baseline timings for the WaveNet forward at certify shapes.

Run on the real TPU:  python perf/lab1_baseline.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_for_audio_defense_tpu.models import WaveNet

B, L, C = 64, 16000, 256
DT = jnp.bfloat16


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main():
    wavenet = WaveNet(dtype=DT)
    wn_vars = wavenet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16000)), jnp.zeros((1, 1)))
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 1, L), jnp.float32) * 0.1
    t = jnp.full((B, 1), 25.0)

    fwd = jax.jit(lambda x, t: wavenet.apply(wn_vars, x, t))
    dt, _ = timeit(fwd, x, t)
    flops = 36 * (2 * B * L * C * 2 * C * 3 + 2 * B * L * C * 2 * C)
    print(f"XLA full fwd: {dt*1e3:.1f} ms  ({flops/dt/1e12:.1f} TF/s eff)")

    # single XLA block at various dilations
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_block import (
        reference_residual_block,
    )

    h = jax.random.normal(jax.random.PRNGKey(3), (B, L, C), DT)
    tb = jax.random.normal(jax.random.PRNGKey(4), (B, C), DT)
    wd = jax.random.normal(jax.random.PRNGKey(5), (3, C, 2 * C), DT) * 0.05
    bd = jnp.zeros((2 * C,), jnp.float32)
    wrs = jax.random.normal(jax.random.PRNGKey(6), (C, 2 * C), DT) * 0.05
    brs = jnp.zeros((2 * C,), jnp.float32)

    blk_flops = 2 * B * L * C * 2 * C * 4
    for d in (1, 64, 2048):
        f = jax.jit(functools.partial(reference_residual_block, dilation=d))
        dt, _ = timeit(f, h, tb, wd, bd, wrs, brs)
        print(f"XLA standalone block d={d}: {dt*1e3:.2f} ms ({blk_flops/dt/1e12:.1f} TF/s)")

    # group kernel current config
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_group import (
        fused_residual_group,
    )

    for dils, tl in [((1, 2, 4, 8), 1024), ((1, 2, 4, 8, 16, 32), 1024),
                     ((1, 2, 4, 8, 16, 32), 2048), ((64, 128, 256), 2048),
                     ((512, 1024), 4096), ((2048,), 4096)]:
        G = len(dils)
        tbg = jax.random.normal(jax.random.PRNGKey(7), (G, B, C), DT)
        wdg = jax.random.normal(jax.random.PRNGKey(8), (G, 3, C, 2 * C), DT) * 0.05
        bdg = jnp.zeros((G, 2 * C), jnp.float32)
        wrsg = jax.random.normal(jax.random.PRNGKey(9), (G, C, 2 * C), DT) * 0.05
        brsg = jnp.zeros((G, 2 * C), jnp.float32)
        try:
            f = functools.partial(fused_residual_group, dilations=dils, tile_l=tl)
            dt, _ = timeit(f, h, tbg, wdg, bdg, wrsg, brsg)
            print(f"group {dils} TL={tl}: {dt*1e3:.2f} ms total, {dt/G*1e3:.2f} ms/blk "
                  f"({G*blk_flops/dt/1e12:.1f} TF/s)")
        except Exception as e:
            print(f"group {dils} TL={tl}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
