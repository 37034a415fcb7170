"""Sweep stack partition plans on the REAL production WaveNet forward.

Round-2 trace finding: per-block cost is ~5.8 ms iff halo overcompute is
zero. A singleton group with pow2 dilation d has H = pow2(d) = d, so each
block computes exactly TL rows — zero overcompute. Multi-block groups pay
S-2d rows per block (up to +75% for (128,256) at TL=1024). This lab times
full 36-block forwards (pad-once, l_real threaded) under candidate plans.
"""

import functools
import time
import sys

import jax
import jax.numpy as jnp

from diffusion_model_for_audio_defense_tpu.models import WaveNet
from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import (
    wavenet_apply_stack,
)

B, L = 64, 16000
NL, CYC = 36, 12


def plan(spec):
    """spec: list of (n_blocks, tile) per 12-cycle."""
    parts = []
    for c in range(3):
        s = 0
        for nb, tl in spec:
            parts.append((c * 12 + s, c * 12 + s + nb, tl))
            s += nb
        assert s == 12
    return tuple(parts)


PLANS = {
    # current shipped plan: (1,2,4,8)(16,32,64)(128,256)(512)(1024)(2048)
    "B6-ship": plan([(4, 1024), (3, 1024), (2, 1024), (1, 1024), (1, 2048), (1, 2048)]),
    # all-singleton, small tiles where allowed
    "S12-1k": plan([(1, 1024)] * 10 + [(1, 1024), (1, 2048)]),
    # all-singleton, all big tiles
    "S12-2k": plan([(1, 2048)] * 12),
    # group only the cheap-halo run (1,2,4,8); singleton the rest
    "G1+S8": plan([(4, 1024)] + [(1, 1024)] * 6 + [(1, 1024), (1, 2048)]),
    # group (1..8) and (16,32) [H=64, +9%]; singleton the rest
    "G2+S6": plan([(4, 1024), (2, 1024)] + [(1, 1024)] * 4 + [(1, 1024), (1, 2048)]),
}
# fix d=1024 tile: H=1024 needs TL>=1024; 1024 ok. d=2048 needs TL=2048.
for k, v in list(PLANS.items()):
    PLANS[k] = tuple((s, e, 2048 if 2 ** ((s) % 12) >= 2048 and e - s == 1 else tl)
                     for s, e, tl in v)


def sync_overhead():
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda a: a + 1)
    _ = float(jnp.sum(f(x)))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(jnp.sum(f(x)))
    return (time.perf_counter() - t0) / 5


def main():
    ov = sync_overhead()
    print(f"sync overhead ~{ov*1e3:.1f} ms")
    model = WaveNet(dtype=jnp.bfloat16)
    var = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, L)), jnp.zeros((1, 1)))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, L), jnp.float32) * 0.3
    t = jnp.full((B,), 37.0)[:, None]
    tot_flops = NL * 2 * B * L * 256 * 2 * 256 * 4

    for tag, parts in PLANS.items():
        for nsplit in ([2] if tag != "S12-1k" else [1, 2, 3]):
            try:
                f = jax.jit(functools.partial(
                    wavenet_apply_stack, nsplit=nsplit, partition=parts))
                out = f(var, x, t)
                out.block_until_ready()
                t0 = time.perf_counter()
                for i in range(3):
                    out = f(var, x + 0.001 * i, t)
                    out.block_until_ready()
                dt = (time.perf_counter() - t0) / 3 - ov
                print(f"{tag:8s} ns{nsplit}: {dt*1e3:7.1f} ms  "
                      f"({tot_flops/dt/1e12:5.1f} TF/s-stack, {dt/NL*1e3:5.2f} ms/blk-equiv)")
            except Exception as e:
                print(f"{tag:8s} ns{nsplit}: FAIL {str(e)[:130]}")


if __name__ == "__main__":
    main()
