"""Full 36-block chain timing: XLA vs Pallas-group variants, one fetch per rep.

The remote tunnel adds ~50ms per host sync, so we time the WHOLE chain
(36 blocks) inside one jit and subtract the measured sync overhead.
"""

import functools
import time

import jax
import jax.numpy as jnp
import sys

sys.path.insert(0, "/root/repo/perf")
from lab3_kernel import group_v2  # noqa: E402

from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_block import (  # noqa: E402
    reference_residual_block,
)

B, L, C = 64, 16000, 256
DT = jnp.bfloat16
NL, CYC = 36, 12
DILS = [2 ** (n % CYC) for n in range(NL)]


def make_params(key):
    ks = jax.random.split(key, 5)
    return dict(
        tb=jax.random.normal(ks[0], (NL, B, C), DT) * 0.3,
        wd=jax.random.normal(ks[1], (NL, 3, C, 2 * C), DT) * 0.05,
        bd=jnp.zeros((NL, 2 * C), jnp.float32),
        wrs=jax.random.normal(ks[2], (NL, C, 2 * C), DT) * 0.05,
        brs=jnp.zeros((NL, 2 * C), jnp.float32),
    )


def chain_xla(h, p):
    skip_sum = jnp.zeros_like(h)
    for n in range(NL):
        h, skip = reference_residual_block(
            h, p["tb"][n], p["wd"][n], p["bd"][n], p["wrs"][n], p["brs"][n], dilation=DILS[n]
        )
        skip_sum = skip_sum + skip
        h, skip_sum = jax.lax.optimization_barrier((h, skip_sum))
    return h, skip_sum


def chain_pallas(h, p, groups, rb=1):
    """groups: list of (start, end, tile_l) covering 0..NL in order."""
    skip_sum = jnp.zeros_like(h)
    for s, e, tl in groups:
        dils = tuple(DILS[s:e])
        sl = slice(s, e)
        h, skip = group_v2(
            h, p["tb"][sl], p["wd"][sl], p["bd"][sl], p["wrs"][sl], p["brs"][sl],
            dilations=dils, tile_l=tl, rb=rb,
        )
        skip_sum = skip_sum + skip
        h, skip_sum = jax.lax.optimization_barrier((h, skip_sum))
    return h, skip_sum


def timeit_chain(fn, h, p, reps=3):
    out = fn(h, p)
    _ = float(jnp.sum(out[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(h + 0.001 * (i + 1), p)
        _ = float(jnp.sum(out[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def sync_overhead():
    tiny = jnp.ones((8, 128), DT)
    f = jax.jit(lambda x: (x * 2,))
    _ = float(jnp.sum(f(tiny)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    n = 10
    for i in range(n):
        _ = float(jnp.sum(f(tiny + i)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


GROUPS_A = []  # per cycle: (1..32), (64,128,256), (512,1024), (2048)
for c in range(3):
    b0 = c * 12
    GROUPS_A += [(b0, b0 + 6, 1024), (b0 + 6, b0 + 9, 1024),
                 (b0 + 9, b0 + 11, 2048), (b0 + 11, b0 + 12, 2048)]

GROUPS_B = []  # smaller groups: (1..8), (16..64)?? must keep H<=TL; try pairs
for c in range(3):
    b0 = c * 12
    GROUPS_B += [(b0, b0 + 4, 1024), (b0 + 4, b0 + 7, 1024), (b0 + 7, b0 + 9, 1024),
                 (b0 + 9, b0 + 10, 1024), (b0 + 10, b0 + 11, 2048), (b0 + 11, b0 + 12, 2048)]


def main():
    ov = sync_overhead()
    print(f"sync overhead ~{ov*1e3:.1f} ms (subtracted)")
    h = jax.random.normal(jax.random.PRNGKey(3), (B, L, C), DT) * 0.3
    p = make_params(jax.random.PRNGKey(0))
    tot_flops = NL * 2 * B * L * C * 2 * C * 4

    configs = [
        ("XLA chain", jax.jit(chain_xla)),
        ("pallas A rb1", jax.jit(functools.partial(chain_pallas, groups=tuple(GROUPS_A), rb=1))),
        ("pallas A rb2", jax.jit(functools.partial(chain_pallas, groups=tuple(GROUPS_A), rb=2))),
        ("pallas B rb1", jax.jit(functools.partial(chain_pallas, groups=tuple(GROUPS_B), rb=1))),
    ]
    for tag, f in configs:
        try:
            dt = timeit_chain(f, h, p) - ov
            print(f"{tag:14s}: {dt*1e3:7.1f} ms  ({tot_flops/dt/1e12:5.1f} TF/s, {dt/NL*1e3:5.2f} ms/blk)")
        except Exception as e:
            print(f"{tag:14s}: FAIL {str(e)[:150]}")


if __name__ == "__main__":
    main()
