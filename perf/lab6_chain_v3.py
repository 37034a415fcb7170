"""Full 36-block chain with kernel v3 (skip aliasing + row split)."""

import functools
import time
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/perf")
from lab4_chain import B, L, C, DT, NL, DILS, make_params, sync_overhead, chain_xla  # noqa
from lab5_kernel import group_v3  # noqa


def chain_v3(h, p, groups, nsplit=1, barrier=True):
    skip_sum = jnp.zeros_like(h)
    for s, e, tl in groups:
        dils = tuple(DILS[s:e])
        sl = slice(s, e)
        h, skip_sum = group_v3(
            h, skip_sum, p["tb"][sl], p["wd"][sl], p["bd"][sl], p["wrs"][sl], p["brs"][sl],
            dilations=dils, tile_l=tl, nsplit=nsplit,
        )
        if barrier:
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


def partition(spec):
    """spec: list of (n_blocks, tile_l) per cycle."""
    groups = []
    for c in range(3):
        b0 = c * 12
        s = 0
        for nb, tl in spec:
            groups.append((b0 + s, b0 + s + nb, tl))
            s += nb
        assert s == 12
    return tuple(groups)


PARTS = {
    # cycle dilations: 1 2 4 8 16 32 64 128 256 512 1024 2048
    "B6": partition([(4, 1024), (3, 1024), (2, 1024), (1, 1024), (1, 2048), (1, 2048)]),
    "A4": partition([(6, 1024), (3, 1024), (2, 2048), (1, 2048)]),
    "C7": partition([(3, 1024), (3, 1024), (2, 1024), (1, 1024), (1, 1024), (1, 2048), (1, 2048)]),
    "D5": partition([(5, 1024), (3, 1024), (2, 1024), (1, 2048), (1, 2048)]),
    "E5": partition([(4, 1024), (4, 1024), (2, 1024), (1, 2048), (1, 2048)]),
    "G8": partition([(4, 1024), (2, 1024), (2, 1024), (1, 1024), (1, 1024), (1, 2048), (1, 2048)]),
}


def main():
    ov = sync_overhead()
    print(f"sync overhead ~{ov*1e3:.1f} ms (subtracted)")
    h = jax.random.normal(jax.random.PRNGKey(3), (B, L, C), DT) * 0.3
    p = make_params(jax.random.PRNGKey(0))
    tot_flops = NL * 2 * B * L * C * 2 * C * 4

    # numeric check vs XLA chain (bf16 tolerance)
    ref = jax.jit(chain_xla)(h, p)
    got = jax.jit(functools.partial(chain_v3, groups=PARTS["B6"], nsplit=2))(h, p)
    err_h = float(jnp.abs(got[0].astype(jnp.float32) - ref[0].astype(jnp.float32)).max())
    err_s = float(jnp.abs(got[1].astype(jnp.float32) - ref[1].astype(jnp.float32)).max())
    print(f"numerics vs XLA chain: h {err_h:.3e}  skip {err_s:.3e}")

    for tag, groups, nsplit, barrier in [
        ("B6 ns2 nobar", PARTS["B6"], 2, False),
        ("B6 ns3 nobar", PARTS["B6"], 3, False),
        ("C7 ns2 nobar", PARTS["C7"], 2, False),
        ("D5 ns2 nobar", PARTS["D5"], 2, False),
        ("E5 ns2 nobar", PARTS["E5"], 2, False),
        ("A4 ns2 nobar", PARTS["A4"], 2, False),
        ("G8 ns2 nobar", PARTS["G8"], 2, False),
        ("B6 ns1 nobar", PARTS["B6"], 1, False),
    ]:
        try:
            f = jax.jit(functools.partial(chain_v3, groups=groups, nsplit=nsplit, barrier=barrier))
            dt = timeit_chain(f, h, p) - ov
            print(f"{tag:14s}: {dt*1e3:7.1f} ms  ({tot_flops/dt/1e12:5.1f} TF/s, {dt/NL*1e3:5.2f} ms/blk)")
        except Exception as e:
            print(f"{tag:14s}: FAIL {str(e)[:130]}")


if __name__ == "__main__":
    main()
