"""Experimental WaveNet group-kernel variants to find where time goes.

Variants (flags):
- gate on/off           (off: linear passthrough of conv_a)
- mask on/off           (off: no validity where(), no t_bias add in kernel)
- rb: batch rows per grid step
- defer_skip: collect gates, single fat skip matmul at the end
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, L, C = 64, 16000, 256
DT = jnp.bfloat16


def _kernel(dils, H, TL, L_real, C, RB, gate_on, mask_on,
            x_prev, x_cur, x_next, t_bias, wd, bd, wrs, brs,
            h_out, skip_out, W_ref, *, acc_dtype=jnp.float32):
    i = pl.program_id(1)
    G = len(dils)
    S = TL + 2 * H

    for rb in range(RB):
        W_ref[rb, 0:H] = x_prev[rb][:]
        W_ref[rb, H:H + TL] = x_cur[rb][:]
        W_ref[rb, H + TL:] = x_next[rb][:]

    base = i * TL - H
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) + base
    valid = jnp.logical_and(rows >= 0, rows < L_real)

    skip_accs = [jnp.zeros((TL, C), dtype=x_cur.dtype) for _ in range(RB)]
    for g, d in enumerate(dils):
        lo, hi = d, S - d
        n = hi - lo
        for rb in range(RB):
            W = W_ref[rb]
            if mask_on:
                X = jnp.where(valid, W + t_bias[rb, g], 0.0).astype(W.dtype)
            else:
                X = W

            def taps(w_half):
                acc = jnp.dot(X[0:n], w_half[0], preferred_element_type=acc_dtype)
                acc += jnp.dot(X[d:d + n], w_half[1], preferred_element_type=acc_dtype)
                acc += jnp.dot(X[2 * d:2 * d + n], w_half[2], preferred_element_type=acc_dtype)
                return acc

            conv_a = taps(wd[g, :, :, :C]) + bd[g, 0, :C][None, :]
            if gate_on:
                conv_b = taps(wd[g, :, :, C:]) + bd[g, 0, C:][None, :]
                gate = (jnp.tanh(conv_a) * jax.nn.sigmoid(conv_b)).astype(W.dtype)
            else:
                gate = conv_a.astype(W.dtype)

            res = jnp.dot(gate, wrs[g, :, :C], preferred_element_type=acc_dtype) + brs[g, 0, :C][None, :]
            skip = jnp.dot(gate, wrs[g, :, C:], preferred_element_type=acc_dtype) + brs[g, 0, C:][None, :]
            W_ref[rb, lo:hi] = ((W[lo:hi] + res) * math.sqrt(0.5)).astype(W.dtype)
            skip_accs[rb] = skip_accs[rb] + skip[H - lo:H - lo + TL].astype(skip_accs[rb].dtype)

    for rb in range(RB):
        h_out[rb] = W_ref[rb, H:H + TL]
        skip_out[rb] = skip_accs[rb].astype(skip_out.dtype)


@functools.partial(jax.jit, static_argnames=("dilations", "tile_l", "rb", "gate_on", "mask_on"))
def group_v2(h, t_bias, w_dil, b_dil, w_rs, b_rs, dilations, tile_l=1024, rb=1,
             gate_on=True, mask_on=True):
    Bs, Ls, Cs = h.shape
    G = len(dilations)
    TL = tile_l
    H = max(8, int(sum(dilations)))
    H = 1 << (H - 1).bit_length()
    assert H <= TL and TL % H == 0
    L_pad = -(-Ls // TL) * TL
    if L_pad != Ls:
        h = jnp.pad(h, ((0, 0), (0, L_pad - Ls), (0, 0)))
    n_tiles = L_pad // TL
    n_halo = L_pad // H
    dtype = h.dtype
    t_bias = jnp.swapaxes(t_bias, 0, 1).astype(dtype)
    w_dil = w_dil.astype(dtype)
    w_rs = w_rs.astype(dtype)
    b_dil = b_dil.astype(jnp.float32)[:, None, :]
    b_rs = b_rs.astype(jnp.float32)[:, None, :]

    r = TL // H
    view = lambda imap: pl.BlockSpec((rb, TL, Cs), imap, memory_space=pltpu.VMEM)
    halo = lambda imap: pl.BlockSpec((rb, H, Cs), imap, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Bs // rb, n_tiles),
        scratch_shapes=[pltpu.VMEM((rb, TL + 2 * H, Cs), dtype)],
        in_specs=[
            halo(lambda b, i: (b, jnp.maximum(i * r - 1, 0), 0)),
            view(lambda b, i: (b, i, 0)),
            halo(lambda b, i: (b, jnp.minimum((i + 1) * r, n_halo - 1), 0)),
            pl.BlockSpec((rb, G, Cs), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[view(lambda b, i: (b, i, 0)), view(lambda b, i: (b, i, 0))],
    )
    kern = functools.partial(_kernel, tuple(dilations), H, TL, Ls, Cs, rb, gate_on, mask_on)
    h_next, skip = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((Bs, L_pad, Cs), dtype)] * 2,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(h, h, h, t_bias, w_dil, b_dil, w_rs, b_rs)
    return h_next[:, :Ls], skip[:, :Ls]


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def bench(dils, tl, rb, gate_on=True, mask_on=True, tag=""):
    G = len(dils)
    h = jax.random.normal(jax.random.PRNGKey(3), (B, L, C), DT)
    tb = jax.random.normal(jax.random.PRNGKey(7), (G, B, C), DT)
    wd = jax.random.normal(jax.random.PRNGKey(8), (G, 3, C, 2 * C), DT) * 0.05
    bd = jnp.zeros((G, 2 * C), jnp.float32)
    wrs = jax.random.normal(jax.random.PRNGKey(9), (G, C, 2 * C), DT) * 0.05
    brs = jnp.zeros((G, 2 * C), jnp.float32)
    blk_flops = 2 * B * L * C * 2 * C * 4
    try:
        f = functools.partial(group_v2, dilations=dils, tile_l=tl, rb=rb,
                              gate_on=gate_on, mask_on=mask_on)
        dt = timeit(f, h, tb, wd, bd, wrs, brs)
        print(f"{tag:28s} dils={dils} TL={tl} rb={rb} gate={int(gate_on)} mask={int(mask_on)}: "
              f"{dt*1e3:7.2f} ms, {dt/G*1e3:6.2f} ms/blk ({G*blk_flops/dt/1e12:5.1f} TF/s)")
    except Exception as e:
        print(f"{tag:28s} dils={dils} TL={tl} rb={rb}: FAIL {str(e)[:100]}")


if __name__ == "__main__":
    sm = (1, 2, 4, 8, 16, 32)
    bench(sm, 1024, 1, tag="baseline")
    bench(sm, 1024, 1, gate_on=False, tag="no gate")
    bench(sm, 1024, 1, mask_on=False, tag="no mask")
    bench(sm, 1024, 1, gate_on=False, mask_on=False, tag="matmuls only")
    bench(sm, 1024, 2, tag="rb=2")
    bench(sm, 1024, 4, tag="rb=4")
    bench(sm, 2048, 1, tag="TL=2048")
    bench(sm, 2048, 2, tag="TL=2048 rb2")
    bench((64, 128, 256), 1024, 1, tag="mid dils")
    bench((64, 128, 256), 2048, 2, tag="mid dils TL2048 rb2")
    bench((512, 1024), 2048, 1, tag="big dils")
    bench((2048,), 2048, 1, tag="d=2048")
    bench((512, 1024, 2048), 4096, 1, tag="big3 TL4096")
