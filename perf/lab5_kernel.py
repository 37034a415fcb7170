"""Kernel v3: group kernel with in-kernel skip accumulation and row-split
VPU/MXU pipelining. Candidate for ops/pallas/wavenet_stack.py.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_v3(dils, H, TL, L_real, C, NSPLIT, x_prev, x_cur, x_next, skip_in,
               t_bias, wd, bd, wrs, brs, h_out, skip_out, W_ref, *, acc_dtype=jnp.float32):
    i = pl.program_id(1)
    S = TL + 2 * H

    W_ref[0:H] = x_prev[0][:]
    W_ref[H:H + TL] = x_cur[0][:]
    W_ref[H + TL:] = x_next[0][:]

    base = i * TL - H
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) + base
    valid = jnp.logical_and(rows >= 0, rows < L_real)

    skip_out[0] = skip_in[0][:]
    for g, d in enumerate(dils):
        lo, hi = d, S - d
        n = hi - lo
        W = W_ref[:]
        X = jnp.where(valid, W + t_bias[0, g], 0.0).astype(W.dtype)

        # row-split: chunks pipeline VPU (gate, update) under MXU (next chunk's taps)
        chunk = max(64, ((n // NSPLIT) // 64) * 64)
        nsp = min(NSPLIT, max(1, n // chunk))
        offs = [c * chunk for c in range(nsp)]
        sizes = [chunk] * (nsp - 1) + [n - chunk * (nsp - 1)]

        for off, sz in zip(offs, sizes):
            def taps(w_half):
                acc = jnp.dot(X[off:off + sz], w_half[0], preferred_element_type=acc_dtype)
                acc += jnp.dot(X[d + off:d + off + sz], w_half[1], preferred_element_type=acc_dtype)
                acc += jnp.dot(X[2 * d + off:2 * d + off + sz], w_half[2], preferred_element_type=acc_dtype)
                return acc

            conv_a = taps(wd[g, :, :, :C]) + bd[g, 0, :C][None, :]
            conv_b = taps(wd[g, :, :, C:]) + bd[g, 0, C:][None, :]
            gate = (jnp.tanh(conv_a) * jax.nn.sigmoid(conv_b)).astype(W.dtype)

            rs = jnp.dot(gate, wrs[g], preferred_element_type=acc_dtype) + brs[g, 0][None, :]
            W_ref[lo + off:lo + off + sz] = (
                (W[lo + off:lo + off + sz] + rs[:, :C]) * math.sqrt(0.5)
            ).astype(W.dtype)
            # skip rows overlapping the central TL window (static slices)
            a = max(H - lo - off, 0)            # start within this chunk
            b_ = min(H + TL - lo - off, sz)     # end within this chunk
            if b_ > a:
                ds_ = lo + off + a - H          # dest offset in [0, TL)
                skip_out[0, ds_:ds_ + (b_ - a)] = (
                    skip_out[0, ds_:ds_ + (b_ - a)] + rs[a:b_, C:].astype(skip_out.dtype)
                )

    h_out[0] = W_ref[H:H + TL]


@functools.partial(jax.jit, static_argnames=("dilations", "tile_l", "nsplit"))
def group_v3(h, skip_sum, t_bias, w_dil, b_dil, w_rs, b_rs, dilations, tile_l=1024, nsplit=1):
    """Returns (h_next, skip_sum + group skips). skip_sum is accumulated
    in-kernel (one read + one write instead of a separate XLA add)."""
    B, L, C = h.shape
    G = len(dilations)
    TL = tile_l
    H = max(8, int(sum(dilations)))
    H = 1 << (H - 1).bit_length()
    assert H <= TL and TL % H == 0
    L_pad = -(-L // TL) * TL
    if L_pad != L:
        h = jnp.pad(h, ((0, 0), (0, L_pad - L), (0, 0)))
        skip_sum = jnp.pad(skip_sum, ((0, 0), (0, L_pad - L), (0, 0)))
    n_tiles = L_pad // TL
    n_halo = L_pad // H
    dtype = h.dtype
    t_bias = jnp.swapaxes(t_bias, 0, 1).astype(dtype)
    w_dil = w_dil.astype(dtype)
    w_rs = w_rs.astype(dtype)
    b_dil = b_dil.astype(jnp.float32)[:, None, :]
    b_rs = b_rs.astype(jnp.float32)[:, None, :]

    r = TL // H
    view = lambda: pl.BlockSpec((1, TL, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    halo = lambda imap: pl.BlockSpec((1, H, C), imap, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        scratch_shapes=[pltpu.VMEM((TL + 2 * H, C), dtype)],
        in_specs=[
            halo(lambda b, i: (b, jnp.maximum(i * r - 1, 0), 0)),
            view(),
            halo(lambda b, i: (b, jnp.minimum((i + 1) * r, n_halo - 1), 0)),
            view(),  # skip_in
            pl.BlockSpec((1, G, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[view(), view()],
    )
    kern = functools.partial(_kernel_v3, tuple(dilations), H, TL, L, C, nsplit)
    h_next, skip = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((B, L_pad, C), dtype)] * 2,
        grid_spec=grid_spec,
        input_output_aliases={3: 1},  # skip_in buffer donated to skip_out
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(h, h, h, skip_sum, t_bias, w_dil, b_dil, w_rs, b_rs)
    return h_next[:, :L], skip[:, :L]
