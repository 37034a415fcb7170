"""Pallas TPU kernel: fused *group* of WaveNet residual blocks.

Chains G consecutive residual blocks inside one kernel: the hidden stream
stays in VMEM across blocks, so HBM sees one read of h (+Σd halo) and one
write of (h', skip-partial) for the whole group instead of per block —
the per-block XLA path is HBM-bound at ~77 TF/s on v5e (see bench notes).

Measured (v5e, B=64, bf16, TL=1024): group (1,2,4,8) = 8.65 ms/block at
124 TF/s — 1.24× XLA's in-model 10.7 ms/block. However mixing pallas calls
with XLA blocks in one jit degrades the XLA blocks' scheduling (full model
436 ms vs 387 ms pure-XLA), so ``WaveNet(use_pallas_groups=True)`` stays an
experimental flag until the large-dilation blocks are pallas-competitive
too (their Σd halo exceeds the VMEM/tile budget here).

Validity bookkeeping: the buffer spans global rows [i·TL − H, (i+1)·TL + H)
with H = Σ dilations. Block g's conv consumes d_g of halo per side; outputs
outside the shrinking valid region are garbage that later blocks never read
from (their own reads shrink in lockstep), and the final write-back takes
only the central TL rows. Rows outside [0, L) are zero-masked before every
conv, reproducing 'SAME' zero padding exactly.

Per-block math (identical to ops/pallas/wavenet_block.py):
    conv_g = Σ_k X[r+(k-1)d_g] @ Wd_g[k];  gate = tanh·σ;
    rs = gate @ Wrs_g;  h ← (h + rs[:, :C])·√½;  skip_acc += rs[:, C:]
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_kernel(dils, H, TL, L_real, C, x_prev, x_cur, x_next, t_bias, wd, bd, wrs, brs,
                  h_out, skip_out, W_ref, *, acc_dtype):
    i = pl.program_id(1)
    G = len(dils)
    S = TL + 2 * H  # buffer rows

    # assemble the haloed window
    W_ref[0:H] = x_prev[0][:]
    W_ref[H : H + TL] = x_cur[0][:]
    W_ref[H + TL :] = x_next[0][:]

    base = i * TL - H
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) + base
    valid = jnp.logical_and(rows >= 0, rows < L_real)

    skip_acc = jnp.zeros((TL, C), dtype=x_cur.dtype)  # bf16 acc matches the XLA path
    for g, d in enumerate(dils):
        W = W_ref[:]
        X = jnp.where(valid, W + t_bias[0, g], 0.0).astype(W.dtype)
        lo, hi = d, S - d  # computable output rows
        n = hi - lo
        # conv: out[r] = X[r-d]@wd0 + X[r]@wd1 + X[r+d]@wd2, split into the
        # tanh/sigmoid N-halves to halve the live f32 accumulators
        def taps(w_half):
            acc = jnp.dot(X[0 : 0 + n], w_half[0], preferred_element_type=acc_dtype)
            acc += jnp.dot(X[d : d + n], w_half[1], preferred_element_type=acc_dtype)
            acc += jnp.dot(X[2 * d : 2 * d + n], w_half[2], preferred_element_type=acc_dtype)
            return acc

        conv_a = taps(wd[g, :, :, :C]) + bd[g, 0, :C][None, :]
        conv_b = taps(wd[g, :, :, C:]) + bd[g, 0, C:][None, :]
        gate = (jnp.tanh(conv_a) * jax.nn.sigmoid(conv_b)).astype(W.dtype)

        res = jnp.dot(gate, wrs[g, :, :C], preferred_element_type=acc_dtype) + brs[g, 0, :C][None, :]
        skip = jnp.dot(gate, wrs[g, :, C:], preferred_element_type=acc_dtype) + brs[g, 0, C:][None, :]

        # residual adds X = h + part_t (reference's in-place ``h += part_t``)
        h_new = ((X[lo:hi] + res) * math.sqrt(0.5)).astype(W.dtype)
        W_ref[lo:hi] = h_new
        # central TL rows of skip: buffer rows [H, H+TL) = skip rows [H-lo, H-lo+TL)
        skip_acc = skip_acc + skip[H - lo : H - lo + TL].astype(skip_acc.dtype)

    h_out[0] = W_ref[H : H + TL]
    skip_out[0] = skip_acc.astype(skip_out.dtype)


@functools.partial(jax.jit, static_argnames=("dilations", "tile_l", "interpret"))
def fused_residual_group(
    h: jnp.ndarray,  # (B, L, C)
    t_bias: jnp.ndarray,  # (G, B, C)
    w_dil: jnp.ndarray,  # (G, 3, C, 2C)
    b_dil: jnp.ndarray,  # (G, 2C)
    w_rs: jnp.ndarray,  # (G, C, 2C)  [res | skip]
    b_rs: jnp.ndarray,  # (G, 2C)
    dilations: tuple = (1, 2, 4, 8),
    tile_l: int = 1024,
    interpret: bool = False,
):
    """Returns (h_next (B,L,C), skip_sum_of_group (B,L,C))."""
    B, L, C = h.shape
    G = len(dilations)
    TL = tile_l
    H = max(8, int(sum(dilations)))
    H = 1 << (H - 1).bit_length()  # next pow2: sublane-aligned and divides TL
    assert H <= TL, f"halo {H} (sum of dilations) must be <= tile {TL}"
    assert TL % H == 0
    L_pad = -(-L // TL) * TL
    if L_pad != L:
        h = jnp.pad(h, ((0, 0), (0, L_pad - L), (0, 0)))
    n_tiles = L_pad // TL
    n_halo = L_pad // H

    dtype = h.dtype
    t_bias = jnp.swapaxes(t_bias, 0, 1).astype(dtype)  # (B, G, C): per-b block
    w_dil = w_dil.astype(dtype)
    w_rs = w_rs.astype(dtype)
    b_dil = b_dil.astype(jnp.float32)[:, None, :]  # (G, 1, 2C)
    b_rs = b_rs.astype(jnp.float32)[:, None, :]

    view = lambda imap: pl.BlockSpec((1, TL, C), imap, memory_space=pltpu.VMEM)
    halo = lambda imap: pl.BlockSpec((1, H, C), imap, memory_space=pltpu.VMEM)
    r = TL // H
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        scratch_shapes=[pltpu.VMEM((TL + 2 * H, C), dtype)],
        in_specs=[
            halo(lambda b, i: (b, jnp.maximum(i * r - 1, 0), 0)),
            view(lambda b, i: (b, i, 0)),
            halo(lambda b, i: (b, jnp.minimum((i + 1) * r, n_halo - 1), 0)),
            pl.BlockSpec((1, G, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            view(lambda b, i: (b, i, 0)),
            view(lambda b, i: (b, i, 0)),
        ],
    )
    kern = functools.partial(_group_kernel, tuple(dilations), H, TL, L, C, acc_dtype=jnp.float32)
    h_next, skip = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((B, L_pad, C), dtype),
            jax.ShapeDtypeStruct((B, L_pad, C), dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(h, h, h, t_bias, w_dil, b_dil, w_rs, b_rs)
    if L_pad != L:
        h_next = h_next[:, :L]
        skip = skip[:, :L]
    return h_next, skip


def reference_residual_group(h, t_bias, w_dil, b_dil, w_rs, b_rs, dilations):
    """jnp chain of reference blocks (validation)."""
    from .wavenet_block import reference_residual_block

    skip_sum = jnp.zeros_like(h)
    for g, d in enumerate(dilations):
        h, skip = reference_residual_block(h, t_bias[g], w_dil[g], b_dil[g], w_rs[g], b_rs[g], dilation=d)
        skip_sum = skip_sum + skip
    return h, skip_sum
