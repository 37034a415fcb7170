"""Pallas TPU kernel: fused WaveNet residual block.

One kernel per dilation computes, for a (batch-row, L-tile) grid cell:

    window = zero-masked haloed slice of h, + per-sample timestep bias
    conv   = Σ_k window[k·d : k·d+TL] @ W_dil[k]      (3 shifted MXU matmuls)
    gate   = tanh(conv[:, :C]) · σ(conv[:, C:])
    rs     = gate @ W_rs + b_rs                        (merged res|skip matmul)
    h'     = (h + rs[:, :C]) · √½ ;  skip = rs[:, C:]

Fusing keeps ``conv``/``gate`` in VMEM: per block the XLA version streams
~5.5 GB through HBM at batch 64 (conv out, gate, res, skip round-trips);
this kernel reads h (+2·d/TL halo) and writes h'/skip only (~2 GB) — the
measured XLA path is ~50% MFU and partially BW-bound (see bench notes).

The halo is assembled from the previous/current/next L-tiles via three
BlockSpec views of the same array (d ≤ TL required — max reference dilation
2048 with TL=2048). L is padded to a TL multiple; out-of-range rows are
zero-masked, which reproduces the conv's zero 'SAME' padding exactly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(d, H, TL, L_real, C, x_prev, x_cur, x_next, t_bias, wd, bd, wrs, brs, h_out, skip_out, x3_ref, *, acc_dtype):
    i = pl.program_id(1)

    cur = x_cur[0]
    window = jnp.concatenate([x_prev[0][H - d :], cur, x_next[0][:d]], axis=0)  # (TL+2d, C)

    base = i * TL - d
    rows = jax.lax.broadcasted_iota(jnp.int32, (TL + 2 * d, 1), 0) + base
    valid = jnp.logical_and(rows >= 0, rows < L_real)
    window = jnp.where(valid, window + t_bias[0], 0.0).astype(window.dtype)

    # one (TL, 3C) @ (3C, 2C) matmul instead of 3 K=C matmuls: deeper K keeps
    # the MXU pipeline full (wd arrives reshaped (3C, 2C)); the shifted slices
    # are staged through VMEM scratch — Mosaic cannot concat offset vectors
    x3_ref[:, 0:C] = window[0:TL]
    x3_ref[:, C : 2 * C] = window[d : d + TL]
    x3_ref[:, 2 * C :] = window[2 * d : 2 * d + TL]
    conv = jnp.dot(x3_ref[:], wd[:], preferred_element_type=acc_dtype)
    conv += bd[0][None, :]

    gate = (jnp.tanh(conv[:, :C]) * jax.nn.sigmoid(conv[:, C:])).astype(window.dtype)
    rs = jnp.dot(gate, wrs[:], preferred_element_type=acc_dtype) + brs[0][None, :]

    # residual adds the t-biased input rows (reference's in-place ``h += part_t``);
    # window rows [d, d+TL) are exactly cur + t_bias (masked)
    h_out[0] = ((window[d:d + TL] + rs[:, :C]) * math.sqrt(0.5)).astype(h_out.dtype)
    skip_out[0] = rs[:, C:].astype(skip_out.dtype)


@functools.partial(
    jax.jit, static_argnames=("dilation", "tile_l", "interpret")
)
def fused_residual_block(
    h: jnp.ndarray,  # (B, L, C)
    t_bias: jnp.ndarray,  # (B, C) — Dense(fc_t) of the shared embedding
    w_dil: jnp.ndarray,  # (3, C, 2C)
    b_dil: jnp.ndarray,  # (2C,)
    w_rs: jnp.ndarray,  # (C, 2C) — [res | skip] merged
    b_rs: jnp.ndarray,  # (2C,)
    dilation: int = 1,
    tile_l: int = 1024,
    interpret: bool = False,
):
    """Returns (h_next (B,L,C), skip (B,L,C))."""
    B, L, C = h.shape
    d = dilation
    TL = tile_l
    assert d <= TL, f"dilation {d} must be <= tile {TL}"
    L_pad = -(-L // TL) * TL
    if L_pad != L:
        h = jnp.pad(h, ((0, 0), (0, L_pad - L), (0, 0)))
    n_tiles = L_pad // TL

    dtype = h.dtype
    t_bias = t_bias.astype(dtype)[:, None, :]  # (B, 1, C): TPU-tileable block
    w_dil = w_dil.astype(dtype).reshape(3 * C, 2 * C)  # stacked-K layout
    w_rs = w_rs.astype(dtype)
    b_dil = b_dil.astype(jnp.float32)[None, :]
    b_rs = b_rs.astype(jnp.float32)[None, :]

    # halo inputs fetch exactly H rows of the neighboring tiles instead of
    # whole tiles — for small dilations this cuts the per-cell DMA from 3
    # full tiles to TL+2H rows. H must be pow2 (sublane-aligned) and divide
    # TL, or the i*r-1 neighbor index maps silently fetch the wrong rows
    # (same guards as wavenet_stack.py / wavenet_group.py).
    H = max(8, d)
    H = 1 << (H - 1).bit_length()
    assert H >= d and TL % H == 0, (d, H, TL)
    n_halo = L_pad // H
    view = lambda imap: pl.BlockSpec((1, TL, C), imap, memory_space=pltpu.VMEM)
    halo = lambda imap: pl.BlockSpec((1, H, C), imap, memory_space=pltpu.VMEM)
    r = TL // H
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        scratch_shapes=[pltpu.VMEM((TL, 3 * C), dtype)],
        in_specs=[
            halo(lambda b, i: (b, jnp.maximum(i * r - 1, 0), 0)),
            view(lambda b, i: (b, i, 0)),
            halo(lambda b, i: (b, jnp.minimum((i + 1) * r, n_halo - 1), 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * C), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            view(lambda b, i: (b, i, 0)),
            view(lambda b, i: (b, i, 0)),
        ],
    )
    kern = functools.partial(_kernel, d, H, TL, L, C, acc_dtype=jnp.float32)
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


def reference_residual_block(h, t_bias, w_dil, b_dil, w_rs, b_rs, dilation: int = 1):
    """Pure-jnp reference of the same math (for kernel validation and the
    d > tile fallback). Preserves h's dtype (f32 biases are downcast after
    the add so a bf16 pipeline stays bf16)."""
    dtype = h.dtype
    x = h + t_bias.astype(dtype)[:, None, :]
    pad = dilation
    conv = jax.lax.conv_general_dilated(
        x, w_dil.astype(dtype), window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b_dil.astype(dtype)[None, None, :]
    C = h.shape[-1]
    gate = jnp.tanh(conv[..., :C]) * jax.nn.sigmoid(conv[..., C:])
    rs = gate @ w_rs.astype(dtype) + b_rs.astype(dtype)[None, None, :]
    # x (= h + part_t) in the residual: the reference's ``h += part_t``
    # mutates its input in place (WaveNet.py:84)
    return (x + rs[..., :C]) * math.sqrt(0.5), rs[..., C:]
