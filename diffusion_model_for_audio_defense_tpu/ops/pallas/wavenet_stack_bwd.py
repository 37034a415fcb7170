"""Pallas TPU backward path for the fused WaveNet residual block.

Completes the differentiable fast path: training steps and adaptive attacks
(reference ``white_box_attack.py`` backprop through the purifier,
``DiffWave_Unconditional/train.py`` loss grads) ride the same fused-kernel
path as inference instead of XLA's generic fusions.

Math (block forward, ``WaveNet.py:53-97`` parity — note the reference's
``h += part_t`` mutates x in place, so t_bias is in the residual too):
    X    = mask · (h_in + t_bias)
    pre  = Σ_k X[r+(k-1)d] @ Wd[k] + bd          (2C channels = [a|b])
    gate = tanh(pre_a) · σ(pre_b)
    rs   = gate @ Wrs + brs
    h'   = (X + rs[:, :C]) · √½ ;  skip' = skip + rs[:, C:]

Backward given (dh', dskip'):
    d_rs   = [√½·dh' | dskip']
    dgate  = d_rs @ Wrsᵀ
    dpre_a = dgate·σ(b)·(1−tanh²a) ;  dpre_b = dgate·tanh(a)·σ(b)(1−σ(b))
    dX[s]  = Σ_k dpre[s−(k−1)d] @ Wd[k]ᵀ
    dh_in  = √½·dh' + mask·dX ;  dskip_in = dskip' (pass-through)
    dtb    = Σ_rows mask·(dX + √½·dh') ;  dWd[k] = X_shiftᵀ dpre ;  dWrs = gateᵀ d_rs

Design: the AD forward (``fused_block_fwd_pre``) STORES the pre-activation
``pre`` (B, L, 2C) alongside the chain state. The first version of this
module recomputed ``pre`` in the backward from ``h_in`` — that costs three
extra matmuls over the halo-extended grad frame (S = TL+2d rows, 2× the
tile at large dilations), ~(4s+7) matmul units per block vs (s+7) with the
stored ``pre`` (s = S/TL ∈ [1, 2]). Storing it trades one (B, L, 2C) HBM
round-trip (~0.7 ms/block at B=16) for up to 40% of the backward FLOPs.
Each tile needs ``pre`` and the upstream grads with a d halo and ``h_in``
with a d halo (for the weight-grad taps); weight grads accumulate across
the sequential TPU grid into constant-index blocks so halo rows are never
double counted.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = math.sqrt(0.5)


# --------------------------------------------------------------------------
# AD forward: singleton residual block that also emits the pre-activation
# --------------------------------------------------------------------------

def _block_fwd_pre_kernel(d, H, TL, L_real, C,
                          x_prev, x_cur, x_next, skip_in, t_bias, wd, bd, wrs, brs,
                          h_out, skip_out, pre_out, W_ref):
    i = pl.program_id(1)
    S = TL + 2 * H
    f32 = jnp.float32

    W_ref[0:H] = x_prev[0][:]
    W_ref[H:H + TL] = x_cur[0][:]
    W_ref[H + TL:] = x_next[0][:]
    base = i * TL - H
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) + base
    valid = jnp.logical_and(rows >= 0, rows < L_real)
    W = W_ref[:]
    X = jnp.where(valid, W + t_bias[0, 0], 0.0).astype(W.dtype)

    lo, hi = d, S - d
    n = hi - lo
    acc = jnp.dot(X[0:n], wd[0], preferred_element_type=f32)
    acc += jnp.dot(X[d:d + n], wd[1], preferred_element_type=f32)
    acc += jnp.dot(X[2 * d:2 * d + n], wd[2], preferred_element_type=f32)
    pre = acc + bd[0][None, :]
    # sigmoid stays f32: Mosaic's bf16 logistic lowering is broken (jax 0.9)
    gate = (jnp.tanh(pre[:, :C]) * jax.nn.sigmoid(pre[:, C:])).astype(W.dtype)
    rs = jnp.dot(gate, wrs[:], preferred_element_type=f32) + brs[0][None, :]
    # residual adds X = h + t_bias (reference's in-place ``h += part_t``)
    h_new = ((X[lo:hi] + rs[:, :C]) * _SQRT_HALF).astype(W.dtype)

    # central TL rows sit at scratch [H, H+TL) ↔ computed rows [H-d, H-d+TL)
    c0 = H - d
    h_out[0] = h_new[c0:c0 + TL]
    skip_out[0] = skip_in[0][:] + rs[c0:c0 + TL, C:].astype(skip_out.dtype)
    pre_out[0] = pre[c0:c0 + TL].astype(pre_out.dtype)


@functools.partial(jax.jit, static_argnames=("dilation", "tile_l", "l_real", "interpret"))
def fused_block_fwd_pre(
    h: jnp.ndarray,        # (B, L, C), L a multiple of tile_l (pad-once layout)
    skip_sum: jnp.ndarray,  # (B, L, C) running skip accumulator (aliased)
    t_bias: jnp.ndarray,   # (B, C)
    w_dil: jnp.ndarray,    # (3, C, 2C)
    b_dil: jnp.ndarray,    # (2C,)
    w_rs: jnp.ndarray,     # (C, 2C)
    b_rs: jnp.ndarray,     # (2C,)
    dilation: int,
    tile_l: int,
    l_real: int,
    interpret: bool = False,
):
    """One singleton residual block; returns ``(h', skip', pre)``.

    Numerically identical to ``fused_group_stack`` with ``G=1`` (same tap
    order, f32 accumulation); additionally writes the central-rows
    pre-activation for the Pallas VJP (`residual_block_grad`).
    """
    B, L, C = h.shape
    d = int(dilation)
    H = max(8, d)
    H = 1 << (H - 1).bit_length()
    TL = int(tile_l)
    assert H <= TL and TL % H == 0 and L % TL == 0, (d, H, TL, L)
    dtype = h.dtype
    n_tiles = L // TL
    n_halo = L // H
    r = TL // H

    t_bias = t_bias.astype(dtype)[:, None, :]
    wd = w_dil.astype(dtype)
    wrs = w_rs.astype(dtype)
    bd = b_dil.astype(jnp.float32)[None, :]
    brs = b_rs.astype(jnp.float32)[None, :]

    view = lambda c=C: pl.BlockSpec((1, TL, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        scratch_shapes=[pltpu.VMEM((TL + 2 * H, C), dtype)],
        in_specs=[
            pl.BlockSpec((1, H, C), lambda b, i: (b, jnp.maximum(i * r - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            view(),
            pl.BlockSpec((1, H, C), lambda b, i: (b, jnp.minimum((i + 1) * r, n_halo - 1), 0),
                         memory_space=pltpu.VMEM),
            view(),  # skip_in
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[view(), view(), view(2 * C)],
    )
    kern = functools.partial(_block_fwd_pre_kernel, d, H, TL, int(l_real), C)
    h2, skip2, pre = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((B, L, C), dtype),
            jax.ShapeDtypeStruct((B, L, C), dtype),
            jax.ShapeDtypeStruct((B, L, 2 * C), dtype),
        ],
        grid_spec=grid_spec,
        input_output_aliases={3: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(h, h, h, skip_sum, t_bias, wd, bd, wrs, brs)
    return h2, skip2, pre


# --------------------------------------------------------------------------
# Backward: consumes the stored pre-activation
# --------------------------------------------------------------------------

def _block_bwd_kernel(d, HU, TL, L_pad, L_real, C,
                      hp, hc, hn,
                      pp, pc, pn,
                      gp, gc, gn, sp, sc, sn,
                      t_bias, wd_t, wrs_t,
                      dh_out, dtb_out, dwd_out, dbd_out, dwrs_out, dbrs_out,
                      X_ref):
    b = pl.program_id(0)
    i = pl.program_id(1)
    # halo unit HU = max(8, d) (Mosaic needs >=8-row blocks); one HU-block
    # per side covers the d halo of h_in / pre / the upstream grads
    S = TL + 2 * HU      # frame: rows [i·TL−HU, (i+1)·TL+HU)
    f32 = jnp.float32

    # ---- stage h_in (+t_bias, masked): only the weight-grad taps need it
    X_ref[0:HU] = hp[0][:]
    X_ref[HU:HU + TL] = hc[0][:]
    X_ref[HU + TL:] = hn[0][:]
    base = i * TL - HU
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) + base
    validx = jnp.logical_and(rows >= 0, rows < L_real)
    X = jnp.where(validx, X_ref[:] + t_bias[0, 0], 0.0).astype(X_ref.dtype)

    # ---- upstream grads with the same halo, masked to the padded extent
    validg = jnp.logical_and(rows >= 0, rows < L_pad)
    dh = jnp.concatenate([gp[0][:], gc[0][:], gn[0][:]], axis=0)
    ds = jnp.concatenate([sp[0][:], sc[0][:], sn[0][:]], axis=0)
    d_rs = jnp.where(
        validg,
        jnp.concatenate([_SQRT_HALF * dh.astype(f32), ds.astype(f32)], axis=-1),
        0.0,
    ).astype(X.dtype)

    # ---- stored pre over the frame (halo rows beyond the array clip to a
    #      duplicated edge block: finite garbage, zeroed through d_rs==0)
    pre = jnp.concatenate([pp[0][:], pc[0][:], pn[0][:]], axis=0).astype(f32)
    ta = jnp.tanh(pre[:, :C])
    sb = jax.nn.sigmoid(pre[:, C:])

    dgate = jnp.dot(d_rs, wrs_t[:], preferred_element_type=f32)  # (S, C)
    dpa = dgate * sb * (1.0 - ta * ta)
    dpb = dgate * ta * sb * (1.0 - sb)
    dpre = jnp.concatenate([dpa, dpb], axis=-1).astype(X.dtype)

    # ---- dX over the tile rows s: dpre frame indices {s+HU+d, s+HU, s+HU−d}
    dX = jnp.dot(dpre[HU + d:HU + d + TL], wd_t[0], preferred_element_type=f32)
    dX += jnp.dot(dpre[HU:HU + TL], wd_t[1], preferred_element_type=f32)
    dX += jnp.dot(dpre[HU - d:HU - d + TL], wd_t[2], preferred_element_type=f32)
    vx_tile = validx[HU:HU + TL]
    dX = jnp.where(vx_tile, dX, 0.0)
    dh_out[0] = (_SQRT_HALF * dh[HU:HU + TL].astype(f32) + dX).astype(dh_out.dtype)

    # ---- accumulated grads (constant-index outputs; TPU grid is sequential)
    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init_w():
        dwd_out[...] = jnp.zeros_like(dwd_out)
        dbd_out[...] = jnp.zeros_like(dbd_out)
        dwrs_out[...] = jnp.zeros_like(dwrs_out)
        dbrs_out[...] = jnp.zeros_like(dbrs_out)

    @pl.when(i == 0)
    def _init_tb():
        dtb_out[0, 0] = jnp.zeros_like(dtb_out[0, 0])

    # conv path + the direct residual path (h' = (h+tb+rs)·√½ ⇒ ∂h'/∂tb ∋ √½)
    dh_tile = jnp.where(vx_tile, dh[HU:HU + TL].astype(f32), 0.0)
    dtb_out[0, 0] += (jnp.sum(dX, axis=0)
                      + _SQRT_HALF * jnp.sum(dh_tile, axis=0)).astype(dtb_out.dtype)

    # weight grads use only the tile's own dpre rows (frame [HU, HU+TL)),
    # so halo rows are never double counted across tiles
    dpre_t = dpre[HU:HU + TL].astype(f32)
    for k in range(3):
        lo = HU + (k - 1) * d
        dwd_out[k] += jnp.dot(
            X[lo:lo + TL].astype(f32).T, dpre_t,
            preferred_element_type=f32).astype(dwd_out.dtype)
    dbd_out[0] += jnp.sum(dpre_t, axis=0).astype(dbd_out.dtype)
    gate_t = (ta[HU:HU + TL] * sb[HU:HU + TL]).astype(f32)
    dwrs_out[...] += jnp.dot(gate_t.T, d_rs[HU:HU + TL].astype(f32),
                             preferred_element_type=f32).astype(dwrs_out.dtype)
    dbrs_out[0] += jnp.sum(d_rs[HU:HU + TL].astype(f32), axis=0).astype(dbrs_out.dtype)


# --------------------------------------------------------------------------
# Input-only backward: adaptive attacks differentiate w.r.t. the waveform
# only (reference ``white_box_attack.py`` PGD/CW loops), so the weight-grad
# outer products (dWd: 3 units, dWrs: 1 of the ~s+7 matmul units/block) and
# the h_in/t_bias staging they need are dead weight. This kernel keeps just
# dgate → dpre → dX: ~(s+3) units, and the only stashed activation is pre.
# --------------------------------------------------------------------------

def _block_bwd_x_kernel(d, HU, TL, L_pad, L_real, C,
                        pp, pc, pn,
                        gp, gc, gn, sp, sc, sn,
                        wd_t, wrs_t,
                        dh_out):
    i = pl.program_id(1)
    S = TL + 2 * HU
    f32 = jnp.float32

    base = i * TL - HU
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) + base
    validg = jnp.logical_and(rows >= 0, rows < L_pad)
    dh = jnp.concatenate([gp[0][:], gc[0][:], gn[0][:]], axis=0)
    ds = jnp.concatenate([sp[0][:], sc[0][:], sn[0][:]], axis=0)
    d_rs = jnp.where(
        validg,
        jnp.concatenate([_SQRT_HALF * dh.astype(f32), ds.astype(f32)], axis=-1),
        0.0,
    ).astype(dh.dtype)

    pre = jnp.concatenate([pp[0][:], pc[0][:], pn[0][:]], axis=0).astype(f32)
    ta = jnp.tanh(pre[:, :C])
    sb = jax.nn.sigmoid(pre[:, C:])

    dgate = jnp.dot(d_rs, wrs_t[:], preferred_element_type=f32)
    dpa = dgate * sb * (1.0 - ta * ta)
    dpb = dgate * ta * sb * (1.0 - sb)
    dpre = jnp.concatenate([dpa, dpb], axis=-1).astype(dh.dtype)

    dX = jnp.dot(dpre[HU + d:HU + d + TL], wd_t[0], preferred_element_type=f32)
    dX += jnp.dot(dpre[HU:HU + TL], wd_t[1], preferred_element_type=f32)
    dX += jnp.dot(dpre[HU - d:HU - d + TL], wd_t[2], preferred_element_type=f32)
    vx_tile = validg[HU:HU + TL]  # dX mask: rows < L_real also masked below
    rows_t = rows[HU:HU + TL]
    dX = jnp.where(jnp.logical_and(vx_tile, rows_t < L_real), dX, 0.0)
    dh_out[0] = (_SQRT_HALF * dh[HU:HU + TL].astype(f32) + dX).astype(dh_out.dtype)


@functools.partial(jax.jit, static_argnames=("dilation", "tile_l", "l_real", "interpret"))
def residual_block_grad_x(
    pre: jnp.ndarray,      # (B, L, 2C) stored pre-activation from the forward
    dh_out: jnp.ndarray,   # (B, L, C) cotangent of h'
    dskip: jnp.ndarray,    # (B, L, C) cotangent of skip'
    w_dil: jnp.ndarray,    # (3, C, 2C)
    w_rs: jnp.ndarray,     # (C, 2C)
    dilation: int,
    tile_l: int = None,
    l_real: int = None,
    interpret: bool = False,
):
    """Input-only VJP of one singleton residual block: returns ``dh_in``.

    The skip cotangent passes through unchanged at the caller; parameter
    cotangents are zero by contract (attack mode — see
    ``wavenet_apply_stack(grad_params=False)``).
    """
    B, L, C = dh_out.shape
    d = int(dilation)
    HU = max(8, d)
    TL = tile_l if tile_l is not None else max(1024, 2 * HU)
    TL = max(TL, HU)
    assert L % TL == 0 and TL % HU == 0, (L, TL, d)
    l_real = L if l_real is None else l_real
    dtype = dh_out.dtype
    n_tiles = L // TL
    n_halo = L // HU
    r = TL // HU

    wd_t = jnp.swapaxes(w_dil, 1, 2).astype(dtype)
    wrs_t = jnp.swapaxes(w_rs, 0, 1).astype(dtype)

    view = lambda c=C: pl.BlockSpec((1, TL, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    halo = lambda off, c=C: pl.BlockSpec(
        (1, HU, c),
        lambda b, i, o=off: (b, jnp.clip(i * r + o, 0, n_halo - 1), 0),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        in_specs=[
            halo(-1, 2 * C), view(2 * C), halo(r, 2 * C),               # pre
            halo(-1), view(), halo(r),                                  # dh_out
            halo(-1), view(), halo(r),                                  # dskip
            full(), full(),                                             # wd_t, wrs_t
        ],
        out_specs=[view()],
    )
    kern = functools.partial(_block_bwd_x_kernel, d, HU, TL, L, l_real, C)
    (dh_in,) = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((B, L, C), dtype)],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(pre, pre, pre,
      dh_out, dh_out, dh_out, dskip, dskip, dskip,
      wd_t, wrs_t)
    return dh_in


@functools.partial(jax.jit, static_argnames=("dilation", "tile_l", "l_real", "interpret"))
def residual_block_grad(
    h_in: jnp.ndarray,     # (B, L, C) block input (forward chain state)
    pre: jnp.ndarray,      # (B, L, 2C) stored pre-activation from the forward
    dh_out: jnp.ndarray,   # (B, L, C) cotangent of h'
    dskip: jnp.ndarray,    # (B, L, C) cotangent of skip'
    t_bias: jnp.ndarray,   # (B, C)
    w_dil: jnp.ndarray,    # (3, C, 2C)
    w_rs: jnp.ndarray,     # (C, 2C)
    dilation: int,
    tile_l: int = None,
    l_real: int = None,
    interpret: bool = False,
):
    """VJP of one singleton residual block.

    Returns ``(dh_in, dt_bias, dw_dil, db_dil, dw_rs, db_rs)``; the skip
    cotangent passes through unchanged (``dskip_in = dskip``) at the caller.
    ``L`` must be a multiple of ``tile_l`` (the pad-once stack layout) with
    the true length in ``l_real``.
    """
    B, L, C = h_in.shape
    d = int(dilation)
    HU = max(8, d)
    TL = tile_l if tile_l is not None else max(1024, 2 * HU)
    TL = max(TL, HU)
    assert L % TL == 0 and TL % HU == 0, (L, TL, d)
    l_real = L if l_real is None else l_real
    dtype = h_in.dtype
    n_tiles = L // TL
    n_halo = L // HU
    r = TL // HU

    t_bias = t_bias.astype(dtype)[:, None, :]  # (B,1,C): Mosaic block-shape rule
    wd_t = jnp.swapaxes(w_dil, 1, 2).astype(dtype)    # (3, 2C, C)
    wrs_t = jnp.swapaxes(w_rs, 0, 1).astype(dtype)    # (2C, C)

    view = lambda c=C: pl.BlockSpec((1, TL, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    halo = lambda off, c=C: pl.BlockSpec(
        (1, HU, c),
        lambda b, i, o=off: (b, jnp.clip(i * r + o, 0, n_halo - 1), 0),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        scratch_shapes=[pltpu.VMEM((TL + 2 * HU, C), dtype)],
        in_specs=[
            halo(-1), view(), halo(r),                                  # h_in
            halo(-1, 2 * C), view(2 * C), halo(r, 2 * C),               # pre
            halo(-1), view(), halo(r),                                  # dh_out
            halo(-1), view(), halo(r),                                  # dskip
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),  # t_bias
            full(), full(),                                             # wd_t, wrs_t
        ],
        out_specs=[
            view(),                                                     # dh_in
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),  # dtb
            const((3, C, 2 * C)), const((1, 2 * C)),                    # dwd, dbd
            const((C, 2 * C)), const((1, 2 * C)),                       # dwrs, dbrs
        ],
    )
    kern = functools.partial(_block_bwd_kernel, d, HU, TL, L, l_real, C)
    outs = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((B, L, C), dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((3, C, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, 2 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * C), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(h_in, h_in, h_in,
      pre, pre, pre,
      dh_out, dh_out, dh_out, dskip, dskip, dskip,
      t_bias, wd_t, wrs_t)
    dh_in, dtb, dwd, dbd, dwrs, dbrs = outs
    return dh_in, dtb[:, 0], dwd, dbd[0], dwrs, dbrs[0]
