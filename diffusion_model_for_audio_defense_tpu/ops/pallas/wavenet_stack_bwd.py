"""Pallas TPU backward kernel for the fused WaveNet residual block.

Completes the differentiable fast path: ``wavenet_stack.fused_group_stack``
is the forward (singleton plan, ~95% of chip peak); this module computes the
block VJP entirely in VMEM so training steps and adaptive attacks
(reference ``white_box_attack.py`` backprop through the purifier,
``DiffWave_Unconditional/train.py`` loss grads) ride the same kernel path
instead of XLA's generic fusions.

Math (block forward, ``WaveNet.py:53-97`` parity):
    X    = mask · (h_in + t_bias)
    pre  = Σ_k X[r+(k-1)d] @ Wd[k] + bd          (2C channels = [a|b])
    gate = tanh(pre_a) · σ(pre_b)
    rs   = gate @ Wrs + brs
    h'   = (h_in + rs[:, :C]) · √½ ;  skip' = skip + rs[:, C:]

Backward given (dh', dskip'):
    d_rs   = [√½·dh' | dskip']
    dgate  = d_rs @ Wrsᵀ
    dpre_a = dgate·σ(b)·(1−tanh²a) ;  dpre_b = dgate·tanh(a)·σ(b)(1−σ(b))
    dX[s]  = Σ_k dpre[s−(k−1)d] @ Wd[k]ᵀ
    dh_in  = √½·dh' + mask·dX ;  dskip_in = dskip' (pass-through)
    dtb    = Σ_rows mask·dX ;   dWd[k] = X_shiftᵀ dpre ;  dWrs = gateᵀ d_rs

pre/gate are REcomputed from the stored block input h_in (the forward's
chain states are materialized to HBM anyway under the all-singleton plan),
so no activation stash beyond h_in is needed. Each tile needs h_in with a
2d halo and upstream grads with a d halo; weight grads accumulate across
the sequential TPU grid into constant-index output blocks.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = math.sqrt(0.5)


def _block_bwd_kernel(d, HU, TL, L_pad, L_real, C,
                      hp2, hp1, hc, hn1, hn2,
                      gp, gc, gn, sp, sc, sn,
                      t_bias, wd, wd_t, bd, wrs_t,
                      dh_out, dtb_out, dwd_out, dbd_out, dwrs_out, dbrs_out,
                      X_ref):
    b = pl.program_id(0)
    i = pl.program_id(1)
    # halo unit HU = max(8, d) (Mosaic needs >=8-row blocks); two HU-blocks
    # per side cover the 2d halo of h_in, one per side covers d for grads
    S = TL + 2 * HU      # grad frame: rows [i·TL−HU, (i+1)·TL+HU)
    Sx = TL + 4 * HU     # h_in frame: rows [i·TL−2HU, (i+1)·TL+2HU)
    f32 = jnp.float32

    # ---- stage h_in (+t_bias, masked) into the X scratch
    X_ref[0:HU] = hp2[0][:]
    X_ref[HU:2 * HU] = hp1[0][:]
    X_ref[2 * HU:2 * HU + TL] = hc[0][:]
    X_ref[2 * HU + TL:3 * HU + TL] = hn1[0][:]
    X_ref[3 * HU + TL:] = hn2[0][:]
    base_x = i * TL - 2 * HU
    rows_x = jax.lax.broadcasted_iota(jnp.int32, (Sx, 1), 0) + base_x
    validx = jnp.logical_and(rows_x >= 0, rows_x < L_real)
    X = jnp.where(validx, X_ref[:] + t_bias[0, 0], 0.0).astype(X_ref.dtype)

    # ---- upstream grads with an HU halo, masked to the real array extent
    base_g = i * TL - HU
    rows_g = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) + base_g
    validg = jnp.logical_and(rows_g >= 0, rows_g < L_pad)
    dh = jnp.concatenate([gp[0][:], gc[0][:], gn[0][:]], axis=0)
    ds = jnp.concatenate([sp[0][:], sc[0][:], sn[0][:]], axis=0)
    d_rs = jnp.where(
        validg,
        jnp.concatenate([_SQRT_HALF * dh.astype(f32), ds.astype(f32)], axis=-1),
        0.0,
    ).astype(X.dtype)

    # ---- recompute pre over the grad frame; grad row g sits at X index
    #      g + HU, taps read X[g + HU + (k−1)d]
    lo0 = HU - d
    acc = jnp.dot(X[lo0:lo0 + S], wd[0], preferred_element_type=f32)
    acc += jnp.dot(X[lo0 + d:lo0 + d + S], wd[1], preferred_element_type=f32)
    acc += jnp.dot(X[lo0 + 2 * d:lo0 + 2 * d + S], wd[2], preferred_element_type=f32)
    pre = acc + bd[0][None, :]
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
    vx_tile = validx[2 * HU:2 * HU + TL]
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

    dtb_out[0, 0] += jnp.sum(dX, axis=0).astype(dtb_out.dtype)

    # weight grads use only the tile's own pre rows (grad frame [HU, HU+TL)),
    # so halo rows are never double counted across tiles
    dpre_t = dpre[HU:HU + TL].astype(f32)
    for k in range(3):
        lo = 2 * HU + (k - 1) * d
        dwd_out[k] += jnp.dot(
            X[lo:lo + TL].astype(f32).T, dpre_t,
            preferred_element_type=f32).astype(dwd_out.dtype)
    dbd_out[0] += jnp.sum(dpre_t, axis=0).astype(dbd_out.dtype)
    gate_t = (ta[HU:HU + TL] * sb[HU:HU + TL]).astype(f32)
    dwrs_out[...] += jnp.dot(gate_t.T, d_rs[HU:HU + TL].astype(f32),
                             preferred_element_type=f32).astype(dwrs_out.dtype)
    dbrs_out[0] += jnp.sum(d_rs[HU:HU + TL].astype(f32), axis=0).astype(dbrs_out.dtype)


@functools.partial(jax.jit, static_argnames=("dilation", "tile_l", "l_real", "interpret"))
def residual_block_grad(
    h_in: jnp.ndarray,     # (B, L, C) block input (forward chain state)
    dh_out: jnp.ndarray,   # (B, L, C) cotangent of h'
    dskip: jnp.ndarray,    # (B, L, C) cotangent of skip'
    t_bias: jnp.ndarray,   # (B, C)
    w_dil: jnp.ndarray,    # (3, C, 2C)
    b_dil: jnp.ndarray,    # (2C,)
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
    TL = max(TL, 2 * HU)
    assert L % TL == 0 and TL % HU == 0, (L, TL, d)
    l_real = L if l_real is None else l_real
    dtype = h_in.dtype
    n_tiles = L // TL
    n_halo = L // HU
    r = TL // HU

    t_bias = t_bias.astype(dtype)[:, None, :]  # (B,1,C): Mosaic block-shape rule
    wd = w_dil.astype(dtype)
    wd_t = jnp.swapaxes(w_dil, 1, 2).astype(dtype)    # (3, 2C, C)
    wrs_t = jnp.swapaxes(w_rs, 0, 1).astype(dtype)    # (2C, C)
    bd = b_dil.astype(jnp.float32)[None, :]

    view = lambda: pl.BlockSpec((1, TL, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    halo = lambda off: pl.BlockSpec(
        (1, HU, C),
        lambda b, i, o=off: (b, jnp.clip(i * r + o, 0, n_halo - 1), 0),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        scratch_shapes=[pltpu.VMEM((TL + 4 * HU, C), dtype)],
        in_specs=[
            halo(-2), halo(-1), view(), halo(r), halo(r + 1),          # h_in
            halo(-1), view(), halo(r),                                  # dh_out
            halo(-1), view(), halo(r),                                  # dskip
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),  # t_bias
            full(), full(), full(), full(),                             # wd, wd_t, bd, wrs_t
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
    )(h_in, h_in, h_in, h_in, h_in,
      dh_out, dh_out, dh_out, dskip, dskip, dskip,
      t_bias, wd, wd_t, bd, wrs_t)
    dh_in, dtb, dwd, dbd, dwrs, dbrs = outs
    return dh_in, dtb[:, 0], dwd, dbd[0], dwrs, dbrs[0]
