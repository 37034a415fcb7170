"""Pallas TPU kernel: the full WaveNet residual stack as fused group kernels.

Replaces the reference's per-block torch modules
(``DiffWave_Unconditional/WaveNet.py:53-135``) with a chain of fused Pallas
group kernels covering ALL 36 blocks — the round-2 rework of
``wavenet_group.py`` (which only fused small-dilation runs and lost to XLA
when interleaved with XLA blocks).

What makes this kernel beat the XLA path (409 ms → 207 ms forward at
B=64, L=16000, C=256, bf16 on v5e-1; 187 TF/s ≈ 95% of chip peak):

1.  Zero halo overcompute: every production block runs as a SINGLETON
    group, where the halo ``H = pow2(d) = d`` means each grid step
    computes exactly TL useful rows (a block in a G>1 group computes
    ``TL+2H-2d`` rows — up to +75% waste at d=128 under H=512).
2.  Fused block body: the 3-tap dilated conv (MXU), gated tanh·σ (VPU),
    res/skip 1×1 (MXU), h update, and skip accumulation all happen on one
    VMEM-resident tile — no im2col staging or elementwise fusions hitting
    HBM (XLA spent ~286 ms/forward there).
3.  In-kernel skip accumulation (``input_output_aliases``): the running
    skip sum rides through the kernel (read+accumulate+write) instead of
    a separate XLA add per call (~1.9 ms of HBM traffic each).
4.  Pad once, mask inside: the stack pads L→16384 a single time and
    threads ``l_real``; per-call pad/slice cost ~54 ms/forward
    ('broadcast_select_fusion' in the certify trace).
5.  No ``optimization_barrier`` between calls: pallas calls already
    sequence through data dependence, and barriers cost ~50 ms across the
    chain by stalling the DMA pipeline at every boundary.

Per-block math (parity with ``WaveNet.py:53-97``; X = h + part_t because the
reference's ``h += part_t`` mutates x in place, so part_t is in the residual):
    conv = Σ_k X[r+(k-1)d] @ Wd[k]  (k=3 taps, 'SAME' zero padding)
    gate = tanh(conv_a) · σ(conv_b)
    [res|skip] = gate @ Wrs + brs
    h' = (X + res)·√½ ;  skip_sum += skip

Validity bookkeeping: the scratch spans rows [i·TL−H, (i+1)·TL+H) with
H = next_pow2(Σ dilations); each block consumes d of halo per side, rows
outside [0, L) are zero-masked before every conv (exact 'SAME' padding),
and only the central TL rows are written back.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stack_kernel(dils, H, TL, L_real, C, NSPLIT,
                  x_prev, x_cur, x_next, skip_in, t_bias, wd, bd, wrs, brs,
                  h_out, skip_out, W_ref, *, acc_dtype=jnp.float32):
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

        # row-split pipelining: VPU(gate/update) of chunk c overlaps
        # MXU(taps) of chunk c+1
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
            # sigmoid stays f32: Mosaic's bf16 logistic lowering is broken
            # (vector.broadcast f32->bf16 verification error, jax 0.9)
            gate = (jnp.tanh(conv_a) * jax.nn.sigmoid(conv_b)).astype(W.dtype)

            rs = jnp.dot(gate, wrs[g], preferred_element_type=acc_dtype) + brs[g, 0][None, :]
            # residual adds X = h + part_t (NOT bare h): the reference's
            # ``h += part_t`` mutates x in place (WaveNet.py:84), so its
            # residual is (x + part_t + res) — verified on the torch module
            W_ref[lo + off:lo + off + sz] = (
                (X[lo + off:lo + off + sz] + rs[:, :C]) * math.sqrt(0.5)
            ).astype(W.dtype)
            a = max(H - lo - off, 0)
            b_ = min(H + TL - lo - off, sz)
            if b_ > a:
                ds_ = lo + off + a - H
                skip_out[0, ds_:ds_ + (b_ - a)] = (
                    skip_out[0, ds_:ds_ + (b_ - a)] + rs[a:b_, C:].astype(skip_out.dtype)
                )

    h_out[0] = W_ref[H:H + TL]


@functools.partial(jax.jit, static_argnames=("dilations", "tile_l", "nsplit", "l_real", "interpret"))
def fused_group_stack(
    h: jnp.ndarray,        # (B, L, C)
    skip_sum: jnp.ndarray,  # (B, L, C) running skip accumulator (donated)
    t_bias: jnp.ndarray,   # (G, B, C)
    w_dil: jnp.ndarray,    # (G, 3, C, 2C)
    b_dil: jnp.ndarray,    # (G, 2C)
    w_rs: jnp.ndarray,     # (G, C, 2C)  [res | skip]
    b_rs: jnp.ndarray,     # (G, 2C)
    dilations: tuple,
    tile_l: int = 1024,
    nsplit: int = 2,
    l_real: int | None = None,
    interpret: bool = False,
):
    """Run G chained residual blocks; returns (h', skip_sum + Σ skips).

    ``l_real``: when the caller has already padded L to a tile multiple
    (the whole-stack fast path), pass the true length here — the kernel
    masks rows ≥ l_real and no per-call pad/slice happens. A per-call
    pad+slice costs ~3 ms of HBM copies at certify shapes, ~54 ms per
    forward across 18 calls (measured via jax.profiler).
    """
    B, L, C = h.shape
    G = len(dilations)
    TL = tile_l
    H = max(8, int(sum(dilations)))
    H = 1 << (H - 1).bit_length()  # pow2: sublane-aligned, divides TL
    assert H <= TL and TL % H == 0, (dilations, H, TL)
    if l_real is not None:
        assert L % TL == 0, (L, TL)
        L_pad = L
    else:
        l_real = L
        L_pad = -(-L // TL) * TL
        if L_pad != L:
            h = jnp.pad(h, ((0, 0), (0, L_pad - L), (0, 0)))
            skip_sum = jnp.pad(skip_sum, ((0, 0), (0, L_pad - L), (0, 0)))
    n_tiles = L_pad // TL
    n_halo = L_pad // H
    dtype = h.dtype
    t_bias = jnp.swapaxes(t_bias, 0, 1).astype(dtype)  # (B, G, C)
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
    kern = functools.partial(_stack_kernel, tuple(dilations), H, TL, l_real, C, nsplit)
    h_next, skip = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((B, L_pad, C), dtype)] * 2,
        grid_spec=grid_spec,
        input_output_aliases={3: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(h, h, h, skip_sum, t_bias, w_dil, b_dil, w_rs, b_rs)
    return h_next[:, :L], skip[:, :L]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def residual_block_ad(h, skip, tb, wd, bd, wrs, brs, dilation, tile_l, l_real, interpret):
    """One singleton residual block with a Pallas VJP (forward =
    ``fused_group_stack`` G=1; backward = ``wavenet_stack_bwd``). Makes the
    fast stack differentiable for training and adaptive attacks."""
    return fused_group_stack(
        h, skip, tb[None], wd[None], bd[None], wrs[None], brs[None],
        dilations=(dilation,), tile_l=tile_l, l_real=l_real, interpret=interpret)


def _block_ad_fwd(h, skip, tb, wd, bd, wrs, brs, dilation, tile_l, l_real, interpret):
    from .wavenet_stack_bwd import fused_block_fwd_pre

    # the AD forward emits the pre-activation so the backward kernel skips
    # the 3-tap recompute over the halo-extended grad frame (wavenet_stack_bwd)
    h2, skip2, pre = fused_block_fwd_pre(
        h, skip, tb, wd, bd, wrs, brs, dilation, tile_l, l_real, interpret)
    return (h2, skip2), (h, pre, tb, wd, bd, wrs, brs)


def _block_ad_bwd(dilation, tile_l, l_real, interpret, res, cts):
    from .wavenet_stack_bwd import residual_block_grad

    h, pre, tb, wd, bd, wrs, brs = res
    dh2, ds2 = cts
    dh, dtb, dwd, dbd, dwrs, dbrs = residual_block_grad(
        h, pre, dh2, ds2, tb, wd, wrs,
        dilation=dilation, tile_l=tile_l, l_real=l_real, interpret=interpret)
    cast = lambda g, p: g.astype(p.dtype)
    return (cast(dh, h), ds2, cast(dtb, tb), cast(dwd, wd),
            cast(dbd, bd), cast(dwrs, wrs), cast(dbrs, brs))


residual_block_ad.defvjp(_block_ad_fwd, _block_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def residual_block_ad_x(h, skip, tb, wd, bd, wrs, brs, dilation, tile_l, l_real, interpret):
    """Input-grad-only variant of ``residual_block_ad`` for adaptive attacks:
    the VJP returns the exact waveform cotangent and ZERO parameter
    cotangents (the weight-grad outer products and their h_in staging are
    skipped in-kernel — ~40% of the backward FLOPs)."""
    return fused_group_stack(
        h, skip, tb[None], wd[None], bd[None], wrs[None], brs[None],
        dilations=(dilation,), tile_l=tile_l, l_real=l_real, interpret=interpret)


def _block_ad_x_fwd(h, skip, tb, wd, bd, wrs, brs, dilation, tile_l, l_real, interpret):
    from .wavenet_stack_bwd import fused_block_fwd_pre

    h2, skip2, pre = fused_block_fwd_pre(
        h, skip, tb, wd, bd, wrs, brs, dilation, tile_l, l_real, interpret)
    return (h2, skip2), (pre, tb, wd, bd, wrs, brs)


def _block_ad_x_bwd(dilation, tile_l, l_real, interpret, res, cts):
    from .wavenet_stack_bwd import residual_block_grad_x

    pre, tb, wd, bd, wrs, brs = res
    dh2, ds2 = cts
    dh = residual_block_grad_x(
        pre, dh2, ds2, wd, wrs,
        dilation=dilation, tile_l=tile_l, l_real=l_real, interpret=interpret)
    z = lambda a: jnp.zeros(a.shape, a.dtype)
    return (dh.astype(dh2.dtype), ds2, z(tb), z(wd), z(bd), z(wrs), z(brs))


residual_block_ad_x.defvjp(_block_ad_x_fwd, _block_ad_x_bwd)


# measured-best plan for one 12-dilation cycle (1..2048) on v5e: ALL
# singletons. A singleton with pow2 dilation has H = pow2(d) = d, so every
# block computes exactly TL useful rows — zero halo overcompute — and runs
# at ~5.74 ms (187 TF/s, ~95% of v5e bf16 peak). Multi-block groups pay
# S-2d rows per block (up to +75% for (128,256) at TL=1024): the grouped
# plan measured 381 ms/forward vs 206.7 ms all-singleton (perf/lab7).
_CYCLE12_PLAN = tuple((i, i + 1, 2048 if i == 11 else 1024) for i in range(12))


def stack_partition(dilations, tile_small: int = 1024, tile_big: int = 2048):
    """Group a dilation sequence into kernel calls: list of (start, end, tile).

    The production 12-cycle uses the swept-on-hardware plan above; other
    sequences fall back to a greedy rule (≤4 blocks, Σd ≤ 448, d ≥ 512
    singleton, big tile once d ≥ 1024).
    """
    n = len(dilations)
    cyc = list(dilations[:12])
    if n % 12 == 0 and all(dilations[i] == cyc[i % 12] for i in range(n)) and \
            cyc == [2 ** k for k in range(12)]:
        return [(c * 12 + s, c * 12 + e, tl)
                for c in range(n // 12) for s, e, tl in _CYCLE12_PLAN]
    parts = []
    i = 0
    while i < n:
        j, tot = i, 0
        while j < n and j - i < 4:
            d = dilations[j]
            if j > i and (d >= 512 or tot + d > 448):
                break
            tot += d
            j += 1
            if d >= 512:
                break
        parts.append((i, j, tile_big if max(dilations[i:j]) >= 1024 else tile_small))
        i = j
    return parts


def wavenet_apply_stack(
    variables,
    audio: jnp.ndarray,
    diffusion_steps: jnp.ndarray,
    num_res_layers: int = 36,
    dilation_cycle: int = 12,
    dtype=jnp.bfloat16,
    nsplit: int = 1,
    partition=None,
    differentiable: bool = False,
    grad_params: bool = True,
    remat_cycles: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full WaveNet forward on the fused-stack kernels.

    Pure function over the standard (unfused) ``WaveNet`` param tree;
    numerically equivalent to ``WaveNet.apply`` at bf16 tolerance. This is
    the production certify/inference path (~2× the XLA forward on v5e:
    207 ms vs 409 ms at B=64).

    ``differentiable=True`` chains custom-VJP blocks whose backward is the
    fused Pallas kernel (``wavenet_stack_bwd``): 178.5 ms fwd+bwd at B=16
    vs 200 ms XLA AD on v5e. With ``grad_params=False`` the VJP computes
    ONLY the waveform cotangent (parameter cotangents are returned as
    zeros) — the adaptive-attack mode, where the weight-grad outer
    products are dead weight. Training keeps ``grad_params=True``.
    ``remat_cycles=True`` bounds stashed activations to one dilation cycle
    (2× forward cost: 232.6 ms measured; use only when memory-bound).
    ``remat_cycles=None`` (default) auto-enables when the AD stash —
    ``num_res_layers · (B, L_pad, 2C)`` pre-activations in the compute
    dtype — would exceed ~12 GB of the 15.75 GB v5e HBM (B=16 f32 needs
    19 GB: measured OOM, perf/lab14; B=16 bf16 at 9.7 GB fits and stays on
    the faster no-remat path, perf/lab8).
    """
    from ...models.wavenet import diffusion_step_embedding, swish

    p = variables["params"]
    if diffusion_steps.ndim == 1:
        diffusion_steps = diffusion_steps[:, None]
    x = jnp.swapaxes(audio, -1, -2).astype(dtype)

    emb_dim = p["fc_t1"]["kernel"].shape[0]
    emb = diffusion_step_embedding(diffusion_steps, emb_dim)
    emb = swish(emb @ p["fc_t1"]["kernel"] + p["fc_t1"]["bias"]).astype(dtype)
    emb = swish(emb @ p["fc_t2"]["kernel"].astype(dtype) + p["fc_t2"]["bias"].astype(dtype))

    w0 = p["init_conv"]["Conv_0"]
    h = jax.nn.relu(x @ w0["kernel"][0].astype(dtype) + w0["bias"].astype(dtype))

    def block_params(ns):
        tb, wd, bd, wrs, brs = [], [], [], [], []
        for n in ns:
            blk = p[f"res_block_{n}"]
            tb.append(emb @ blk["Dense_0"]["kernel"].astype(dtype) + blk["Dense_0"]["bias"].astype(dtype))
            wd.append(blk["dilated_conv"]["Conv_0"]["kernel"])
            bd.append(blk["dilated_conv"]["Conv_0"]["bias"])
            if "rs_conv" in blk:
                wrs.append(blk["rs_conv"]["Conv_0"]["kernel"][0])
                brs.append(blk["rs_conv"]["Conv_0"]["bias"])
            else:
                wrs.append(jnp.concatenate(
                    [blk["res_conv"]["Conv_0"]["kernel"][0], blk["skip_conv"]["Conv_0"]["kernel"][0]], axis=-1))
                brs.append(jnp.concatenate(
                    [blk["res_conv"]["Conv_0"]["bias"], blk["skip_conv"]["Conv_0"]["bias"]]))
        st = lambda xs: jnp.stack(xs)
        return st(tb), st(wd), st(bd), st(wrs), st(brs)

    dils = [2 ** (n % dilation_cycle) for n in range(num_res_layers)]
    if differentiable:
        # AD mode: every block is a singleton custom-VJP call (the Pallas
        # backward needs a 2d halo, hence tile >= 2d); cycles are rematted so
        # only one chain state per cycle is stashed for the backward pass.
        tiles = [max(1024, 2 * d_) for d_ in dils]
        parts = [(n, n + 1, tiles[n]) for n in range(num_res_layers)]
    else:
        parts = partition if partition is not None else stack_partition(dils)
    # pad ONCE to a common tile multiple and thread l_real through every
    # kernel call — per-call pad/slice costs ~54 ms/forward in HBM copies
    # (measured: 'broadcast_select_fusion' in the certify trace).
    L = h.shape[1]
    tile_lcm = max(tl for _, _, tl in parts)
    L_pad = -(-L // tile_lcm) * tile_lcm
    if L_pad != L:
        h = jnp.pad(h, ((0, 0), (0, L_pad - L), (0, 0)))
    skip_sum = jnp.zeros_like(h)
    if remat_cycles is None:
        stash = num_res_layers * h.shape[0] * L_pad * 2 * h.shape[-1] * jnp.dtype(dtype).itemsize
        remat_cycles = differentiable and stash > 12 * 1024**3
    if differentiable:
        block_fn = residual_block_ad if grad_params else residual_block_ad_x

        def make_cycle(ns):
            def cyc(h, skip, pblocks):
                for n, (tb, wd, bd, wrs, brs) in zip(ns, pblocks):
                    h, skip = block_fn(
                        h, skip, tb[0], wd[0], bd[0], wrs[0], brs[0],
                        dils[n], tiles[n], L, interpret)
                return h, skip
            return cyc

        step = max(1, dilation_cycle)
        for c0 in range(0, num_res_layers, step):
            ns = list(range(c0, min(c0 + step, num_res_layers)))
            pblocks = [block_params(range(n, n + 1)) for n in ns]
            fn = make_cycle(ns)
            if remat_cycles:
                fn = jax.checkpoint(fn)
            h, skip_sum = fn(h, skip_sum, pblocks)
    else:
        for s, e, tl in parts:
            tb, wd, bd, wrs, brs = block_params(range(s, e))
            h, skip_sum = fused_group_stack(
                h, skip_sum, tb, wd, bd, wrs, brs,
                dilations=tuple(dils[s:e]), tile_l=tl, nsplit=nsplit,
                l_real=L, interpret=interpret,
            )
    out = skip_sum[:, :L] * math.sqrt(1.0 / num_res_layers)

    f1 = p["final_conv1"]["Conv_0"]
    out = jax.nn.relu(out @ f1["kernel"][0].astype(dtype) + f1["bias"].astype(dtype))
    f2 = p["final_conv2"]["Conv_0"]
    out = out @ f2["kernel"][0].astype(dtype) + f2["bias"].astype(dtype)
    return jnp.swapaxes(out, -1, -2).astype(jnp.float32)
