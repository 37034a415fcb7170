"""Pallas TPU kernel: the improved-diffusion UNet ResBlock, fused.

The spec-domain UNet forward is HBM-roofline-bound, not MXU-starved
(perf/lab15: 4.0 TF = 20.5 ms MXU floor vs ~33 GB = 40.3 ms BW floor at
B=256 bf16; ~80% of traced time sits in generic XLA fusions that stage
activations through HBM between the norm/SiLU/conv stages). This kernel
computes the whole ResBlock body (reference
``improved_diffusion/unet.py`` ResBlock / ``models/unet.py:64-97``)

    h   = conv3x3(silu(GN32(x)))
    h   = silu(GN32(h) * (1 + scale) + shift)        # scale-shift norm
    h   = conv3x3(h)                                 # (dropout off: inference)
    out = (x @ W_skip + b_skip  if Cin != Cout else x) + h

on one VMEM-resident batch tile, so the only HBM traffic per block is
one read of ``x`` and one write of ``out`` (plus the weights).

Design notes (v5e):

- **Flat layout** ``(rows, C)``: spatial positions map to sublanes,
  channels to lanes — H·W ∈ {16..1024} and C ∈ {128..512} in the
  production config, so tiles are aligned.
- **One matmul per conv tap over ALL images in the tile**: the batch
  tile lives in a single zero-edged scratch of ``bB·P + 2W+2`` rows
  (``P = H·W + 2W+2``, each image's interior preceded/followed by
  ``W+1`` pad rows). Tap (dy,dx) of the 3×3 conv is then the contiguous
  slice at row offset ``dy·W + dx`` — the flattened-pad trick — so each
  tap is one ``(bB·P, C) @ (C, Cout)`` MXU matmul (v1 of this kernel
  did per-image ``(H·W, C)`` matmuls and lost to XLA on MXU
  utilization). Output rows that land in an inter-image pad are garbage
  and are never read back; row-wrap contamination (a dx≠1 tap reading
  the horizontally adjacent image row) is killed by a periodic
  per-column iota mask on the tap's input.
- **f32 tap accumulation** via ``preferred_element_type``, cast to the
  compute dtype once per conv (XLA's bf16 conv does the same).
- **GroupNorm32 without lane reshapes**: per-channel Σx / Σx² come from
  one fused reduce over rows; group sums and the broadcast back to
  channels are two tiny matmuls against a 0/1 group-indicator matrix
  (lane-dim reshapes like ``(…,32,C/32)`` are what Mosaic is bad at).
  Stats are f32 like the reference's GroupNorm32.
- The timestep embedding projection (a (B, emb) @ (emb, 2C) matmul) is
  left to XLA and enters the kernel as separate per-image scale and
  shift rows (a lane-offset slice of one (1, 2C) row can't be broadcast
  by Mosaic — "Invalid input layout").

Grid is over batch tiles only; weights are VMEM-resident across steps.
Scratch zero-fill happens once at step 0 — interiors are overwritten
every step and the pad rows/cols are never written.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _num_groups(c: int, groups: int = 32) -> int:
    g = min(groups, c)
    while c % g:
        g -= 1
    return g


def _group_norm(x, gscale, gbias, g, eps=1e-5):
    """GroupNorm over one image's (rows, channels) 2-D tile.

    ``x`` may be bf16; stats are f32 (reference GroupNorm32). The group
    reduction runs as two matmuls against a (C, g) indicator so no
    lane-dim reshape is needed, and all broadcasts are the supported
    (1, C) → (R, C) sublane form.
    """
    R, C = x.shape
    cg = C // g
    cidx = jax.lax.broadcasted_iota(jnp.int32, (C, g), 0)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (C, g), 1)
    G = (cidx // cg == gidx).astype(jnp.float32)  # (C, g)

    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=0, keepdims=True)  # (1, C)
    ss = jnp.sum(xf * xf, axis=0, keepdims=True)
    n = R * cg
    sg = jax.lax.dot(s, G)  # (1, g)
    ssg = jax.lax.dot(ss, G)
    mean_g = sg / n
    var_g = jnp.maximum(ssg / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    Gt = G.T  # (g, C)
    mean_c = jax.lax.dot(mean_g, Gt)  # (1, C)
    rstd_c = jax.lax.dot(rstd_g, Gt)
    normed = (xf - mean_c) * rstd_c
    return normed * gscale.astype(jnp.float32) + gbias.astype(jnp.float32)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _resblock_kernel(
    x_ref, esc_ref, esh_ref, gn1s, gn1b, w1_ref, b1_ref, gn2s, gn2b,
    w2_ref, b2_ref,
    *rest, out_ref, hp_ref, cv_ref, H, W, Cin, Cout, g1, g2, has_skip,
    cdtype, ablate=(),
):
    if has_skip:
        skw_ref, skb_ref = rest
    HW = H * W
    bB = x_ref.shape[0]
    P = HW + 2 * W + 2          # per-image rows incl. the W+1 pads each side
    R = bB * P                  # all images, flattened
    base = 2 * W + 2            # hp row of image 0's first interior row

    @pl.when(pl.program_id(0) == 0)
    def _zero_scratch():
        hp_ref[...] = jnp.zeros_like(hp_ref)

    # Column masks for the dx=0 / dx=2 taps (kill row-wrap contamination).
    # Output row q (flat coords) has x-position ((q mod P) - (W+1)) mod W;
    # rows in inter-image pads are garbage and masked arbitrarily.
    q = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    xpos = jax.lax.rem(jax.lax.rem(q, P) + W - 1, W)  # -(W+1) ≡ +W-1 (mod W)
    mask_l = (xpos != 0).astype(cdtype)      # dx=0: x'=x-1 invalid at x==0
    mask_r = (xpos != W - 1).astype(cdtype)  # dx=2: x'=x+1 invalid at x==W-1

    def conv3x3(w_ref, b_row, C):
        """3x3 SAME conv of all interiors in hp[:, :C] → cv_ref (f32).

        Accumulates in-place in the f32 scratch: an SSA ``acc = acc + dot``
        chain makes Mosaic stack-allocate every intermediate (9×(R,Cout)
        f32 blew the 16 MB scoped-vmem limit at 32×32×128)."""
        cv_ref[...] = jnp.broadcast_to(b_row.astype(jnp.float32), (R, Cout))
        for dy in range(3):
            for dx in range(3):
                off = dy * W + dx
                patch = hp_ref[off:off + R, :C]
                if "no_mask" not in ablate:
                    if dx == 0:
                        patch = patch * mask_l
                    elif dx == 2:
                        patch = patch * mask_r
                cv_ref[...] += jax.lax.dot(
                    patch, w_ref[3 * dy + dx],
                    preferred_element_type=jnp.float32)

    def interior(ref, b, C):
        q0 = W + 1 + b * P  # image b's interior in output (flat) coords
        return ref[q0:q0 + HW, :C]

    # --- in_layers: GN32 → SiLU → conv1 ---------------------------------
    for b in range(bB):
        if "no_gn" in ablate:
            h1 = x_ref[b].astype(jnp.float32)
        else:
            h1 = _silu(_group_norm(x_ref[b], gn1s[...], gn1b[...], g1))
        hp_ref[base + b * P:base + b * P + HW, :Cin] = h1.astype(cdtype)
    conv3x3(w1_ref, b1_ref[...], Cin)

    # --- out_layers: GN32 → ·(1+scale)+shift → SiLU → conv2 -------------
    for b in range(bB):
        if "no_gn" in ablate:
            h2 = interior(cv_ref, b, Cout)
        else:
            escale = esc_ref[b].astype(jnp.float32)  # (1, Cout)
            eshift = esh_ref[b].astype(jnp.float32)
            h2 = _silu(_group_norm(interior(cv_ref, b, Cout), gn2s[...],
                                   gn2b[...], g2) * (1.0 + escale) + eshift)
        hp_ref[base + b * P:base + b * P + HW, :Cout] = h2.astype(cdtype)
    conv3x3(w2_ref, b2_ref[...], Cout)

    # --- residual --------------------------------------------------------
    for b in range(bB):
        x_b = x_ref[b]
        if has_skip:
            res = jax.lax.dot(
                x_b, skw_ref[...], preferred_element_type=jnp.float32
            ) + skb_ref[...].astype(jnp.float32)
        else:
            res = x_b.astype(jnp.float32)
        out_ref[b] = (res + interior(cv_ref, b, Cout)).astype(out_ref.dtype)


def fused_resblock(
    x: jnp.ndarray,           # (B, H, W, Cin) channels-last
    emb_out: jnp.ndarray,     # (B, 2*Cout) — Dense(silu(emb)), scale‖shift
    gn1_scale, gn1_bias,      # (Cin,)
    w1, b1,                   # (3, 3, Cin, Cout), (Cout,)
    gn2_scale, gn2_bias,      # (Cout,)
    w2, b2,                   # (3, 3, Cout, Cout), (Cout,)
    skip_w=None, skip_b=None,  # (Cin, Cout), (Cout,) when Cin != Cout
    *,
    batch_block: int | None = None,
    compute_dtype=jnp.bfloat16,
    vmem_budget: int = 8 * 1024 * 1024,
    interpret: bool = False,
    _ablate: tuple = (),  # perf-lab-only: drop kernel stages to locate cost
) -> jnp.ndarray:
    """Fused UNet ResBlock forward (scale-shift norm, dropout off).

    Matches ``models.unet.ResBlock`` with ``use_scale_shift_norm=True`` and
    ``train=False`` to compute-dtype tolerance. Returns (B, H, W, Cout) in
    ``x.dtype``.
    """
    B, H, W, Cin = x.shape
    Cout = b1.shape[0]
    HW = H * W
    has_skip = skip_w is not None
    if (Cin != Cout) != has_skip:
        raise ValueError("skip_w must be given exactly when Cin != Cout")

    cdtype = jnp.dtype(compute_dtype)
    if batch_block is None:
        # x block + padded scratch (cdtype) + f32 conv acc + out block
        per_img = HW * (Cin * x.dtype.itemsize
                        + max(Cin, Cout) * cdtype.itemsize
                        + Cout * 4
                        + Cout * x.dtype.itemsize)
        batch_block = max(1, min(B, vmem_budget // max(per_img, 1)))
        while B % batch_block:
            batch_block -= 1
    bB = batch_block
    if B % bB:
        raise ValueError(f"batch {B} not divisible by batch_block {bB}")

    x2 = x.reshape(B, HW, Cin)
    w1r = w1.astype(cdtype).reshape(9, Cin, Cout)
    w2r = w2.astype(cdtype).reshape(9, Cout, Cout)
    P = HW + 2 * W + 2

    row = lambda v: jnp.asarray(v).reshape(1, -1)  # (C,) → (1, C): 2-D VMEM tiles
    # scale/shift as separate operands: a lane-offset slice of one (1, 2C)
    # row can't be broadcast by Mosaic ("Invalid input layout")
    operands = [
        x2, emb_out[:, None, :Cout], emb_out[:, None, Cout:],
        row(gn1_scale), row(gn1_bias), w1r, row(b1),
        row(gn2_scale), row(gn2_bias), w2r, row(b2),
    ]
    in_specs = [
        pl.BlockSpec((bB, HW, Cin), lambda i: (i, 0, 0)),
        pl.BlockSpec((bB, 1, Cout), lambda i: (i, 0, 0)),
        pl.BlockSpec((bB, 1, Cout), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, Cin), lambda i: (0, 0)),
        pl.BlockSpec((1, Cin), lambda i: (0, 0)),
        pl.BlockSpec((9, Cin, Cout), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, Cout), lambda i: (0, 0)),
        pl.BlockSpec((1, Cout), lambda i: (0, 0)),
        pl.BlockSpec((1, Cout), lambda i: (0, 0)),
        pl.BlockSpec((9, Cout, Cout), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, Cout), lambda i: (0, 0)),
    ]
    if has_skip:
        operands += [skip_w.astype(cdtype), row(skip_b)]
        in_specs += [
            pl.BlockSpec((Cin, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
        ]

    kernel = functools.partial(
        _resblock_kernel, H=H, W=W, Cin=Cin, Cout=Cout,
        g1=_num_groups(Cin), g2=_num_groups(Cout),
        has_skip=has_skip, cdtype=cdtype, ablate=tuple(_ablate),
    )

    def kernel_entry(*refs):
        *ins, out_ref, hp_ref, cv_ref = refs
        kernel(*ins, out_ref=out_ref, hp_ref=hp_ref, cv_ref=cv_ref)

    out = pl.pallas_call(
        kernel_entry,
        grid=(B // bB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bB, HW, Cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HW, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bB * P + 2 * W + 2, max(Cin, Cout)), cdtype),
            pltpu.VMEM((bB * P, Cout), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return out.reshape(B, H, W, Cout)
