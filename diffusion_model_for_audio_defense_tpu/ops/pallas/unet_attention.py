"""Pallas TPU kernel: fused UNet QKV self-attention.

The spec-domain UNet forward is HBM-bound (perf/lab21: 25.1 GB moved vs an
8.1 GB floor at B=256 bf16, 86% of HBM peak achieved). The single largest
addressable chunk is attention (reference ``improved_diffusion/unet.py``
QKVAttention, rebuilt at ``models/unet.py:100-116``): XLA materializes the
(B, h, T, T) score matrix through HBM (write + softmax read/write + read;
~0.8 GB per ds=2 block at B=256, T=256) and spends ~2.4 ms/forward on
head-split transpose copies of q/k/v (perf/lab15).

This kernel computes, for one (batch, head) grid cell, the whole

    w = softmax((q · s) (k · s)ᵀ),  s = 1/√√d      [f32, in VMEM]
    o = w v

with q/k/v read directly as lane-dim slices of the fused ``(B, T, 3C)``
QKV projection — no head-major transpose, no score matrix in HBM. Per
ds=2 attention block the HBM traffic drops to one read of qkv (100 MB)
plus one write of the output (33 MB).

Layout notes (v5e):
- The Dense qkv output is ``(B, T, 3C)`` with the 3C dim ordered
  ``(which ∈ {q,k,v}, head, d)`` — exactly the reference's
  ``reshape(B, T, 3, h, d)`` split — so q/k/v of head ``h`` are the
  contiguous lane slices at ``(which·heads + h)·d``. Three BlockSpecs over
  the SAME operand deliver them; d = C/h = 64 in the production config
  (128ch × mult 2, 4 heads) keeps slices lane-aligned.
- Scores are (T, T) f32 in VMEM (256 KB at T=256) — never touch HBM.
- Matmuls accumulate f32 via ``preferred_element_type``; the softmax
  matches the reference's f32 softmax, and ``w`` is cast back to the
  compute dtype before ``w·v`` like the einsum path. One deliberate
  deviation: the scores matmul here takes q/k as *f32* operands (the
  in-register head slices are cast before scaling), while the einsum path
  multiplies compute-dtype operands with f32 accumulation — under bf16 the
  outputs differ by ~2.5e-3 (measured, perf/lab22). The custom VJP
  recomputes through the einsum path, so the gradient is that of the
  (bit-close) einsum forward, not of the kernel.

Gradients: ``fused_qkv_attention`` carries a ``jax.custom_vjp`` whose
backward recomputes through the differentiable einsum path
(``attention_core``) — the forward stays bytes-minimal, attacks/training
still differentiate (same pattern as the WaveNet stack's stored-pre VJP,
``wavenet_stack_bwd.py``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_core(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Reference einsum path (``models/unet.py:109-114``): (B,T,3C) → (B,T,C)."""
    B, T, C3 = qkv.shape
    C = C3 // 3
    d = C // num_heads
    q, k, v = (qkv.reshape(B, T, 3, num_heads, d)[:, :, i] for i in range(3))
    scale = 1.0 / math.sqrt(math.sqrt(d))
    w = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhts,bshd->bthd", w, v).reshape(B, T, C)


def _attn_kernel(qkv_ref, out_ref, *, scale, cdtype, bb, num_heads, d):
    # Static loops over the batch tile and heads: one (T,T) score matrix at
    # a time in VMEM. bb images per grid step keep the per-step work well
    # above the grid/DMA overhead (bb=1 would mean B ≈ 256 tiny steps per
    # block). The block carries the full 3C lane width (Mosaic requires
    # 128-divisible or full-width blocks; d=64 head slices are neither), so
    # q/k/v head slices are in-register strided slices — and qkv is read
    # from HBM exactly once.
    C = num_heads * d
    for i in range(bb):
        row = qkv_ref[i]  # (T, 3C)
        outs = []
        for h in range(num_heads):
            q = row[:, h * d:(h + 1) * d].astype(jnp.float32) * scale  # (T, d)
            k = row[:, C + h * d:C + (h + 1) * d].astype(jnp.float32) * scale
            v = row[:, 2 * C + h * d:2 * C + (h + 1) * d]
            w = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (T, T) — lives in VMEM only
            w = w - jnp.max(w, axis=-1, keepdims=True)
            e = jnp.exp(w)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdtype)
            outs.append(jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ))  # (T, d)
        out_ref[i] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


def supports(T: int, C: int, num_heads: int) -> bool:
    """Shapes the TPU kernel handles: lane-aligned head slices, ≥8 sublanes.

    Production spec UNet attention is (T, d) ∈ {(256, 64), (64, 64)} — both
    pass. Only the *verified* head widths are admitted: d == 64 (measured,
    perf/lab22) and d % 128 == 0 (slice lane offsets 128-aligned). Shapes
    like d = 192 would have unaligned in-register slice offsets Mosaic may
    reject at compile time instead of falling back (ADVICE r4). Everything
    else uses the einsum path.
    """
    if C % num_heads:
        return False
    d = C // num_heads
    return (d == 64 or d % 128 == 0) and T % 8 == 0


def _batch_tile(B: int, cap: int = 8) -> int:
    bb = min(B, cap)
    while B % bb:
        bb -= 1
    return bb


def _fused_fwd_impl(qkv: jnp.ndarray, num_heads: int, interpret: bool) -> jnp.ndarray:
    B, T, C3 = qkv.shape
    C = C3 // 3
    d = C // num_heads
    scale = 1.0 / math.sqrt(math.sqrt(d))
    bb = _batch_tile(B)

    kern = functools.partial(
        _attn_kernel, scale=scale, cdtype=qkv.dtype, bb=bb, num_heads=num_heads, d=d
    )
    return pl.pallas_call(
        kern,
        grid=(B // bb,),
        in_specs=[pl.BlockSpec((bb, T, C3), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((bb, T, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_qkv_attention(qkv: jnp.ndarray, num_heads: int, interpret: bool = False):
    """Fused attention: (B, T, 3C) qkv → (B, T, C), scores VMEM-resident.

    Numerics track ``attention_core`` to ~2.5e-3 under bf16 (the scores
    matmul takes f32 operands here — see module docstring). Backward =
    einsum-path recompute, i.e. the gradient of the einsum forward.
    """
    return _fused_fwd_impl(qkv, num_heads, interpret)


def _fused_fwd(qkv, num_heads, interpret):
    return _fused_fwd_impl(qkv, num_heads, interpret), qkv


def _fused_bwd(num_heads, interpret, qkv, g):
    del interpret
    _, vjp = jax.vjp(lambda x: attention_core(x, num_heads), qkv)
    return (vjp(g)[0],)


fused_qkv_attention.defvjp(_fused_fwd, _fused_bwd)
