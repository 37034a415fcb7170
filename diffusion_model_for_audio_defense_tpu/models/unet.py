"""Improved-diffusion UNet ε-net (Flax, NHWC).

Rebuild of ``improved_diffusion/unet.py``: timestep-embedded ResBlocks with
scale-shift GroupNorm, multi-head QKV self-attention at the configured
downsample rates, conv up/downsampling, zero-initialized output projections.
Public call keeps the reference seam: ``model(x (B,C,H,W), t (B,)) → (B,C',H,W)``
(NCHW at the boundary, channels-last inside for TPU lanes).

Reference defaults (``script_util.py:11-35``): 32×32, 128ch, 3 res blocks,
heads 4, attention at ds∈{2,4} ("16,8" for image_size 32 → 32/16=2, 32/8=4),
dropout 0.3, scale-shift norm, channel_mult (1,2,2,2).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def unet_timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Reference ``nn.py:103-121``: freqs exp(-ln(P)·i/half), [cos ‖ sin]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _gn32(x, scale, bias):
    """GroupNorm(32) computed in float32 (reference GroupNorm32).

    Single-pass statistics: μ and E[x²] come out of ONE fused reduce over the
    (possibly bf16) input, and the normalization re-reads the input instead
    of a materialized f32 copy. With the two-pass ``.var()`` formulation XLA
    materialized an f32 reshape of every activation (1.5 GB/fwd at B=256 —
    and the UNet forward is HBM-roofline-bound, perf/lab15)."""
    g = min(32, x.shape[-1])
    while x.shape[-1] % g:  # production channel counts are all divisible by 32;
        g -= 1  # smaller test configs fall back to the largest divisor
    grp = x.reshape(x.shape[:-1] + (g, x.shape[-1] // g))
    xf = grp.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    meansq = jnp.square(xf).mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    normed = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
    return (normed * scale + bias).astype(x.dtype)


class GroupNorm32(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        return _gn32(x, scale, bias)


class ResBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="in_conv", dtype=self.dtype)(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels, name="emb_proj",
            dtype=self.dtype,
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = nn.silu(GroupNorm32(name="out_norm")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.zeros_init(), name="out_conv", dtype=self.dtype,
        )(h)

        if x.shape[-1] != self.out_channels:
            x = nn.Dense(self.out_channels, name="skip", dtype=self.dtype)(x)  # 1×1 conv
        return x + h


class AttentionBlock(nn.Module):
    num_heads: int = 1
    dtype: object = None
    # Fused Pallas attention (ops/pallas/unet_attention.py): scores stay in
    # VMEM instead of round-tripping HBM — the UNet forward is HBM-bound
    # (perf/lab21/lab22). Falls back to the einsum path for shapes the
    # kernel doesn't cover (tiny test configs). `pallas_interpret` runs the
    # kernel in interpret mode (CPU tests).
    use_pallas: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas import unet_attention as _pattn

        B, H, W, C = x.shape
        h = GroupNorm32(name="norm")(x).reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, name="qkv", dtype=self.dtype)(h)  # 1-D conv k=1
        if self.use_pallas and _pattn.supports(H * W, C, self.num_heads):
            a = _pattn.fused_qkv_attention(qkv, self.num_heads, self.pallas_interpret)
        else:
            qkv = qkv.reshape(B, H * W, 3, self.num_heads, C // self.num_heads)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, T, h, d)
            scale = 1.0 / math.sqrt(math.sqrt(C // self.num_heads))
            w = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale)
            w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
            a = jnp.einsum("bhts,bshd->bthd", w, v).reshape(B, H * W, C)
        out = nn.Dense(C, kernel_init=nn.initializers.zeros_init(), name="proj_out", dtype=self.dtype)(a)
        return x + out.reshape(B, H, W, C)


class Downsample(nn.Module):
    use_conv: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), name="op",
                           dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    use_conv: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        if self.use_conv:
            x = nn.Conv(C, (3, 3), padding=((1, 1), (1, 1)), name="conv", dtype=self.dtype)(x)
        return x


class UNetModel(nn.Module):
    in_channels: int = 1
    model_channels: int = 128
    out_channels: int = 1
    num_res_blocks: int = 3
    attention_resolutions: Tuple[int, ...] = (2, 4)  # downsample rates
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 2, 2)
    conv_resample: bool = True
    num_heads: int = 4
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    # compute dtype (params stay f32; GroupNorm32 stays f32 internally) —
    # TPU-native equivalent of the reference's fp16 conversion
    # (improved_diffusion/unet.py:439-460): bf16 keeps the MXU fed without
    # the loss-scale dance of fp16_util.py
    dtype: object = None
    # fused Pallas attention (HBM-bound forward; see AttentionBlock)
    use_pallas_attention: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        heads_up = self.num_heads_upsample if self.num_heads_upsample != -1 else self.num_heads
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW → NHWC
        if self.dtype is not None:
            x = x.astype(self.dtype)

        emb = unet_timestep_embedding(timesteps.reshape(-1), self.model_channels)
        emb = nn.Dense(4 * self.model_channels, name="time_embed_0", dtype=self.dtype)(emb)
        emb = nn.Dense(4 * self.model_channels, name="time_embed_2", dtype=self.dtype)(nn.silu(emb))

        hs = []
        h = nn.Conv(self.model_channels, (3, 3), padding=((1, 1), (1, 1)), name="in_conv",
                    dtype=self.dtype)(x)
        hs.append(h)
        ds = 1
        blk = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = ResBlock(mult * self.model_channels, self.dropout, self.use_scale_shift_norm,
                             dtype=self.dtype, name=f"down_res_{blk}")(h, emb, train)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads, dtype=self.dtype, use_pallas=self.use_pallas_attention,
                                       pallas_interpret=self.pallas_interpret, name=f"down_attn_{blk}")(h)
                hs.append(h)
                blk += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(self.conv_resample, dtype=self.dtype, name=f"down_sample_{level}")(h)
                hs.append(h)
                ds *= 2

        h = ResBlock(h.shape[-1], self.dropout, self.use_scale_shift_norm, dtype=self.dtype,
                     name="mid_res_0")(h, emb, train)
        h = AttentionBlock(self.num_heads, dtype=self.dtype, use_pallas=self.use_pallas_attention,
                           pallas_interpret=self.pallas_interpret, name="mid_attn")(h)
        h = ResBlock(h.shape[-1], self.dropout, self.use_scale_shift_norm, dtype=self.dtype,
                     name="mid_res_1")(h, emb, train)

        blk = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(mult * self.model_channels, self.dropout, self.use_scale_shift_norm,
                             dtype=self.dtype, name=f"up_res_{blk}")(h, emb, train)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(heads_up, dtype=self.dtype, use_pallas=self.use_pallas_attention,
                                       pallas_interpret=self.pallas_interpret, name=f"up_attn_{blk}")(h)
                blk += 1
            if level:
                h = Upsample(self.conv_resample, dtype=self.dtype, name=f"up_sample_{level}")(h)
                ds //= 2

        h = nn.silu(GroupNorm32(name="out_norm")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=nn.initializers.zeros_init(), name="out_conv")(h)
        return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)  # NHWC → NCHW


class SuperResModel(nn.Module):
    """UNet that super-resolves: conditions on a bilinear-upsampled low-res
    image concatenated on the channel dim (reference
    ``improved_diffusion/unet.py:525-547``). Parameters live at the same
    tree paths as a plain ``UNetModel`` with ``in_channels`` doubled, so the
    torch converter applies unchanged."""

    in_channels: int = 1
    model_channels: int = 128
    out_channels: int = 1
    num_res_blocks: int = 3
    attention_resolutions: Tuple[int, ...] = (2, 4)
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 2, 2)
    conv_resample: bool = True
    num_heads: int = 4
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True

    def setup(self):
        unet = UNetModel(
            in_channels=self.in_channels * 2,
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions,
            dropout=self.dropout,
            channel_mult=self.channel_mult,
            conv_resample=self.conv_resample,
            num_heads=self.num_heads,
            num_heads_upsample=self.num_heads_upsample,
            use_scale_shift_norm=self.use_scale_shift_norm,
        )
        self._unet = unet
        nn.share_scope(self, self._unet)

    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray,
                 low_res: jnp.ndarray = None, train: bool = False) -> jnp.ndarray:
        B, C, H, W = x.shape
        up = jax.image.resize(
            low_res.astype(x.dtype), (B, low_res.shape[1], H, W), method="bilinear")
        return self._unet(jnp.concatenate([x, up], axis=1), timesteps, train)


def infer_unet_kwargs(variables) -> dict:
    """Derive ``create_unet`` kwargs from a checkpoint's parameter shapes.

    The reference CLIs instantiate the spec UNet at a fixed width (no flags —
    ``adaptive_attack_eval.py`` hard-codes ``create_model`` defaults), which
    breaks the moment a checkpoint was trained at another size (e.g. the
    reduced smoke/CPU configs of ``scripts/train_real_spec.py``). Parameter
    shapes carry the full geometry for 32×32 models, so the CLIs infer it:

    - ``time_embed_0.kernel`` is ``(model_channels, 4*model_channels)``,
    - ``down_res_*`` / ``down_sample_*`` counts give num_res_blocks / levels,
    - ``in_conv.kernel`` is ``(3, 3, in_channels, model_channels)``,
    - ``out_conv`` doubling the input channels means ``learn_sigma``.
    """
    params = variables["params"] if "params" in variables else variables
    num_channels = int(params["time_embed_0"]["kernel"].shape[0])
    n_down = sum(1 for k in params if str(k).startswith("down_res_"))
    n_levels = sum(1 for k in params if str(k).startswith("down_sample_")) + 1
    if n_down == 0 or n_down % n_levels:
        raise ValueError(f"cannot infer num_res_blocks from {n_down} blocks / {n_levels} levels")
    in_channels = int(params["in_conv"]["kernel"].shape[2])
    learn_sigma = int(params["out_conv"]["kernel"].shape[-1]) == 2 * in_channels
    return dict(num_channels=num_channels, num_res_blocks=n_down // n_levels,
                in_channels=in_channels, learn_sigma=learn_sigma)


def create_unet(
    image_size: int = 32,
    num_channels: int = 128,
    num_res_blocks: int = 3,
    learn_sigma: bool = False,
    attention_resolutions: str = "16,8",
    dropout: float = 0.3,
    num_heads: int = 4,
    num_heads_upsample: int = -1,
    use_scale_shift_norm: bool = True,
    in_channels: int = 1,
    dtype=None,
    use_pallas_attention: bool = False,
    pallas_interpret: bool = False,
) -> UNetModel:
    """Mirror of ``script_util.create_model`` (:86-126)."""
    if image_size == 256:
        channel_mult = (1, 1, 2, 2, 4, 4)
    elif image_size == 64:
        channel_mult = (1, 2, 3, 4)
    elif image_size == 32:
        channel_mult = (1, 2, 2, 2)
    else:
        raise ValueError(f"unsupported image size: {image_size}")
    attn_ds = tuple(image_size // int(r) for r in attention_resolutions.split(","))
    return UNetModel(
        in_channels=in_channels,
        model_channels=num_channels,
        out_channels=in_channels * (2 if learn_sigma else 1),
        num_res_blocks=num_res_blocks,
        attention_resolutions=attn_ds,
        dropout=dropout,
        channel_mult=channel_mult,
        num_heads=num_heads,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        dtype=dtype,
        use_pallas_attention=use_pallas_attention,
        pallas_interpret=pallas_interpret,
    )
