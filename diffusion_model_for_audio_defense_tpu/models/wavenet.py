"""DiffWave WaveNet ε-network (Flax).

TPU-first re-design of the reference net
(``diffusion_models/DiffWave_Unconditional/WaveNet.py:53-172``):

- channels-last layout ``(B, L, C)`` so the channel dim sits on the TPU lane
  axis (C=256/512 → two/four 128-lanes) and the dilated convs tile onto the
  MXU;
- weight-norm is a *training-time* reparameterization in the reference
  (``WaveNet.py:28,67,72``); converted checkpoints fold ``g·v/‖v‖`` into plain
  kernels (see ``core/checkpoint.py``), and training here can enable the same
  reparameterization via ``use_weight_norm=True``;
- the public ``__call__`` keeps the reference seam: input ``(audio, t)`` with
  ``audio (B, 1, L)`` and ``t (B, 1)`` float timesteps, output ε ``(B, 1, L)``.

Production config (reference ``configs/config.json:8-18``): res=256, skip=256,
36 layers, dilation cycle 12.
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp


def diffusion_step_embedding(t: jnp.ndarray, dim: int = 128) -> jnp.ndarray:
    """Sinusoidal timestep embedding, reference ``util.py:68-93`` parity.

    ``t``: (B, 1) float. Returns (B, dim) = [sin(t·10^(4i/63)) ‖ cos(...)]
    with frequencies exp(-i·ln(10000)/(dim/2-1)).
    """
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    args = t.astype(jnp.float32) * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)


def swish(x):
    return x * nn.sigmoid(x)


class _WNConv(nn.Module):
    """1-D conv, optionally weight-normalized (training parity)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    use_weight_norm: bool = False
    zero_init: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        pad = self.dilation * (self.kernel_size - 1) // 2
        init = nn.initializers.zeros_init() if self.zero_init else nn.initializers.kaiming_normal()
        conv = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=((pad, pad),),
            kernel_init=init,
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
        )
        if self.use_weight_norm:
            conv = nn.WeightNorm(conv, feature_axes=-1)
        return conv(x)


class ResidualBlock(nn.Module):
    """Gated dilated-conv residual block (reference ``WaveNet.py:53-97``)."""

    res_channels: int
    skip_channels: int
    dilation: int
    use_weight_norm: bool = False
    fuse_res_skip: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, t_embed):
        # per-layer FC of the shared 512-d timestep embedding, added per-channel
        part_t = nn.Dense(self.res_channels, dtype=self.dtype)(t_embed)  # (B, C)
        xt = x + part_t[:, None, :]
        h = _WNConv(2 * self.res_channels, 3, self.dilation, self.use_weight_norm, dtype=self.dtype, name="dilated_conv")(xt)
        gate = jnp.tanh(h[..., : self.res_channels]) * nn.sigmoid(h[..., self.res_channels :])
        if self.fuse_res_skip and not self.use_weight_norm:
            # one (C → C_res+C_skip) matmul instead of two: gate is read once
            # and the MXU tile is wider (checkpoint converter concatenates the
            # reference's res_conv/skip_conv kernels — core/checkpoint.py)
            rs = _WNConv(self.res_channels + self.skip_channels, 1, dtype=self.dtype, name="rs_conv")(gate)
            res, skip = rs[..., : self.res_channels], rs[..., self.res_channels :]
        else:
            res = _WNConv(self.res_channels, 1, use_weight_norm=self.use_weight_norm, dtype=self.dtype, name="res_conv")(gate)
            skip = _WNConv(self.skip_channels, 1, use_weight_norm=self.use_weight_norm, dtype=self.dtype, name="skip_conv")(gate)
        # the reference's ``h += part_t`` (WaveNet.py:84) mutates x in place,
        # so its residual is (x + part_t + res) — verified against the torch
        # module; using bare x here would break real-checkpoint parity
        return (xt + res) * math.sqrt(0.5), skip


class _Conv0Params(nn.Module):
    """Parameter-only stand-in matching ``_WNConv``'s tree (Conv_0/kernel)."""

    kshape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.kaiming_normal(), self.kshape)
        b = self.param("bias", nn.initializers.zeros_init(), (self.kshape[-1],))
        return k, b


class _NamedConvParams(nn.Module):
    kshape: tuple

    @nn.compact
    def __call__(self):
        return _Conv0Params(self.kshape, name="Conv_0")()


class _GroupBlockParams(nn.Module):
    """Declares one residual block's params (same tree as ``ResidualBlock``
    unfused layout) and returns them raw for the fused group kernel."""

    res_channels: int
    skip_channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, emb):
        C, Cs = self.res_channels, self.skip_channels
        t_bias = nn.Dense(C, dtype=self.dtype)(emb)  # Dense_0
        wd, bd = _NamedConvParams((3, C, 2 * C), name="dilated_conv")()
        wr, br = _NamedConvParams((1, C, C), name="res_conv")()
        ws, bs = _NamedConvParams((1, C, Cs), name="skip_conv")()
        w_rs = jnp.concatenate([wr[0], ws[0]], axis=-1)
        b_rs = jnp.concatenate([br, bs])
        return t_bias, wd, bd, w_rs, b_rs


class _DilationCycle(nn.Module):
    """One dilation cycle (blocks with dilations 2^0 … 2^(cycle-1)) as a scan
    body: `nn.scan` over cycles stacks the per-cycle params and cuts the HLO
    (and compile time) by the number of cycles."""

    res_channels: int
    skip_channels: int
    dilation_cycle: int
    use_weight_norm: bool = False
    fuse_res_skip: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, carry, emb):
        h, skip_sum = carry
        for i in range(self.dilation_cycle):
            h, skip = ResidualBlock(
                self.res_channels,
                self.skip_channels,
                dilation=2**i,
                use_weight_norm=self.use_weight_norm,
                fuse_res_skip=self.fuse_res_skip,
                dtype=self.dtype,
                name=f"res_block_{i}",
            )(h, emb)
            skip_sum = skip_sum + skip
            h, skip_sum = jax.lax.optimization_barrier((h, skip_sum))
        return (h, skip_sum), None


class WaveNet(nn.Module):
    """DiffWave ε-net. Call with ``(audio (B,1,L), t (B,1))`` → ε ``(B,1,L)``."""

    in_channels: int = 1
    res_channels: int = 256
    skip_channels: int = 256
    out_channels: int = 1
    num_res_layers: int = 36
    dilation_cycle: int = 12
    diffusion_step_embed_dim_in: int = 128
    diffusion_step_embed_dim_mid: int = 512
    diffusion_step_embed_dim_out: int = 512
    use_weight_norm: bool = False
    fuse_res_skip: bool = False
    scan_cycles: bool = False  # lax.scan over dilation cycles (stacked params)
    use_pallas_groups: bool = False  # fused Pallas kernel for small-dilation runs
    pallas_interpret: bool = False  # run the group kernel in interpreter mode (CPU tests)
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params stay f32

    @nn.compact
    def __call__(self, audio: jnp.ndarray, diffusion_steps: jnp.ndarray) -> jnp.ndarray:
        if diffusion_steps.ndim == 1:
            diffusion_steps = diffusion_steps[:, None]
        x = jnp.swapaxes(audio, -1, -2)  # (B, L, C_in): channels-last for TPU

        # shared swish MLP on the sinusoidal embedding (reference WaveNet.py:120-126)
        emb = diffusion_step_embedding(diffusion_steps, self.diffusion_step_embed_dim_in)
        emb = swish(nn.Dense(self.diffusion_step_embed_dim_mid, dtype=self.dtype, name="fc_t1")(emb))
        emb = swish(nn.Dense(self.diffusion_step_embed_dim_out, dtype=self.dtype, name="fc_t2")(emb))

        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = nn.relu(_WNConv(self.res_channels, 1, use_weight_norm=self.use_weight_norm, dtype=self.dtype, name="init_conv")(x))

        skip_sum = jnp.zeros(h.shape[:-1] + (self.skip_channels,), dtype=h.dtype)
        block_kwargs = dict(
            res_channels=self.res_channels,
            skip_channels=self.skip_channels,
            use_weight_norm=self.use_weight_norm,
            fuse_res_skip=self.fuse_res_skip,
            dtype=self.dtype,
        )
        if self.scan_cycles:
            assert self.num_res_layers % self.dilation_cycle == 0
            n_cycles = self.num_res_layers // self.dilation_cycle
            ScannedCycle = nn.scan(
                _DilationCycle,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=n_cycles,
            )
            (h, skip_sum), _ = ScannedCycle(
                dilation_cycle=self.dilation_cycle, name="cycles", **block_kwargs
            )((h, skip_sum), emb)
        elif self.use_pallas_groups and not self.use_weight_norm:
            from ..ops.pallas.wavenet_group import fused_residual_group

            # same guard as wavenet_apply_pallas: a 4-byte compute dtype
            # doubles the group's VMEM weight stash (~6.3 MB bf16 → ~12.6 MB
            # f32 for a 6-block group) — disable grouping rather than overflow
            budget = 64 if jnp.dtype(self.dtype or jnp.float32).itemsize < 4 else 0
            n = 0
            while n < self.num_res_layers:
                group = []
                while (
                    n < self.num_res_layers
                    and sum(g[1] for g in group) + 2 ** (n % self.dilation_cycle) <= budget
                ):
                    group.append((n, 2 ** (n % self.dilation_cycle)))
                    n += 1
                if len(group) == 1:  # lone small block: XLA is faster
                    n -= 1
                    group = []
                if group:
                    parts = [
                        _GroupBlockParams(self.res_channels, self.skip_channels, self.dtype,
                                          name=f"res_block_{i}")(emb)
                        for i, _ in group
                    ]
                    stacked = [jnp.stack([prt[k] for prt in parts]) for k in range(5)]
                    h, skip = fused_residual_group(
                        h, *stacked, dilations=tuple(d for _, d in group), tile_l=1024,
                        interpret=self.pallas_interpret,
                    )
                    skip_sum = skip_sum + skip
                else:
                    h, skip = ResidualBlock(
                        dilation=2 ** (n % self.dilation_cycle), name=f"res_block_{n}", **block_kwargs
                    )(h, emb)
                    skip_sum = skip_sum + skip
                    n += 1
                h, skip_sum = jax.lax.optimization_barrier((h, skip_sum))
        else:
            for n in range(self.num_res_layers):
                h, skip = ResidualBlock(
                    dilation=2 ** (n % self.dilation_cycle),
                    name=f"res_block_{n}",
                    **block_kwargs,
                )(h, emb)
                skip_sum = skip_sum + skip
                # force block-by-block scheduling: without this XLA's latency-
                # hiding scheduler keeps every block's (B, L, C_skip) output
                # alive at once (36 × 0.5 GB at batch 32 → OOM)
                h, skip_sum = jax.lax.optimization_barrier((h, skip_sum))
        out = skip_sum * math.sqrt(1.0 / self.num_res_layers)

        out = nn.relu(_WNConv(self.skip_channels, 1, use_weight_norm=self.use_weight_norm, dtype=self.dtype, name="final_conv1")(out))
        out = _WNConv(self.out_channels, 1, use_weight_norm=self.use_weight_norm, zero_init=True, dtype=self.dtype, name="final_conv2")(out)
        return jnp.swapaxes(out, -1, -2).astype(jnp.float32)  # back to (B, C_out, L)


def wavenet_from_config(wavenet_config: dict, **overrides) -> WaveNet:
    """Build from the reference JSON ``wavenet_config`` dict (config.json:8-18)."""
    cfg = dict(wavenet_config)
    cfg.update(overrides)
    return WaveNet(**cfg)


def wavenet_apply_pallas(
    variables,
    audio: jnp.ndarray,
    diffusion_steps: jnp.ndarray,
    num_res_layers: int = 36,
    dilation_cycle: int = 12,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """WaveNet forward with the Pallas fused residual-block kernel.

    Pure function over the standard (unfused) ``WaveNet`` param tree —
    res/skip kernels are concatenated per block at trace time. Numerically
    equivalent to ``WaveNet.apply`` (kernel validated against the XLA conv to
    ~2e-4/block in f32; full-model spread ~2e-2 rel from default-precision
    matmul accumulation order on both sides). Measured on v5e at B=64 bf16:
    429 ms vs 387 ms for the XLA path — the kernel beats a *standalone* XLA
    block 1.8× (13.6 vs 24 ms) but XLA's cross-block fusion still wins
    in-model, so this stays an optional path for kernel iteration
    (see ops/pallas/wavenet_block.py).
    """
    p = variables["params"]
    if diffusion_steps.ndim == 1:
        diffusion_steps = diffusion_steps[:, None]
    x = jnp.swapaxes(audio, -1, -2).astype(dtype)  # (B, L, 1)

    emb_dim = p["fc_t1"]["kernel"].shape[0]
    emb = diffusion_step_embedding(diffusion_steps, emb_dim)
    emb = swish(emb @ p["fc_t1"]["kernel"] + p["fc_t1"]["bias"]).astype(dtype)
    emb = swish(emb @ p["fc_t2"]["kernel"].astype(dtype) + p["fc_t2"]["bias"].astype(dtype))

    w0 = p["init_conv"]["Conv_0"]
    h = jax.nn.relu(x @ w0["kernel"][0].astype(dtype) + w0["bias"].astype(dtype))

    from ..ops.pallas.wavenet_block import reference_residual_block
    from ..ops.pallas.wavenet_group import fused_residual_group

    def block_params(n):
        blk = p[f"res_block_{n}"]
        t_bias = emb @ blk["Dense_0"]["kernel"].astype(dtype) + blk["Dense_0"]["bias"].astype(dtype)
        if "rs_conv" in blk:
            w_rs = blk["rs_conv"]["Conv_0"]["kernel"][0]
            b_rs = blk["rs_conv"]["Conv_0"]["bias"]
        else:
            w_rs = jnp.concatenate(
                [blk["res_conv"]["Conv_0"]["kernel"][0], blk["skip_conv"]["Conv_0"]["kernel"][0]], axis=-1
            )
            b_rs = jnp.concatenate([blk["res_conv"]["Conv_0"]["bias"], blk["skip_conv"]["Conv_0"]["bias"]])
        wd = blk["dilated_conv"]["Conv_0"]["kernel"]
        bd = blk["dilated_conv"]["Conv_0"]["bias"]
        return t_bias, wd, bd, w_rs, b_rs

    skip_sum = jnp.zeros_like(h)
    # the 6-block group holds ~6.3MB of bf16 weights in VMEM; f32 doubles that
    # and overflows, so grouping only engages for sub-f32 compute dtypes
    group_budget = 64 if jnp.dtype(dtype).itemsize < 4 else 0
    n = 0
    while n < num_res_layers:
        d = 2 ** (n % dilation_cycle)
        # fuse runs of small dilations (Σd ≤ tile budget) into one group kernel
        group = []
        while n < num_res_layers and sum(g[1] for g in group) + 2 ** (n % dilation_cycle) <= group_budget:
            group.append((n, 2 ** (n % dilation_cycle)))
            n += 1
        if len(group) == 1:  # a lone block gains nothing from the group kernel
            n -= 1
            group = []
        if group:
            ns = [g[0] for g in group]
            dils = tuple(g[1] for g in group)
            parts = [block_params(i) for i in ns]
            stack = lambda k: jnp.stack([prt[k] for prt in parts])
            h, skip = fused_residual_group(
                h, stack(0), stack(1), stack(2), stack(3), stack(4),
                dilations=dils, tile_l=1024, interpret=interpret,
            )
            skip_sum = skip_sum + skip
            h, skip_sum = jax.lax.optimization_barrier((h, skip_sum))
            continue
        # larger dilations: the fused-group VMEM/halo budget is exceeded and
        # per-block Pallas measured slower than XLA's in-model conv — use XLA
        t_bias, wd, bd, w_rs, b_rs = block_params(n)
        h, skip = reference_residual_block(
            h, t_bias, wd.astype(dtype), bd.astype(jnp.float32),
            w_rs.astype(dtype), b_rs.astype(jnp.float32), dilation=d,
        )
        skip_sum = skip_sum + skip
        h, skip_sum = jax.lax.optimization_barrier((h, skip_sum))
        n += 1
    out = skip_sum * math.sqrt(1.0 / num_res_layers)

    f1 = p["final_conv1"]["Conv_0"]
    out = jax.nn.relu(out @ f1["kernel"][0].astype(dtype) + f1["bias"].astype(dtype))
    f2 = p["final_conv2"]["Conv_0"]
    out = out @ f2["kernel"][0].astype(dtype) + f2["bias"].astype(dtype)
    return jnp.swapaxes(out, -1, -2).astype(jnp.float32)
