"""UNet torch→flax converter parity against a torch golden fixture that
reproduces the improved-diffusion UNetModel key layout and math."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from diffusion_model_for_audio_defense_tpu.core.checkpoint import convert_unet_state_dict
from diffusion_model_for_audio_defense_tpu.models.unet import UNetModel

MC = 32  # model channels
HEADS = 2
EMB = 4 * MC


class TRes(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.in_layers = tnn.Sequential(tnn.GroupNorm(32, cin), tnn.SiLU(), tnn.Conv2d(cin, cout, 3, padding=1))
        self.emb_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(EMB, 2 * cout))
        self.out_layers = tnn.Sequential(
            tnn.GroupNorm(32, cout), tnn.SiLU(), tnn.Dropout(0.0), tnn.Conv2d(cout, cout, 3, padding=1)
        )
        self.skip_connection = tnn.Conv2d(cin, cout, 1) if cin != cout else tnn.Identity()

    def forward(self, x, emb):
        h = self.in_layers(x)
        eo = self.emb_layers(emb)[:, :, None, None]
        scale, shift = torch.chunk(eo, 2, dim=1)
        h = self.out_layers[0](h) * (1 + scale) + shift
        h = self.out_layers[1](h)
        h = self.out_layers[3](self.out_layers[2](h))
        return self.skip_connection(x) + h


class TAttn(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnn.GroupNorm(32, c)
        self.qkv = tnn.Conv1d(c, 3 * c, 1)
        self.proj_out = tnn.Conv1d(c, c, 1)

    def forward(self, x):
        b, c, hh, ww = x.shape
        xs = x.reshape(b, c, -1)
        qkv = self.qkv(self.norm(xs)).reshape(b * HEADS, -1, hh * ww)
        ch = c // HEADS
        q, k, v = qkv.split(ch, dim=1)
        scale = 1 / math.sqrt(math.sqrt(ch))
        w = torch.softmax(torch.einsum("bct,bcs->bts", q * scale, k * scale).float(), dim=-1).type(qkv.dtype)
        a = torch.einsum("bts,bcs->bct", w, v).reshape(b, c, hh * ww)
        return x + self.proj_out(a).reshape(b, c, hh, ww)


class TDown(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.op = tnn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x, emb=None):
        return self.op(x)


class TUp(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, padding=1)

    def forward(self, x, emb=None):
        return self.conv(tF.interpolate(x, scale_factor=2, mode="nearest"))


class TSeq(tnn.Sequential):
    def forward(self, x, emb):
        for m in self:
            x = m(x, emb) if isinstance(m, TRes) else m(x)
        return x


class TorchUNet(tnn.Module):
    """improved_diffusion.unet.UNetModel key layout, config:
    model_channels=32, num_res_blocks=1, channel_mult=(1,2), attn at ds=2."""

    def __init__(self):
        super().__init__()
        self.time_embed = tnn.Sequential(tnn.Linear(MC, EMB), tnn.SiLU(), tnn.Linear(EMB, EMB))
        self.input_blocks = tnn.ModuleList([TSeq(tnn.Conv2d(1, MC, 3, padding=1))])
        # level 0 (mult 1, ds 1, no attn)
        self.input_blocks.append(TSeq(TRes(MC, MC)))
        self.input_blocks.append(TSeq(TDown(MC)))
        # level 1 (mult 2, ds 2, attn)
        self.input_blocks.append(TSeq(TRes(MC, 2 * MC), TAttn(2 * MC)))
        self.middle_block = TSeq(TRes(2 * MC, 2 * MC), TAttn(2 * MC), TRes(2 * MC, 2 * MC))
        self.output_blocks = tnn.ModuleList([
            TSeq(TRes(4 * MC, 2 * MC), TAttn(2 * MC)),
            TSeq(TRes(3 * MC, 2 * MC), TAttn(2 * MC), TUp(2 * MC)),
            TSeq(TRes(3 * MC, MC)),
            TSeq(TRes(2 * MC, MC)),
        ])
        self.out = tnn.Sequential(tnn.GroupNorm(32, MC), tnn.SiLU(), tnn.Conv2d(MC, 1, 3, padding=1))

    def forward(self, x, t):
        half = MC // 2
        freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
        args = t.float()[:, None] * freqs[None]
        emb = self.time_embed(torch.cat([torch.cos(args), torch.sin(args)], dim=-1))
        hs = []
        h = x
        for m in self.input_blocks:
            h = m(h, emb)
            hs.append(h)
        h = self.middle_block(h, emb)
        for m in self.output_blocks:
            h = m(torch.cat([h, hs.pop()], dim=1), emb)
        return self.out(h)


def test_unet_converter_parity(rng_np):
    torch.manual_seed(0)
    tm = TorchUNet().eval()
    params = convert_unet_state_dict(
        tm.state_dict(), num_res_blocks=1, channel_mult=(1, 2), attention_ds=(2,), num_heads=HEADS
    )
    fm = UNetModel(
        in_channels=1, model_channels=MC, out_channels=1, num_res_blocks=1,
        attention_resolutions=(2,), dropout=0.0, channel_mult=(1, 2), num_heads=HEADS,
        use_scale_shift_norm=True,
    )
    x = rng_np.standard_normal((2, 1, 16, 16)).astype(np.float32)
    t = np.array([3.0, 77.0], dtype=np.float32)
    with torch.no_grad():
        golden = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t)))
    assert ours.shape == golden.shape
    assert np.abs(golden).max() > 1e-3  # non-vacuous
    np.testing.assert_allclose(ours, golden, atol=5e-5, rtol=1e-4)


def test_infer_unet_kwargs_roundtrip():
    """CLI geometry inference (cli/_common.py Diffusion-Spec): a non-default
    checkpoint must rebuild the exact architecture that produced it — the
    reference CLIs hard-code create_model defaults (adaptive_attack_eval.py),
    which breaks on any reduced/widened UNet checkpoint."""
    from diffusion_model_for_audio_defense_tpu.models.unet import (
        create_unet,
        infer_unet_kwargs,
    )

    for kwargs in (
        dict(num_channels=32, num_res_blocks=1),
        dict(num_channels=64, num_res_blocks=2, learn_sigma=True),
        dict(),  # reference default 128ch/3RB
    ):
        unet = create_unet(**kwargs)
        variables = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32)), jnp.zeros((1,)))
        got = infer_unet_kwargs(variables)
        want = dict(num_channels=128, num_res_blocks=3, in_channels=1, learn_sigma=False)
        want.update(kwargs)
        assert got == want
        # the inferred kwargs rebuild a module that accepts the params as-is
        rebuilt = create_unet(**got)
        out = rebuilt.apply(variables, jnp.zeros((1, 1, 32, 32)), jnp.zeros((1,)))
        assert out.shape == (1, 2 if got["learn_sigma"] else 1, 32, 32)
