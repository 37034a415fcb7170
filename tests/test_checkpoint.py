"""Checkpoint converters: torch ResNeXt/M5 → Flax, logits parity to 1e-4."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from diffusion_model_for_audio_defense_tpu.core.checkpoint import (
    convert_m5_state_dict,
    convert_resnext_state_dict,
    load_pytree,
    save_pytree,
)
from diffusion_model_for_audio_defense_tpu.models import M5, CifarResNeXt


class _TorchBottleneck(tnn.Module):
    """Torch fixture matching the reference ResNeXt bottleneck key layout."""

    def __init__(self, cin, cout, stride, card, base_w, widen):
        super().__init__()
        D = card * int(base_w * cout / (widen * 64.0))
        self.conv_reduce = tnn.Conv2d(cin, D, 1, bias=False)
        self.bn_reduce = tnn.BatchNorm2d(D)
        self.conv_conv = tnn.Conv2d(D, D, 3, stride=stride, padding=1, groups=card, bias=False)
        self.bn = tnn.BatchNorm2d(D)
        self.conv_expand = tnn.Conv2d(D, cout, 1, bias=False)
        self.bn_expand = tnn.BatchNorm2d(cout)
        self.shortcut = tnn.Sequential()
        if cin != cout:
            self.shortcut.add_module("shortcut_conv", tnn.Conv2d(cin, cout, 1, stride=stride, bias=False))
            self.shortcut.add_module("shortcut_bn", tnn.BatchNorm2d(cout))

    def forward(self, x):
        b = tF.relu(self.bn_reduce(self.conv_reduce(x)))
        b = tF.relu(self.bn(self.conv_conv(b)))
        b = self.bn_expand(self.conv_expand(b))
        return tF.relu(self.shortcut(x) + b)


class _TorchResNeXt(tnn.Module):
    def __init__(self, nlabels=10, card=2, depth=11, base_w=4, widen=4, cin=1):
        super().__init__()
        n = (depth - 2) // 9
        stages = [64, 64 * widen, 128 * widen, 256 * widen]
        self.conv_1_3x3 = tnn.Conv2d(cin, 64, 3, 1, 1, bias=False)
        self.bn_1 = tnn.BatchNorm2d(64)
        for s, (cout, stride) in enumerate(zip(stages[1:], (1, 2, 2)), start=1):
            blocks = tnn.Sequential()
            for b in range(n):
                blocks.add_module(
                    f"stage_{s}_bottleneck_{b}",
                    _TorchBottleneck(stages[s - 1] if b == 0 else cout, cout, stride if b == 0 else 1, card, base_w, widen),
                )
            setattr(self, f"stage_{s}", blocks)
        self.classifier = tnn.Linear(stages[3], nlabels)

    def forward(self, x):
        x = tF.relu(self.bn_1(self.conv_1_3x3(x)))
        x = self.stage_3(self.stage_2(self.stage_1(x)))
        x = tF.avg_pool2d(x, 8, 1).view(x.shape[0], -1)
        return self.classifier(x)


def test_resnext_converter_logits_parity(rng_np):
    torch.manual_seed(0)
    tm = _TorchResNeXt().eval()
    # randomize running stats so BN conversion is actually exercised
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    variables = convert_resnext_state_dict(tm.state_dict())
    fm = CifarResNeXt(nlabels=10, cardinality=2, depth=11, base_width=4, widen_factor=4, in_channels=1)
    x = rng_np.standard_normal((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        golden = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-4)


def test_m5_converter_logits_parity(rng_np):
    torch.manual_seed(1)

    class TorchM5(tnn.Module):
        def __init__(self, k=80, n_out=10, ch=8):
            super().__init__()
            self.conv1 = tnn.Conv1d(1, ch, k, stride=16)
            self.bn1 = tnn.BatchNorm1d(ch)
            self.conv2 = tnn.Conv1d(ch, ch, 3)
            self.bn2 = tnn.BatchNorm1d(ch)
            self.conv3 = tnn.Conv1d(ch, 2 * ch, 3)
            self.bn3 = tnn.BatchNorm1d(2 * ch)
            self.conv4 = tnn.Conv1d(2 * ch, 2 * ch, 3)
            self.bn4 = tnn.BatchNorm1d(2 * ch)
            self.fc1 = tnn.Linear(2 * ch, n_out)

        def forward(self, x):
            for i in (1, 2, 3, 4):
                x = getattr(self, f"conv{i}")(x)
                x = tF.relu(getattr(self, f"bn{i}")(x))
                x = tF.max_pool1d(x, 4)
            x = tF.avg_pool1d(x, x.shape[-1]).view(x.shape[0], -1)
            return tF.log_softmax(self.fc1(x), dim=1)

    tm = TorchM5().eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    variables = convert_m5_state_dict(tm.state_dict())
    fm = M5(n_input=1, first_kernel_size=80, n_output=10, n_channel=8)
    x = rng_np.standard_normal((2, 1, 16000)).astype(np.float32) * 0.1
    with torch.no_grad():
        golden = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-3)


def test_orbax_roundtrip(tmp_path):
    tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    save_pytree(str(tmp_path / "ck"), tree)
    back = load_pytree(str(tmp_path / "ck"))
    np.testing.assert_array_equal(back["params"]["w"], tree["params"]["w"])
