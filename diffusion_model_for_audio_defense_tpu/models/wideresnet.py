"""WideResNet (pre-activation) for 1×32×32 mel inputs.

Rebuild of ``audio_models/ConvNets_SpeechCommands/models/wideresnet.py``:
BN-ReLU-conv basic blocks, three groups (strides 1/2/2), final BN-ReLU →
8×8 avg-pool → FC. The '28_10D' registry name is WRN-28-10 with dropout 0.3
(the reference trains that variant separately).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class _WRNBlock(nn.Module):
    out_planes: int
    stride: int = 1
    drop_rate: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        equal = x.shape[-1] == self.out_planes
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        pre = nn.relu(bn("bn1")(x))
        src = x if equal else pre
        out = nn.Conv(self.out_planes, (3, 3), strides=(self.stride,) * 2, padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv1")(pre)
        out = nn.relu(bn("bn2")(out))
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        out = nn.Conv(self.out_planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        if equal:
            sc = x
        else:
            sc = nn.Conv(self.out_planes, (1, 1), strides=(self.stride,) * 2, use_bias=False,
                         dtype=self.dtype, name="conv_shortcut")(src)
        return sc + out


class WideResNet(nn.Module):
    depth: int = 28
    widen_factor: int = 10
    num_classes: int = 10
    in_channels: int = 1
    drop_rate: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert (self.depth - 4) % 6 == 0
        n = (self.depth - 4) // 6
        widths = [16, 16 * self.widen_factor, 32 * self.widen_factor, 64 * self.widen_factor]
        x = jnp.transpose(x, (0, 2, 3, 1))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(widths[0], (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv1")(x)
        for g, w in enumerate(widths[1:]):
            stride = 1 if g == 0 else 2
            for b in range(n):
                x = _WRNBlock(w, stride if b == 0 else 1, self.drop_rate, self.dtype,
                              name=f"block{g + 1}_{b}")(x, train)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name="bn1")(x))
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, name="fc")(x)


def wideresnet28_10(num_classes=10, in_channels=1, dtype=None):
    return WideResNet(28, 10, num_classes, in_channels, 0.0, dtype)


def wideresnet28_10D(num_classes=10, in_channels=1, dtype=None):
    return WideResNet(28, 10, num_classes, in_channels, 0.3, dtype)


def wideresnet52_10(num_classes=10, in_channels=1, dtype=None):
    return WideResNet(52, 10, num_classes, in_channels, 0.0, dtype)
