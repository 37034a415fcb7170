"""ResNet-18/34/50/101/152 (torchvision-style, mel-input variant).

Rebuild of ``audio_models/ConvNets_SpeechCommands/models/resnet.py``: 7×7/s2
stem + 3×3/s2 maxpool, four stages, AvgPool2d(1) (on 32×32 input the final
map is 1×1) → FC.
"""

from __future__ import annotations

from typing import Sequence, Type

import flax.linen as nn
import jax.numpy as jnp


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: object = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(_bn(train, self.dtype, "bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _bn(train, self.dtype, "bn2")(out)
        if self.downsample:
            x = nn.Conv(self.planes * self.expansion, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            x = _bn(train, self.dtype, "ds_bn")(x)
        return nn.relu(x + out)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: object = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(_bn(train, self.dtype, "bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(_bn(train, self.dtype, "bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = _bn(train, self.dtype, "bn3")(out)
        if self.downsample:
            x = nn.Conv(self.planes * 4, (1, 1), strides=(self.stride,) * 2, use_bias=False,
                        dtype=self.dtype, name="ds_conv")(x)
            x = _bn(train, self.dtype, "ds_bn")(x)
        return nn.relu(x + out)


class ResNet(nn.Module):
    block: Type[nn.Module]
    layers: Sequence[int]
    num_classes: int = 10
    in_channels: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        exp = 4 if self.block is Bottleneck else 1
        x = jnp.transpose(x, (0, 2, 3, 1))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_bn(train, self.dtype, "bn1")(x))
        x = nn.max_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf),
                        (3, 3), strides=(2, 2))
        inplanes = 64
        for s, (planes, n) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if s == 0 else 2
            for b in range(n):
                ds = b == 0 and (stride != 1 or inplanes != planes * exp)
                x = self.block(planes, stride if b == 0 else 1, ds, self.dtype, name=f"layer{s + 1}_{b}")(x, train)
            inplanes = planes * exp
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # AvgPool over remaining 1×1
        return nn.Dense(self.num_classes, name="fc")(x)


def resnet18(num_classes=10, in_channels=1, dtype=None):
    return ResNet(BasicBlock, (2, 2, 2, 2), num_classes, in_channels, dtype)


def resnet34(num_classes=10, in_channels=1, dtype=None):
    return ResNet(BasicBlock, (3, 4, 6, 3), num_classes, in_channels, dtype)


def resnet50(num_classes=10, in_channels=1, dtype=None):
    return ResNet(Bottleneck, (3, 4, 6, 3), num_classes, in_channels, dtype)


def resnet101(num_classes=10, in_channels=1, dtype=None):
    return ResNet(Bottleneck, (3, 4, 23, 3), num_classes, in_channels, dtype)


def resnet152(num_classes=10, in_channels=1, dtype=None):
    return ResNet(Bottleneck, (3, 8, 36, 3), num_classes, in_channels, dtype)
