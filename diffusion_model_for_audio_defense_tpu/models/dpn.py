"""Dual Path Network (DPN-92/26, CIFAR variant) for 1×32×32 mel inputs.

Rebuild of ``audio_models/ConvNets_SpeechCommands/models/dpn.py``: grouped
3×3 bottlenecks whose outputs split into a residual path (first
``out_planes`` channels, added) and a dense path (concatenated).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class _DPNBottleneck(nn.Module):
    in_planes: int
    out_planes: int
    dense_depth: int
    stride: int
    first_layer: bool
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        out = nn.Conv(self.in_planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.in_planes, (3, 3), strides=(self.stride,) * 2, padding=((1, 1), (1, 1)),
                      feature_group_count=32, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.out_planes + self.dense_depth, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.first_layer:
            x = nn.Conv(self.out_planes + self.dense_depth, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype, name="shortcut_conv")(x)
            x = bn("shortcut_bn")(x)
        d = self.out_planes
        out = jnp.concatenate([x[..., :d] + out[..., :d], x[..., d:], out[..., d:]], axis=-1)
        return nn.relu(out)


class DPN(nn.Module):
    in_planes: Sequence[int] = (96, 192, 384, 768)
    out_planes: Sequence[int] = (256, 512, 1024, 2048)
    num_blocks: Sequence[int] = (3, 4, 20, 3)
    dense_depth: Sequence[int] = (16, 32, 24, 128)
    num_classes: int = 10
    in_channels: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 3, 1))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name="bn1")(x))
        for layer, (ip, op, nb, dd) in enumerate(zip(self.in_planes, self.out_planes, self.num_blocks, self.dense_depth)):
            stride = 1 if layer == 0 else 2
            for i in range(nb):
                x = _DPNBottleneck(ip, op, dd, stride if i == 0 else 1, i == 0, self.dtype,
                                   name=f"layer{layer + 1}_{i}")(x, train)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # avg_pool2d(out, 4) on the 4×4 map
        return nn.Dense(self.num_classes, name="linear")(x)


def dpn92(num_classes=10, in_channels=1, dtype=None):
    return DPN(num_classes=num_classes, in_channels=in_channels, dtype=dtype)


def dpn26(num_classes=10, in_channels=1, dtype=None):
    return DPN(num_blocks=(2, 2, 2, 2), num_classes=num_classes, in_channels=in_channels, dtype=dtype)
