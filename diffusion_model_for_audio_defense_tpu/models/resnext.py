"""ResNeXt-29 (CIFAR variant) — the main victim classifier.

Rebuild of ``audio_models/ConvNets_SpeechCommands/models/resnext.py:23-142``
(CifarResNeXt, cardinality 8, base_width 64, widen_factor 4) for 1×32×32
mel-spectrogram inputs. NHWC layout; grouped 3×3 via
``feature_group_count``; logits output (no softmax), reference parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ResNeXtBottleneck(nn.Module):
    out_channels: int
    stride: int
    cardinality: int
    base_width: int
    widen_factor: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name)
        width_ratio = self.out_channels / (self.widen_factor * 64.0)
        D = self.cardinality * int(self.base_width * width_ratio)

        b = nn.Conv(D, (1, 1), use_bias=False, dtype=self.dtype, name="conv_reduce")(x)
        b = nn.relu(norm("bn_reduce")(b))
        b = nn.Conv(D, (3, 3), strides=(self.stride, self.stride), padding=((1, 1), (1, 1)),
                    feature_group_count=self.cardinality, use_bias=False, dtype=self.dtype, name="conv_conv")(b)
        b = nn.relu(norm("bn")(b))
        b = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv_expand")(b)
        b = norm("bn_expand")(b)

        if x.shape[-1] != self.out_channels:
            sc = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, self.stride), use_bias=False, dtype=self.dtype, name="shortcut_conv")(x)
            sc = norm("shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(sc + b)


class CifarResNeXt(nn.Module):
    nlabels: int = 10
    cardinality: int = 8
    depth: int = 29
    base_width: int = 64
    widen_factor: int = 4
    in_channels: int = 1
    dtype: object = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # accept NCHW (the Wave2Spect/classifier seam) and go channels-last
        x = jnp.transpose(x, (0, 2, 3, 1))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        block_depth = (self.depth - 2) // 9
        stages = [64, 64 * self.widen_factor, 128 * self.widen_factor, 256 * self.widen_factor]

        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv_1_3x3")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn_1")(x))

        for s, (out_ch, stride) in enumerate(zip(stages[1:], (1, 2, 2)), start=1):
            for b in range(block_depth):
                x = ResNeXtBottleneck(
                    out_channels=out_ch,
                    stride=stride if b == 0 else 1,
                    cardinality=self.cardinality,
                    base_width=self.base_width,
                    widen_factor=self.widen_factor,
                    dtype=self.dtype,
                    name=f"stage_{s}_bottleneck_{b}",
                )(x, train=train)

        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # = avg_pool2d(x, 8)
        return nn.Dense(self.nlabels, name="classifier")(x)


def resnext29_8_64(num_classes: int = 10, in_channels: int = 1, dtype=None) -> CifarResNeXt:
    return CifarResNeXt(nlabels=num_classes, cardinality=8, depth=29, base_width=64, widen_factor=4, in_channels=in_channels, dtype=dtype)
