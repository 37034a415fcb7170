"""DenseNet-BC (CIFAR variant) for 1×32×32 mel inputs.

Rebuild of ``audio_models/ConvNets_SpeechCommands/models/densenet.py``:
bottleneck dense blocks (BN-ReLU-1×1 → BN-ReLU-3×3, concat), compression-2
transitions with 2×2 avg-pool, final BN-ReLU → 8×8 avg-pool → FC.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class _DenseBottleneck(nn.Module):
    growth_rate: int
    expansion: int = 4
    drop_rate: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        out = nn.relu(bn("bn1")(x))
        out = nn.Conv(self.expansion * self.growth_rate, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.growth_rate, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        if self.drop_rate > 0:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        return jnp.concatenate([x, out], axis=-1)


class DenseNet(nn.Module):
    depth: int = 100
    growth_rate: int = 12
    compression: int = 2
    num_classes: int = 10
    in_channels: int = 1
    drop_rate: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert (self.depth - 4) % 3 == 0, "depth should be 3n+4"
        n = (self.depth - 4) // 6  # bottleneck block
        x = jnp.transpose(x, (0, 2, 3, 1))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(2 * self.growth_rate, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        for d in range(3):
            for b in range(n):
                x = _DenseBottleneck(self.growth_rate, drop_rate=self.drop_rate, dtype=self.dtype,
                                     name=f"dense{d + 1}_{b}")(x, train)
            if d < 2:
                bn = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                  dtype=self.dtype, name=f"trans{d + 1}_bn")
                x = nn.relu(bn(x))
                x = nn.Conv(x.shape[-1] // self.compression, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"trans{d + 1}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name="bn_final")(x))
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return nn.Dense(self.num_classes, name="fc")(x)


def densenet_bc_100_12(num_classes=10, in_channels=1, dtype=None):
    return DenseNet(100, 12, 2, num_classes, in_channels, dtype=dtype)


def densenet_bc_250_24(num_classes=10, in_channels=1, dtype=None):
    return DenseNet(250, 24, 2, num_classes, in_channels, dtype=dtype)


def densenet_bc_190_40(num_classes=10, in_channels=1, dtype=None):
    return DenseNet(190, 40, 2, num_classes, in_channels, dtype=dtype)
