"""VGG (torchvision CIFAR-adapted) for 1×32×32 mel inputs.

Rebuild of ``audio_models/ConvNets_SpeechCommands/models/vgg.py``: conv3-BN-
ReLU stacks per config letter with 2×2 maxpools, then the 512→4096→4096→C
classifier head (feature map is 1×1 after five pools on 32×32 input).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_CFG = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    cfg: str = "E"
    batch_norm: bool = True
    num_classes: int = 10
    in_channels: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 3, 1))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        conv_i = 0
        for v in _CFG[self.cfg]:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"conv_{conv_i}")(x)
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype, name=f"bn_{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="fc2")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="fc3")(x)


def vgg19_bn(num_classes: int = 10, in_channels: int = 1, dtype=None) -> VGG:
    return VGG(cfg="E", batch_norm=True, num_classes=num_classes, in_channels=in_channels, dtype=dtype)


def vgg11_bn(num_classes: int = 10, in_channels: int = 1, dtype=None) -> VGG:
    return VGG(cfg="A", batch_norm=True, num_classes=num_classes, in_channels=in_channels, dtype=dtype)


def vgg16_bn(num_classes: int = 10, in_channels: int = 1, dtype=None) -> VGG:
    return VGG(cfg="D", batch_norm=True, num_classes=num_classes, in_channels=in_channels, dtype=dtype)
