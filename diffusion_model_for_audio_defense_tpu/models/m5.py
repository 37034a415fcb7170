"""M5 raw-waveform CNN (reference ``audio_models/M5/M5Net.py:4-38``).

Channels-last Flax re-design: conv1d(k=80/160, stride=16) → 4×(conv-BN-ReLU-
maxpool4) → global avg-pool → FC → log-softmax. Input ``(B, 1, L)`` raw
waveform; output log-probabilities (the reference returns ``log_softmax`` —
kept so CE losses/logit comparisons match).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class M5(nn.Module):
    n_input: int = 1
    first_kernel_size: int = 80
    n_output: int = 35
    stride: int = 16
    n_channel: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.swapaxes(x, -1, -2)  # (B, L, C)
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)

        def block(x, feats, k):
            x = nn.Conv(feats, kernel_size=(k,), strides=(self.stride,) if k == self.first_kernel_size else (1,), padding="VALID")(x)
            x = nn.relu(norm()(x))
            # MaxPool1d(4): window 4, stride 4, VALID (floor) — torch default
            return nn.max_pool(x, window_shape=(4,), strides=(4,), padding="VALID")

        x = block(x, self.n_channel, self.first_kernel_size)
        x = block(x, self.n_channel, 3)
        x = block(x, 2 * self.n_channel, 3)
        x = block(x, 2 * self.n_channel, 3)
        x = jnp.mean(x, axis=1)  # avg_pool over full remaining length
        x = nn.Dense(self.n_output)(x)
        return nn.log_softmax(x, axis=-1)
