"""Attention-RCNN keyword-spotting model (Qualcomm KWS).

Rebuild of ``audio_models/RCNN_KWS/model.py``: separable conv over the mel
frame sequence (depthwise k=5/s=2 over time, then pointwise with stride 8),
2-layer bidirectional GRU, tanh attention (``e_t = v·tanh(W h_t + b)``),
attended context → linear → log-softmax. Variable-length inputs supported
(eval is per-utterance batch 1 in the reference driver).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class _BiGRU(nn.Module):
    hidden_size: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):  # x: (B, T, F)
        for layer in range(self.num_layers):
            fwd = nn.RNN(nn.GRUCell(self.hidden_size), name=f"gru{layer}_fwd")(x)
            bwd = nn.RNN(nn.GRUCell(self.hidden_size), reverse=True, keep_order=True, name=f"gru{layer}_bwd")(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return x  # (B, T, 2H)


class KWSModel(nn.Module):
    in_size: int = 40
    hidden_size: int = 64
    kernel_size: tuple = (20, 5)
    stride: tuple = (8, 2)
    gru_num_layers: int = 2
    num_dirs: int = 2
    num_classes: int = 4

    @nn.compact
    def __call__(self, batch: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # batch: (B, 1, n_mels, T) spectrogram or (B, n_mels, T)
        x = batch[:, 0] if batch.ndim == 4 else batch  # (B, F, T)
        x = jnp.swapaxes(x, 1, 2)  # (B, T, F): time-major for conv/scan

        # depthwise conv over time (k=ks[1], stride=st[1]) then pointwise 1×1
        # with stride st[0] (reference ``sepconv``)
        x = nn.Conv(self.in_size, kernel_size=(self.kernel_size[1],), strides=(self.stride[1],),
                    feature_group_count=self.in_size, padding="VALID", name="depthwise")(x)
        # the reference's pointwise conv is GROUPED: groups=int(in/k0)
        # (model.py:11) — 1 for the shipped n_mels=32 checkpoints, 2 for the
        # code-default in_size=40
        x = nn.Conv(self.hidden_size, kernel_size=(1,), strides=(self.stride[0],),
                    feature_group_count=max(1, self.in_size // self.kernel_size[0]),
                    padding="VALID", name="pointwise")(x)

        h = _BiGRU(self.hidden_size, self.gru_num_layers, name="gru")(x)  # (B, T', 2H)

        # attention: e_t = v·tanh(W h_t + b); α = softmax_t(e); c = Σ α_t h_t
        e = nn.Dense(1, use_bias=False, name="attn_v")(jnp.tanh(nn.Dense(2 * self.hidden_size, name="attn_w")(h)))
        alpha = jax.nn.softmax(e[..., 0], axis=-1)  # (B, T')
        c = jnp.einsum("bt,bth->bh", alpha, h)
        logits = nn.Dense(self.num_classes, use_bias=False, name="attn_u")(c)
        return nn.log_softmax(logits, axis=-1)
