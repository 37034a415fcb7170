"""Sinc (bandlimited) resampling, torchaudio-compatible.

Replaces ``torchaudio.transforms.Resample(resampling_method='sinc_
interpolation')`` used by the DS defense (``frequency_defense.py:37-60``).
The kernel is precomputed on host following the torchaudio algorithm
(gcd-reduced rates, Hann-windowed sinc, ``lowpass_filter_width=6``,
``rolloff=0.99``) and applied as one strided conv — an MXU matmul.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _resample_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6, rolloff: float = 0.99):
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd
    base_freq = min(orig, new) * rolloff  # anti-aliasing cutoff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig  # (1, K)
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx  # (new, K)
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    kernel = np.where(t == 0, 1.0, np.sinc(t)) * window * (base_freq / orig)
    return kernel.astype(np.float32), orig, new, width


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Resample ``x (..., L)`` from orig_freq to new_freq."""
    if orig_freq == new_freq:
        return x
    kernel, orig, new, width = _resample_kernel(orig_freq, new_freq)
    batch_shape = x.shape[:-1]
    length = x.shape[-1]
    xf = x.reshape(-1, 1, length)
    pad = width + orig
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, pad)))
    k = jnp.asarray(kernel)[:, None, :]  # (new, 1, K) — OIW layout
    y = jax.lax.conv_general_dilated(
        xf, k, window_strides=(orig,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
    )  # (B, new, frames)
    y = jnp.swapaxes(y, 1, 2).reshape(xf.shape[0], -1)
    target_len = int(math.ceil(new_freq * length / orig_freq))
    return y[:, :target_len].reshape(*batch_shape, target_len)
