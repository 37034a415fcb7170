"""STFT / spectrogram ops.

Numerically matches ``torch.stft`` with ``center=True, pad_mode='constant'``
(zero pad), periodic Hann window — the configuration used by the reference's
``torchaudio.transforms.MelSpectrogram`` (``adaptive_attack_eval.py:114``) and
by the psychoacoustic masker (``robustness_eval/white_box_attack.py:659-666``,
which uses ``center=False``).

Framing is a static gather over precomputed indices; the FFT lowers to XLA's
native TPU FFT. Everything is jittable and differentiable.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    return jnp.asarray(w[:win_length], dtype=dtype)


@functools.lru_cache(maxsize=32)
def _frame_indices(length: int, frame_length: int, hop: int):
    n_frames = 1 + (length - frame_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return idx  # (n_frames, frame_length) numpy → folded as constant


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice ``x (..., L)`` into overlapping frames ``(..., n_frames, frame_length)``."""
    idx = _frame_indices(x.shape[-1], frame_length, hop)
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT of ``x (..., L)`` → ``(..., n_fft//2+1, n_frames)``.

    Matches torch.stft(onesided=True, normalized=False, pad_mode='constant').
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, dtype=x.dtype)
    if win_length < n_fft:  # torch centers the window inside n_fft
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad)
    frames = frame_signal(x, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, axis=-1)  # (..., n_frames, n_fft//2+1)
    return jnp.swapaxes(spec, -1, -2)


def spectrogram(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    power: float = 2.0,
    center: bool = True,
    window: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Magnitude/power spectrogram, torchaudio.transforms.Spectrogram parity."""
    s = stft(x, n_fft, hop_length, window=window, center=center)
    mag2 = s.real**2 + s.imag**2
    if power == 2.0:
        return mag2
    if power == 1.0:
        return jnp.sqrt(jnp.maximum(mag2, 1e-30))
    return jnp.power(jnp.maximum(mag2, 1e-30), power / 2.0)
