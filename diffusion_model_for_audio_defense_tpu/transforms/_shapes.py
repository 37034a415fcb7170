"""Shared shape dispatch for the signal-defense transforms."""

from __future__ import annotations


def as_bt(audio):
    """Normalize waveform shapes to (B, T); returns (array, original_shape).

    Accepts (T,), (B, T), or the public (B, 1, T) seam.
    """
    if audio.ndim == 1:
        return audio[None, :], audio.shape
    if audio.ndim == 2:
        return audio, audio.shape
    if audio.ndim == 3:
        return audio[:, 0, :], audio.shape
    raise NotImplementedError("Audio Shape Error")
