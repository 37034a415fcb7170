"""Mel spectrogram front-end with torchaudio parity.

Replaces the reference preprocessing pipeline
``Compose([torchaudio.transforms.MelSpectrogram(n_fft=2048, hop_length=512,
n_mels=32, norm='slaney', mel_scale='slaney', pad_mode='constant'),
AmplitudeToDB(stype='power')])`` (``adaptive_attack_eval.py:110-116``).

The slaney-scale filterbank is precomputed in float64 on host and baked into
the compiled program; the whole wave→log-mel map is a framing gather, one
batched rFFT and one (frames × filterbank) matmul — MXU-friendly and fully
differentiable (attacks backprop through it).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .stft import spectrogram as _spectrogram

_F_SP = 200.0 / 3.0  # slaney linear region slope
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(freq, mel_scale: str = "slaney"):
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    mels = freq / _F_SP
    return np.where(freq >= _MIN_LOG_HZ, _MIN_LOG_MEL + np.log(np.maximum(freq, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP, mels)


def mel_to_hz(mels, mel_scale: str = "slaney"):
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    freqs = _F_SP * mels
    return np.where(mels >= _MIN_LOG_MEL, _MIN_LOG_HZ * np.exp(_LOGSTEP * (mels - _MIN_LOG_MEL)), freqs)


@functools.lru_cache(maxsize=8)
def _mel_filterbank_np(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm: str | None,
    mel_scale: str,
):
    """Triangular filterbank, torchaudio.functional.melscale_fbanks parity.

    Returns (n_freqs, n_mels) float64.
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min, m_max = hz_to_mel(f_min, mel_scale), hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz(m_pts, mel_scale)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb


def mel_filterbank(
    n_freqs: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    n_mels: int = 32,
    sample_rate: int = 16000,
    norm: str | None = "slaney",
    mel_scale: str = "slaney",
    dtype=jnp.float32,
) -> jnp.ndarray:
    f_max = f_max if f_max is not None else sample_rate / 2.0
    fb = _mel_filterbank_np(n_freqs, f_min, f_max, n_mels, sample_rate, norm, mel_scale)
    return jnp.asarray(fb, dtype=dtype)


def amplitude_to_db(x, stype: str = "power", top_db: float | None = None, amin: float = 1e-10, ref_value: float = 1.0):
    """torchaudio.transforms.AmplitudeToDB parity (stype='power' → 10·log10)."""
    multiplier = 10.0 if stype == "power" else 20.0
    db = multiplier * jnp.log10(jnp.maximum(x, amin))
    db = db - multiplier * np.log10(max(amin, ref_value))
    if top_db is not None:
        db = jnp.maximum(db, jnp.max(db, axis=tuple(range(1, db.ndim)), keepdims=True) - top_db)
    return db


class MelSpectrogram:
    """Callable wave→mel-power map. Input ``(..., L)`` → ``(..., n_mels, n_frames)``."""

    def __init__(
        self,
        sample_rate: int = 16000,
        n_fft: int = 2048,
        hop_length: int = 512,
        n_mels: int = 32,
        f_min: float = 0.0,
        f_max: float | None = None,
        power: float = 2.0,
        norm: str | None = "slaney",
        mel_scale: str = "slaney",
        center: bool = True,
    ):
        self.n_fft, self.hop_length, self.power, self.center = n_fft, hop_length, power, center
        self.fb = mel_filterbank(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate, norm, mel_scale)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = _spectrogram(x, self.n_fft, self.hop_length, power=self.power, center=self.center)
        # spec: (..., freq, time); contract freq with the filterbank on the MXU
        return jnp.einsum("...ft,fm->...mt", spec, self.fb)


class Wave2Spect:
    """The reference's ``Wave2Spect = MelSpectrogram ∘ AmplitudeToDB`` seam.

    Input waveform ``(B, 1, 16000)`` → log-mel ``(B, 1, 32, 32)``.
    """

    def __init__(self, n_mels: int = 32, sample_rate: int = 16000, n_fft: int = 2048, hop_length: int = 512, top_db: float | None = None):
        self.melspec = MelSpectrogram(sample_rate=sample_rate, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels)
        self.top_db = top_db

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return amplitude_to_db(self.melspec(x), stype="power", top_db=self.top_db)
