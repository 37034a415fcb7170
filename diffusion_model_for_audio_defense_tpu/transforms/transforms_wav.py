"""Waveform data transforms (reference ``transforms/transforms_wav.py``).

Host-side numpy preprocessing/augmentation callables over the same
dict-based protocol (``{'path', 'samples', 'sample_rate', 'target'}``) so
dataset code composes identically. Stochastic augments take a
``numpy.random.Generator`` for reproducibility instead of global RNG.
"""

from __future__ import annotations

import numpy as np

from ..data.wav_io import read_wav
from ..ops.mel import MelSpectrogram


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, data):
        for t in self.transforms:
            data = t(data)
        return data


def _should_apply(rng: np.random.Generator, prob: float = 0.5) -> bool:
    return rng.random() < prob


class LoadAudio:
    def __init__(self, sample_rate: int = 16000):
        self.sample_rate = sample_rate

    def __call__(self, data):
        path = data["path"]
        if path:
            samples, sr = read_wav(path, self.sample_rate)
        else:  # silence
            sr = self.sample_rate
            samples = np.zeros(sr, dtype=np.float32)
        data["samples"] = samples
        data["sample_rate"] = sr
        return data


class FixAudioLength:
    def __init__(self, time: float = 1.0):
        self.time = time

    def __call__(self, data):
        samples = data["samples"]
        length = int(self.time * data["sample_rate"])
        if length < len(samples):
            data["samples"] = samples[:length]
        elif length > len(samples):
            data["samples"] = np.pad(samples, (0, length - len(samples)), "constant")
        return data


class ChangeAmplitude:
    def __init__(self, amplitude_range=(0.7, 1.1), rng=None):
        self.amplitude_range = amplitude_range
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        if not _should_apply(self.rng):
            return data
        data["samples"] = data["samples"] * self.rng.uniform(*self.amplitude_range)
        return data


class ChangeSpeedAndPitchAudio:
    def __init__(self, max_scale: float = 0.2, rng=None):
        self.max_scale = max_scale
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        if not _should_apply(self.rng):
            return data
        samples = data["samples"]
        scale = self.rng.uniform(-self.max_scale, self.max_scale)
        speed_fac = 1.0 / (1 + scale)
        data["samples"] = np.interp(
            np.arange(0, len(samples), speed_fac), np.arange(0, len(samples)), samples
        ).astype(np.float32)
        return data


class StretchAudio:
    """Time-stretch without pitch change via phase vocoder (replaces
    librosa.effects.time_stretch)."""

    def __init__(self, max_scale: float = 0.2, rng=None, n_fft: int = 2048, hop: int = 512):
        self.max_scale = max_scale
        self.rng = rng or np.random.default_rng()
        self.n_fft, self.hop = n_fft, hop

    def __call__(self, data):
        if not _should_apply(self.rng):
            return data
        rate = 1 + self.rng.uniform(-self.max_scale, self.max_scale)
        data["samples"] = self._phase_vocoder(data["samples"], rate)
        return data

    def _phase_vocoder(self, y: np.ndarray, rate: float) -> np.ndarray:
        # composed from the shared STFT helpers (transforms_stft.py) so the
        # vocoder core exists once; matches librosa.effects.time_stretch
        # (reflect-centered stft, librosa-style 2-column pad in the vocoder)
        from .transforms_stft import _np_istft, _np_stft, _phase_vocoder

        D = _np_stft(np.asarray(y, np.float32), self.n_fft, self.hop)
        if D.shape[1] < 2:
            return np.asarray(y, np.float32)
        out = _phase_vocoder(D, rate, self.hop)
        return _np_istft(out, self.hop).astype(np.float32)


class TimeshiftAudio:
    def __init__(self, max_shift_seconds: float = 0.2, rng=None):
        self.max_shift_seconds = max_shift_seconds
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        if not _should_apply(self.rng):
            return data
        samples = data["samples"]
        max_shift = int(data["sample_rate"] * self.max_shift_seconds)
        shift = int(self.rng.integers(-max_shift, max_shift + 1))
        a, b = -min(0, shift), max(0, shift)
        samples = np.pad(samples, (a, b), "constant")
        data["samples"] = samples[: len(samples) - a] if a else samples[b:]
        return data


class AddBackgroundNoise:
    def __init__(self, bg_dataset, max_percentage: float = 0.45, rng=None):
        self.bg_dataset = bg_dataset
        self.max_percentage = max_percentage
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        if not _should_apply(self.rng):
            return data
        noise = self.bg_dataset[int(self.rng.integers(len(self.bg_dataset)))]["samples"]
        pct = self.rng.uniform(0, self.max_percentage)
        data["samples"] = data["samples"] * (1 - pct) + noise * pct
        return data


class ToMelSpectrogram:
    """wave → log-mel (n_mels, frames) using the on-device slaney front-end."""

    def __init__(self, n_mels: int = 32):
        self.melspec = MelSpectrogram(n_mels=n_mels)

    def __call__(self, data):
        import jax.numpy as jnp

        s = np.asarray(self.melspec(jnp.asarray(data["samples"])[None, :])[0])
        # reference uses librosa.power_to_db(ref=np.max) with the default
        # top_db=80 (transforms_wav.py:140): per-utterance max-referenced dB
        # floored at -80 — same convention as ToMelSpectrogramFromSTFT
        db = 10.0 * np.log10(np.maximum(s, 1e-10))
        db -= 10.0 * np.log10(max(1e-10, float(s.max())))
        data["mel_spectrogram"] = np.maximum(db, db.max() - 80.0)
        return data
