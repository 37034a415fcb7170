"""STFT-domain augmentations (reference ``transforms/transforms_stft.py``).

Host-side numpy transforms over the same dict protocol, used by the
classifier training pipeline (``train_speech_commands.py:66-80``):
ToSTFT → stretch/shift/background-noise on the complex STFT →
FixSTFTDimension → mel → DeleteSTFT. librosa is replaced with plain numpy
(framed rFFT, a phase-vocoder stretch, and the slaney mel filterbank from
``ops/mel.py``).
"""

from __future__ import annotations

import numpy as np

from ..ops.mel import _mel_filterbank_np


def _np_stft(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")  # librosa.stft default centering
    n_frames = 1 + (len(xp) - n_fft) // hop
    win = np.hanning(n_fft + 1)[:-1]
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return np.fft.rfft(xp[idx] * win, axis=1).T  # (freq, frames)


def _np_istft(stft: np.ndarray, hop: int) -> np.ndarray:
    n_fft = 2 * (stft.shape[0] - 1)
    win = np.hanning(n_fft + 1)[:-1]
    frames = np.fft.irfft(stft.T, axis=1) * win
    n = hop * (frames.shape[0] - 1) + n_fft
    y = np.zeros(n)
    wsum = np.zeros(n)
    for t in range(frames.shape[0]):
        y[t * hop : t * hop + n_fft] += frames[t]
        wsum[t * hop : t * hop + n_fft] += win**2
    y = y / np.maximum(wsum, 1e-8)
    return y[n_fft // 2 : -(n_fft // 2)]


def _phase_vocoder(stft: np.ndarray, rate: float, hop: int) -> np.ndarray:
    n_freq, n_frames = stft.shape
    steps = np.arange(0, n_frames, rate)
    phi_adv = np.linspace(0, np.pi * hop, n_freq)
    out = np.zeros((n_freq, len(steps)), dtype=complex)
    phase = np.angle(stft[:, 0])
    padded = np.pad(stft, ((0, 0), (0, 2)))
    for t, step in enumerate(steps):
        i0 = int(step)
        frac = step - i0
        mag = (1 - frac) * np.abs(padded[:, i0]) + frac * np.abs(padded[:, i0 + 1])
        out[:, t] = mag * np.exp(1j * phase)
        dphase = np.angle(padded[:, i0 + 1]) - np.angle(padded[:, i0]) - phi_adv
        dphase -= 2 * np.pi * np.round(dphase / (2 * np.pi))
        phase += phi_adv + dphase
    return out


class ToSTFT:
    def __init__(self, n_fft: int = 2048, hop_length: int = 512):
        self.n_fft, self.hop_length = n_fft, hop_length

    def __call__(self, data):
        data["n_fft"] = self.n_fft
        data["hop_length"] = self.hop_length
        data["stft"] = _np_stft(np.asarray(data["samples"], np.float32), self.n_fft, self.hop_length)
        data["stft_shape"] = data["stft"].shape
        return data


class StretchAudioOnSTFT:
    def __init__(self, max_scale: float = 0.2, rng=None):
        self.max_scale = max_scale
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        if self.rng.random() >= 0.5:
            return data
        scale = self.rng.uniform(-self.max_scale, self.max_scale)
        data["stft"] = _phase_vocoder(data["stft"], 1 + scale, data["hop_length"])
        return data


class TimeshiftAudioOnSTFT:
    def __init__(self, max_shift: int = 8, rng=None):
        self.max_shift = max_shift
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        if self.rng.random() >= 0.5:
            return data
        stft = data["stft"]
        shift = int(self.rng.integers(-self.max_shift, self.max_shift + 1))
        a, b = -min(0, shift), max(0, shift)
        stft = np.pad(stft, ((0, 0), (a, b)), "constant")
        data["stft"] = stft[:, b:] if a == 0 else stft[:, :-a]
        return data


class AddBackgroundNoiseOnSTFT:
    def __init__(self, bg_dataset, max_percentage: float = 0.45, rng=None):
        self.bg_dataset = bg_dataset
        self.max_percentage = max_percentage
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        if self.rng.random() >= 0.5:
            return data
        noise = self.bg_dataset[int(self.rng.integers(len(self.bg_dataset)))]["stft"]
        pct = self.rng.uniform(0, self.max_percentage)
        data["stft"] = data["stft"] * (1 - pct) + noise * pct
        return data


class FixSTFTDimension:
    def __call__(self, data):
        stft = data["stft"]
        t_len, orig_t_len = stft.shape[1], data["stft_shape"][1]
        if t_len > orig_t_len:
            stft = stft[:, :orig_t_len]
        elif t_len < orig_t_len:
            stft = np.pad(stft, ((0, 0), (0, orig_t_len - t_len)), "constant")
        data["stft"] = stft
        return data


class ToMelSpectrogramFromSTFT:
    def __init__(self, n_mels: int = 32):
        self.n_mels = n_mels

    def __call__(self, data):
        fb = _mel_filterbank_np(
            data["n_fft"] // 2 + 1, 0.0, data["sample_rate"] / 2.0, self.n_mels,
            data["sample_rate"], "slaney", "slaney",
        )  # (freq, mel)
        s = fb.T @ (np.abs(data["stft"]) ** 2.0)
        # librosa.power_to_db(ref=np.max)
        db = 10.0 * np.log10(np.maximum(s, 1e-10))
        db -= 10.0 * np.log10(max(1e-10, s.max()))
        data["mel_spectrogram"] = np.maximum(db, db.max() - 80.0)
        return data


class DeleteSTFT:
    def __call__(self, data):
        del data["stft"]
        return data


class AudioFromSTFT:
    def __call__(self, data):
        data["istft_samples"] = _np_istft(data["stft"], data["hop_length"]).astype(
            np.asarray(data["samples"]).dtype
        )
        return data
