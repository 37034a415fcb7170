"""Psychoacoustic masking model (Lin & Abdulla 2015, Qin et al. 2019
simplifications).

Rebuild of ``robustness_eval/white_box_attack.py:38-275``
(``PsychoacousticMasker``). This is host-side data preparation — the
thresholds are computed once per clean utterance in numpy/scipy and then fed
to the traced stage-2 loss; only the PSD of the *perturbation* is recomputed
(and differentiated) on device.

Pipeline per frame: PSD normalized to 96 dB → tonal maskers at local PSD
maxima (smoothed ±1 bin) → drop maskers under the absolute threshold of
hearing → 0.5-bark dedup keeping the louder masker → two-slope spread
function → global threshold = 10·log10(Σ 10^(T_i/10) + 10^(ATH/10)).

Note: the reference's bark-distance dedup indexes the bark scale with the
*list* position instead of the frequency-bin index (``:226``) — an evident
bug; this implementation uses the frequency-bin bark values.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.signal as ss


class PsychoacousticMasker:
    def __init__(self, window_size: int = 2048, hop_size: int = 512, sample_rate: int = 16000) -> None:
        self._window_size = window_size
        self._hop_size = hop_size
        self._sample_rate = sample_rate
        self._fft_frequencies = np.linspace(0, sample_rate / 2, window_size // 2 + 1)
        self._bark = 13 * np.arctan(0.00076 * self._fft_frequencies) + 3.5 * np.arctan(
            np.square(self._fft_frequencies / 7500.0)
        )
        valid = np.logical_and(20 <= self._fft_frequencies, self._fft_frequencies <= 2e4)
        ath = np.full(valid.shape, -np.inf)
        f_khz = self._fft_frequencies[valid] * 0.001
        ath[valid] = 3.64 * f_khz**-0.8 - 6.5 * np.exp(-0.6 * np.square(f_khz - 3.3)) + 0.001 * f_khz**4 - 12
        self._ath = ath

    window_size = property(lambda self: self._window_size)
    hop_size = property(lambda self: self._hop_size)
    sample_rate = property(lambda self: self._sample_rate)
    fft_frequencies = property(lambda self: self._fft_frequencies)
    bark = property(lambda self: self._bark)
    absolute_threshold_hearing = property(lambda self: self._ath)

    def power_spectral_density(self, audio: np.ndarray) -> Tuple[np.ndarray, float]:
        """96 dB-normalized PSD matrix ``(n_freq, n_frames)`` + PSD maximum."""
        audio = np.asarray(audio, dtype=np.float32).ravel()
        window = ss.get_window("hann", self._window_size, fftbins=True)
        n_frames = 1 + (len(audio) - self._window_size) // self._hop_size
        idx = np.arange(n_frames)[:, None] * self._hop_size + np.arange(self._window_size)[None, :]
        frames = audio[idx] * window
        stft = np.fft.rfft(frames, axis=-1).T  # (n_freq, n_frames)
        gain = np.sqrt(8.0 / 3.0)
        with np.errstate(divide="ignore"):
            psd = 20 * np.log10(np.abs(gain * stft / self._window_size))
        psd = psd.clip(min=-200)
        psd_max = float(psd.max())
        return 96.0 - psd_max + psd, psd_max

    def find_maskers(self, psd_vector: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Local maxima as (all-tonal) maskers, smoothed with ±1 neighbors."""
        masker_idx = ss.argrelmax(psd_vector)[0]
        smoothed = 10 * np.log10(
            sum(10 ** (psd_vector[masker_idx + i] / 10) for i in (-1, 0, 1))
        )
        return smoothed, masker_idx

    def filter_maskers(self, maskers: np.ndarray, masker_idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        keep = maskers > self._ath[masker_idx]
        maskers, masker_idx = maskers[keep], masker_idx[keep]
        keep = np.ones(len(masker_idx), dtype=bool)
        i_prev = 0
        for i in range(1, len(masker_idx)):
            if self._bark[masker_idx[i]] - self._bark[masker_idx[i_prev]] < 0.5:
                if maskers[i_prev] < maskers[i]:
                    keep[i_prev] = False
                    i_prev = i
                else:
                    keep[i] = False
            else:
                i_prev = i
        return maskers[keep], masker_idx[keep]

    def calculate_individual_threshold(self, maskers: np.ndarray, masker_idx: np.ndarray) -> np.ndarray:
        delta_shift = -6.025 - 0.275 * self._bark
        z = self._bark[None, :] - self._bark[masker_idx][:, None]  # (K, n_freq)
        down = 27.0 * z
        up = (-27.0 + 0.37 * np.maximum(maskers - 40.0, 0.0))[:, None] * z
        spread = np.where(z > 0, up, down)
        return maskers[:, None] + delta_shift[masker_idx][:, None] + spread

    def calculate_global_threshold(self, individual_threshold: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore"):
            return 10 * np.log10(np.sum(10 ** (individual_threshold / 10), axis=0) + 10 ** (self._ath / 10))

    def calculate_threshold_and_psd_maximum(self, audio: np.ndarray) -> Tuple[np.ndarray, float]:
        psd, psd_max = self.power_spectral_density(audio)
        threshold = np.zeros_like(psd)
        for frame in range(psd.shape[1]):
            maskers, idx = self.filter_maskers(*self.find_maskers(psd[:, frame]))
            threshold[:, frame] = self.calculate_global_threshold(
                self.calculate_individual_threshold(maskers, idx)
            )
        return threshold, psd_max
