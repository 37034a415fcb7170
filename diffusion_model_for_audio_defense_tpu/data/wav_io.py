"""WAV IO via the stdlib (librosa/soundfile are not in the TPU image).

Speech Commands wavs are 16 kHz 16-bit mono PCM; this reader covers 8/16/32
bit PCM and float32 wavs and resamples on host if a different rate is
requested (matching ``librosa.load(path, sr=16000)`` semantics well enough
for this corpus, which is natively 16 kHz).
"""

from __future__ import annotations

import wave

import numpy as np


def read_wav(path: str, sample_rate: int | None = 16000) -> tuple[np.ndarray, int]:
    """Returns (samples float32 in [-1,1] mono, sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if sample_rate is not None and sr != sample_rate:
        # linear host resample (SC corpus is natively 16 kHz; this is a fallback)
        t_new = np.linspace(0.0, len(x) - 1, int(round(len(x) * sample_rate / sr)))
        x = np.interp(t_new, np.arange(len(x)), x).astype(np.float32)
        sr = sample_rate
    return x, sr


def write_wav(path: str, samples: np.ndarray, sample_rate: int = 16000) -> None:
    x = np.asarray(samples, dtype=np.float32).ravel()
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
