"""WAV IO via the stdlib (librosa/soundfile are not in the TPU image).

Speech Commands wavs are 16 kHz 16-bit mono PCM; this reader covers 8/16/32
bit PCM and float32 wavs and resamples on host if a different rate is
requested (matching ``librosa.load(path, sr=16000)`` semantics well enough
for this corpus, which is natively 16 kHz).
"""

from __future__ import annotations

import wave

import numpy as np


def _parse_riff(path: str):
    """Minimal RIFF/WAVE chunk parser: returns (format_tag, channels, sr,
    bits_per_sample, data_bytes). Unlike stdlib ``wave`` it understands
    IEEE-float (tag 3) and WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE, resolved via
    the SubFormat GUID) instead of rejecting them or misreading float
    payloads as int32 PCM."""
    import struct

    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file: {path}")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise ValueError(f"missing fmt/data chunk in {path}")
    tag, ch, sr, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE and len(fmt) >= 26:
        tag = struct.unpack("<H", fmt[24:26])[0]  # first 2 bytes of SubFormat GUID
    return tag, ch, sr, bits, payload


def read_wav(path: str, sample_rate: int | None = 16000) -> tuple[np.ndarray, int]:
    """Returns (samples float32 in [-1,1] mono, sample_rate)."""
    tag, ch, sr, bits, raw = _parse_riff(path)
    if tag == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(raw, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float bit depth {bits} in {path}")
    elif tag == 1:  # integer PCM
        if bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits} in {path}")
    else:
        raise ValueError(f"unsupported WAV format tag {tag} in {path}")
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
