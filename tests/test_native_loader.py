"""Native C++ wav loader vs the pure-Python reader (bitwise parity).

The C++ loader (native/wav_loader.cc, built lazily by data/native_loader.py)
must reproduce data/wav_io.py::read_wav + transforms FixAudioLength exactly
— every PCM/float format, channel mixing, resampling, padding/truncation —
so the native path can be the silent default for batch pipelines.
"""

import os
import struct
import wave

import numpy as np
import pytest

from diffusion_model_for_audio_defense_tpu.data import (
    DataLoader,
    batch_read_wavs,
    native_available,
    read_wav,
    wav_batch_collate,
)
from diffusion_model_for_audio_defense_tpu.data.sc_dataset import _FolderDataset
from diffusion_model_for_audio_defense_tpu.transforms import Compose, FixAudioLength, LoadAudio


def _write_pcm16(path, x, sr=16000, ch=1):
    pcm = np.clip(np.round(np.asarray(x) * 32768.0), -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _write_raw(path, tag, ch, sr, bits, payload_bytes):
    fmt = struct.pack("<HHIIHH", tag, ch, sr, sr * ch * bits // 8, ch * bits // 8, bits)
    data = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload_bytes)) + payload_bytes)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data)


@pytest.fixture(scope="module")
def wav_zoo(tmp_path_factory):
    """One file per supported format + shapes that exercise pad/trunc."""
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    files = {}

    x = rng.uniform(-0.9, 0.9, 16000).astype(np.float32)
    _write_pcm16(d / "pcm16.wav", x)
    files["pcm16"] = str(d / "pcm16.wav")

    short = rng.uniform(-0.9, 0.9, 7000).astype(np.float32)
    _write_pcm16(d / "short.wav", short)
    files["short"] = str(d / "short.wav")

    long_ = rng.uniform(-0.9, 0.9, 23000).astype(np.float32)
    _write_pcm16(d / "long.wav", long_)
    files["long"] = str(d / "long.wav")

    st = rng.uniform(-0.9, 0.9, (8000, 2)).astype(np.float32)
    _write_pcm16(d / "stereo.wav", st.ravel(), ch=2)
    files["stereo"] = str(d / "stereo.wav")

    f32 = rng.uniform(-1, 1, 5000).astype("<f4")
    _write_raw(d / "float32.wav", 3, 1, 16000, 32, f32.tobytes())
    files["float32"] = str(d / "float32.wav")

    f64 = rng.uniform(-1, 1, 3000).astype("<f8")
    _write_raw(d / "float64.wav", 3, 1, 16000, 64, f64.tobytes())
    files["float64"] = str(d / "float64.wav")

    i32 = (rng.uniform(-1, 1, 4000) * 2**31).astype("<i4")
    _write_raw(d / "pcm32.wav", 1, 1, 16000, 32, i32.tobytes())
    files["pcm32"] = str(d / "pcm32.wav")

    u8 = rng.integers(0, 256, 4000).astype(np.uint8)
    _write_raw(d / "pcm8.wav", 1, 1, 16000, 8, u8.tobytes())
    files["pcm8"] = str(d / "pcm8.wav")

    # extensible header wrapping PCM16
    pcm = (rng.uniform(-0.9, 0.9, 2000) * 32767).astype("<i2")
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
    fmt += struct.pack("<H", 22) + struct.pack("<H", 16) + struct.pack("<I", 1)
    fmt += struct.pack("<H", 1) + b"\x00" * 14
    data = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm.tobytes())) + pcm.tobytes())
    with open(d / "extensible.wav", "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data)
    files["extensible"] = str(d / "extensible.wav")

    # 8 kHz file -> native loader must resample to 16 kHz like read_wav
    lo = rng.uniform(-0.9, 0.9, 4000).astype(np.float32)
    _write_pcm16(d / "sr8k.wav", lo, sr=8000)
    files["sr8k"] = str(d / "sr8k.wav")
    return files


def _python_fixed(path, L):
    if path:
        x, _ = read_wav(path, 16000)
    else:
        x = np.zeros(16000, dtype=np.float32)
    out = np.zeros(L, dtype=np.float32)
    m = min(len(x), L)
    out[:m] = x[:m]
    return out, len(x)


def test_native_builds():
    """The C++ toolchain is in the image — the lazy build must succeed here
    (other tests degrade to fallback-parity checks if a future image drops
    g++, but on this one a build failure is a bug)."""
    assert native_available()


def test_batch_parity_all_formats(wav_zoo):
    paths = list(wav_zoo.values()) + [""]  # empty path = silence
    L = 16000
    got, lens = batch_read_wavs(paths, 16000, target_len=L)
    for i, p in enumerate(paths):
        want, n = _python_fixed(p, L)
        assert lens[i] == n, p
        np.testing.assert_array_equal(got[i], want, err_msg=p or "<silence>")


def test_batch_parity_truncate_and_pad(wav_zoo):
    # target shorter than the long file, longer than the short one
    paths = [wav_zoo["long"], wav_zoo["short"]]
    got, lens = batch_read_wavs(paths, 16000, target_len=9000)
    for i, p in enumerate(paths):
        want, n = _python_fixed(p, 9000)
        assert lens[i] == n
        np.testing.assert_array_equal(got[i], want)


def test_python_fallback_matches(wav_zoo, monkeypatch):
    paths = [wav_zoo["pcm16"], wav_zoo["stereo"], wav_zoo["sr8k"], ""]
    native, ln = batch_read_wavs(paths, 16000, target_len=12000)
    monkeypatch.setenv("DMAD_NO_NATIVE", "1")
    import diffusion_model_for_audio_defense_tpu.data.native_loader as nl
    monkeypatch.setattr(nl, "_LIB", None)
    fb, lf = batch_read_wavs(paths, 16000, target_len=12000)
    monkeypatch.setattr(nl, "_LIB", None)  # leave lazy state clean
    np.testing.assert_array_equal(native, fb)
    np.testing.assert_array_equal(ln, lf)


def test_collate_matches_transform_pipeline(wav_zoo):
    """wav_batch_collate == per-item LoadAudio+FixAudioLength through the
    DataLoader, including targets and ordering."""
    items = [(wav_zoo["pcm16"], 3), (wav_zoo["short"], 1), (wav_zoo["long"], 7)]
    ds_paths = _FolderDataset(items, classes=list("abcdefgh"))
    ds_xform = _FolderDataset(items, classes=list("abcdefgh"),
                              transform=Compose([LoadAudio(), FixAudioLength(1.0)]))
    dl_native = DataLoader(ds_paths, batch_size=3,
                           collate_fn=wav_batch_collate(16000, 1.0))
    dl_python = DataLoader(ds_xform, batch_size=3)
    b_native = next(iter(dl_native))
    b_python = next(iter(dl_python))
    np.testing.assert_array_equal(b_native["samples"], b_python["samples"])
    np.testing.assert_array_equal(b_native["target"], b_python["target"])
    assert b_native["samples"].dtype == np.float32


def test_missing_file_raises(wav_zoo, tmp_path):
    with pytest.raises(ValueError, match="failed"):
        batch_read_wavs([wav_zoo["pcm16"], str(tmp_path / "nope.wav")],
                        16000, target_len=1000)


def test_many_files_threaded(wav_zoo):
    """More files than threads — exercise the pool's work-stealing index."""
    paths = [wav_zoo["pcm16"], wav_zoo["short"], wav_zoo["stereo"]] * 20
    got, lens = batch_read_wavs(paths, 16000, target_len=16000, n_threads=7)
    want0, _ = _python_fixed(wav_zoo["pcm16"], 16000)
    for i in range(0, len(paths), 3):
        np.testing.assert_array_equal(got[i], want0)
