"""Dataset/loader tests over a synthetic wav corpus."""

import os

import numpy as np
import pytest

from diffusion_model_for_audio_defense_tpu.data import (
    DataLoader,
    QualcommKeywordSpottingDataset,
    SC09Dataset,
    SpeechCommandsDataset,
    read_wav,
    write_wav,
)
from diffusion_model_for_audio_defense_tpu.transforms import Compose, FixAudioLength, LoadAudio


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("sc09")
    rng = np.random.default_rng(0)
    for ci, cls in enumerate(["zero", "one", "two"]):
        d = root / cls
        d.mkdir()
        for i in range(5):
            # distinct lengths to exercise FixAudioLength
            n = 12000 + 1000 * i
            write_wav(str(d / f"{cls}_{i}.wav"), rng.standard_normal(n) * 0.05, 16000)
    return str(root)


def test_wav_roundtrip(tmp_path, rng_np):
    x = (rng_np.standard_normal(16000) * 0.1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x)
    y, sr = read_wav(p)
    assert sr == 16000 and y.shape == (16000,)
    np.testing.assert_allclose(y, x, atol=1.0 / 32767 + 1e-6)


def test_sc09_dataset(corpus):
    tfm = Compose([LoadAudio(), FixAudioLength()])
    ds = SC09Dataset(folder=corpus, transform=tfm, num_per_class=3)
    assert len(ds) == 9  # 3 classes present × 3 per class
    item = ds[0]
    assert item["samples"].shape == (16000,)
    assert item["target"] in (0, 1, 2)


def test_dataloader_batching(corpus):
    tfm = Compose([LoadAudio(), FixAudioLength()])
    ds = SC09Dataset(folder=corpus, transform=tfm, num_per_class=5)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(dl)
    assert sum(b["samples"].shape[0] for b in batches) == len(ds)
    assert batches[0]["samples"].shape == (4, 16000)
    assert batches[0]["target"].shape == (4,)
    # deterministic under the same seed/epoch
    again = list(DataLoader(ds, batch_size=4, shuffle=True, seed=1))
    np.testing.assert_array_equal(batches[0]["target"], again[0]["target"])


def test_dataloader_process_sharding(corpus):
    tfm = Compose([LoadAudio(), FixAudioLength()])
    ds = SC09Dataset(folder=corpus, transform=tfm, num_per_class=5)
    shard0 = DataLoader(ds, batch_size=100, process_index=0, process_count=3)
    shard1 = DataLoader(ds, batch_size=100, process_index=1, process_count=3)
    t0 = next(iter(shard0))["target"]
    t1 = next(iter(shard1))["target"]
    assert len(t0) + len(t1) < 2 * len(ds)  # actually sharded


def test_balanced_weights(corpus):
    ds = SpeechCommandsDataset(folder=corpus, classes=["unknown", "silence", "zero", "one", "two"])
    w = ds.make_weights_for_balanced_classes()
    assert w.shape == (len(ds),) and (w > 0).all()


def test_qualcomm_split(tmp_path):
    rng = np.random.default_rng(0)
    for cls in ["hey_android", "hey_snapdragon", "hi_galaxy", "hi_lumina"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(130):
            write_wav(str(d / f"{i:04d}.wav"), rng.standard_normal(800) * 0.01, 16000)
    test = QualcommKeywordSpottingDataset(str(tmp_path), split="Test")
    valid = QualcommKeywordSpottingDataset(str(tmp_path), split="Valid")
    train = QualcommKeywordSpottingDataset(str(tmp_path), split="Train")
    assert len(test) == 4 * 25
    assert len(valid) == 4 * 100
    assert len(train) == 4 * 5
    paths = {p for p, _ in test.data} | {p for p, _ in valid.data} | {p for p, _ in train.data}
    assert len(paths) == 4 * 130  # disjoint cover


def test_read_wav_float_and_extensible(tmp_path):
    """read_wav decodes IEEE-float (tag 3) and WAVE_FORMAT_EXTENSIBLE wavs
    correctly instead of misreading the bits as int32 PCM."""
    import struct

    from diffusion_model_for_audio_defense_tpu.data.wav_io import read_wav

    x = (np.sin(np.linspace(0, 40, 1600)) * 0.5).astype(np.float32)
    payload = x.astype("<f4").tobytes()

    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    p = tmp_path / "f32.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    y, sr = read_wav(str(p))
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-7)

    sub = struct.pack("<H", 3) + b"\x00\x00" + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt_ext = (struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 16000 * 4, 4, 32)
               + struct.pack("<H", 22) + struct.pack("<H", 32) + struct.pack("<I", 4) + sub)
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_ext)) + fmt_ext
            + b"data" + struct.pack("<I", len(payload)) + payload)
    p2 = tmp_path / "ext.wav"
    p2.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    y2, _ = read_wav(str(p2))
    np.testing.assert_allclose(y2, x, atol=1e-7)


def test_prefetch_matches_sequential_and_propagates_errors():
    from diffusion_model_for_audio_defense_tpu.data import prefetch

    items = list(prefetch(iter(range(20)), depth=3))
    assert items == list(range(20))

    def boom():
        yield 1
        raise ValueError("loader died")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="loader died"):
        next(it)


def test_prefetch_to_device_puts_arrays():
    import jax
    import numpy as np

    from diffusion_model_for_audio_defense_tpu.data import prefetch_to_device

    batches = [{"x": np.ones((2, 4), np.float32) * i, "meta": i} for i in range(3)]
    out = list(prefetch_to_device(batches, depth=2))
    assert len(out) == 3
    assert isinstance(out[1]["x"], jax.Array)
    assert out[2]["meta"] == 2
    np.testing.assert_array_equal(np.asarray(out[1]["x"]), np.ones((2, 4)) * 1)


def test_prefetch_infinite_generator_stops_cleanly():
    import itertools

    from diffusion_model_for_audio_defense_tpu.data import prefetch

    gen = prefetch(itertools.count(), depth=2)
    got = [next(gen) for _ in range(5)]
    assert got == [0, 1, 2, 3, 4]
    gen.close()  # must not hang


def test_prefetch_producer_thread_exits_after_close():
    import itertools
    import threading
    import time

    from diffusion_model_for_audio_defense_tpu.data import prefetch

    before = threading.active_count()
    gen = prefetch(itertools.count(), depth=2)
    assert next(gen) == 0
    gen.close()
    # the producer must unblock from its full-queue put and exit
    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before
