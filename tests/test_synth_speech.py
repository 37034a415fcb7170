"""Synthetic SC09-like dataset (data/synth_speech.py): shapes, determinism,
class structure, and SC09Dataset round-trip."""

import numpy as np

from diffusion_model_for_audio_defense_tpu.data.synth_speech import (
    NUM_CLASSES,
    labeled_batch,
    synth_utterance,
    waveform_batches,
    write_dataset,
)


def test_utterance_shape_range_determinism():
    a = synth_utterance(np.random.default_rng(3), 4)
    b = synth_utterance(np.random.default_rng(3), 4)
    assert a.shape == (16000,) and a.dtype == np.float32
    assert np.abs(a).max() <= 0.6 + 1e-6  # v2 peak range (0.25, 0.6)
    np.testing.assert_array_equal(a, b)


def test_task_is_hard_but_separable():
    """v2 hardening (VERDICT r4 weak #2): adjacent f0 bands overlap, so some
    examples are genuinely ambiguous — but the dominant-stack structure keeps
    most of the mass separable. Checked via a nearest-class-centroid rule on
    the FFT magnitude (a weak classifier): well above chance, below perfect."""
    rng = np.random.default_rng(0)
    from diffusion_model_for_audio_defense_tpu.data.synth_speech import labeled_batch

    x, y = labeled_batch(rng, 300)
    mag = np.abs(np.fft.rfft(x[:, 0, :], axis=-1))[:, :600]
    mag /= mag.sum(-1, keepdims=True)
    cents = np.stack([mag[y == c].mean(0) for c in range(NUM_CLASSES)])
    xt, yt = labeled_batch(np.random.default_rng(1), 200)
    mt = np.abs(np.fft.rfft(xt[:, 0, :], axis=-1))[:, :600]
    mt /= mt.sum(-1, keepdims=True)
    pred = np.argmin(((mt[:, None, :] - cents[None]) ** 2).sum(-1), axis=1)
    acc = (pred == yt).mean()
    assert 0.5 < acc < 0.99, acc


def test_labeled_batch_balanced():
    x, y = labeled_batch(np.random.default_rng(0), 40)
    assert x.shape == (40, 1, 16000) and y.shape == (40,)
    assert (np.bincount(y, minlength=NUM_CLASSES) == 4).all()


def test_classes_are_frequency_separated():
    """Dominant FFT frequency must increase with the label — the structure
    the M5 classifier learns in the real_diffwave artifact."""
    rng = np.random.default_rng(1)
    cents = []
    for c in (0, 4, 9):
        dom = []
        for _ in range(4):
            u = synth_utterance(rng, c)
            mag = np.abs(np.fft.rfft(u))
            freqs = np.fft.rfftfreq(len(u), 1 / 16000)
            dom.append(freqs[mag.argmax()])
        cents.append(np.mean(dom))
    assert cents[0] < cents[1] < cents[2], cents


def test_waveform_batches_stream():
    it = waveform_batches(seed=5, batch_size=3, length=4000)
    b1, b2 = next(it), next(it)
    assert b1.shape == (3, 1, 4000)
    assert not np.allclose(b1, b2)  # fresh draws each batch


def test_write_dataset_roundtrip(tmp_path):
    from diffusion_model_for_audio_defense_tpu.data import SC09Dataset
    from diffusion_model_for_audio_defense_tpu.transforms import (
        Compose,
        FixAudioLength,
        LoadAudio,
    )

    root = write_dataset(str(tmp_path / "d"), n_per_class=2, seed=7)
    ds = SC09Dataset(folder=root, transform=Compose([LoadAudio(), FixAudioLength()]),
                     num_per_class=2)
    assert len(ds) == 2 * NUM_CLASSES
    item = ds[0]
    assert item["samples"].shape == (16000,)
    assert 0 <= item["target"] < NUM_CLASSES
