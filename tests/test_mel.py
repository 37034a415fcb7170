"""STFT/mel parity: STFT vs torch.stft golden; filterbank structural checks."""

import jax.numpy as jnp
import numpy as np
import torch

import importlib

mel_mod = importlib.import_module("diffusion_model_for_audio_defense_tpu.ops.mel")
stft_mod = importlib.import_module("diffusion_model_for_audio_defense_tpu.ops.stft")


def test_hann_window_matches_torch():
    for n in (400, 2048):
        ours = np.asarray(stft_mod.hann_window(n))
        theirs = torch.hann_window(n).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_stft_matches_torch(rng_np):
    x = rng_np.standard_normal((2, 16000)).astype(np.float32)
    ours = np.asarray(stft_mod.stft(jnp.asarray(x), n_fft=2048, hop_length=512))
    theirs = torch.stft(
        torch.from_numpy(x),
        n_fft=2048,
        hop_length=512,
        window=torch.hann_window(2048),
        center=True,
        pad_mode="constant",
        return_complex=True,
    ).numpy()
    assert ours.shape == theirs.shape == (2, 1025, 32)
    np.testing.assert_allclose(ours.real, theirs.real, atol=2e-3)
    np.testing.assert_allclose(ours.imag, theirs.imag, atol=2e-3)


def test_stft_uncentered_matches_torch(rng_np):
    # masker configuration: window 2048, hop 512, center=False (white_box_attack.py:659-666)
    x = rng_np.standard_normal((1, 16000)).astype(np.float32)
    ours = np.asarray(stft_mod.stft(jnp.asarray(x), n_fft=2048, hop_length=512, center=False))
    theirs = torch.stft(
        torch.from_numpy(x), n_fft=2048, hop_length=512,
        window=torch.hann_window(2048), center=False, return_complex=True,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours.real, theirs.real, atol=2e-3)


def test_mel_scale_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_mod.mel_to_hz(mel_mod.hz_to_mel(f)), f, rtol=1e-9, atol=1e-6)


def test_mel_filterbank_structure():
    fb = np.asarray(mel_mod.mel_filterbank(1025, n_mels=32, sample_rate=16000))
    assert fb.shape == (1025, 32)
    assert (fb >= 0).all()
    # every filter is non-empty and unimodal-triangular
    assert (fb.sum(axis=0) > 0).all()
    # slaney norm: area of filter m ≈ 1 after multiplying by bin width... check
    # the known equal-area property: enorm * triangle area == ~1 per filter
    all_freqs = np.linspace(0, 8000, 1025)
    areas = fb.sum(axis=0) * (all_freqs[1] - all_freqs[0])
    np.testing.assert_allclose(areas, np.ones(32), rtol=0.05)


def test_wave2spect_shape_and_grad(rng_np):
    import jax

    w2s = mel_mod.Wave2Spect(n_mels=32)
    x = jnp.asarray(rng_np.standard_normal((3, 1, 16000)).astype(np.float32) * 0.1)
    out = w2s(x)
    assert out.shape == (3, 1, 32, 32)
    g = jax.grad(lambda v: jnp.sum(w2s(v)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_amplitude_to_db_matches_formula(rng_np):
    x = np.abs(rng_np.standard_normal((4, 8)).astype(np.float32)) + 1e-12
    ours = np.asarray(mel_mod.amplitude_to_db(jnp.asarray(x)))
    theirs = 10.0 * np.log10(np.maximum(x, 1e-10))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
