"""Artifact saving helpers (reference ``utils.py:10-73``).

``audio_save``: 16 kHz wav; ``spec_save``: 32×32 mel png;
``audio_save_as_img``: waveform plot. matplotlib only (librosa.display's
specshow is replaced by a plain imshow with the same orientation).
"""

from __future__ import annotations

import os

import numpy as np

from .data.wav_io import write_wav


def _np1d(x):
    import jax

    x = np.asarray(jax.device_get(x))
    return x.reshape(-1)


def audio_save(audio, path: str = ".", name: str = "audio.wav", sample_rate: int = 16000):
    os.makedirs(path, exist_ok=True)
    x = _np1d(audio)
    if np.abs(x).max() > 1.0:  # int16-scaled
        x = x / (2.0**15)
    write_wav(os.path.join(path, name), x, sample_rate)


def spec_save(spec, path: str = ".", name: str = "spec.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(path, exist_ok=True)
    s = np.asarray(spec)
    s = s.reshape(s.shape[-2], s.shape[-1])
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(s, origin="lower", aspect="auto", cmap="magma")
    ax.set_xlabel("frame")
    ax.set_ylabel("mel bin")
    fig.tight_layout()
    fig.savefig(os.path.join(path, name))
    plt.close(fig)


def audio_save_as_img(audio, path: str = ".", name: str = "wave.png", sample_rate: int = 16000):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(path, exist_ok=True)
    x = _np1d(audio)
    fig, ax = plt.subplots(figsize=(8, 2))
    ax.plot(np.arange(len(x)) / sample_rate, x, linewidth=0.5)
    ax.set_xlabel("time (s)")
    ax.set_ylim(-1, 1)
    fig.tight_layout()
    fig.savefig(os.path.join(path, name))
    plt.close(fig)
