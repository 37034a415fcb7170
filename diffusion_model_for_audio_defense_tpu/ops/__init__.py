from .stft import frame_signal, stft, spectrogram  # noqa: F401
from .mel import (  # noqa: F401
    hz_to_mel,
    mel_to_hz,
    mel_filterbank,
    MelSpectrogram,
    amplitude_to_db,
    Wave2Spect,
)
