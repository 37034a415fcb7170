from .transforms_wav import (  # noqa: F401
    Compose,
    LoadAudio,
    FixAudioLength,
    ChangeAmplitude,
    ChangeSpeedAndPitchAudio,
    StretchAudio,
    TimeshiftAudio,
    AddBackgroundNoise,
    ToMelSpectrogram,
)
from .time_defense import TimeDomainDefense, AT, AS, MS  # noqa: F401
from .frequency_defense import FreqDomainDefense, DS, LPF, BPF  # noqa: F401
from .feature_defense import FeCo, FEATURE_COMPRESSION  # noqa: F401
from .transforms_stft import (  # noqa: F401
    ToSTFT,
    StretchAudioOnSTFT,
    TimeshiftAudioOnSTFT,
    AddBackgroundNoiseOnSTFT,
    FixSTFTDimension,
    ToMelSpectrogramFromSTFT,
    DeleteSTFT,
    AudioFromSTFT,
)
