from .wav_io import read_wav, write_wav  # noqa: F401
from .sc_dataset import (  # noqa: F401
    CLASSES,
    SC09_CLASSES,
    SpeechCommandsDataset,
    SC09Dataset,
    BackgroundNoiseDataset,
)
from .qualcomm_kws_dataset import QUALCOMM_CLASSES, QualcommKeywordSpottingDataset  # noqa: F401
from .loader import DataLoader  # noqa: F401
from .image_datasets import ImageDataset, load_image_data  # noqa: F401
from .prefetch import prefetch, prefetch_to_device  # noqa: F401
from .native_loader import batch_read_wavs, native_available, wav_batch_collate  # noqa: F401
