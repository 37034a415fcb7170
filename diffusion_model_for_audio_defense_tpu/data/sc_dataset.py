"""Speech Commands / SC09 datasets (reference ``datasets/sc_dataset.py``).

Framework-free map-style datasets over wav folders; batching lives in
``data/loader.py``. Class layouts mirror the reference exactly:
- SpeechCommands: 12 classes, unknown/silence + yes…go, everything else
  mapped to 'unknown' (the last class index, ``sc_dataset.py:22-47``)
- SC09: digit words zero…nine with a per-class cap (``:90-149``)
"""

from __future__ import annotations

import os

import numpy as np

CLASSES = "unknown, silence, yes, no, up, down, left, right, on, off, stop, go".split(", ")
SC09_CLASSES = "zero, one, two, three, four, five, six, seven, eight, nine".split(", ")


class _FolderDataset:
    def __init__(self, data, classes, transform=None):
        self.data = data
        self.classes = classes
        self.transform = transform

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index):
        path, target = self.data[index]
        item = {"path": path, "target": target}
        if self.transform is not None:
            item = self.transform(item)
        return item

    def make_weights_for_balanced_classes(self) -> np.ndarray:
        count = np.zeros(len(self.classes))
        for _, t in self.data:
            count[t] += 1
        weight_per_class = float(len(self.data)) / np.maximum(count, 1)
        return np.asarray([weight_per_class[t] for _, t in self.data])


class SpeechCommandsDataset(_FolderDataset):
    def __init__(self, folder, transform=None, classes=CLASSES, silence_percentage=0.1):
        # the reference's ACTIVE path (sc_dataset.py:35) scans only the named
        # classes — extra corpus folders (bed, bird, cat, ...) are excluded,
        # NOT bucketed (its len(classes)-1 remap is dead code there and would
        # mislabel them as the last class)
        all_classes = [d for d in classes if os.path.isdir(os.path.join(folder, d)) and not d.startswith("_")]
        class_to_idx = {c: i for i, c in enumerate(classes)}
        data = []
        for c in sorted(all_classes):
            d = os.path.join(folder, c)
            target = class_to_idx[c]
            for f in sorted(os.listdir(d)):
                data.append((os.path.join(d, f), target))
        super().__init__(data, classes, transform)


class SC09Dataset(_FolderDataset):
    def __init__(self, folder, transform=None, classes=SC09_CLASSES, num_per_class=100):
        class_to_idx = {c: i for i, c in enumerate(classes)}
        data = []
        for c in classes:
            d = os.path.join(folder, c)
            if not os.path.isdir(d):
                continue
            files = sorted(os.listdir(d))[:num_per_class]
            data += [(os.path.join(d, f), class_to_idx[c]) for f in files]
        super().__init__(data, classes, transform)


class BackgroundNoiseDataset(_FolderDataset):
    """Chops all wavs in the folder into fixed-length clips
    (reference ``:152-181``)."""

    def __init__(self, folder, transform=None, sample_rate=16000, sample_length=1):
        from .wav_io import read_wav

        audio_files = [f for f in sorted(os.listdir(folder)) if f.endswith(".wav")]
        samples = []
        for f in audio_files:
            s, sr = read_wav(os.path.join(folder, f), sample_rate)
            samples.append(s)
        samples = np.concatenate(samples) if samples else np.zeros(sample_rate)
        c = int(sample_rate * sample_length)
        r = len(samples) // c
        self.samples = samples[: r * c].reshape(-1, c)
        self.sample_rate = sample_rate
        self.transform = transform
        self.path = folder

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        data = {"samples": self.samples[index], "sample_rate": self.sample_rate, "target": 1, "path": ""}
        if self.transform is not None:
            data = self.transform(data)
        return data
