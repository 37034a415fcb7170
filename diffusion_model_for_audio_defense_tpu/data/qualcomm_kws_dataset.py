"""Qualcomm Keyword Speech dataset
(reference ``datasets/qualcomm_kws_dataset.py``).

4 keywords; deterministic per-class split by trailing counts:
Train = [:-125], Valid = [-125:-25], Test = [-25:] (reference ``:37-43``).
"""

from __future__ import annotations

import os

import numpy as np

from .sc_dataset import _FolderDataset

QUALCOMM_CLASSES = ["hey_android", "hey_snapdragon", "hi_galaxy", "hi_lumina"]


class QualcommKeywordSpottingDataset(_FolderDataset):
    def __init__(self, folder, transform=None, classes=QUALCOMM_CLASSES, split: str = "Test"):
        assert split in ("Train", "Valid", "Test")
        class_to_idx = {c: i for i, c in enumerate(classes)}
        data = []
        for c in classes:
            d = os.path.join(folder, c)
            if not os.path.isdir(d):
                continue
            files = sorted(os.listdir(d))
            if split == "Train":
                files = files[:-125]
            elif split == "Valid":
                files = files[-125:-25]
            else:
                files = files[-25:]
            data += [(os.path.join(d, f), class_to_idx[c]) for f in files]
        super().__init__(data, classes, transform)


def random_length_collate(batch, rng: np.random.Generator, min_sec=0.747, max_sec=2.747, sample_rate=16000):
    """Random-crop/pad every item in the batch to one random length
    (reference ``RCNN_KWS/train.py:48-58`` / ``DiffWave dataset.py:161-181``)."""
    length = int(rng.uniform(min_sec, max_sec) * sample_rate)
    out = []
    for item in batch:
        s = item["samples"]
        if len(s) > length:
            start = int(rng.integers(0, len(s) - length + 1))
            s = s[start : start + length]
        else:
            s = np.pad(s, (0, length - len(s)))
        out.append(s)
    return np.stack(out), np.asarray([item["target"] for item in batch])
