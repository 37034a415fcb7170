"""CIFAR-10 dataset (python-pickle batch format).

The reference trains CIFAR-10 variants of the ConvNets zoo
(``train_cifar10.py``/``test_cifar10.py``) via torchvision; this reader
loads the standard ``cifar-10-batches-py`` directory directly.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

CIFAR10_CLASSES = [
    "airplane", "automobile", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
]

_MEAN = np.array([0.4914, 0.4822, 0.4465], dtype=np.float32)
_STD = np.array([0.2470, 0.2435, 0.2616], dtype=np.float32)


class CIFAR10Dataset:
    """Map-style dataset yielding {'image': (3,32,32) float32 normalized,
    'target': int}."""

    def __init__(self, root: str, train: bool = True, normalize: bool = True, augment_rng=None):
        files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        xs, ys = [], []
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                d = pickle.load(fh, encoding="bytes")
            xs.append(d[b"data"])
            ys += list(d[b"labels"])
        self.data = np.concatenate(xs).reshape(-1, 3, 32, 32).astype(np.float32) / 255.0
        self.targets = np.asarray(ys, dtype=np.int64)
        self.normalize = normalize
        self.augment_rng = augment_rng  # random crop + hflip when set
        self.classes = CIFAR10_CLASSES

    def __len__(self):
        return len(self.targets)

    def __getitem__(self, i):
        img = self.data[i]
        if self.augment_rng is not None:
            rng = self.augment_rng
            if rng.random() < 0.5:
                img = img[:, :, ::-1]
            pad = np.pad(img, ((0, 0), (4, 4), (4, 4)), mode="reflect")
            dy, dx = rng.integers(0, 9, size=2)
            img = pad[:, dy : dy + 32, dx : dx + 32]
        if self.normalize:
            img = (img - _MEAN[:, None, None]) / _STD[:, None, None]
        return {"image": np.ascontiguousarray(img), "target": int(self.targets[i])}
