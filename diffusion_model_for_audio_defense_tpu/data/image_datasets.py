"""Generic image-folder dataset for diffusion training.

Rebuild of ``improved_diffusion/image_datasets.py:1-106``: recursively list
image files, optional class conditioning from the filename prefix (the part
before the first underscore), BOX-downsample by powers of two then BICUBIC
resize + center crop to ``resolution``, floats in [-1, 1], NCHW. The MPI
rank/world sharding becomes ``jax.process_index()`` sharding through this
repo's ``DataLoader`` (multi-host data parallelism, SURVEY.md §2.8 P4).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_IMG_EXTS = {"jpg", "jpeg", "png", "gif", "bmp"}


def list_image_files_recursively(data_dir: str):
    """Reference ``image_datasets.py:57-66``; sorted for determinism."""
    results = []
    for entry in sorted(os.listdir(data_dir)):
        full_path = os.path.join(data_dir, entry)
        ext = entry.split(".")[-1].lower()
        if "." in entry and ext in _IMG_EXTS:
            results.append(full_path)
        elif os.path.isdir(full_path):
            results.extend(list_image_files_recursively(full_path))
    return results


def center_crop_resize(pil_image, resolution: int) -> np.ndarray:
    """BOX-halve while ≥2× target, BICUBIC to target min-side, center crop
    (reference ``image_datasets.py:86-101``). Returns HWC uint8 RGB."""
    from PIL import Image

    while min(*pil_image.size) >= 2 * resolution:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX)
    scale = resolution / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC)
    arr = np.array(pil_image.convert("RGB"))
    crop_y = (arr.shape[0] - resolution) // 2
    crop_x = (arr.shape[1] - resolution) // 2
    return arr[crop_y: crop_y + resolution, crop_x: crop_x + resolution]


class ImageDataset:
    """Map-style dataset of {'image': NCHW float32 [-1,1], ['y': int64]}."""

    def __init__(self, resolution: int, image_paths, classes=None):
        self.resolution = resolution
        self.image_paths = list(image_paths)
        self.classes = list(classes) if classes is not None else None

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, idx):
        from PIL import Image

        with open(self.image_paths[idx], "rb") as f:
            pil_image = Image.open(f)
            pil_image.load()
        arr = center_crop_resize(pil_image, self.resolution).astype(np.float32) / 127.5 - 1
        out = {"image": np.transpose(arr, (2, 0, 1))}
        if self.classes is not None:
            out["y"] = np.int64(self.classes[idx])
        return out


def load_image_data(
    data_dir: str,
    batch_size: int,
    image_size: int,
    class_cond: bool = False,
    deterministic: bool = False,
    seed: int = 0,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
):
    """Infinite generator of (images, kwargs) like the reference
    ``load_data`` (``image_datasets.py:8-54``). Classes come from the
    filename prefix before the first underscore."""
    import itertools

    from .loader import DataLoader

    if not data_dir:
        raise ValueError("unspecified data directory")
    all_files = list_image_files_recursively(data_dir)
    classes = None
    if class_cond:
        class_names = [os.path.basename(p).split("_")[0] for p in all_files]
        sorted_classes = {x: i for i, x in enumerate(sorted(set(class_names)))}
        classes = [sorted_classes[x] for x in class_names]
    if process_index is None:
        import jax

        process_index, process_count = jax.process_index(), jax.process_count()
    ds = ImageDataset(image_size, all_files, classes=classes)
    loader = DataLoader(
        ds, batch_size=batch_size, shuffle=not deterministic, drop_last=True,
        seed=seed, process_index=process_index, process_count=process_count or 1,
    )
    for epoch in itertools.count():
        loader.set_epoch(epoch)
        for batch in loader:
            kwargs = {"y": batch["y"]} if class_cond else {}
            yield batch["image"], kwargs
