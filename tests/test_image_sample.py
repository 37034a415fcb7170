"""Smoke + parity tests for the UNet sampling CLI and the generic image
dataset (reference ``scripts/image_sample.py``, ``scripts/super_res_sample.py``,
``improved_diffusion/image_datasets.py``)."""

import numpy as np
import pytest


def _tiny_args(tmp_path, extra=()):
    return [
        "--num_channels", "8", "--num_res_blocks", "1", "--num_heads", "1",
        "--diffusion_steps", "4", "--noise_schedule", "cosine", "--dropout", "0.0",
        "--batch_size", "2", "--num_samples", "2",
        "--out_dir", str(tmp_path), "--model_path", str(tmp_path / "missing"),
        *extra,
    ]


def test_image_sample_cli_plain(tmp_path, capsys):
    from diffusion_model_for_audio_defense_tpu.cli import image_sample

    out = image_sample.main(_tiny_args(tmp_path))
    arr = np.load(out)["arr_0"]
    assert arr.shape == (2, 32, 32, 1) and arr.dtype == np.uint8


def test_image_sample_cli_ddim_and_respacing(tmp_path):
    from diffusion_model_for_audio_defense_tpu.cli import image_sample

    out = image_sample.main(
        _tiny_args(tmp_path, ["--use_ddim", "1", "--timestep_respacing", "ddim2"]))
    arr = np.load(out)["arr_0"]
    assert arr.shape == (2, 32, 32, 1)


def test_image_sample_cli_super_res(tmp_path):
    from diffusion_model_for_audio_defense_tpu.cli import image_sample

    base = image_sample.main(_tiny_args(tmp_path))
    sr_dir = tmp_path / "sr"
    out = image_sample.main(_tiny_args(sr_dir) + [
        "--super_res", "1", "--base_samples", str(base),
        "--large_size", "32", "--small_size", "32",
    ])
    arr = np.load(out)["arr_0"]
    assert arr.shape == (2, 32, 32, 1)


@pytest.fixture()
def image_folder(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            # rectangular, larger than target: exercises BOX/BICUBIC + crop
            arr = rng.integers(0, 255, size=(40, 70, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{cls}_{i}.png")
    return str(tmp_path)


def test_image_dataset_folder(image_folder):
    from diffusion_model_for_audio_defense_tpu.data import load_image_data
    from diffusion_model_for_audio_defense_tpu.data.image_datasets import (
        list_image_files_recursively,
    )

    files = list_image_files_recursively(image_folder)
    assert len(files) == 6
    gen = load_image_data(image_folder, batch_size=4, image_size=16,
                          class_cond=True, process_index=0, process_count=1)
    batch, kwargs = next(gen)
    assert batch.shape == (4, 3, 16, 16)
    assert batch.min() >= -1.0 and batch.max() <= 1.0
    assert kwargs["y"].shape == (4,) and set(np.unique(kwargs["y"])) <= {0, 1}
    # deterministic order without class_cond
    g2 = load_image_data(image_folder, batch_size=2, image_size=16,
                         deterministic=True, process_index=0, process_count=1)
    b1, _ = next(g2)
    g3 = load_image_data(image_folder, batch_size=2, image_size=16,
                         deterministic=True, process_index=0, process_count=1)
    b2, _ = next(g3)
    np.testing.assert_array_equal(b1, b2)


def test_center_crop_resize_matches_reference_shape():
    from PIL import Image

    from diffusion_model_for_audio_defense_tpu.data.image_datasets import (
        center_crop_resize,
    )

    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, size=(100, 80, 3), dtype=np.uint8))
    out = center_crop_resize(img, 16)
    assert out.shape == (16, 16, 3)
