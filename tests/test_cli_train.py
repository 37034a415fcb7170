"""Smoke tests for the remaining training/finetune drivers."""

import numpy as np
import pytest

from diffusion_model_for_audio_defense_tpu.data import write_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus2")
    rng = np.random.default_rng(0)
    for cls in ["zero", "one"]:
        d = root / cls
        d.mkdir()
        for i in range(4):
            write_wav(str(d / f"{i}.wav"), rng.standard_normal(16000) * 0.05)
    return str(root)


def test_spectrogram_train_cli(corpus, tmp_path):
    from diffusion_model_for_audio_defense_tpu.cli.spectrogram_train import main

    main([
        "--data_dir", corpus, "--num_channels", "16", "--num_res_blocks", "1",
        "--dropout", "0.0", "--diffusion_steps", "50", "--batch_size", "4",
        "--save_interval", "1000", "--max_steps", "2", "--save_dir", str(tmp_path / "sd"),
    ])


def test_adv_finetune_cli(corpus, tmp_path):
    from diffusion_model_for_audio_defense_tpu.cli.adv_finetune import main

    main([
        "--data_path", corpus, "--classifier_model", "resnext29_8_64", "--defense", "None",
        "--max_iter_1", "1", "--epochs", "1", "--batch_size", "2", "--num_per_class", "1",
        "--max_batches", "1", "--save_dir", str(tmp_path / "ft"), "--verbose", "0",
    ])
    import os

    assert os.path.isdir(tmp_path / "ft")
