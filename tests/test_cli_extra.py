"""Smoke tests: STFT transforms, eval CLIs, CIFAR-10, KWS trainer, split util."""

import os
import pickle

import numpy as np
import pytest

from diffusion_model_for_audio_defense_tpu.data import write_wav


def test_stft_transform_pipeline(rng_np):
    from diffusion_model_for_audio_defense_tpu.transforms import (
        AddBackgroundNoiseOnSTFT,
        AudioFromSTFT,
        DeleteSTFT,
        FixSTFTDimension,
        StretchAudioOnSTFT,
        TimeshiftAudioOnSTFT,
        ToMelSpectrogramFromSTFT,
        ToSTFT,
    )

    data = {"samples": rng_np.standard_normal(16000).astype(np.float32) * 0.1, "sample_rate": 16000}
    data = ToSTFT()(data)
    assert data["stft"].shape == (1025, 32)
    orig = data["stft"].copy()

    # istft roundtrip before augmentation
    d2 = AudioFromSTFT()(dict(data))
    n = min(len(d2["istft_samples"]), 16000)
    err = np.abs(d2["istft_samples"][200 : n - 200] - data["samples"][200 : n - 200]).max()
    assert err < 1e-3, err

    rng = np.random.default_rng(0)
    data = StretchAudioOnSTFT(rng=rng)(data)
    data = TimeshiftAudioOnSTFT(rng=rng)(data)
    data = FixSTFTDimension()(data)
    assert data["stft"].shape == orig.shape

    bg = [{"stft": rng_np.standard_normal((1025, 32)) * 0.01}]
    data = AddBackgroundNoiseOnSTFT(bg, rng=np.random.default_rng(3))(data)
    data = ToMelSpectrogramFromSTFT(n_mels=32)(data)
    assert data["mel_spectrogram"].shape == (32, 32)
    assert data["mel_spectrogram"].max() <= 0 + 1e-6  # power_to_db(ref=max)
    data = DeleteSTFT()(data)
    assert "stft" not in data


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus3")
    rng = np.random.default_rng(0)
    for cls in ["zero", "one"]:
        d = root / cls
        d.mkdir()
        for i in range(3):
            write_wav(str(d / f"{i}.wav"), rng.standard_normal(16000) * 0.05)
    return str(root)


def test_test_speech_commands_cli(corpus, tmp_path):
    from diffusion_model_for_audio_defense_tpu.cli.test_speech_commands import main

    acc = main([
        "--data_path", corpus, "--classifier_model", "m5", "--num_per_class", "2",
        "--batch_size", "4", "--kaggle_csv", str(tmp_path / "k.csv"),
    ])
    assert 0.0 <= acc <= 1.0
    assert os.path.exists(tmp_path / "k.csv")
    acc2 = main([
        "--data_path", corpus, "--classifier_model", "m5", "--num_per_class", "1",
        "--batch_size", "2", "--multi_crop",
    ])
    assert 0.0 <= acc2 <= 1.0


def test_cifar10_dataset_and_cli(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "cifar"
    root.mkdir()
    for name, n in [("data_batch_1", 64), ("test_batch", 32)]:
        d = {b"data": rng.integers(0, 256, (n, 3072), dtype=np.uint8).astype(np.uint8),
             b"labels": rng.integers(0, 10, n).tolist()}
        with open(root / name, "wb") as f:
            pickle.dump(d, f)
    for i in range(2, 6):
        with open(root / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": rng.integers(0, 256, (8, 3072), dtype=np.uint8), b"labels": rng.integers(0, 10, 8).tolist()}, f)

    from diffusion_model_for_audio_defense_tpu.cli.train_cifar10 import main

    tr = main([
        "--data_root", str(root), "--model", "resnet18", "--epochs", "1",
        "--batch_size", "16", "--max_batches_per_epoch", "2", "--save_dir", str(tmp_path / "c10"),
    ])
    assert os.path.isdir(tmp_path / "c10")


def test_train_kws_cli(tmp_path):
    rng = np.random.default_rng(0)
    for cls in ["hey_android", "hey_snapdragon", "hi_galaxy", "hi_lumina"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(127):
            write_wav(str(d / f"{i:03d}.wav"), rng.standard_normal(12000) * 0.02)
    from diffusion_model_for_audio_defense_tpu.cli.train_kws import main

    main([
        "--data_path", str(tmp_path), "--epochs", "1", "--batch_size", "4",
        "--max_batches_per_epoch", "1", "--adv_steps", "2", "--length_buckets", "2",
        "--save_dir", str(tmp_path / "kws"),
    ])
    assert os.path.isdir(tmp_path / "kws")


def test_split_dataset_cli(tmp_path):
    root = tmp_path / "speech_commands"
    (root / "yes").mkdir(parents=True)
    for i in range(4):
        write_wav(str(root / "yes" / f"{i}.wav"), np.zeros(100))
    (root / "validation_list.txt").write_text("yes/0.wav\n")
    (root / "testing_list.txt").write_text("yes/1.wav\n")
    from diffusion_model_for_audio_defense_tpu.cli.split_dataset import main

    main([str(root)])
    assert os.path.exists(tmp_path / "valid" / "yes" / "0.wav")
    assert os.path.exists(tmp_path / "test" / "yes" / "1.wav")
    assert os.path.exists(tmp_path / "train" / "yes" / "2.wav")


def test_sde_toy_cli(tmp_path):
    """The toy VP-SDE harness: exact-score reverse solve recovers the bimodal
    mixture (validates the Euler-Maruyama scan used by the purifiers)."""
    from diffusion_model_for_audio_defense_tpu.cli import sde_toy

    ed = sde_toy.main(["--n_samples", "1024", "--T", "100",
                       "--plot", str(tmp_path / "toy.png")])
    assert ed < 0.2 and (tmp_path / "toy.png").exists()


def test_eps_fn_routing_flags(monkeypatch):
    """--use_pallas 0 and --no-bf16 reach the XLA/f32 path even when the
    backend reports TPU (regression: fast=False used to fall through to the
    differentiable-Pallas branch)."""
    import argparse

    import jax as _jax
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.cli import _common

    ns = lambda **kw: argparse.Namespace(ddpm_config=None, ddpm_path=None, **kw)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")

    wn, _, eps_off, _ = _common.load_diffwave_eps_fn(ns(use_pallas=0, bf16=True), fast=False)
    # the XLA closure's freevars are (variables, wavenet); the pallas ones capture wavenet_apply_stack
    assert "wavenet_apply_stack" not in eps_off.__code__.co_freevars
    assert wn.dtype == jnp.bfloat16  # --bf16 honored

    wn2, _, eps_f32, _ = _common.load_diffwave_eps_fn(ns(use_pallas=1, bf16=False), fast=True)
    assert wn2.dtype is None  # --no-bf16 -> f32 compute
    assert "wavenet_apply_stack" in eps_f32.__code__.co_freevars

    # skip_channels != res_channels must fall back to XLA (kernel concatenates res|skip)
    import json, tempfile, os
    cfg = {"wavenet_config": {"res_channels": 128, "skip_channels": 256, "num_res_layers": 2,
                              "dilation_cycle": 2},
           "diffusion_config": {"T": 10, "beta_0": 1e-4, "beta_T": 0.02}}
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(cfg, f); path = f.name
    try:
        ns_sk = argparse.Namespace(ddpm_config=path, ddpm_path=None, use_pallas=1, bf16=True)
        _, _, eps_sk, _ = _common.load_diffwave_eps_fn(ns_sk, fast=True)
        assert "wavenet_apply_stack" not in eps_sk.__code__.co_freevars
    finally:
        os.unlink(path)


def test_convert_checkpoint_cli_roundtrip(tmp_path):
    """torch M5 checkpoint → Orbax dir → identical logits through the
    directory-loading path every CLI uses."""
    M5_CKPT = "/root/reference/audio_models/M5/checkpoints/kernel_size=160/vanilla-best-acc.pth"
    if not os.path.isfile(M5_CKPT):
        pytest.skip("reference checkpoints absent")
    import jax
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.cli import convert_checkpoint
    from diffusion_model_for_audio_defense_tpu.core.checkpoint import (
        load_classifier_checkpoint,
        load_pytree,
    )
    from diffusion_model_for_audio_defense_tpu.models import create_model

    dst = str(tmp_path / "m5_orbax")
    convert_checkpoint.main([M5_CKPT, dst, "--kind", "m5"])
    direct = load_classifier_checkpoint(M5_CKPT, "m5")
    restored = load_pytree(dst)
    model = create_model("m5", num_classes=10, in_channels=1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1, 16000)).astype(np.float32) * 0.1)
    a = np.asarray(model.apply(direct, x))
    b = np.asarray(model.apply(restored, x))
    np.testing.assert_array_equal(a, b)


def test_fakebob_eval_cli(corpus):
    """The gitignored-equivalent wrapper injects --attack FAKEBOB."""
    from diffusion_model_for_audio_defense_tpu.cli.fakebob_eval import main

    out = main([
        "--data_path", corpus, "--classifier_model", "m5", "--defense", "None",
        "--max_iter_1", "1", "--num_per_class", "1", "--batch_size", "2",
        "--max_batches", "1", "--verbose", "0",
    ])
    assert out["total"] == 2
    assert 0.0 <= out["robust_acc"] <= 1.0


def test_parallel_certified_robustness_eval_cli(corpus, tmp_path):
    """σ-sweep wrapper: one certify run per sigma, results keyed by σ."""
    import json

    from diffusion_model_for_audio_defense_tpu.cli.parallel_certified_robustness_eval import main

    cfg = {
        "diffusion_config": {"T": 20, "beta_0": 1e-4, "beta_T": 0.02},
        "wavenet_config": {
            "in_channels": 1, "res_channels": 8, "skip_channels": 8, "out_channels": 1,
            "num_res_layers": 2, "dilation_cycle": 2, "diffusion_step_embed_dim_in": 8,
            "diffusion_step_embed_dim_mid": 16, "diffusion_step_embed_dim_out": 16,
        },
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    results = main([
        "--sigmas", "0.25,0.5",
        "--data_path", corpus, "--classifier_model", "m5", "--defense_method", "diffusion",
        "--ddpm_config", str(cfg_path), "--num_sampling", "64", "--n0", "16",
        "--certify_batch_size", "16", "--num_per_class", "1", "--batch_size", "2",
        "--max_examples", "1",
    ])
    assert set(results) == {0.25, 0.5}
    assert all(len(v) >= 1 for v in results.values())
