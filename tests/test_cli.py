"""CLI driver smoke tests over a synthetic corpus (CPU, tiny configs)."""

import json
import os

import numpy as np
import pytest

from diffusion_model_for_audio_defense_tpu.data import write_wav

TINY_CFG = {
    "diffusion_config": {"T": 20, "beta_0": 1e-4, "beta_T": 0.02},
    "wavenet_config": {
        "in_channels": 1, "res_channels": 8, "skip_channels": 8, "out_channels": 1,
        "num_res_layers": 2, "dilation_cycle": 2, "diffusion_step_embed_dim_in": 8,
        "diffusion_step_embed_dim_mid": 16, "diffusion_step_embed_dim_out": 16,
    },
    "train_config": {
        "output_directory": "", "tensorboard_directory": "", "ckpt_iter": "max",
        "iters_per_ckpt": 5, "iters_per_logging": 2, "n_iters": 100,
        "learning_rate": 2e-4, "batch_size_per_gpu": 2,
    },
    "trainset_config": {"data_path": "", "segment_length": 16000, "sampling_rate": 16000},
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    for cls in ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine"]:
        d = root / cls
        d.mkdir()
        for i in range(3):
            write_wav(str(d / f"{i}.wav"), rng.standard_normal(16000) * 0.05)
    return str(root)


@pytest.fixture(scope="module")
def ddpm_config(tmp_path_factory, corpus):
    d = tmp_path_factory.mktemp("cfg")
    cfg = dict(TINY_CFG)
    cfg["train_config"] = dict(cfg["train_config"], output_directory=str(d / "ckpt"),
                               tensorboard_directory=str(d / "tb"))
    cfg["trainset_config"] = dict(cfg["trainset_config"], data_path=corpus)
    path = d / "config.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def test_adaptive_attack_eval_none_defense(corpus):
    from diffusion_model_for_audio_defense_tpu.cli.adaptive_attack_eval import main

    out = main([
        "--data_path", corpus, "--classifier_model", "m5", "--defense", "None",
        "--attack", "CW", "--max_iter_1", "2", "--num_per_class", "2", "--batch_size", "4",
        "--max_batches", "1", "--verbose", "0",
    ])
    assert out["total"] == 4
    assert 0.0 <= out["robust_acc"] <= 1.0


def test_adaptive_attack_eval_diffusion_defense(corpus, ddpm_config):
    from diffusion_model_for_audio_defense_tpu.cli.adaptive_attack_eval import main

    out = main([
        "--data_path", corpus, "--classifier_model", "m5", "--defense", "Diffusion",
        "--diffusion_type", "ddpm", "--t", "2", "--ddpm_config", ddpm_config,
        "--attack", "CW", "--max_iter_1", "1", "--num_per_class", "1", "--batch_size", "2",
        "--max_batches", "1", "--verbose", "0",
    ])
    assert out["total"] == 2


def test_certified_robustness_eval(corpus, ddpm_config, tmp_path):
    from diffusion_model_for_audio_defense_tpu.cli.certified_robustness_eval import main

    records = main([
        "--data_path", corpus, "--classifier_model", "m5", "--defense_method", "diffusion",
        "--ddpm_config", ddpm_config, "--sigma", "0.25", "--num_sampling", "256",
        "--n0", "32", "--certify_batch_size", "16", "--num_per_class", "1",
        "--batch_size", "2", "--max_examples", "2", "--save_path", str(tmp_path / "cert.jsonl"),
    ])
    assert len(records) >= 2
    assert all("certified_radius" in r for r in records)
    assert os.path.exists(tmp_path / "cert.jsonl")


def test_train_diffwave_cli(ddpm_config):
    from diffusion_model_for_audio_defense_tpu.cli.train_diffwave import main

    main(["-c", ddpm_config, "--dataset", "sc09", "--max_iters", "3"])
    cfg = json.loads(open(ddpm_config).read())
    # 3 iters < iters_per_ckpt → no ckpt yet, but trainer ran without error


def test_inference_cli(ddpm_config, tmp_path):
    from diffusion_model_for_audio_defense_tpu.cli.inference import main

    main(["-c", ddpm_config, "-n", "2", "--output_directory", str(tmp_path / "out")])
    wavs = os.listdir(tmp_path / "out")
    assert len(wavs) == 2


def test_train_classifier_cli(corpus, tmp_path):
    from diffusion_model_for_audio_defense_tpu.cli.train_classifier import main

    tr = main([
        "--train_path", corpus, "--valid_path", corpus, "--model", "m5", "--mode", "vanilla",
        "--epochs", "1", "--batch_size", "4", "--num_per_class", "2",
        "--save_dir", str(tmp_path / "clf"),
    ])
    assert os.path.isdir(tmp_path / "clf")


def test_model_stealing_and_transfer(corpus, tmp_path):
    from diffusion_model_for_audio_defense_tpu.cli.model_stealing import main as steal
    from diffusion_model_for_audio_defense_tpu.cli.transfer_attack_eval import main as transfer

    steal([
        "--data_path", corpus, "--classifier_model", "m5", "--surrogate_model", "m5",
        "--epochs", "1", "--batch_size", "4", "--num_per_class", "2",
        "--save_dir", str(tmp_path / "sur"),
    ])
    assert os.path.isdir(tmp_path / "sur")

    stats = transfer([
        "--data_path", corpus, "--classifier_model", "m5", "--surrogate_model", "m5",
        "--defense", "None", "--max_iter_1", "2", "--num_per_class", "1",
        "--batch_size", "2", "--max_batches", "1",
    ])
    assert stats["total"] == 2


def test_kws_driver_smoke(tmp_path):
    from diffusion_model_for_audio_defense_tpu.cli.kws_adaptive_attack_eval import main

    rng = np.random.default_rng(0)
    for cls in ["hey_android", "hey_snapdragon", "hi_galaxy", "hi_lumina"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(26):
            write_wav(str(d / f"{i:03d}.wav"), rng.standard_normal(16000) * 0.05)
    out = main([
        "--data_path", str(tmp_path), "--defense", "None", "--attack", "CW",
        "--max_iter_1", "1", "--batch_size", "2", "--max_batches", "1", "--verbose", "0",
    ])
    assert "robust" in out


KWS_REAL_CKPT = "/root/reference/audio_models/RCNN_KWS/checkpoints/vanilla-best-acc-kws-attn_rcnn-n_mels=32.pth"


@pytest.mark.skipif(not os.path.isfile(KWS_REAL_CKPT), reason="reference checkpoints absent")
def test_kws_driver_with_real_checkpoint(tmp_path):
    """End-to-end KWS attack eval with the REAL converted RCNN-KWS weights
    (one of the two trained artifacts the reference ships) — real-numerics
    coverage of the driver, not just random-init plumbing."""
    from diffusion_model_for_audio_defense_tpu.cli.kws_adaptive_attack_eval import main

    rng = np.random.default_rng(1)
    for cls in ["hey_android", "hey_snapdragon", "hi_galaxy", "hi_lumina"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(26):
            write_wav(str(d / f"{i:03d}.wav"), rng.standard_normal(16000) * 0.05)
    out = main([
        "--data_path", str(tmp_path), "--defense", "AS", "--attack", "CW",
        "--classifier_path", KWS_REAL_CKPT,
        "--max_iter_1", "2", "--batch_size", "2", "--max_batches", "1", "--verbose", "0",
        "--fused_stage_1",
    ])
    assert "robust" in out and np.isfinite(list(out.values())).all()


def test_certified_robustness_resume(corpus, ddpm_config, tmp_path):
    """--resume skips already-certified utterances and appends: a full run
    and a crash-interrupted + resumed run produce the same number of records
    with identical ids."""
    from diffusion_model_for_audio_defense_tpu.cli.certified_robustness_eval import main

    out = str(tmp_path / "cert.jsonl")
    base_args = [
        "--data_path", corpus, "--classifier_model", "m5",
        "--defense_method", "randsmooth", "--sigma", "0.06",
        "--num_sampling", "32", "--n0", "16", "--certify_batch_size", "16",
        "--batch_size", "4", "--num_per_class", "1", "--save_path", out,
    ]
    recs_full = main(base_args + ["--max_examples", "8"])
    n_full = len(recs_full)
    assert n_full >= 8

    # simulate a crash after 5 records (partial batch) PLUS a truncated
    # partial line (SIGKILL mid-write), then resume
    with open(out) as f:
        lines = [l for l in f if l.strip()]
    with open(out, "w") as f:
        f.writelines(lines[:5])
        f.write(lines[5][: len(lines[5]) // 2])  # torn record
    recs = main(base_args + ["--resume", "--max_examples", "8"])
    assert len(recs) == n_full
    assert [r["id"] for r in recs] == [r["id"] for r in recs_full]
    # the first 5 records are the preserved originals, bit-identical
    assert recs[:5] == recs_full[:5]
    # resuming a COMPLETE run certifies nothing further and respects
    # --max_examples (no extra batch beyond the limit)
    recs2 = main(base_args + ["--resume", "--max_examples", "8"])
    assert len(recs2) == n_full
