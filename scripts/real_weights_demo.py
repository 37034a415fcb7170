"""End-to-end pipeline demo with the REAL reference M5 checkpoint.

The reference ships exactly two trained artifacts usable here: the M5
raw-waveform CNN (``audio_models/M5/checkpoints/kernel_size=160/
vanilla-best-acc.pth``) and the RCNN-KWS models. This script turns
"CLI plumbing smoke-tested on random inits" into "pipeline demonstrated
with real weights" (VERDICT r2 #7):

1. synthesize 2 utterances/class (class-dependent harmonic stacks + noise —
   the reference ships no wav data, so inputs are synthetic but the model
   weights are the converted real checkpoint)
2. label each utterance with the real M5's own clean prediction, so the
   certification below measures the stability of the *real* model's
   decision under Gaussian smoothing (not accuracy on made-up labels)
3. run ``cli/certified_robustness_eval.py`` (randomized smoothing,
   σ=0.06 like the reference's randsmooth variant, small N) → JSONL
4. run ``cli/adaptive_attack_eval.py`` (CW linf, AS defense) on the same
   data → clean/defended/robust accuracies

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/real_weights_demo.py
Artifacts land in artifacts/real_m5/.
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
M5_CKPT = "/root/reference/audio_models/M5/checkpoints/kernel_size=160/vanilla-best-acc.pth"
OUT = os.path.join(REPO, "artifacts", "real_m5")
CLASSES = ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine"]


def synth_utterance(rng, base_hz, L=16000, sr=16000):
    """A vowel-ish harmonic stack with an amplitude envelope + noise floor."""
    t = np.arange(L) / sr
    sig = np.zeros(L)
    for k, a in enumerate((1.0, 0.6, 0.35, 0.2), start=1):
        sig += a * np.sin(2 * np.pi * base_hz * k * t + rng.uniform(0, 2 * np.pi))
    env = np.exp(-((t - 0.45) ** 2) / (2 * 0.18**2))
    sig = sig * env + 0.02 * rng.standard_normal(L)
    return (0.4 * sig / np.abs(sig).max()).astype(np.float32)


def main():
    from diffusion_model_for_audio_defense_tpu.data import write_wav

    data_dir = os.path.join(OUT, "synth_sc09")
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(0)

    # --- 1. synthesize, 2 per class slot (frequency varies per class slot)
    waves = []
    for ci in range(10):
        for j in range(2):
            base = 120 + 55 * ci + 11 * j
            waves.append(synth_utterance(rng, base))

    # --- 2. label by the REAL M5's clean predictions
    import jax
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.core.checkpoint import load_classifier_checkpoint
    from diffusion_model_for_audio_defense_tpu.models import create_model

    model = create_model("m5", num_classes=10, in_channels=1)
    variables = load_classifier_checkpoint(M5_CKPT, "m5")
    x = jnp.asarray(np.stack(waves))[:, None, :]
    preds = np.asarray(jnp.argmax(model.apply(variables, x), -1))
    print("real-M5 clean predictions on synthetic utterances:", preds.tolist())

    for cls in CLASSES:
        os.makedirs(os.path.join(data_dir, cls), exist_ok=True)
    for i, (w, p) in enumerate(zip(waves, preds)):
        write_wav(os.path.join(data_dir, CLASSES[p], f"synth_{i:02d}.wav"), w)

    # --- 3. certification with the real checkpoint (plain randomized
    # smoothing — the reference ships no DiffWave weights, and M5 is the
    # raw-waveform model the reference's randsmooth variant pairs with)
    from diffusion_model_for_audio_defense_tpu.cli import certified_robustness_eval

    jsonl = os.path.join(OUT, "certified_sigma0.06_N2000.jsonl")
    records = certified_robustness_eval.main([
        "--data_path", data_dir, "--classifier_model", "m5",
        "--classifier_path", M5_CKPT, "--defense_method", "randsmooth",
        "--sigma", "0.06", "--num_sampling", "2000", "--n0", "100",
        "--certify_batch_size", "100", "--batch_size", "20",
        "--save_path", jsonl,
    ])
    certified = sum(1 for r in records if r["y_pred"] == r["y_true"] and r["certified_radius"] > 0)
    print(f"certified-to-clean-prediction: {certified}/{len(records)}")

    # --- 4. one attack eval end-to-end (CW linf, AS smoothing defense)
    from diffusion_model_for_audio_defense_tpu.cli import adaptive_attack_eval

    res = adaptive_attack_eval.main([
        "--data_path", data_dir, "--classifier_model", "m5",
        "--classifier_path", M5_CKPT, "--defense", "AS", "--attack", "CW",
        "--bound_norm", "linf", "--eps", "65", "--max_iter_1", "10",
        "--batch_size", "20", "--num_per_class", "2",
    ])
    summary = {
        "checkpoint": M5_CKPT,
        "n_utts": len(records),
        "certify": {"sigma": 0.06, "N": 2000,
                    "certified_to_clean_pred": certified},
        "attack": res if isinstance(res, dict) else None,
    }
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("summary ->", os.path.join(OUT, "summary.json"))


if __name__ == "__main__":
    main()
