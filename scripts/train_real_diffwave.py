"""Train a REAL DiffWave purifier + classifier and show the defense defends.

The reference ships no DiffWave weights (its ``diffwave_ddpm.py:395-411``
loads a private 1M-iter checkpoint), so every purify/attack/certify number
in this repo previously ran on random weights (VERDICT r3 #2). This script
produces the first end-to-end "defense actually defends" artifact:

  stage data        synthesize the SC09-layout test set (data/synth_speech.py)
  stage classifier  train M5 (raw-waveform CNN) on the synthetic stream
  stage diffwave    train the PRODUCTION-config WaveNet (256ch/36L, the same
                    model bench.py certifies) with DiffWaveTrainer
                    (use_pallas=True — the fused Pallas stack fwd+bwd)
  stage eval        (a) denoise sanity: acc(clean) / acc(noisy) / acc(denoised)
                    (b) cli/adaptive_attack_eval.py CW, defended vs undefended
                    (c) cli/certified_robustness_eval.py σ=0.25, diffusion vs
                        plain randsmooth
  → artifacts/real_diffwave/summary.json + checkpoints + loss curve

Run on the TPU (one axon client at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_real_diffwave.py --stage all

Mirrors the reference recipe: DiffWave_Unconditional/train.py (Adam 2e-4,
T=200 linear β∈[1e-4, 0.02]) + adaptive_attack_eval.py:244-363 +
certified_robustness_eval.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "artifacts", "real_diffwave")
TEST_DIR = os.path.join(OUT, "synth_sc09_test")
CLF_DIR = os.path.join(OUT, "classifier")
CLF_CKPT = os.path.join(CLF_DIR, "m5_synth-best-acc")
CLF_EVAL = os.path.join(OUT, "m5_synth_eval")
DW_DIR = os.path.join(OUT, "diffwave_ckpts")
DW_FINAL = os.path.join(OUT, "diffwave_final")


def stage_data():
    from diffusion_model_for_audio_defense_tpu.data.synth_speech import write_dataset

    write_dataset(TEST_DIR, n_per_class=10, seed=1234)
    print("test set ->", TEST_DIR)


def stage_classifier(epochs: int = 25, batches_per_epoch: int = 20, batch: int = 64):
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.data.synth_speech import labeled_batch
    from diffusion_model_for_audio_defense_tpu.models import create_model
    from diffusion_model_for_audio_defense_tpu.train import ClassifierTrainer
    from diffusion_model_for_audio_defense_tpu.train import logger as tlog

    class StreamLoader:
        """Fresh synthetic batches every epoch (infinite data ⇒ no overfit)."""

        def __init__(self, seed):
            self.seed = seed
            self.epoch = 0

        def set_epoch(self, e):
            self.epoch = e

        def __iter__(self):
            rng = np.random.default_rng((self.seed, self.epoch))
            for _ in range(batches_per_epoch):
                x, y = labeled_batch(rng, batch)
                yield {"samples": x[:, 0, :], "target": y}

    tlog.configure(CLF_DIR, ["csv", "human"])
    model = create_model("m5", num_classes=10, in_channels=1)
    tr = ClassifierTrainer(model, transform=None, mode="vanilla", lr=0.02,
                           sample_input=jnp.zeros((1, 1, 16000)), save_dir=CLF_DIR)
    val = StreamLoader(seed=999)
    for epoch in range(epochs):
        loss, acc = tr.train_epoch(StreamLoader(seed=7), epoch)
        vloss, vacc = tr.evaluate(val)
        tlog.logkv("epoch", epoch)
        tlog.logkv("valid_acc", vacc)
        tlog.dumpkvs()
        tr.maybe_checkpoint(vloss, vacc, "m5_synth")
    print(f"classifier: best valid acc {tr.best_acc:.4f} -> {CLF_CKPT}")
    assert tr.best_acc > 0.9, "classifier failed to learn the synthetic task"
    # params+stats-only export for the CLIs (the best-acc ckpt carries the
    # optimizer state too)
    from diffusion_model_for_audio_defense_tpu.core.checkpoint import (
        load_pytree,
        save_pytree,
    )

    best = load_pytree(CLF_CKPT)
    save_pytree(CLF_EVAL, {"params": best["params"], "batch_stats": best["batch_stats"]})
    print("eval classifier ->", CLF_EVAL)


def stage_diffwave(iters: int = 20000, batch: int = 16):
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.core import linear_schedule
    from diffusion_model_for_audio_defense_tpu.core.checkpoint import save_pytree
    from diffusion_model_for_audio_defense_tpu.data.synth_speech import waveform_batches
    from diffusion_model_for_audio_defense_tpu.models import WaveNet
    from diffusion_model_for_audio_defense_tpu.train import DiffWaveTrainer
    from diffusion_model_for_audio_defense_tpu.train import logger as tlog

    tlog.configure(OUT, ["csv", "human"])
    model = WaveNet(dtype=jnp.bfloat16)  # production 256ch/36L, bf16 compute
    trainer = DiffWaveTrainer(
        model, linear_schedule(200), learning_rate=2e-4, output_directory=DW_DIR,
        iters_per_ckpt=5000, iters_per_logging=200, use_pallas=True,
    )
    trainer.train(waveform_batches(seed=0, batch_size=batch), max_iters=iters)
    trainer.save_checkpoint()
    save_pytree(DW_FINAL, trainer.params)  # clean params-only ckpt for CLIs
    print(f"diffwave: {trainer.n_iter} iters -> {DW_FINAL}")


def _load_eval_pieces():
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.core import linear_schedule
    from diffusion_model_for_audio_defense_tpu.core.checkpoint import load_pytree
    from diffusion_model_for_audio_defense_tpu.models import WaveNet, create_model

    sched = linear_schedule(200)
    wavenet = WaveNet(dtype=jnp.bfloat16)
    wn_vars = load_pytree(DW_FINAL)
    clf = create_model("m5", num_classes=10, in_channels=1)
    clf_state = load_pytree(CLF_EVAL)
    clf_vars = {"params": clf_state["params"], "batch_stats": clf_state["batch_stats"]}
    return sched, wavenet, wn_vars, clf, clf_vars


def stage_eval(attack_iters: int = 30, certify_n: int = 2000):
    import jax
    import jax.numpy as jnp

    from diffusion_model_for_audio_defense_tpu.core import compute_t_star
    from diffusion_model_for_audio_defense_tpu.core.functional import jit_hoisted
    from diffusion_model_for_audio_defense_tpu.data.synth_speech import labeled_batch
    from diffusion_model_for_audio_defense_tpu.ops.pallas.wavenet_stack import wavenet_apply_stack
    from diffusion_model_for_audio_defense_tpu.purify.ddpm import one_shot_denoise

    summary = {"config": {"wavenet": "256ch/36L bf16 (production)", "classifier": "m5",
                          "schedule": "linear T=200 beta 1e-4..0.02"}}

    sched, wavenet, wn_vars, clf, clf_vars = _load_eval_pieces()
    eps_fn = lambda x, t: wavenet_apply_stack(
        wn_vars, x, t[:, None], num_res_layers=wavenet.num_res_layers,
        dilation_cycle=wavenet.dilation_cycle, dtype=jnp.bfloat16)
    clf_fn = jit_hoisted(lambda x: clf.apply(clf_vars, x))

    # ---- (a) denoise sanity: does one-shot purification recover noisy x? --
    rng = np.random.default_rng(2024)
    x, y = labeled_batch(rng, 100)
    x = jnp.asarray(x)

    def acc(xb):
        return float(np.mean(np.argmax(np.asarray(clf_fn(xb)), -1) == y))

    denoise = {}
    key = jax.random.PRNGKey(0)
    for sigma in (0.1, 0.25):
        t_star = compute_t_star(sched, sigma)
        sas = (1.0 / (1.0 + sigma**2)) ** 0.5
        key, k = jax.random.split(key)
        noisy = x + sigma * jax.random.normal(k, x.shape)
        # the certify chain's exact normalization: scale into q(x_t|x0) then
        # one-shot denoise at t* (certify/smoothing.py)
        den_fn = jit_hoisted(lambda xn: one_shot_denoise(eps_fn, sched, sas * xn, t_star))
        denoised = den_fn(noisy)
        denoise[f"sigma={sigma}"] = {
            "t_star": int(t_star), "clean_acc": acc(x), "noisy_acc": acc(noisy),
            "denoised_acc": acc(jnp.asarray(np.asarray(denoised), jnp.float32)),
        }
        print(f"sigma={sigma}: {denoise[f'sigma={sigma}']}")
    summary["denoise_sanity"] = denoise

    # ---- (b) adaptive CW attack: undefended vs Diffusion-defended ---------
    from diffusion_model_for_audio_defense_tpu.cli import adaptive_attack_eval

    common = ["--data_path", TEST_DIR, "--classifier_model", "m5",
              "--classifier_path", CLF_EVAL, "--attack", "CW",
              "--bound_norm", "linf", "--eps", "65",
              "--max_iter_1", str(attack_iters), "--batch_size", "25",
              "--num_per_class", "5", "--seed", "0"]
    print("\n=== attack: undefended ===")
    res_none = adaptive_attack_eval.main(common + ["--defense", "None"])
    print("\n=== attack: Diffusion (DDPM one-shot, t*=3) ===")
    res_diff = adaptive_attack_eval.main(
        common + ["--defense", "Diffusion", "--diffusion_type", "ddpm",
                  "--t", "3", "--ddpm_path", DW_FINAL, "--bf16"])
    summary["attack_cw_linf_eps65"] = {
        "max_iter_1": attack_iters,
        "undefended": res_none,
        "defended_diffusion_t3": res_diff,
    }

    # ---- (c) certification: diffusion denoised-smoothing vs randsmooth ----
    from diffusion_model_for_audio_defense_tpu.cli import certified_robustness_eval

    def certify(method, tag, extra=()):
        path = os.path.join(OUT, f"certified_{tag}.jsonl")
        recs = certified_robustness_eval.main([
            "--data_path", TEST_DIR, "--classifier_model", "m5",
            "--classifier_path", CLF_EVAL, "--defense_method", method,
            "--sigma", "0.25", "--num_sampling", str(certify_n), "--n0", "100",
            "--certify_batch_size", "128", "--batch_size", "25",
            "--num_per_class", "5", "--save_path", path, *extra])
        n_cert = sum(1 for r in recs if r["y_pred"] == r["y_true"] and r["certified_radius"] > 0)
        radii = [r["certified_radius"] for r in recs
                 if r["y_pred"] == r["y_true"] and r["certified_radius"] > 0]
        return {"n": len(recs), "certified_correct": n_cert,
                "mean_certified_radius": float(np.mean(radii)) if radii else 0.0,
                "jsonl": os.path.relpath(path, REPO)}

    print("\n=== certify: diffusion denoised smoothing (sigma=0.25) ===")
    summary["certify_sigma0.25"] = {
        "diffusion": certify("diffusion", "diffusion_sigma0.25",
                             ("--ddpm_path", DW_FINAL)),
        "randsmooth_no_denoiser": certify("randsmooth", "randsmooth_sigma0.25"),
        "N": certify_n,
    }

    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("\nsummary ->", os.path.join(OUT, "summary.json"))
    print(json.dumps(summary, indent=2))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", choices=["all", "data", "classifier", "diffwave", "eval"],
                    default="all")
    ap.add_argument("--diffwave_iters", type=int, default=20000)
    ap.add_argument("--attack_iters", type=int, default=30)
    ap.add_argument("--certify_n", type=int, default=2000)
    args = ap.parse_args()

    from diffusion_model_for_audio_defense_tpu.core.functional import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(OUT, exist_ok=True)
    if args.stage in ("all", "data"):
        stage_data()
    if args.stage in ("all", "classifier"):
        stage_classifier()
    if args.stage in ("all", "diffwave"):
        stage_diffwave(iters=args.diffwave_iters)
    if args.stage in ("all", "eval"):
        stage_eval(attack_iters=args.attack_iters, certify_n=args.certify_n)


if __name__ == "__main__":
    main()
