"""Transfer / model-stealing / adversarial-finetune artifact on TRAINED weights.

VERDICT r4 #8: the stealing, transfer and finetune drivers were unit-tested
but never run against trained weights. Three stages, mirroring the
reference's workflow (``transfer_attack_eval.py:399-533``,
``adv_finetune.py:240-262``, gitignored ``model_stealing.py`` via
``scripts/model_stealing.sh``):

  steal     train a surrogate ResNeXt29 by querying the TRAINED victim for
            labels (cli/model_stealing.py) -> acc_steal
  transfer  CW adversarial examples crafted white-box on the surrogate,
            evaluated on the victim, vanilla vs Diffusion-defended
            (cli/transfer_attack_eval.py)
  finetune  one adversarial-finetune improvement loop on the victim
            (cli/adv_finetune.py), robust acc before vs after

-> artifacts/real_transfer/summary.json

Run on the TPU AFTER the train pipelines:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_transfer.py
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DW_DIR = os.path.join(REPO, "artifacts", "real_diffwave")
DW_FINAL = os.path.join(DW_DIR, "diffwave_final")
DW_CONFIG = os.path.join(DW_DIR, "config.json")
TEST_DIR = os.path.join(DW_DIR, "synth_sc09_test")
TRAIN_DIR = os.path.join(REPO, "artifacts", "real_spec", "synth_sc09_train")
CLF_EVAL = os.path.join(REPO, "artifacts", "real_spec", "resnext_synth_eval")
OUT = os.path.join(REPO, "artifacts", "real_transfer")
SUR_DIR = os.path.join(OUT, "surrogate")
SUR_EVAL = os.path.join(OUT, "surrogate_eval")
FT_DIR = os.path.join(OUT, "advft")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", choices=["all", "steal", "transfer", "finetune"], default="all")
    ap.add_argument("--steal_epochs", type=int, default=8)
    ap.add_argument("--eps", type=int, default=2000)
    ap.add_argument("--attack_iters", type=int, default=30)
    ap.add_argument("--ft_epochs", type=int, default=2)
    ap.add_argument("--num_per_class", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from diffusion_model_for_audio_defense_tpu.core.checkpoint import (
        load_pytree,
        save_pytree,
    )
    from diffusion_model_for_audio_defense_tpu.core.functional import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    os.makedirs(OUT, exist_ok=True)
    spath = os.path.join(OUT, "summary.json")
    summary = {}
    if os.path.isfile(spath):
        with open(spath) as f:
            summary = json.load(f)
    summary["config"] = {
        "victim": "ResNeXt29 8x64 (trained, artifacts/real_spec/resnext_synth_eval)",
        "surrogate": "ResNeXt29 8x64 stolen by label queries",
        "defense": "DiffWave DDPM one-shot t*=3 (trained)",
        "task": "synth_speech v2 (hardened)",
        "match": "reference transfer_attack_eval.py:399-533, adv_finetune.py:240-262",
    }

    def flush():
        with open(spath, "w") as f:
            json.dump(summary, f, indent=2)

    # ---- 1. model stealing -------------------------------------------------
    if args.stage in ("all", "steal"):
        from diffusion_model_for_audio_defense_tpu.cli import model_stealing

        if os.path.isdir(SUR_DIR):
            shutil.rmtree(SUR_DIR)
        trainer = model_stealing.main([
            "--data_path", TRAIN_DIR, "--classifier_model", "resnext29_8_64",
            "--classifier_path", CLF_EVAL, "--surrogate_model", "resnext29_8_64",
            "--epochs", str(args.steal_epochs), "--batch_size", "64",
            "--max_batches_per_epoch", "16", "--save_dir", SUR_DIR, "--seed", "0"])
        best = load_pytree(os.path.join(SUR_DIR, "surrogate-best-acc"))
        save_pytree(SUR_EVAL, {"params": best["params"], "batch_stats": best["batch_stats"]})
        summary["steal"] = {"epochs": args.steal_epochs,
                            "final_agreement_with_victim": float(trainer.best_acc)}
        flush()

    # ---- 2. transfer attack ------------------------------------------------
    if args.stage in ("all", "transfer"):
        from diffusion_model_for_audio_defense_tpu.cli import transfer_attack_eval

        stats = transfer_attack_eval.main([
            "--data_path", TEST_DIR, "--classifier_model", "resnext29_8_64",
            "--classifier_path", CLF_EVAL, "--surrogate_model", "resnext29_8_64",
            "--surrogate_path", SUR_EVAL, "--defense", "Diffusion",
            "--diffusion_type", "ddpm", "--t", "3",
            "--ddpm_path", DW_FINAL, "--ddpm_config", DW_CONFIG, "--bf16",
            "--bound_norm", "linf", "--eps", str(args.eps),
            "--max_iter_1", str(args.attack_iters), "--batch_size", "25",
            "--num_per_class", str(args.num_per_class), "--seed", "0"])
        t = max(stats["total"], 1)
        summary["transfer"] = {
            "eps_int16": args.eps, "max_iter_1": args.attack_iters,
            "acc_steal": stats["steal_agree"] / t,
            "vanilla_clean": stats["vanilla_clean"] / t,
            "vanilla_robust_transfer": stats["vanilla_robust"] / t,
            "defended_clean": stats["defended_clean"] / t,
            "defended_robust_transfer": stats["defended_robust"] / t,
            "total": t,
        }
        flush()

    # ---- 3. adversarial finetune ------------------------------------------
    if args.stage in ("all", "finetune"):
        from diffusion_model_for_audio_defense_tpu.cli import (
            adaptive_attack_eval,
            adv_finetune,
        )

        def robust_eval(clf_path):
            return adaptive_attack_eval.main([
                "--data_path", TEST_DIR, "--classifier_model", "resnext29_8_64",
                "--classifier_path", clf_path, "--attack", "CW",
                "--bound_norm", "linf", "--eps", str(args.eps),
                "--max_iter_1", str(args.attack_iters), "--batch_size", "25",
                "--num_per_class", str(args.num_per_class), "--seed", "0",
                "--defense", "None"])

        before = robust_eval(CLF_EVAL)
        if os.path.isdir(FT_DIR):
            shutil.rmtree(FT_DIR)
        adv_finetune.main([
            "--data_path", TRAIN_DIR, "--classifier_model", "resnext29_8_64",
            "--classifier_path", CLF_EVAL, "--defense", "None",
            "--attack", "CW", "--bound_norm", "linf", "--eps", str(args.eps),
            "--max_iter_1", "10", "--lr", "1e-3",
            "--epochs", str(args.ft_epochs), "--batch_size", "20",
            "--num_per_class", "10", "--max_batches", "8",
            "--save_dir", FT_DIR, "--seed", "0"])
        after = robust_eval(os.path.join(FT_DIR, "advft-last"))
        summary["adv_finetune"] = {
            "eps_int16": args.eps, "ft_epochs": args.ft_epochs,
            "before": before, "after": after,
            "note": "reference recipe (SGD-style finetune on CW examples, "
                    "adv_finetune.py:240-262; arg-order bug at :260 fixed)",
        }
        flush()

    print("\nsummary ->", spath)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
