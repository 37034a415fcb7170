"""KWS real-weights artifact: RCNN keyword spotter + DiffWave defense.

VERDICT r4 #7: the KWS harness (``cli/kws_adaptive_attack_eval.py``,
rebuilding the reference ``kws_adaptive_attack_eval.py:73-95``) had a
unit-tested driver but no trained-weights artifact. Stages:

  data   synthetic Qualcomm-keyword-layout corpus (4 keywords = synth
         classes 0-3, variable 1.0-2.5 s lengths; the reference's
         trailing-count split applies unchanged)
  train  RCNN-KWS (CRNN + attention) via cli/train_kws.py
  eval   cli/kws_adaptive_attack_eval.py: CW at the reference budget and at
         a strong budget, undefended vs Diffusion-defended (the TRAINED
         DiffWave from artifacts/real_diffwave — same harmonic family)

-> artifacts/real_kws/summary.json

Run on the TPU AFTER train_real_diffwave.py:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_real_kws.py
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "real_kws")
DATA = os.path.join(OUT, "synth_qualcomm")
CLF_DIR = os.path.join(OUT, "classifier")
CLF_CKPT = os.path.join(CLF_DIR, "kws-best-acc")
DW_DIR = os.path.join(REPO, "artifacts", "real_diffwave")
DW_FINAL = os.path.join(DW_DIR, "diffwave_final")
DW_CONFIG = os.path.join(DW_DIR, "config.json")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", choices=["all", "data", "train", "eval"], default="all")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--attack_iters", type=int, default=30)
    ap.add_argument("--strong_eps", type=int, default=2000)
    ap.add_argument("--strong_iters", type=int, default=60)
    ap.add_argument("--eval_batches", type=int, default=4)
    ap.add_argument("--eval_batch_size", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true", help="minutes-scale pipeline validation")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.smoke:
        args.epochs, args.attack_iters = 2, 2
        args.strong_eps, args.eval_batches = None, 1

    from diffusion_model_for_audio_defense_tpu.core.functional import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    os.makedirs(OUT, exist_ok=True)

    if args.stage in ("all", "data"):
        from diffusion_model_for_audio_defense_tpu.data.synth_speech import (
            write_kws_dataset,
        )

        if os.path.isdir(DATA):
            shutil.rmtree(DATA)  # stale task versions must not leak in
        write_kws_dataset(DATA, n_per_class=200, seed=21)
        print("kws corpus ->", DATA)

    if args.stage in ("all", "train"):
        from diffusion_model_for_audio_defense_tpu.cli import train_kws

        if os.path.isdir(CLF_DIR):
            shutil.rmtree(CLF_DIR)
        train_kws.main(["--data_path", DATA, "--epochs", str(args.epochs),
                        "--batch_size", "32", "--save_dir", CLF_DIR,
                        "--max_batches_per_epoch", "16"])
        assert os.path.isdir(CLF_CKPT), "KWS training produced no best-acc checkpoint"

    if args.stage in ("all", "eval"):
        from diffusion_model_for_audio_defense_tpu.cli import kws_adaptive_attack_eval

        summary = {"config": {
            "classifier": "RCNN-KWS (CRNN+attention, 4 keywords) on mel32",
            "defense": "DiffWave DDPM one-shot t*=3 (trained, artifacts/real_diffwave)",
            "task": "synthetic Qualcomm-keyword layout (synth_speech v2 classes 0-3, 1.0-2.5s)",
            "match": "reference kws_adaptive_attack_eval.py:73-95",
        }}

        def run_cw(eps: int, iters: int):
            common = ["--data_path", DATA, "--classifier_path", CLF_CKPT,
                      "--attack", "CW", "--bound_norm", "linf", "--eps", str(eps),
                      "--max_iter_1", str(iters),
                      "--batch_size", str(args.eval_batch_size),
                      "--max_batches", str(args.eval_batches), "--seed", "0"]
            print(f"\n=== KWS attack eps={eps} iters={iters}: undefended ===")
            res_none = kws_adaptive_attack_eval.main(common + ["--defense", "None"])
            print(f"\n=== KWS attack eps={eps} iters={iters}: Diffusion t*=3 ===")
            res_diff = kws_adaptive_attack_eval.main(
                common + ["--defense", "Diffusion", "--diffusion_type", "ddpm", "--t", "3",
                          "--ddpm_path", DW_FINAL, "--ddpm_config", DW_CONFIG, "--bf16"])
            rec = {"eps_int16": eps, "eps_float": eps / 32768.0, "max_iter_1": iters,
                   "undefended": res_none, "defended_diffusion_t3": res_diff}
            if res_none["robust"] >= 0.95:
                rec["note"] = "budget too small for this task: attack breaks (almost) nothing undefended"
            return rec

        summary["attack_cw_linf_eps65"] = run_cw(65, args.attack_iters)
        if args.strong_eps:
            summary[f"attack_cw_linf_eps{args.strong_eps}_strong"] = run_cw(
                args.strong_eps, args.strong_iters)

        spath = os.path.join(OUT, "summary.json")
        with open(spath, "w") as f:
            json.dump(summary, f, indent=2)
        print("\nsummary ->", spath)
        print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
