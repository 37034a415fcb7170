"""Strong-attack addendum to the real-weights DiffWave artifact.

The prod eval's CW run uses the reference default budget (linf eps=65 int16
units ~= 0.002, 30 iters — adaptive_attack_eval.py:73-74), which fails to
break even the UNDEFENDED M5 on the cleanly-separable synthetic task
(robust acc 100% both ways), so the defended-vs-undefended comparison is
vacuous at that budget. This addendum re-runs the same CW attack at a
budget that actually breaks the undefended model (eps=2000 ~= 0.061, the
AudioAttack class default, 100 stage-1 iters) and records the contrast in
``artifacts/real_diffwave/attack_strong.json`` + merges it into
``summary.json``.

Run on the TPU (one axon client at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/attack_strength_r4.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "real_diffwave")
TEST_DIR = os.path.join(OUT, "synth_sc09_test")
CLF_EVAL = os.path.join(OUT, "m5_synth_eval")
DW_FINAL = os.path.join(OUT, "diffwave_final")
CONFIG = os.path.join(OUT, "config.json")

EPS = 2000      # int16 units ≈ 0.061 in [-1,1] — AudioAttack's class default
ITERS = 100


def main():
    from diffusion_model_for_audio_defense_tpu.cli import adaptive_attack_eval
    from diffusion_model_for_audio_defense_tpu.core.functional import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    common = ["--data_path", TEST_DIR, "--classifier_model", "m5",
              "--classifier_path", CLF_EVAL, "--attack", "CW",
              "--bound_norm", "linf", "--eps", str(EPS),
              "--max_iter_1", str(ITERS), "--batch_size", "25",
              "--num_per_class", "5", "--seed", "0"]
    print(f"=== strong attack (eps={EPS}, iters={ITERS}): undefended ===")
    res_none = adaptive_attack_eval.main(common + ["--defense", "None"])
    print(f"=== strong attack (eps={EPS}, iters={ITERS}): Diffusion ddpm t*=3 ===")
    res_diff = adaptive_attack_eval.main(
        common + ["--defense", "Diffusion", "--diffusion_type", "ddpm",
                  "--t", "3", "--ddpm_path", DW_FINAL,
                  "--ddpm_config", CONFIG, "--bf16"])

    rec = {"eps_int16": EPS, "eps_float": EPS / 32768.0, "max_iter_1": ITERS,
           "undefended": res_none, "defended_diffusion_t3": res_diff}
    with open(os.path.join(OUT, "attack_strong.json"), "w") as f:
        json.dump(rec, f, indent=2)

    spath = os.path.join(OUT, "summary.json")
    if os.path.exists(spath):
        with open(spath) as f:
            summary = json.load(f)
        summary[f"attack_cw_linf_eps{EPS}_strong"] = rec
        with open(spath, "w") as f:
            json.dump(summary, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
