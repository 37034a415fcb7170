#!/bin/bash
# Randomized-smoothing certification (reference scripts/certified_robust_eval.sh:
# DEFENSE=diffusion, N=100000, sigma sweep, alpha=0.001, n0=100).
DATA=${DATA:-datasets/speech_commands/test}
N=${N:-100000}
python -m diffusion_model_for_audio_defense_tpu.cli.parallel_certified_robustness_eval \
  --sigmas "${SIGMAS:-0.25,0.5,1.0}" \
  --data_path "$DATA" --defense_method diffusion \
  --num_sampling "$N" --n0 100 --alpha 0.001 --certify_batch_size 64 \
  |& tee "logs_certify_N${N}.txt"
