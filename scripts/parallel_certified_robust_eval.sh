#!/bin/bash
# Sigma-sweep certification (reference scripts/parallel_certified_robust_eval.sh).
# The reference launches one process per (GPU, input, sigma); here the draws
# axis is already sharded over every chip of the mesh, so one process sweeps
# all sigmas back to back.
N=${N:-100000}
python -m diffusion_model_for_audio_defense_tpu.cli.parallel_certified_robustness_eval \
  --data_path "${DATA:-datasets/speech_commands/test}" \
  --defense_method "${DEFENSE:-diffusion}" \
  --sigmas "${SIGMAS:-0.25,0.5,1.0}" --num_sampling "$N" \
  --certify_batch_size "${BATCH_SIZE:-128}" \
  |& tee "logs_parallel_certified_N=${N}.txt"
