#!/bin/bash
# Transfer attack from a model-stealing surrogate (reference scripts/transfer_eval.sh).
MAX_ITER_1=${MAX_ITER_1:-1000}
T=${T:-5}
python -m diffusion_model_for_audio_defense_tpu.cli.transfer_attack_eval \
  --data_path "${DATA:-datasets/speech_commands/test}" \
  --surrogate_path "${SURROGATE:?set SURROGATE to the stolen-model checkpoint}" \
  --max_iter_1 "$MAX_ITER_1" --t "$T" \
  --batch_size "${BATCH_SIZE:-32}" \
  |& tee "logs_transfer_CW_T=${T}_iter=${MAX_ITER_1}.txt"
