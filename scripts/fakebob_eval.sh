#!/bin/bash
# FAKEBOB black-box evaluation (reference scripts/fakebob_eval.sh).
DATA=${DATA:-datasets/speech_commands/test}
python -m diffusion_model_for_audio_defense_tpu.cli.fakebob_eval \
  --data_path "$DATA" --defense "${DEFENSE:-Diffusion}" --diffusion_type sde --t "${T:-5}" \
  |& tee logs_fakebob.txt
