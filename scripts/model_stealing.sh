#!/bin/bash
# Train a surrogate by model stealing, then evaluate transfer attacks
# (reference scripts/model_stealing.sh + transfer_attack_eval).
DATA_TRAIN=${DATA_TRAIN:-datasets/speech_commands/train}
DATA_TEST=${DATA_TEST:-datasets/speech_commands/test}
python -m diffusion_model_for_audio_defense_tpu.cli.model_stealing \
  --data_path "$DATA_TRAIN" --surrogate_model resnext29_8_64 --epochs 30 \
  --save_dir checkpoints/surrogate |& tee logs_stealing.txt
python -m diffusion_model_for_audio_defense_tpu.cli.transfer_attack_eval \
  --data_path "$DATA_TEST" --surrogate_path checkpoints/surrogate/surrogate-best-acc \
  --defense Diffusion --diffusion_type sde --t 5 |& tee logs_transfer.txt
