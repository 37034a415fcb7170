#!/bin/bash
# Adversarial (PGD) classifier training (reference scripts/train_sc09_classifier.sh;
# the commented vanilla variant runs with MODE=vanilla).
MODEL=${MODEL:-resnext29_8_64}
MODE=${MODE:-adv}
python -m diffusion_model_for_audio_defense_tpu.cli.train_classifier \
  --train_path "${TRAIN:-datasets/speech_commands/train}" \
  --valid_path "${VALID:-datasets/speech_commands/valid}" \
  --model "$MODEL" --mode "$MODE" \
  --lr 0.01 --epochs 70 --batch_size 96 \
  |& tee "logs_${MODE}_train_sc09_${MODEL}.txt"
