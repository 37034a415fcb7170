#!/bin/bash
# Jacobian-regularized classifier training (reference scripts/jacobian_reg_train.sh).
MODEL=${MODEL:-resnext29_8_64}
LAMBDA=${LAMBDA:-1e-11}
python -m diffusion_model_for_audio_defense_tpu.cli.train_classifier \
  --train_path "${TRAIN:-datasets/speech_commands/train}" \
  --valid_path "${VALID:-datasets/speech_commands/valid}" \
  --model "$MODEL" --mode jacobian --reg "$LAMBDA" \
  --lr 0.01 --epochs 70 --batch_size 96 \
  |& tee "logs_jacobian_reg=${LAMBDA}_${MODEL}.txt"
