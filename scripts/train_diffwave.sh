#!/bin/bash
# DiffWave purifier training (reference DiffWave_Unconditional/distributed_train.py;
# here one process drives every local chip through the dp(x tp) mesh).
python -m diffusion_model_for_audio_defense_tpu.cli.train_diffwave \
  -c "${CONFIG:-configs/config.json}" --dataset "${DATASET:-sc09}" |& tee logs_train_diffwave.txt
