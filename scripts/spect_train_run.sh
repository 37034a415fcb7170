#!/bin/bash
# Spectrogram diffusion training (reference spect_train_mpi_run.sh: bs 230,
# 128ch UNet, 200 steps — no mpiexec needed, single controller drives the mesh).
python -m diffusion_model_for_audio_defense_tpu.cli.spectrogram_train \
  --data_dir "${DATA:-datasets/speech_commands/train}" \
  --batch_size 230 --num_channels 128 --num_res_blocks 3 --dropout 0.3 \
  --diffusion_steps 200 --save_interval 10000 |& tee logs_spect_train.txt
