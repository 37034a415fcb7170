#!/bin/bash
# Fetch + split Speech Commands v0.02 (reference datasets/speech_commands/
# download_speech_commands_dataset.sh). Requires network access.
set -e
mkdir -p datasets/speech_commands_raw && cd datasets/speech_commands_raw
wget -c http://download.tensorflow.org/data/speech_commands_v0.02.tar.gz
tar -xzf speech_commands_v0.02.tar.gz -C audio
cd ../..
python -m diffusion_model_for_audio_defense_tpu.cli.split_dataset datasets/speech_commands_raw/audio --out datasets/speech_commands
