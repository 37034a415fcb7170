#!/bin/bash
# Adaptive white-box robustness sweep (reference scripts/adaptive_robust_eval.sh).
# CW-Linf through the DiffWave VP-SDE purifier at several noise scales.
DATA=${DATA:-datasets/speech_commands/test}
CLF=${CLF:-resnext29_8_64}
DDPM=${DDPM:-diffusion_models/DiffWave_Unconditional/exp/ch256_T200_betaT0.02/logs/checkpoint/1000000.pkl}
for T in 1 3 5 25; do
  python -m diffusion_model_for_audio_defense_tpu.cli.adaptive_attack_eval \
    --data_path "$DATA" --classifier_model "$CLF" \
    --defense Diffusion --diffusion_type sde --t $T --ddpm_path "$DDPM" \
    --attack CW --bound_norm linf --eps 65 --max_iter_1 30 \
    --eot_attack_size "${EOT:-1}" --eot_defense_size "${EOT:-1}" \
    |& tee "logs_adaptive_t${T}.txt"
done
