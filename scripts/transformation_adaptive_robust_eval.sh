#!/bin/bash
# Adaptive attack against the non-diffusion transformation defenses
# (reference scripts/transformation_adaptive_robust_eval.sh; MS there).
ATTACK=${ATTACK:-CW}
EPS=${EPS:-65}
MAX_ITER_1=${MAX_ITER_1:-100}
for DEFENSE in ${DEFENSES:-MS AS DS LPF BPF FeCo}; do
  python -m diffusion_model_for_audio_defense_tpu.cli.adaptive_attack_eval \
    --data_path "${DATA:-datasets/speech_commands/test}" \
    --defense "$DEFENSE" --attack "$ATTACK" --bound_norm linf --eps "$EPS" \
    --max_iter_1 "$MAX_ITER_1" --num_per_class 10 --batch_size "${BATCH_SIZE:-8}" \
    |& tee "logs_transformation_${DEFENSE}_${ATTACK}.txt"
done
