#!/bin/bash
# L2-bounded CW sweep (reference scripts/l2_robust_eval.sh: eps=32768/2^15, lr=eps/50).
DATA=${DATA:-datasets/speech_commands/test}
python -m diffusion_model_for_audio_defense_tpu.cli.adaptive_attack_eval \
  --data_path "$DATA" --defense Diffusion --diffusion_type sde --t "${T:-5}" \
  --attack CW --bound_norm l2 --eps 32768 --max_iter_1 "${ITERS:-100}" \
  |& tee logs_l2_robust.txt
