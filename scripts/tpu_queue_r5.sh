#!/bin/bash
# Round-5 TPU work queue (deadline-aware, serial — the axon tunnel admits
# ONE client at a time; CLAUDE.md). Executes the round-5 artifact list in
# VERDICT-priority order; steps that don't fit before the deadline are
# skipped so the tunnel is always free for the driver's round-end bench.
#
# Work list (VERDICT r4 "Next round"):
#   1. real_diffwave regen on the hardened task (train + denoise/CW/certify)
#   2. real_spec with corpus-derived mel bounds + 30k-step UNet + t* sweep
#   3. real_flagship (DiffWave + mel + ResNeXt composition)
#   4. certify_protocol: the actual N=100k runs (resume-safe)
#   5. real_blackbox (FAKEBOB / SirenAttack / Kenansville-fft)
#   6. real_kws (RCNN-KWS + trained DiffWave)
#   7. real_transfer (steal + transfer + adv-finetune)
#   8. real_qin (fused stage-2 imperceptibility)
#   9. bench re-measure
#
# Usage: bash scripts/tpu_queue_r5.sh [logdir] [deadline_epoch]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r5}
DEADLINE=${2:-$(( $(date +%s) + 23400 ))}   # default: now + 6.5 h
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site

left() { echo $(( DEADLINE - $(date +%s) )); }
probe() { timeout 300 python -c "import jax; print(jax.devices())"; }

up=0
while [ "$(left)" -gt 1200 ]; do
  if probe > "$LOG/probe.log" 2>&1; then
    echo "TUNNEL UP at $(date +%H:%M:%S)"; up=1; break
  fi
  echo "probe: down $(date +%H:%M:%S) ($(left))s to deadline"
  sleep 150
done
if [ "$up" != 1 ]; then echo "tunnel never answered before deadline; giving up"; exit 1; fi

reprobe() {
  while [ "$(left)" -gt 1200 ]; do
    probe > "$LOG/probe.log" 2>&1 && return 0
    echo "reprobe: down $(date +%H:%M:%S)"; sleep 150
  done
  return 1
}

run() { # run <name> <budget_s> <cmd...> — skip unless it fits; one retry
  local name=$1 budget=$2; shift 2
  for attempt in 1 2; do
    local rem=$(( $(left) - 300 ))
    local t=$budget
    [ "$rem" -lt "$t" ] && t=$rem
    if [ "$t" -lt 900 ]; then
      echo "=== $name SKIPPED (only ${rem}s to deadline) ==="
      return 2
    fi
    echo "=== $name attempt $attempt start $(date +%H:%M:%S) timeout ${t}s ==="
    timeout "$t" "$@" > "$LOG/$name.a$attempt.log" 2>&1
    local rc=$?
    echo "=== $name attempt $attempt rc=$rc end $(date +%H:%M:%S) ==="
    tail -3 "$LOG/$name.a$attempt.log"
    [ $rc -eq 0 ] && return 0
    [ $attempt -eq 1 ] && { echo "$name failed; re-probing tunnel"; reprobe || return $rc; }
  done
  return 1
}

run diffwave    10800 python scripts/train_real_diffwave.py --preset prod
run spec        10800 python scripts/train_real_spec.py --preset prod
run flagship     4500 python scripts/eval_flagship.py
run certify100k  7200 python scripts/certify_protocol.py --utts 1.0:6,0.5:3,0.25:3
run blackbox     3600 python scripts/eval_blackbox.py
run kws          2700 python scripts/train_real_kws.py
run transfer     2700 python scripts/eval_transfer.py
run qin          2700 python scripts/eval_qin.py
run bench        1800 python bench.py
echo "QUEUE DONE $(date)"
