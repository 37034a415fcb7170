#!/bin/bash
# Round-5 recovery chain (session 2). The 19:38Z queue wedged mid-diffwave
# (axon client stalled at 0% CPU, iter 14000, csv stale 55 min). This chain
# resumes diffwave from ckpt_10000 and rolls straight into the spec UNet,
# with a wedge watchdog: if the stage's progress file goes stale >10 min
# while the process sleeps, kill -9 and relaunch with --resume.
#
# Usage: bash scripts/r5_tpu_chain.sh
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5
mkdir -p "$LOG"

watchdog_run() { # watchdog_run <name> <budget_s> <progress_file> <cmd...>
  local name=$1 budget=$2 pfile=$3; shift 3
  for attempt in 1 2 3; do
    touch "$pfile" 2>/dev/null || true
    timeout "$budget" "$@" >> "$LOG/$name.chain.log" 2>&1 &
    local pid=$!
    echo "[$name] attempt $attempt pid=$pid start $(date -u +%H:%M:%S)"
    while kill -0 $pid 2>/dev/null; do
      sleep 120
      local age=$(( $(date +%s) - $(stat -c %Y "$pfile" 2>/dev/null || echo 0) ))
      if [ "$age" -gt 600 ]; then
        echo "[$name] WEDGE: $pfile stale ${age}s at $(date -u +%H:%M:%S); kill -9 $pid"
        kill -9 $pid 2>/dev/null
        sleep 5
      fi
    done
    wait $pid; local rc=$?
    echo "[$name] attempt $attempt rc=$rc end $(date -u +%H:%M:%S)"
    [ $rc -eq 0 ] && return 0
    # re-probe the tunnel before retrying
    timeout 300 python -c "import jax; print(jax.devices())" > "$LOG/probe.log" 2>&1 \
      || { echo "[$name] tunnel down after failure"; sleep 150; }
  done
  return 1
}

watchdog_run diffwave_resume 4500 artifacts/real_diffwave/progress.csv \
  python scripts/train_real_diffwave.py --preset prod --stage diffwave --resume --iters_per_ckpt 2000 \
  || echo "diffwave_resume FAILED"

# spec data is quick and deterministic; no watchdog needed
timeout 900 python scripts/train_real_spec.py --preset prod --stage data \
  >> "$LOG/spec_data.chain.log" 2>&1
echo "[spec_data] rc=$? $(date -u +%H:%M:%S)"

# spectrogram_train's logger writes progress.csv to $LOGDIR (train/logger.py:150)
export LOGDIR=$LOG/spec_unet_logs
mkdir -p "$LOGDIR"
watchdog_run spec_unet 7200 "$LOGDIR/progress.csv" \
  python scripts/train_real_spec.py --preset prod --stage unet --resume \
  || echo "spec_unet FAILED"

echo "CHAIN DONE $(date -u)"
