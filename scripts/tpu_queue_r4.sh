#!/bin/bash
# Round-4 TPU work queue. The axon tunnel admits ONE client at a time and
# has been known to wedge for hours (VERDICT r3 #1) — this runner probes
# until the tunnel answers, then executes the round-4 TPU work list
# SERIALLY with per-step timeouts, logging to $LOG. Never pattern-kills.
#
# Usage: bash scripts/tpu_queue_r4.sh [logdir]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4}
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site

probe() { timeout 300 python -c "import jax; print(jax.devices())"; }

up=0
for i in $(seq 1 120); do
  if probe > "$LOG/probe.log" 2>&1; then
    echo "TUNNEL UP after probe $i at $(date +%H:%M:%S)"; up=1; break
  fi
  echo "probe $i: down $(date +%H:%M:%S)"
  sleep 150
done
if [ "$up" != 1 ]; then echo "tunnel never answered; giving up"; exit 1; fi

reprobe() { # wait (up to ~2.5h) for the tunnel to answer again
  for i in $(seq 1 60); do
    probe > "$LOG/probe.log" 2>&1 && return 0
    echo "reprobe $i: down $(date +%H:%M:%S)"; sleep 150
  done
  return 1
}

run() { # run <name> <timeout_s> <cmd...> — one retry after a re-probe,
        # so a mid-queue tunnel wedge doesn't burn the remaining work list
  local name=$1 t=$2; shift 2
  for attempt in 1 2; do
    echo "=== $name attempt $attempt start $(date +%H:%M:%S) ==="
    timeout "$t" "$@" > "$LOG/$name.a$attempt.log" 2>&1
    local rc=$?
    echo "=== $name attempt $attempt rc=$rc end $(date +%H:%M:%S) ==="
    tail -3 "$LOG/$name.a$attempt.log"
    [ $rc -eq 0 ] && return 0
    [ $attempt -eq 1 ] && { echo "$name failed; re-probing tunnel"; reprobe || return $rc; }
  done
  return 1
}

run bench1   7200 python bench.py
run diffwave 16000 python scripts/train_real_diffwave.py --preset prod
run spec     14000 python scripts/train_real_spec.py
run lab21    3600 python perf/lab21_unet_bytes.py
run bench2   3600 python bench.py
echo "QUEUE DONE $(date)"
