#!/bin/bash
# Round-4 TPU work queue (v2: deadline-aware). The axon tunnel admits ONE
# client at a time and has been wedged for 15+ hours (VERDICT r3 #1) — this
# runner probes until the tunnel answers, then executes the round-4 TPU
# work list SERIALLY with per-step timeouts. v2 adds a hard DEADLINE: no
# step starts unless it fits before it, and probing stops at it, so the
# queue can never hold the tunnel into the driver's round-end bench run
# (which would collide under the single-client rule and turn a recovered
# tunnel back into a red BENCH artifact). Never pattern-kills.
#
# Usage: bash scripts/tpu_queue_r4.sh [logdir] [deadline_epoch]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4}
DEADLINE=${2:-$(date -d '21:30' +%s)}   # default: today 21:30 UTC (round ends ~22:00)
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

reprobe() { # wait for the tunnel to answer again (bounded by the deadline)
  while [ "$(left)" -gt 1200 ]; do
    probe > "$LOG/probe.log" 2>&1 && return 0
    echo "reprobe: down $(date +%H:%M:%S)"; sleep 150
  done
  return 1
}

run() { # run <name> <budget_s> <cmd...> — skip unless it fits before the
        # deadline (timeout clamped to the remaining window minus a 300 s
        # buffer); one retry after a re-probe so a mid-queue wedge doesn't
        # burn the rest of the work list
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

run bench1   2700 python bench.py
run diffwave 14400 python scripts/train_real_diffwave.py --preset prod
run spec     9000 python scripts/train_real_spec.py
run lab21    2400 python perf/lab21_unet_bytes.py
run bench2   1800 python bench.py
echo "QUEUE DONE $(date)"
