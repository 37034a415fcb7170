#!/bin/bash
# Round-5 TPU chain v2. Fixes over r5_tpu_chain.sh, learned the hard way:
#   - kill the whole process GROUP on a stall (v1 killed only the `timeout`
#     wrapper, orphaning the python, which kept the tunnel and made every
#     relaunch a second axon client — the double-client hang of CLAUDE.md);
#   - probe the tunnel before EVERY attempt, not just after a failure;
#   - adopt (wait on) a pre-existing training python instead of spawning a
#     competitor.
# Usage: bash scripts/r5_tpu_chain2.sh
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_r5
mkdir -p "$LOG"

probe_until_up() {
  until timeout 300 python -c "import jax; print(jax.devices())" > "$LOG/probe.log" 2>&1; do
    echo "[probe] tunnel down $(date -u +%H:%M:%S); retry in 120s"
    sleep 120
  done
}

watchdog_run() { # watchdog_run <name> <budget_s> <stale_s> <progress_file> <cmd...>
  local name=$1 budget=$2 stale=$3 pfile=$4; shift 4
  for attempt in 1 2 3 4; do
    probe_until_up
    touch "$pfile" 2>/dev/null || true
    setsid timeout "$budget" "$@" >> "$LOG/$name.chain.log" 2>&1 &
    local pid=$!
    echo "[$name] attempt $attempt pgid=$pid start $(date -u +%H:%M:%S)"
    while kill -0 $pid 2>/dev/null; do
      sleep 60
      local age=$(( $(date +%s) - $(stat -c %Y "$pfile" 2>/dev/null || echo 0) ))
      if [ "$age" -gt "$stale" ]; then
        echo "[$name] STALL: $pfile stale ${age}s at $(date -u +%H:%M:%S); killing group $pid"
        kill -9 -"$pid" 2>/dev/null
        sleep 5
      fi
    done
    wait $pid; local rc=$?
    echo "[$name] attempt $attempt rc=$rc end $(date -u +%H:%M:%S)"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

# ---- stage 0: adopt the in-flight diffwave python, if any ------------------
adopt=$(ps -o pid= -C python | while read p; do
  grep -lq "train_real_diffwave" /proc/$p/cmdline 2>/dev/null && echo $p; done | head -1)
if [ -n "${adopt:-}" ]; then
  echo "[adopt] waiting on existing diffwave python $adopt"
  while kill -0 "$adopt" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y artifacts/real_diffwave/progress.csv) ))
    if [ "$age" -gt 900 ]; then
      echo "[adopt] STALL ${age}s at $(date -u +%H:%M:%S); killing $adopt"
      kill -9 "$adopt" 2>/dev/null
    fi
  done
  echo "[adopt] diffwave python exited $(date -u +%H:%M:%S)"
fi

# finish diffwave if the run above died short of the 20k target
last_iter=$(tail -1 artifacts/real_diffwave/progress.csv | cut -d, -f1)
if [ "${last_iter:-0}" -lt 19800 ] || [ ! -d artifacts/real_diffwave/diffwave_final ]; then
  watchdog_run diffwave_finish 4500 600 artifacts/real_diffwave/progress.csv \
    python scripts/train_real_diffwave.py --preset prod --stage diffwave --resume --iters_per_ckpt 2000 \
    || echo "diffwave_finish FAILED"
fi

# ---- stage 1: spec data (quick, deterministic) ------------------------------
probe_until_up
timeout 900 python scripts/train_real_spec.py --preset prod --stage data \
  >> "$LOG/spec_data.chain.log" 2>&1
echo "[spec_data] rc=$? $(date -u +%H:%M:%S)"

# ---- stage 2: spec UNet (the round's job #1) --------------------------------
export LOGDIR=$LOG/spec_unet_logs
mkdir -p "$LOGDIR"
watchdog_run spec_unet 9000 600 "$LOGDIR/progress.csv" \
  python scripts/train_real_spec.py --preset prod --stage unet --resume \
  || echo "spec_unet FAILED"

echo "CHAIN2 DONE $(date -u)"
