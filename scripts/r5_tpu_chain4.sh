#!/bin/bash
# Round-5 TPU chain v4 (second VM-reset restart). Lesson from v3: the
# gitignored ckpts/ dir does NOT survive a VM reset, so an 85-min unet
# stage that gets budget-killed before exporting unet_final loses
# everything. v4 trains the UNet in ~3000-step CHUNKS, each chunk ending
# with a normal stage_unet exit that exports the freshest EMA sweep to the
# TRACKED artifacts/real_spec/unet_final and commits it — a reset now
# costs at most one chunk, and eval can always run on the last export.
# Usage: bash scripts/r5_tpu_chain4.sh [logdir] [deadline_epoch]
set -u
cd /root/repo
LOG=${1:-logs_r5d}
DEADLINE=${2:-$(( $(date +%s) + 5700 ))}
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site

left() { echo $(( DEADLINE - $(date +%s) )); }
commit() { bash scripts/_commit_artifacts.sh "$1"; }
probe() { timeout 300 python -c "import jax; print(jax.devices())" > "$LOG/probe.log" 2>&1; }

run() { # run <name> <budget_s> <cmd...>
  local name=$1 budget=$2; shift 2
  local rem=$(( $(left) - 60 )); local t=$budget
  [ "$rem" -lt "$t" ] && t=$rem
  [ "$t" -lt 300 ] && { echo "=== $name SKIPPED (${rem}s left)"; return 2; }
  echo "=== $name start $(date -u +%H:%M:%S) timeout ${t}s ==="
  setsid timeout "$t" "$@" >> "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc end $(date -u +%H:%M:%S) ==="
  tail -3 "$LOG/$name.log"
  return $rc
}

probe || { echo "tunnel down at launch; waiting 120s"; sleep 120; probe || echo "still down — proceeding, stages will fail fast"; }

# ---- 1. v2 synthetic data (deterministic seeds -> same corpus as v3's run)
run spec_data 900 python scripts/train_real_spec.py --preset prod --stage data
commit "r5 spec: v2 data stage"

# ---- 2. UNet in committed chunks ------------------------------------------
CKPT=artifacts/real_spec/ckpts
TARGET=30000
CHUNK=2000
UNET_END=$(( DEADLINE - 2520 ))   # reserve ~42 min for clf+eval
FAILS=0
while :; do
  now=$(date +%s)
  [ "$now" -ge "$UNET_END" ] && { echo "unet window exhausted"; break; }
  [ "$(left)" -lt 2400 ] && { echo "reserving tail for clf+eval"; break; }
  cur=$(ls "$CKPT" 2>/dev/null | grep -oE '^model[0-9]+' | grep -oE '[0-9]+' | sort -n | tail -1)
  cur=${cur:-0}
  [ "$cur" -ge "$TARGET" ] && { echo "unet reached $cur"; break; }
  next=$(( cur + CHUNK )); [ "$next" -gt "$TARGET" ] && next=$TARGET
  if run "unet_c$next" 1500 python scripts/train_real_spec.py --preset prod \
      --stage unet --resume --unet_steps "$next"; then
    FAILS=0
    commit "r5 spec: UNet EMA export at step $next (chunked train)"
  else
    FAILS=$(( FAILS + 1 ))
    commit "r5 spec: UNet chunk attempt (rc!=0) partial state"
    [ "$FAILS" -ge 3 ] && { echo "3 consecutive chunk failures; moving on"; break; }
    sleep 30
  fi
done

# ---- 3. classifier on the v2 task ------------------------------------------
run spec_clf 1200 python scripts/train_real_spec.py --preset prod --stage classifier --clf_epochs 12
commit "r5 spec: ResNeXt29 8x64 classifier (v2 task)"

# ---- 4. eval: denoise-sanity t* sweep + strong CW + eps65 (incremental dump)
run spec_eval $(( $(left) - 90 )) python scripts/train_real_spec.py --preset prod --stage eval
commit "r5 spec: eval summary (denoise sanity + adaptive CW)"

echo "CHAIN4 DONE $(date -u)"
