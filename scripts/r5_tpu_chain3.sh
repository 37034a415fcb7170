#!/bin/bash
# Round-5 TPU chain v3 (post-VM-reset restart). Changes over v2:
#   - fine-grained stages (spec data/unet/clf/eval separately, diffwave
#     train vs eval separately) so a budget kill loses one stage, not four;
#   - git-commits the artifacts after EVERY stage attempt (the VM reset
#     between sessions wiped 17k iters of un-committed training);
#   - deadline-aware like tpu_queue_r5.sh (stages that don't fit are
#     skipped so the tunnel is free for the driver's round-end bench);
#   - staleness watchdog measured over the artifact dir (max mtime of any
#     file under it), generous thresholds on eval stages where cold jit
#     compiles legitimately go 5-10 min without writing a file.
# Usage: bash scripts/r5_tpu_chain3.sh [logdir] [deadline_epoch]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r5c}
DEADLINE=${2:-$(( $(date +%s) + 11100 ))}   # default: now + 3h05m
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site

left() { echo $(( DEADLINE - $(date +%s) )); }
probe() { timeout 300 python -c "import jax; print(jax.devices())"; }

probe_until_up() {
  while [ "$(left)" -gt 600 ]; do
    probe > "$LOG/probe.log" 2>&1 && return 0
    echo "[probe] tunnel down $(date -u +%H:%M:%S); retry in 120s"
    sleep 120
  done
  return 1
}

newest_age() { # newest_age <dir> — seconds since the newest file under dir
  local t
  t=$(find "$1" -type f -printf '%T@\n' 2>/dev/null | sort -rn | head -1)
  t=${t%.*}
  [ -z "$t" ] && { echo 999999; return; }
  echo $(( $(date +%s) - t ))
}

run_stage() { # run_stage <name> <budget_s> <stale_s> <watch_dir> <cmd...>
  local name=$1 budget=$2 stale=$3 wdir=$4; shift 4
  for attempt in 1 2; do
    local rem=$(( $(left) - 120 ))
    local t=$budget
    [ "$rem" -lt "$t" ] && t=$rem
    if [ "$t" -lt 600 ]; then
      echo "=== $name SKIPPED (${rem}s to deadline) ==="
      return 2
    fi
    probe_until_up || { echo "=== $name SKIPPED (tunnel down at deadline) ==="; return 2; }
    mkdir -p "$wdir"
    touch "$wdir/.stage_start"   # an empty dir must not read as infinitely stale
    echo "=== $name attempt $attempt start $(date -u +%H:%M:%S) timeout ${t}s ==="
    local t0=$(date +%s)
    setsid timeout "$t" "$@" >> "$LOG/$name.log" 2>&1 &
    local pid=$!
    while kill -0 $pid 2>/dev/null; do
      sleep 60
      local age=$(newest_age "$wdir")
      local ran=$(( $(date +%s) - t0 ))
      # only stall-kill once the stage has had time to start writing
      if [ "$ran" -gt "$stale" ] && [ "$age" -gt "$stale" ]; then
        echo "[$name] STALL: $wdir quiet ${age}s at $(date -u +%H:%M:%S); killing group $pid"
        kill -9 -"$pid" 2>/dev/null
        sleep 5
      fi
    done
    wait $pid; local rc=$?
    echo "=== $name attempt $attempt rc=$rc end $(date -u +%H:%M:%S) ==="
    tail -3 "$LOG/$name.log"
    bash scripts/_commit_artifacts.sh "r5 artifacts: $name stage output (auto-commit)"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

SPEC=artifacts/real_spec
DW=artifacts/real_diffwave

# ---- 1. spec pipeline: VERDICT r4 job #1 -----------------------------------
run_stage spec_data  900 1200 "$SPEC" \
  python scripts/train_real_spec.py --preset prod --stage data
run_stage spec_unet 5100 1200 "$SPEC" \
  python scripts/train_real_spec.py --preset prod --stage unet --resume
run_stage spec_clf  1800 1200 "$SPEC" \
  python scripts/train_real_spec.py --preset prod --stage classifier
run_stage spec_eval 3000 2400 "$SPEC" \
  python scripts/train_real_spec.py --preset prod --stage eval

# ---- 2. diffwave v2 regen (train) + sanity/attack eval ----------------------
run_stage dw_data   600 1200 "$DW" \
  python scripts/train_real_diffwave.py --preset prod --stage data
run_stage dw_clf   1500 1200 "$DW" \
  python scripts/train_real_diffwave.py --preset prod --stage classifier
run_stage dw_train 5100  900 "$DW" \
  python scripts/train_real_diffwave.py --preset prod --stage diffwave --resume \
    --diffwave_iters 16000 --iters_per_ckpt 2000
run_stage dw_eval  3300 2400 "$DW" \
  python scripts/train_real_diffwave.py --preset prod --stage eval \
    --diffwave_iters 16000 --eval_parts sanity,attack
# certify section for real_diffwave intentionally deferred: certification
# evidence comes from flagship (sigma=0.25 N=2000 vs randsmooth, ResNeXt)
# and certify_protocol (N=100k); re-run with --eval_parts certify if time.

# ---- 3. flagship: trained DiffWave -> mel32 -> trained ResNeXt ---------------
run_stage flagship 3900 2400 artifacts/real_flagship \
  python scripts/eval_flagship.py

# ---- 4. the actual N=100k protocol (reduced utterance counts, stated) -------
run_stage certify100k 3000 2400 artifacts/certify_protocol \
  python scripts/certify_protocol.py --utts 1.0:2,0.5:1,0.25:1

# ---- 5. tail: black-box / qin / kws / transfer (fit-dependent) ---------------
run_stage blackbox 2100 2400 artifacts/real_blackbox python scripts/eval_blackbox.py
run_stage qin      1800 2400 artifacts/real_qin      python scripts/eval_qin.py
run_stage kws      1800 1500 artifacts/real_kws      python scripts/train_real_kws.py
run_stage transfer 1800 2400 artifacts/real_transfer python scripts/eval_transfer.py
run_stage dw_certify 2400 2400 "$DW" \
  python scripts/train_real_diffwave.py --preset prod --stage eval \
    --diffwave_iters 16000 --eval_parts certify

echo "CHAIN3 DONE $(date -u)"
