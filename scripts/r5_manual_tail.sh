#!/bin/bash
# Round-5 manual tail after the chunked-unet economics collapsed (the
# persistent compile cache does not hit across processes on this axon
# session, so every stage invocation pays ~10-15 min of remote compile).
# Sequence: export the EMA@1000 (zero-step run, no train compile) -> commit,
# classifier (per-epoch tracked export) -> commit, eval (incremental summary
# dumps) until the deadline -> commit.
set -u
cd /root/repo
LOG=${1:-logs_r5d}
DEADLINE=${2:-1787206100}
export PYTHONPATH=/root/repo:/root/.axon_site
left() { echo $(( DEADLINE - $(date +%s) )); }
commit() { bash scripts/_commit_artifacts.sh "$1"; }

echo "=== export start $(date -u +%H:%M:%S)"
setsid timeout 600 python scripts/train_real_spec.py --preset prod \
  --stage unet --resume --unet_steps 1000 >> "$LOG/unet_export.log" 2>&1
echo "export rc=$? $(date -u +%H:%M:%S)"; tail -2 "$LOG/unet_export.log"
commit "r5 spec: UNet EMA export at step 1000 (corpus-derived mel bounds)"

echo "=== clf start $(date -u +%H:%M:%S)"
setsid timeout 1100 python scripts/train_real_spec.py --preset prod \
  --stage classifier --clf_epochs 12 >> "$LOG/spec_clf.log" 2>&1
echo "clf rc=$? $(date -u +%H:%M:%S)"; tail -2 "$LOG/spec_clf.log"
commit "r5 spec: ResNeXt29 8x64 classifier on v2 task"

T=$(( $(left) - 60 ))
echo "=== eval start $(date -u +%H:%M:%S) timeout ${T}s"
setsid timeout "$T" python scripts/train_real_spec.py --preset prod \
  --stage eval >> "$LOG/spec_eval.log" 2>&1
echo "eval rc=$? $(date -u +%H:%M:%S)"; tail -4 "$LOG/spec_eval.log"
commit "r5 spec: eval summary (denoise sanity t* sweep + adaptive CW)"
echo "TAIL DONE $(date -u)"
