#!/bin/bash
# Round-5 session-6 chain (one axon client at a time — serialized):
#   1. eval_flagship --resume   (denoise sanity already committed; this adds
#      the strong + eps65 adaptive-CW rows = VERDICT r4 next #2's missing half)
#   2. certify_protocol         (VERDICT r4 next #3: the ACTUAL N=100k
#      protocol; utterance plan sized to the remaining window)
#   3. leftovers if time: flagship certify sigma=0.25 N=2000 (resume skips
#      the attack rows), lab23 close-out
# Every stage attempt ends with scripts/_commit_artifacts.sh.
set -u
cd /root/repo
LOG=logs_r5g
mkdir -p "$LOG"
DEADLINE=${1:-1787216400}   # 09:00:00 UTC — leave the driver's bench window
export PYTHONPATH=/root/repo:/root/.axon_site
left() { echo $(( DEADLINE - $(date +%s) )); }
commit() { bash scripts/_commit_artifacts.sh "$1"; }

# flagship attacks get the window minus a certify-protocol reserve (~18 min)
T=$(( $(left) - 1100 )); [ "$T" -gt 1500 ] && T=1500
echo "=== flagship_cw start $(date -u +%H:%M:%S) left=$(left)s timeout ${T}s ==="
setsid timeout "$T" python scripts/eval_flagship.py --resume \
  --skip_certify --skip_lab23 >> "$LOG/flagship_cw.log" 2>&1
echo "flagship_cw rc=$? $(date -u +%H:%M:%S)"; tail -3 "$LOG/flagship_cw.log"
commit "r5 flagship: adaptive CW rows (strong + eps65, undefended vs defended)"

T=$(( $(left) - 60 ))
if [ "$T" -gt 300 ]; then
  # ~5.8 min/utt at N=100k plus ~5 min compile; sigma is a traced arg so
  # extra sigmas reuse the compile
  if [ "$T" -gt 1500 ]; then PLAN="1.0:1,0.5:1,0.25:1";
  elif [ "$T" -gt 1000 ]; then PLAN="1.0:1,0.25:1";
  else PLAN="1.0:1"; fi
  echo "$PLAN" > artifacts/certify_protocol/utts_override.txt
  echo "=== certify_protocol start $(date -u +%H:%M:%S) timeout ${T}s plan=$PLAN ==="
  setsid timeout "$T" python scripts/certify_protocol.py >> "$LOG/certify_protocol.log" 2>&1
  echo "certify_protocol rc=$? $(date -u +%H:%M:%S)"; tail -3 "$LOG/certify_protocol.log"
  commit "r5 certify: N=100k protocol run (plan $PLAN)"
fi

T=$(( $(left) - 60 ))
if [ "$T" -gt 420 ]; then
  echo "=== flagship_certify start $(date -u +%H:%M:%S) timeout ${T}s ==="
  setsid timeout "$T" python scripts/eval_flagship.py --resume \
    --skip_lab23 >> "$LOG/flagship_certify.log" 2>&1
  echo "flagship_certify rc=$? $(date -u +%H:%M:%S)"; tail -3 "$LOG/flagship_certify.log"
  commit "r5 flagship: certify sigma=0.25 N=2000 diffusion vs randsmooth"
fi

echo "CHAIN DONE $(date -u)"
