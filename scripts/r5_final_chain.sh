#!/bin/bash
# Round-5 final session chain (one axon client at a time — serialized):
#   1. spec eval --attack_only  (recover the 413-killed defended CW rows;
#      jit_hoisted now hoists oversized pallas graphs + the defended run
#      passes --no_pallas_attention)
#   2. eval_flagship            (VERDICT r4 next #2: DiffWave+mel+ResNeXt,
#      incremental dumps, strong row before eps65, lab23 close-out inside)
#   3. certify_protocol         (VERDICT r4 next #3: the ACTUAL N=100k
#      protocol; utterance plan retuned to the remaining window)
# Every stage attempt ends with scripts/_commit_artifacts.sh.
set -u
cd /root/repo
LOG=logs_r5f
mkdir -p "$LOG"
DEADLINE=${1:-1787213700}   # 08:15:00 UTC — leave the driver's bench window
export PYTHONPATH=/root/repo:/root/.axon_site
left() { echo $(( DEADLINE - $(date +%s) )); }
commit() { bash scripts/_commit_artifacts.sh "$1"; }

echo "=== spec_attack start $(date -u +%H:%M:%S) left=$(left)s ==="
setsid timeout 1500 python scripts/train_real_spec.py --preset prod \
  --stage eval --attack_only >> "$LOG/spec_attack.log" 2>&1
echo "spec_attack rc=$? $(date -u +%H:%M:%S)"; tail -3 "$LOG/spec_attack.log"
commit "r5 spec: defended CW rows (attack_only recovery after compile-tunnel 413)"

# flagship gets the window minus a certify-protocol reserve (>=20 min when
# available); its incremental dumps make a timeout kill lose one block only
T=$(( $(left) - 1300 )); [ "$T" -gt 3300 ] && T=3300
if [ "$T" -gt 300 ]; then
  echo "=== flagship start $(date -u +%H:%M:%S) timeout ${T}s ==="
  setsid timeout "$T" python scripts/eval_flagship.py >> "$LOG/flagship.log" 2>&1
  echo "flagship rc=$? $(date -u +%H:%M:%S)"; tail -3 "$LOG/flagship.log"
  commit "r5 flagship: DiffWave + mel + ResNeXt29 artifact (denoise/CW/certify)"
fi

T=$(( $(left) - 90 ))
if [ "$T" -gt 300 ]; then
  # size the utterance plan to the window: ~5.8 min/utt at N=100k plus ~5 min
  # compile. >=25 min: 3 utts across sigmas; else 1-2 at sigma=1.0.
  if [ "$T" -gt 2100 ]; then PLAN="1.0:1,0.5:1,0.25:1";
  elif [ "$T" -gt 1200 ]; then PLAN="1.0:2";
  else PLAN="1.0:1"; fi
  echo "$PLAN" > artifacts/certify_protocol/utts_override.txt
  echo "=== certify_protocol start $(date -u +%H:%M:%S) timeout ${T}s plan=$PLAN ==="
  setsid timeout "$T" python scripts/certify_protocol.py >> "$LOG/certify_protocol.log" 2>&1
  echo "certify_protocol rc=$? $(date -u +%H:%M:%S)"; tail -3 "$LOG/certify_protocol.log"
  commit "r5 certify: N=100k protocol run (plan $PLAN)"
fi

echo "CHAIN DONE $(date -u)"
