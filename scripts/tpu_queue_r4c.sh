#!/bin/bash
# Round-4 follow-up TPU queue: waits for the main queue (scripts/
# tpu_queue_r4.sh, PID in /tmp/tpu_queue.pid) to exit, then runs the
# strong-attack addendum (scripts/attack_strength_r4.py). Same single-client
# and deadline rules as the main queue. Never pattern-kills.
#
# Usage: bash scripts/tpu_queue_r4c.sh [logdir] [deadline_epoch]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4c}
DEADLINE=${2:?deadline epoch required}
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site

left() { echo $(( DEADLINE - $(date +%s) )); }

# gate: main queue must be gone (exact-PID check, no pattern matching)
while [ -f /tmp/tpu_queue.pid ] && kill -0 "$(cat /tmp/tpu_queue.pid)" 2>/dev/null; do
  if [ "$(left)" -lt 1500 ]; then
    echo "deadline too close while main queue still running; giving up"; exit 1
  fi
  sleep 60
done
echo "main queue done at $(date +%H:%M:%S); $(left)s to deadline"

rem=$(( $(left) - 300 ))
[ "$rem" -gt 2400 ] && rem=2400
if [ "$rem" -lt 900 ]; then echo "no room before deadline; skipping"; exit 1; fi
echo "=== attack_strong start $(date +%H:%M:%S) timeout ${rem}s ==="
timeout "$rem" python scripts/attack_strength_r4.py > "$LOG/attack_strong.log" 2>&1
rc=$?
echo "=== attack_strong rc=$rc end $(date +%H:%M:%S) ==="
tail -5 "$LOG/attack_strong.log"
exit $rc
