#!/usr/bin/env bash
# End-of-round hygiene: assert no process other than the caller's tree is
# holding the axon TPU tunnel (one client at a time — a survivor wedges the
# NEXT round's backend init; round 3's BENCH/MULTICHIP both died that way).
# Detection only — NEVER pattern-kills (a pattern can match this session).
set -u
self_tree=$(pstree -p $$ 2>/dev/null | grep -oE '[0-9]+' | sort -u)
bad=0
for pid in $(ps -eo pid=,comm= | awk '$2 ~ /python/ {print $1}'); do
  echo "$self_tree" | grep -qx "$pid" && continue
  if grep -qs 'axon' "/proc/$pid/maps" 2>/dev/null || \
     tr '\0' '\n' < "/proc/$pid/environ" 2>/dev/null | grep -q 'JAX_PLATFORMS=axon'; then
    echo "TPU-client candidate still alive: PID $pid: $(tr '\0' ' ' < /proc/$pid/cmdline | head -c 200)" >&2
    bad=1
  fi
done
if [ "$bad" -ne 0 ]; then
  echo "assert_no_tpu_clients: FAIL — kill the PIDs above by number (kill <pid>), never by pattern." >&2
  exit 1
fi
echo "assert_no_tpu_clients: OK — no surviving TPU clients."
