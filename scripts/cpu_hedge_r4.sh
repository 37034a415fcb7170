#!/bin/bash
# Round-4 CPU hedge runner. The axon tunnel has been wedged for 15+ hours
# (see scripts/tpu_queue_r4.sh, which is probing for it); meanwhile the
# reduced real-weights artifacts (`--preset cpu`) train on the single host
# core with a forced-CPU backend (no axon client, so it cannot collide
# with the TPU queue). Serial: one core. Detached launch (setsid) so a
# driver-session crash doesn't kill training mid-run.
#
# Usage: setsid nohup bash scripts/cpu_hedge_r4.sh > /tmp/cpu_hedge_r4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

step() {
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout "$t" "$@"
  echo "=== $name rc=$? end $(date +%H:%M:%S) ==="
}

# diffwave stage died at iter 400/600 with the previous session (no ckpt at
# iters_per_ckpt=5000) — rerun it from scratch, then eval. data+classifier
# stages already completed (artifacts/real_diffwave_cpu/classifier).
step diffwave 7200 python scripts/train_real_diffwave.py --preset cpu --cpu --stage diffwave
step dw_eval 10800 python scripts/train_real_diffwave.py --preset cpu --cpu --stage eval
step spec    14400 python scripts/train_real_spec.py --preset cpu --cpu
echo "CPU HEDGE DONE $(date)"
