#!/bin/bash
# Round-4 queue, phase 9: hypothesis D (angular V dial x10 AND W x10 — the
# coupled reconstruction that lands all three published anchors in the CPU
# probe: naive 2.21, EKF 1.27, pgs_result 0.77 vs published 2.21-2.28 /
# 0.93-1.40 / 0.93). Full high-noise config set at proper world counts.
set -u
cd /root/repo
mkdir -p .tpulogs
Q=.tpulogs/queue.log

wait_for_tpu() {
  local deadline=$(( $(date +%s) + $1 ))
  while [ "$(date +%s)" -lt "$deadline" ]; do
    if timeout 150 python -c "
import jax, jax.numpy as jnp
y = jnp.ones((128, 128)) @ jnp.ones((128, 128))
print('ok', float(y[0, 0]))" > /dev/null 2>&1; then
      return 0
    fi
    echo "=== tunnel still down $(date -u '+%F %T')" >> "$Q"
    sleep 60
  done
  return 1
}

run() {
  local name=$1 tmo=$2; shift 2
  if ! wait_for_tpu 7200; then
    echo "=== $name SKIPPED (tunnel down 2h) $(date -u '+%F %T')" >> "$Q"
    return 1
  fi
  sleep 45
  echo "=== $name start $(date -u '+%F %T')" >> "$Q"
  timeout "$tmo" "$@" > ".tpulogs/$name.out" 2> ".tpulogs/$name.err"
  echo "=== $name rc=$? $(date -u '+%F %T')" >> "$Q"
  sleep 15
}

# wait for the phase-8 A/B queue to drain first (single TPU client rule)
while pgrep -f "tpu_queue_r4h.sh" > /dev/null 2>&1; do sleep 60; done

HIGH=naive_high_one_time,ekf_slam_high_one_time,naive_high_iter,ekf_slam_high_iter
run parity_d 10800 python scripts/reference_parity.py --scale-w --only "$HIGH" \
    --out docs/reference_parity_d.json
run parity_d 10800 python scripts/reference_parity.py --scale-w --only "$HIGH" \
    --out docs/reference_parity_d.json
echo "=== QUEUE9 DONE $(date -u '+%F %T')" >> "$Q"
